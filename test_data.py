#!/usr/bin/env python
"""Driver wrapper: python test_data.py — see radnet_tpu/cli/test_data.py."""
import sys
from radnet_tpu.cli.test_data import main

if __name__ == "__main__":
    sys.exit(main())
