#!/usr/bin/env python
"""Driver wrapper: python test.py — see radnet_tpu/cli/test.py."""
import sys
from radnet_tpu.cli.test import main

if __name__ == "__main__":
    sys.exit(main())
