#!/usr/bin/env python
"""Driver wrapper: python test_rpn.py — see radnet_tpu/cli/test_rpn.py."""
import sys
from radnet_tpu.cli.test_rpn import main

if __name__ == "__main__":
    sys.exit(main())
