#!/usr/bin/env python
"""Driver wrapper: python train.py — see radnet_tpu/cli/train.py."""
import sys
from radnet_tpu.cli.train import main

if __name__ == "__main__":
    sys.exit(main())
