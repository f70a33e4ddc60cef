#!/usr/bin/env python
"""Driver wrapper: python cont_train.py — see radnet_tpu/cli/cont_train.py."""
import sys
from radnet_tpu.cli.cont_train import main

if __name__ == "__main__":
    sys.exit(main())
