#!/usr/bin/env python
"""Driver wrapper: python predict.py — see radnet_tpu/cli/predict.py."""
import sys
from radnet_tpu.cli.predict import main

if __name__ == "__main__":
    sys.exit(main())
