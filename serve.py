#!/usr/bin/env python
"""Driver wrapper: python serve.py — see radnet_tpu/cli/serve.py."""
import sys
from radnet_tpu.cli.serve import main

if __name__ == "__main__":
    sys.exit(main())
