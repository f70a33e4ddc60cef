#!/usr/bin/env python
"""Train-step batch-size sweep: steps/s, images/s and MFU per batch size.

Larger tile batches amortize the fixed per-step work (target generation,
proposal NMS, optimizer update are batch-size-independent or sublinear)
over more MXU work, so train MFU should rise with batch until HBM or
canvas-activation memory binds.  This measures where that curve bends on
the real chip, using the SAME measurement as bench.py's
``time_train_step`` (bundled, donated, carry-threaded - the only
trustworthy pattern through the tunnel, CLAUDE.md pitfall #3).

Usage: python scripts/sweep_train_batch.py [--batches 8,16,32] [--steps 40]
"""

from __future__ import annotations

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", default="8,16,32")
    ap.add_argument("--steps", type=int, default=40)
    args = ap.parse_args()

    from bench import _enable_compile_cache, time_train_step

    _enable_compile_cache()
    print(f"{'batch':>6} {'steps/s':>9} {'imgs/s':>9} {'MFU':>7}")
    for b in [int(x) for x in args.batches.split(",")]:
        try:
            sps, ips, mfu = time_train_step(
                config_overrides={"batch_size": b}, n_steps=args.steps
            )
            print(f"{b:>6} {sps:>9.2f} {ips:>9.1f} {mfu:>7.3f}")
        except Exception as e:
            print(f"{b:>6} failed: {e}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
