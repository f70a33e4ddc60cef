#!/usr/bin/env python
"""Stage-level ablation of the ResNet50 trunk (carry-threaded).

Round-3 attribution (`ablate_cascade.py`) put the trunk at 7.0 ms of the
35.1 ms 8-tile inference batch at 26% MFU - the named remaining perf
lever (VERDICT r3 item 1).  This script attributes trunk time to the
stem / stage2 / stage3 / stage4 prefixes with the same tunnel-proof
carry-threaded discipline (CLAUDE.md pitfall #3): each iteration's input
depends on the previous output, one 4-byte scalar value fetch at the end.

Usage: python scripts/ablate_trunk.py [--batch 8] [--iters 30]
       [--dtype bfloat16]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # v5e bf16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--dtype", default="bfloat16")
    ap.add_argument("--canvas", type=int, default=None)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radnet_tpu.config import Config
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.models.detector import build_model
    from radnet_tpu.models.resnet import ResNet50Trunk
    from radnet_tpu.data.pipeline import preprocess_on_device

    config = Config(network="resnet50", compute_dtype=args.dtype)
    if args.canvas:
        config.canvas_size = args.canvas
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    # Standalone trunk prefixes applied with the full model's trunk params
    # (flax looks sublayers up by name; truncation just skips the rest).
    trunk_params = state.params["trunk"]
    trunk_stats = state.batch_stats["trunk"]

    b, s = args.batch, config.canvas_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 64, (b, s, s, 3)).astype(np.float32) + 127)

    dt = {"bfloat16": jnp.bfloat16, "float32": jnp.float32}[args.dtype]

    def prefix_fn(up_to):
        mod = ResNet50Trunk(dtype=dt, up_to=up_to)

        @jax.jit
        def fn(carry, params, stats, imgs):
            x = preprocess_on_device(imgs + carry * 1e-12)
            y = mod.apply({"params": params, "batch_stats": stats}, x)
            return carry + y.astype(jnp.float32).mean() * 1e-12

        return fn

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)  # compile
        float(carry)  # value-fetch barrier
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)
        return (time.perf_counter() - t0) / iters

    def flops_of(jitted, argspec):
        try:
            ca = jitted.lower(*argspec).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", float("nan")))
        except Exception:
            return float("nan")

    z = jnp.float32(0.0)
    extra = (trunk_params, trunk_stats, images)
    rows = []
    for up_to, label in ((
        ("stem", "stem"),
        ("s2", "+stage2"),
        ("s3", "+stage3"),
        (None, "+stage4 (full)"),
    )):
        fn = prefix_fn(up_to)
        dt_s = timed(fn, extra, args.iters)
        fl = flops_of(fn, (z, *extra))
        rows.append((label, dt_s, fl))

    dev = jax.devices()[0]
    print(f"\ndevice={dev} batch={b} @{s}^2 dtype={args.dtype} "
          f"iters={args.iters} (carry-threaded, cumulative)")
    print(f"{'prefix':<16}{'ms/batch':>10}{'GFLOP':>9}{'MFU%':>6}")
    prev_t, prev_f = 0.0, 0.0
    for name, dts, fl in rows:
        mfu = fl / dts / PEAK * 100 if np.isfinite(fl) else float("nan")
        print(f"{name:<16}{dts*1e3:>10.2f}"
              f"{fl/1e9 if np.isfinite(fl) else float('nan'):>9.1f}{mfu:>6.1f}")
    print("\nstage deltas:")
    prev_t, prev_f = 0.0, 0.0
    for name, dts, fl in rows:
        d_t, d_f = dts - prev_t, (fl - prev_f if np.isfinite(fl) else float("nan"))
        mfu = d_f / d_t / PEAK * 100 if np.isfinite(d_f) and d_t > 0 else float("nan")
        print(f"  {name:<16}{d_t*1e3:>8.2f} ms {d_f/1e9:>8.1f} GF {mfu:>5.1f}% MFU")
        prev_t, prev_f = dts, fl
    return 0


if __name__ == "__main__":
    sys.exit(main())
