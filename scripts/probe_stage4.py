#!/usr/bin/env python
"""A/B probes for the ResNet50 stage-4 formulation (carry-threaded).

Stage 4 (6 bottlenecks @38x38x1024) measures 2.79 ms at 29% MFU
(scripts/ablate_trunk.py) against a ~1.0 ms roofline (161 GFLOP compute,
~540 MB HBM).  Suspects: the bf16 (16,128) tile padding of the 38-row
spatial dim (38->48, 26% dead sublanes) and conv lowering for 1x1 convs
that a plain (B*H*W, C) @ (C, O) matmul avoids.

Usage: python scripts/probe_stage4.py [--batch 8] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    b = args.batch
    H = W = 38
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (b, H, W, 1024)).astype(np.float32)).astype(dt)

    def mk(shape):
        return jnp.asarray(rng.normal(0, 0.03, shape).astype(np.float32))

    # 6 blocks x (1x1 1024->256, 3x3 256->256, 1x1 256->1024) + bn scale/shift
    blocks = []
    for _ in range(6):
        blocks.append(
            dict(
                w1=mk((1, 1, 1024, 256)), s1=mk((256,)), b1=mk((256,)),
                w2=mk((3, 3, 256, 256)), s2=mk((256,)), b2=mk((256,)),
                w3=mk((1, 1, 256, 1024)), s3=mk((1024,)), b3=mk((1024,)),
            )
        )

    def conv(x, w, pad="VALID"):
        return jax.lax.conv_general_dilated(
            x, w.astype(dt), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def block_conv(x, p):
        y = conv(x, p["w1"])
        y = jnp.maximum(y * p["s1"].astype(dt) + p["b1"].astype(dt), 0)
        y = conv(y, p["w2"], "SAME")
        y = jnp.maximum(y * p["s2"].astype(dt) + p["b2"].astype(dt), 0)
        y = conv(y, p["w3"])
        y = y * p["s3"].astype(dt) + p["b3"].astype(dt)
        return jnp.maximum(y + x, 0)

    def block_dot(x, p):
        # 1x1 convs as (B*H*W, C) matmuls; 3x3 stays a conv.
        v = x.reshape(-1, 1024)
        y = jnp.dot(v, p["w1"].reshape(1024, 256).astype(dt))
        y = jnp.maximum(y * p["s1"].astype(dt) + p["b1"].astype(dt), 0)
        y = conv(y.reshape(b, H, W, 256), p["w2"], "SAME").reshape(-1, 256)
        y = jnp.maximum(y * p["s2"].astype(dt) + p["b2"].astype(dt), 0)
        y = jnp.dot(y, p["w3"].reshape(256, 1024).astype(dt))
        y = y * p["s3"].astype(dt) + p["b3"].astype(dt)
        return jnp.maximum(y + v, 0).reshape(b, H, W, 1024)

    probes = {}

    def add(name, blk):
        @jax.jit
        def fn(carry, x0, blocks):
            x = x0 + (carry * 1e-12).astype(dt)
            for p in blocks:
                x = blk(x, p)
            return carry + x.astype(jnp.float32).mean() * 1e-12
        probes[name] = fn

    add("6x bottleneck conv (current)", block_conv)
    add("6x bottleneck 1x1-as-dot", block_dot)

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)
        return (time.perf_counter() - t0) / iters

    print(f"batch={b} @38x38x1024 bf16, iters={args.iters}")
    for name, fn in probes.items():
        dt_s = timed(fn, (x0, blocks), args.iters)
        print(f"{name:<30}{dt_s*1e3:>8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
