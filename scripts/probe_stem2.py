#!/usr/bin/env python
"""Stem probes round 2: planar (channel-major) formulations.

probe_stem.py showed the s2d BUILD alone costs 1.53 ms - the channel-
minor (B,H,W,3/12) layouts are lane-padded and every op touching them
crawls.  These probes keep the image planar (B,C,H,W) end-to-end, where
the minor dims are dense spatial, and measure (a) the XLA NCHW conv on a
planar prebuilt s2d tensor, (b) the planar s2d build itself, (c) the
final NCHW->NHWC transpose the rest of the trunk needs, (d) uint8 planar
input + on-device preprocess, as the pipeline would ship it.

Usage: python scripts/probe_stem2.py [--batch 8] [--iters 30]
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
    s = 608
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    img_planar = jnp.asarray(
        rng.normal(0, 64, (b, 3, s, s)).astype(np.float32) + 127
    )
    img_planar_u8 = jnp.asarray(
        rng.integers(0, 255, (b, 3, s, s), dtype=np.uint8)
    )
    kernel = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))

    def kern_s2d_oihw(k):
        # (7,7,3,64) -> OIHW (64, 12, 4, 4) with channel order (p, q, c)
        kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8,8,3,64)
        kk = (
            kp.reshape(4, 2, 4, 2, 3, 64)
            .transpose(5, 1, 3, 4, 0, 2)  # (64, p, q, c, a, b)
            .reshape(64, 12, 4, 4)
        )
        return kk

    def planar_s2d(xpad):
        # (B, 3, 614, 614) -> (B, 12, 307, 307), channel order (p, q, c)
        parts = []
        for p in (0, 1):
            for q in (0, 1):
                parts.append(xpad[:, :, p::2, q::2])
        return jnp.concatenate(parts, axis=1)

    @jax.jit
    def p_s2d_build(carry, x):
        xpad = jnp.pad((x + carry * 1e-12).astype(dt), ((0, 0), (0, 0), (3, 3), (3, 3)))
        x2 = planar_s2d(xpad)
        return carry + x2.astype(jnp.float32).mean() * 1e-12

    x2_pre = jax.jit(
        lambda x: planar_s2d(jnp.pad(x.astype(dt), ((0, 0), (0, 0), (3, 3), (3, 3))))
    )(img_planar)
    x2_pre.block_until_ready()

    @jax.jit
    def p_conv_only(carry, x2, kernel):
        y = jax.lax.conv_general_dilated(
            x2 + (carry * 1e-12).astype(dt), kern_s2d_oihw(kernel).astype(dt),
            (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @jax.jit
    def p_full_planar(carry, x, kernel):
        """pad + s2d + conv, all planar; output NCHW."""
        xpad = jnp.pad((x + carry * 1e-12).astype(dt), ((0, 0), (0, 0), (3, 3), (3, 3)))
        x2 = planar_s2d(xpad)
        y = jax.lax.conv_general_dilated(
            x2, kern_s2d_oihw(kernel).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @jax.jit
    def p_full_planar_pool_nhwc(carry, x, kernel):
        """planar conv + NCHW maxpool + transpose to NHWC (trunk handoff)."""
        xpad = jnp.pad((x + carry * 1e-12).astype(dt), ((0, 0), (0, 0), (3, 3), (3, 3)))
        x2 = planar_s2d(xpad)
        y = jax.lax.conv_general_dilated(
            x2, kern_s2d_oihw(kernel).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        y = jnp.maximum(y, 0)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
        )
        y = jnp.transpose(y, (0, 2, 3, 1))  # NHWC for stage 2
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @jax.jit
    def p_full_planar_u8(carry, xu8, kernel):
        """uint8 planar input + mean-centering on device (pipeline form)."""
        x = xu8.astype(dt) - jnp.asarray([103.939, 116.779, 123.68], dt).reshape(1, 3, 1, 1)
        x = x + (carry * 1e-12).astype(dt)
        xpad = jnp.pad(x, ((0, 0), (0, 0), (3, 3), (3, 3)))
        x2 = planar_s2d(xpad)
        y = jax.lax.conv_general_dilated(
            x2, kern_s2d_oihw(kernel).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        y = jnp.maximum(y, 0)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 1, 3, 3), (1, 1, 2, 2), "VALID"
        )
        y = jnp.transpose(y, (0, 2, 3, 1))
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @jax.jit
    def p_transpose_only(carry, x2):
        y = jnp.transpose(x2 + (carry * 1e-12).astype(dt), (0, 2, 3, 1))
        return carry + y.astype(jnp.float32).mean() * 1e-12

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)
        return (time.perf_counter() - t0) / iters

    it = args.iters
    rows = [
        ("planar s2d build only", timed(p_s2d_build, (img_planar,), it)),
        ("planar conv only (prebuilt)", timed(p_conv_only, (x2_pre, kernel), it)),
        ("planar pad+s2d+conv", timed(p_full_planar, (img_planar, kernel), it)),
        ("planar full+pool+to-NHWC", timed(p_full_planar_pool_nhwc, (img_planar, kernel), it)),
        ("planar u8 full (pipeline form)", timed(p_full_planar_u8, (img_planar_u8, kernel), it)),
        ("transpose (B,12,307,307)->NHWC", timed(p_transpose_only, (x2_pre,), it)),
    ]
    print(f"batch={b} @608^2 planar, iters={it}  [NHWC current: full 1.99, "
          f"stem+pool 2.48 (probe_stem.py)]")
    for name, dt_s in rows:
        print(f"{name:<34}{dt_s*1e3:>8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
