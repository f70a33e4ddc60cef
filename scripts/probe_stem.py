#!/usr/bin/env python
"""A/B probes for the ResNet50 stem (carry-threaded, tunnel-proof).

The stage ablation (scripts/ablate_trunk.py) attributes 2.5 ms of the
7.3 ms trunk batch to the stem at 3.7% MFU - far below both the compute
roofline (~0.1 ms) and the HBM roofline (~0.3 ms), i.e. the cost is
layout, not arithmetic.  Each probe isolates one candidate formulation;
all are carry-threaded with a scalar value fetch (CLAUDE.md pitfall #3).

Usage: python scripts/probe_stem.py [--batch 8] [--iters 30]
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
    rng = np.random.default_rng(0)
    img = jnp.asarray(rng.normal(0, 64, (b, s, s, 3)).astype(np.float32) + 127)
    kernel = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))
    # pre-built s2d input + re-laid-out kernel (for conv-only probes)
    dt = jnp.bfloat16

    def s2d(xpad):
        bb, h, w, c = xpad.shape
        xw = xpad.reshape(bb, h, w // 2, 2 * c)
        return jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)

    def kern_s2d(k):
        kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        return (
            kp.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
        )

    @jax.jit
    def build_x2(img):
        xpad = jnp.pad(img.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        return s2d(xpad)

    x2_pre = build_x2(img)
    x2_pre.block_until_ready()

    probes = {}

    def probe(name):
        def deco(fn):
            probes[name] = jax.jit(fn)
            return fn
        return deco

    @probe("full current (pad+s2d+conv)")
    def p_full(carry, img, kernel):
        x = img + carry * 1e-12
        xpad = jnp.pad(x.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        x2 = s2d(xpad)
        y = jax.lax.conv_general_dilated(
            x2, kern_s2d(kernel).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @probe("s2d build only")
    def p_s2d(carry, img):
        x = img + carry * 1e-12
        xpad = jnp.pad(x.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        x2 = s2d(xpad)
        return carry + x2.astype(jnp.float32).mean() * 1e-12

    @probe("conv only (prebuilt s2d)")
    def p_conv(carry, x2, kernel):
        y = jax.lax.conv_general_dilated(
            x2 + (carry * 1e-12).astype(dt), kern_s2d(kernel).astype(dt),
            (1, 1), "VALID", dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @probe("plain 7x7/2 NHWC")
    def p_plain(carry, img, kernel):
        x = img + carry * 1e-12
        xpad = jnp.pad(x.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        y = jax.lax.conv_general_dilated(
            xpad, kernel.astype(dt), (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @probe("plain 7x7/2 NCHW")
    def p_nchw(carry, img, kernel):
        x = img + carry * 1e-12
        xc = jnp.transpose(x.astype(dt), (0, 3, 1, 2))
        xpad = jnp.pad(xc, ((0, 0), (0, 0), (3, 3), (3, 3)))
        y = jax.lax.conv_general_dilated(
            xpad, jnp.transpose(kernel, (3, 2, 0, 1)).astype(dt), (2, 2), "VALID",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        # back to NHWC for the rest of the trunk
        y = jnp.transpose(y, (0, 2, 3, 1))
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @probe("s2d conv NCHW")
    def p_s2d_nchw(carry, img, kernel):
        x = img + carry * 1e-12
        xpad = jnp.pad(x.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        x2 = s2d(xpad)  # (B, 307, 307, 12)
        x2c = jnp.transpose(x2, (0, 3, 1, 2))
        y = jax.lax.conv_general_dilated(
            x2c, jnp.transpose(kern_s2d(kernel), (3, 2, 0, 1)).astype(dt),
            (1, 1), "VALID", dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        y = jnp.transpose(y, (0, 2, 3, 1))
        return carry + y.astype(jnp.float32).mean() * 1e-12

    @probe("stem+bn+relu+maxpool (current)")
    def p_stem_pool(carry, img, kernel):
        x = img + carry * 1e-12
        xpad = jnp.pad(x.astype(dt), ((0, 0), (3, 3), (3, 3), (0, 0)))
        x2 = s2d(xpad)
        y = jax.lax.conv_general_dilated(
            x2, kern_s2d(kernel).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        y = nnrelu(y)
        y = jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )
        return carry + y.astype(jnp.float32).mean() * 1e-12

    def nnrelu(v):
        return jnp.maximum(v, 0)

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)
        return (time.perf_counter() - t0) / iters

    argmap = {
        "full current (pad+s2d+conv)": (img, kernel),
        "s2d build only": (img,),
        "conv only (prebuilt s2d)": (x2_pre, kernel),
        "plain 7x7/2 NHWC": (img, kernel),
        "plain 7x7/2 NCHW": (img, kernel),
        "s2d conv NCHW": (img, kernel),
        "stem+bn+relu+maxpool (current)": (img, kernel),
    }
    print(f"batch={b} @608^2, iters={args.iters}")
    for name, fn in probes.items():
        dt_s = timed(fn, argmap[name], args.iters)
        print(f"{name:<34}{dt_s*1e3:>8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
