#!/usr/bin/env python
"""A/B probes for the int8 stage-5 RoI head formulations (carry-threaded).

Round 4 changed the stride-1 1x1 convs of the quantized head from the
int8 conv form (r3: 4.5 ms/tile vs 4.9 float) to a per-pixel-scaled
(B*H*W, C) int8 matmul - and the bench regressed to 7.9 ms/tile vs 4.6
float (BENCH_r04.json).  This probe times the stage-5 bottleneck chain
(s5a/s5b/s5c at the production inference shape: B tiles x 300 RoIs,
7x7x1024 pre-strided input) under each candidate formulation to find
which change took the time and which variant to ship (VERDICT r4 item 2).

Usage: python scripts/probe_int8.py [--tiles 12] [--iters 20]
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
    ap.add_argument("--tiles", type=int, default=12)
    ap.add_argument("--rois", type=int, default=300)
    ap.add_argument("--iters", type=int, default=20)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    N = args.tiles * args.rois  # RoIs as batch axis
    H = W = 7
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    x0 = jnp.asarray(rng.normal(0, 1, (N, H, W, 1024)).astype(np.float32)).astype(dt)

    def mk(shape):
        return jnp.asarray(rng.normal(0, 0.03, shape).astype(np.float32))

    # s5a (project, stride 1 pre-strided) + s5b + s5c: filters (512,512,2048)
    def mkblock(cin):
        return dict(
            w1=mk((1, 1, cin, 512)), s1=mk((512,)), b1=mk((512,)),
            w2=mk((3, 3, 512, 512)), s2=mk((512,)), b2=mk((512,)),
            w3=mk((1, 1, 512, 2048)), s3=mk((2048,)), b3=mk((2048,)),
        )

    blocks = [mkblock(1024), mkblock(2048), mkblock(2048)]
    blocks[0]["wsc"] = mk((1, 1, 1024, 2048))
    blocks[0]["ssc"] = mk((2048,))
    blocks[0]["bsc"] = mk((2048,))

    def quantize_sym(x, axes):
        x = x.astype(jnp.float32)
        amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
        scale = jnp.maximum(amax, jnp.float32(1e-12)) / jnp.float32(127.0)
        q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
        return q, scale

    def conv_f(x, w, pad="VALID"):
        return jax.lax.conv_general_dilated(
            x, w.astype(dt), (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def int8_conv(x, kernel, pad="VALID"):
        xq, sx = quantize_sym(x, axes=(1, 2, 3))
        wq, sw = quantize_sym(kernel, axes=(0, 1, 2))
        acc = jax.lax.conv_general_dilated(
            xq, wq, (1, 1), pad,
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.int32,
        )
        return acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))

    def int8_dense_rowscale(v, kernel2d):
        xq, sx = quantize_sym(v, axes=(1,))
        wq, sw = quantize_sym(kernel2d, axes=(0,))
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return acc.astype(jnp.float32) * (sx * sw)

    def int8_dense_roiscale(x4d, kernel2d):
        # per-RoI scale computed on the 4D view, broadcast over pixels
        xq, sx = quantize_sym(x4d, axes=(1, 2, 3))  # (N,1,1,1)
        o = kernel2d.shape[1]
        wq, sw = quantize_sym(kernel2d, axes=(0,))
        n, h, w, c = x4d.shape
        acc = jax.lax.dot_general(
            xq.reshape(-1, c), wq, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.int32,
        )
        out = acc.astype(jnp.float32) * (sx.reshape(-1, 1).repeat(h * w, 0) * sw)
        return out.reshape(n, h, w, o)

    def int8_dense_bf16out(v, kernel2d):
        xq, sx = quantize_sym(v, axes=(1,))
        wq, sw = quantize_sym(kernel2d, axes=(0,))
        acc = jax.lax.dot_general(
            xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
        )
        return (acc.astype(jnp.float32) * (sx * sw)).astype(dt)

    # ----- block formulations -------------------------------------------- #
    def bn_relu(y, s, b):
        return jnp.maximum(y.astype(dt) * s.astype(dt) + b.astype(dt), 0)

    def bn(y, s, b):
        return y.astype(dt) * s.astype(dt) + b.astype(dt)

    def block_float(x, p):
        n, h, w, _ = x.shape
        v = x.reshape(-1, x.shape[-1])
        y = jnp.dot(v, p["w1"].reshape(-1, 512).astype(dt)).reshape(n, h, w, 512)
        y = bn_relu(y, p["s1"], p["b1"])
        y = conv_f(y, p["w2"], "SAME")
        y = bn_relu(y, p["s2"], p["b2"])
        y = jnp.dot(y.reshape(-1, 512), p["w3"].reshape(512, 2048).astype(dt))
        y = bn(y.reshape(n, h, w, 2048), p["s3"], p["b3"])
        if "wsc" in p:
            sc = jnp.dot(v, p["wsc"].reshape(-1, 2048).astype(dt)).reshape(n, h, w, 2048)
            sc = bn(sc, p["ssc"], p["bsc"])
        else:
            sc = x
        return jnp.maximum(y + sc, 0)

    def block_int8_conv(x, p):  # round-3 shipped form
        y = bn_relu(int8_conv(x, p["w1"]), p["s1"], p["b1"])
        y = bn_relu(int8_conv(y, p["w2"], "SAME"), p["s2"], p["b2"])
        y = bn(int8_conv(y, p["w3"]), p["s3"], p["b3"])
        if "wsc" in p:
            sc = bn(int8_conv(x, p["wsc"]), p["ssc"], p["bsc"])
        else:
            sc = x
        return jnp.maximum(y + sc, 0)

    def block_int8_dense_pixel(x, p):  # round-4 shipped form
        n, h, w, c = x.shape
        y = int8_dense_rowscale(x.reshape(-1, c), p["w1"].reshape(c, 512))
        y = bn_relu(y.reshape(n, h, w, 512), p["s1"], p["b1"])
        y = bn_relu(int8_conv(y, p["w2"], "SAME"), p["s2"], p["b2"])
        y = int8_dense_rowscale(y.reshape(-1, 512), p["w3"].reshape(512, 2048))
        y = bn(y.reshape(n, h, w, 2048), p["s3"], p["b3"])
        if "wsc" in p:
            sc = int8_dense_rowscale(x.reshape(-1, c), p["wsc"].reshape(c, 2048))
            sc = bn(sc.reshape(n, h, w, 2048), p["ssc"], p["bsc"])
        else:
            sc = x
        return jnp.maximum(y + sc, 0)

    def block_int8_dense_roi(x, p):  # per-RoI scales on the dense form
        c = x.shape[-1]
        y = bn_relu(int8_dense_roiscale(x, p["w1"].reshape(c, 512)), p["s1"], p["b1"])
        y = bn_relu(int8_conv(y, p["w2"], "SAME"), p["s2"], p["b2"])
        y = bn(int8_dense_roiscale(y, p["w3"].reshape(512, 2048)), p["s3"], p["b3"])
        if "wsc" in p:
            sc = bn(int8_dense_roiscale(x, p["wsc"].reshape(c, 2048)), p["ssc"], p["bsc"])
        else:
            sc = x
        return jnp.maximum(y + sc, 0)

    def block_int8_dense_bf16(x, p):  # pixel scales, bf16 epilogue
        n, h, w, c = x.shape
        y = int8_dense_bf16out(x.reshape(-1, c), p["w1"].reshape(c, 512))
        y = bn_relu(y.reshape(n, h, w, 512), p["s1"], p["b1"])
        y = bn_relu(int8_conv(y, p["w2"], "SAME"), p["s2"], p["b2"])
        y = int8_dense_bf16out(y.reshape(-1, 512), p["w3"].reshape(512, 2048))
        y = bn(y.reshape(n, h, w, 2048), p["s3"], p["b3"])
        if "wsc" in p:
            sc = int8_dense_bf16out(x.reshape(-1, c), p["wsc"].reshape(c, 2048))
            sc = bn(sc.reshape(n, h, w, 2048), p["ssc"], p["bsc"])
        else:
            sc = x
        return jnp.maximum(y + sc, 0)

    probes = {}

    def add(name, blk):
        @jax.jit
        def fn(carry, x0, blocks):
            x = x0 + (carry * 1e-12).astype(dt)
            for p in blocks:
                x = blk(x, p)
            return carry + x.astype(jnp.float32).mean() * 1e-12
        probes[name] = fn

    add("float bf16 (1x1 dot)", block_float)
    add("int8 conv form (r3)", block_int8_conv)
    add("int8 dense pixel-scale (r4)", block_int8_dense_pixel)
    add("int8 dense roi-scale", block_int8_dense_roi)
    add("int8 dense pixel bf16-out", block_int8_dense_bf16)

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)  # value-fetch barrier (CLAUDE.md pitfall #3)
        return (time.perf_counter() - t0) / iters

    print(f"N={N} RoIs @7x7x1024, s5 chain x3 blocks, iters={args.iters}")
    # warm-up loop: the FIRST timed loop of a process reads ~2x (tunnel
    # warm-up, scripts/measure_alternating.py note) - burn one.
    timed(probes["float bf16 (1x1 dot)"], (x0, blocks), 5)
    for name, fn in probes.items():
        dt_s = timed(fn, (x0, blocks), args.iters)
        print(f"{name:<32}{dt_s*1e3:>8.2f} ms  ({dt_s*1e3/args.tiles:.3f} ms/tile)")
    return 0


if __name__ == "__main__":
    sys.exit(main())
