#!/usr/bin/env python
"""Stem probes round 3: dense-matmul s2d construction from GREY panels.

probe_stem.py/probe_stem2.py established: the s2d BUILD (1.53 ms of the
~2.5 ms stem+pool) is pure layout cost - every op touching the
channel-minor (B,H,W,3/12) tensors runs at 3-12/128 lane occupancy - and
planar NCHW formulations are worse (5-8 ms).  This round exploits the
serving reality that panels are GREY (single channel shipped; bench.py's
panel and the archive's topographic visualizations): the tile is a DENSE
2-D map, and strided s2d extraction can be phrased as small selection
MATMULS on the MXU instead of lane-sparse slices:

  quad:  Sr^T @ Gpad @ Sc   -> the 4 parity quadrants of one dense map
  w2:    (Sr_p^T @ Gpad) @ W2 -> (307, 1842) whose row-major view IS the
         (j, q, c)-minor s2d slab for row-parity p (W2[w, 6j+3q+c] =
         [w == 2j+q]); subtract the mean*content-mask arg, concat p=0,1.

Both must be bit-exact vs the reference s2d+conv (asserted).

Usage: python scripts/probe_stem3.py [--batch 8] [--iters 30]
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
    s = 608          # canvas
    sp = s + 6       # padded: 614
    half = sp // 2   # 307
    out_hw = 304     # conv output (614-4+1)//... = 611-> with 4x4 VALID: 611? no:
    # s2d (307,307,12) -> 4x4 VALID conv -> (304, 304, 64)
    dt = jnp.bfloat16
    rng = np.random.default_rng(0)
    MEAN = np.array([103.939, 116.779, 123.68], np.float32)

    # grey content canvas: 600x600 content in a 608 canvas (uint8-ish vals)
    grey = np.zeros((b, s, s), np.float32)
    grey[:, :600, :600] = rng.integers(0, 255, (b, 600, 600)).astype(np.float32)
    grey_j = jnp.asarray(grey)
    kernel = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))

    def kern_s2d(k):
        kp = jnp.pad(k, ((0, 1), (0, 1), (0, 0), (0, 0)))
        return (
            kp.reshape(4, 2, 4, 2, 3, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 12, 64)
        )

    # ---- selection operators (host-built, passed as jit args) -------- #
    # Sr[w, p*half + i] = [w == 2i + p]; Sc likewise for columns.
    Sr = np.zeros((sp, sp), np.float32)
    for p in (0, 1):
        for i in range(half):
            Sr[2 * i + p, p * half + i] = 1.0
    Sc = Sr  # same geometry
    # W2[w, 6j + 3q + c] = [w == 2j + q]
    W2 = np.zeros((sp, 6 * half), np.float32)
    for j in range(half):
        for q in (0, 1):
            for c in range(3):
                W2[2 * j + q, 6 * j + 3 * q + c] = 1.0
    # content mask in padded coords (1 where the canvas sits, 0 on the
    # zero ring): the mean subtraction must not touch the ring.
    cmask = np.zeros((sp, sp), np.float32)
    cmask[3 : 3 + s, 3 : 3 + s] = 1.0
    # mean-mask slabs for the w2 variant: M_p[i, 6j+3q+c] =
    # cmask[2i+p, 2j+q] * MEAN[c]
    Mslab = np.zeros((2, half, 6 * half), np.float32)
    for p in (0, 1):
        for q in (0, 1):
            sub = cmask[p::2, q::2]  # (half, half)
            for c in range(3):
                Mslab[p, :, 3 * q + c :: 6] = sub * MEAN[c]
    Sr_j, Sc_j, W2_j, Mslab_j = map(jnp.asarray, (Sr, Sc, W2, Mslab))
    cmask_j = jnp.asarray(cmask)

    def conv(x2, k):
        return jax.lax.conv_general_dilated(
            x2.astype(dt), kern_s2d(k).astype(dt), (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )

    def pool(y):
        y = jnp.maximum(y, 0)
        return jax.lax.reduce_window(
            y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
        )

    # ---- baseline: today's prescaled path (broadcast + NHWC s2d) ----- #
    def stem_baseline(g, k):
        img = jnp.broadcast_to(g[..., None], g.shape + (3,))
        img = img - jnp.asarray(MEAN, jnp.float32)
        # zero the dead 8-px band like the canvas build does (content only
        # in [:600]; the canvas carries real zeros there, centered to -mean
        # in today's path - replicate exactly: mean-center the WHOLE canvas)
        x = img.astype(dt)
        xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
        bb, h, w, c = xpad.shape
        xw = xpad.reshape(bb, h, w // 2, 2 * c)
        x2 = jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)
        return pool(conv(x2, k))

    # ---- quad variant ------------------------------------------------ #
    def stem_quad(g, k, Sr, Sc, cmask):
        gp = jnp.pad(g, ((0, 0), (3, 3), (3, 3)))
        # quadrants of (2*half, 2*half): [p*half+i, q*half+j] = gp[2i+p, 2j+q]
        quads = jnp.einsum("wk,bwv,vl->bkl", Sr, gp, Sc,
                           preferred_element_type=jnp.float32)
        mquads = jnp.einsum("wk,wv,vl->kl", Sr, cmask, Sc,
                            preferred_element_type=jnp.float32)
        parts = []
        for p in (0, 1):
            for q in (0, 1):
                pq = quads[:, p * half:(p + 1) * half, q * half:(q + 1) * half]
                mq = mquads[p * half:(p + 1) * half, q * half:(q + 1) * half]
                for c in range(3):
                    parts.append(pq - MEAN[c] * mq)
        x2 = jnp.stack(parts, axis=-1)  # (B, half, half, 12) in (p,q,c) order
        return pool(conv(x2, k))

    # ---- w2 variant -------------------------------------------------- #
    def stem_w2(g, k, Sr, W2, Mslab):
        gp = jnp.pad(g, ((0, 0), (3, 3), (3, 3)))
        slabs = []
        for p in (0, 1):
            rows = jnp.einsum("wk,bwv->bkv", Sr[:, p * half:(p + 1) * half], gp,
                              preferred_element_type=jnp.float32)
            slab = jnp.einsum("bkv,vl->bkl", rows, W2,
                              preferred_element_type=jnp.float32) - Mslab[p]
            slabs.append(slab.reshape(b, half, half, 6))
        x2 = jnp.concatenate(slabs, axis=-1)
        # channel order is (q, c) within each p-slab, slabs stacked p-major:
        # (p*6 + 3q + c) == the reference (p,q,c) order.
        return pool(conv(x2, k))

    # parity check (f32 conv would be exact; bf16 conv is shared, so
    # compare the three bf16 pipelines against each other)
    yb = jax.jit(stem_baseline)(grey_j, kernel)
    yq = jax.jit(stem_quad)(grey_j, kernel, Sr_j, Sc_j, cmask_j)
    yw = jax.jit(stem_w2)(grey_j, kernel, Sr_j, W2_j, Mslab_j)
    eq = np.max(np.abs(np.asarray(yq, np.float32) - np.asarray(yb, np.float32)))
    ew = np.max(np.abs(np.asarray(yw, np.float32) - np.asarray(yb, np.float32)))
    print(f"max |quad - baseline| = {eq:.6f}   max |w2 - baseline| = {ew:.6f}")

    probes = {}

    def add(name, fn, extra):
        @jax.jit
        def f(carry, g, *rest):
            y = fn(g + (carry * 1e-12), *rest)
            return carry + y.astype(jnp.float32).mean() * 1e-12
        probes[name] = (f, extra)

    add("baseline bcast+s2d+conv+pool", stem_baseline, (kernel,))
    add("quad matmul s2d", stem_quad, (kernel, Sr_j, Sc_j, cmask_j))
    add("w2 matmul s2d", stem_w2, (kernel, Sr_j, W2_j, Mslab_j))

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, grey_j, *extra)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, grey_j, *extra)
        float(carry)
        return (time.perf_counter() - t0) / iters

    # burn one loop (first timed loop of a process reads ~2x)
    timed(*probes["baseline bcast+s2d+conv+pool"], 5)
    print(f"batch={b} grey @608^2 (stem incl. canvas centering + pool), iters={args.iters}")
    for name, (fn, extra) in probes.items():
        dt_s = timed(fn, extra, args.iters)
        print(f"{name:<34}{dt_s*1e3:>8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
