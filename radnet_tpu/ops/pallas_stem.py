"""Fused ResNet50 stem for GREY panels: one Pallas kernel does
7x7/2-conv + bias/mean-correction + FrozenBN + ReLU + 3x3/2-maxpool
straight from a dense 2-D grey canvas.

Why: the stem is the trunk's worst stage (2.5 ms of a 7.3 ms 8-tile
batch at 3.7% MFU - BASELINE.md round-4 ablation).  The cost is pure
layout: a (B, H, W, 3) image puts C=3 on the 128-lane minor dim, so
every op touching it - the pad, the space-to-depth build (1.53 ms
alone), the conv - runs at 3-12/128 lane occupancy.  Planar (NCHW) and
matmul-s2d reformulations measure WORSE (scripts/probe_stem2.py /
probe_stem3.py).  The fix is to never materialize a channel-minor
tensor at all: rock-art panels are greyscale stored as 3 identical
channels (the serving path already ships ONE channel - inference.py),
so the stem collapses to a single-channel conv

    out[i, j, o] = sum_{dy,dx} g[2i+dy, 2j+dx] * K7[dy, dx, o] + b0[i, j, o]

with K7 = sum_c W[:, :, c, :] and b0 folding the conv bias and the
per-channel mean centering (the content mask makes b0 a map, not a
vector: the reference zero-pads AFTER centering, so the 3-px ring stays
true zero - resnet50.py:182's ZeroPadding2D((3,3))).  The grey map is
DENSE (W on lanes), and the kernel:

  * streams 39-row slabs of the padded canvas HBM->VMEM (manual DMA -
    consecutive blocks overlap by 7 rows, which BlockSpec can't express),
  * deinterleaves even/odd columns once per slab (stride-2 lane slices),
  * im2cols 49 shifted row-slices into a (B, 49, ncr, 304) patch tensor
    and contracts it with K7 on the MXU,
  * applies the fused BN scale + (bias0*scale + shift) map, ReLU, and
    max-pools on the fly into the (B, 8, 151, 64) output block.

Numerics note: the XLA path rounds the CENTERED image to bf16 before
the conv (non-integer values); this kernel convolves the exact integer
grey values (uint8 fits bf16 exactly) and applies the centering as an
f32 correction after the f32-accumulated matmul - same math, one fewer
rounding.  Detection sets match the reference path (pinned by
tests/test_pallas_stem.py at f32 tolerance).

Geometry (canvas 608, stride-16 parity): SP = 614 padded, conv 304,
pool 151 - general over canvas_size via the constructor.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _stem_kernel(g_ref, k7_ref, b0_ref, scale_ref, out_ref, slab, b0s, sems,
                 *, B, CH, CW, PH, PW, TP, CHUNK):
    """One grid step = CHUNK conv rows of one TP-pool-row block, whole
    batch.  The chunk axis lives in the GRID (not an unrolled python
    loop): a fully unrolled 17-conv-row body compiled to a program large
    enough to OOM-kill the remote Mosaic compiler.

    g_ref:     (B, GP, SPW) bf16 ANY - padded grey canvases (SPW = S+6
               rounded up to 128 lanes; DMA minor dims must be aligned)
    k7_ref:    (49, 64) f32 VMEM - channel-summed stem kernel (dy*7+dx, o)
    b0_ref:    (CH+3, CW, 128) f32 ANY - bias0*scale + shift map
               (row-padded; channels padded 64->128 for DMA alignment)
    scale_ref: (1, 64) f32 VMEM - fused FrozenBN scale
    out_ref:   (B, TP, PW, 64) bf16 - pool-row block (revisited across
               the chunk grid dim; zero-initialized at chunk 0)
    slab:      (B, 16, SPW) bf16 VMEM scratch
    b0s:       (CHUNK, CW, 128) f32 VMEM scratch
    """
    i = pl.program_id(0)
    t = pl.program_id(1)
    ncr_total = 2 * TP + 1             # conv rows per block (17)
    # conv rows this step: c = CHUNK*t + cr; slab covers G rows
    # [4*TP*i + 2*CHUNK*t, +16) = rows 2*cr+dy for cr<CHUNK, dy<7.
    cp_g = pltpu.make_async_copy(
        g_ref.at[:, pl.ds(4 * TP * i + 2 * CHUNK * t, 16), :], slab, sems.at[0]
    )
    cp_b = pltpu.make_async_copy(
        b0_ref.at[pl.ds(2 * TP * i + CHUNK * t, CHUNK), :, :], b0s, sems.at[1]
    )
    cp_g.start()
    cp_b.start()
    cp_g.wait()
    cp_b.wait()

    x = slab[:]                        # (B, 16, SPW) bf16
    SPW = x.shape[-1]
    HALF = SPW // 2
    # Column deinterleave on the MXU: Mosaic supports neither strided
    # slicing (vector.extract_strided_slice strides must be 1) nor >2D
    # gather, but a 0/1 selection matmul is exact (one nonzero product
    # per output, f32 accumulated) and tiny next to the conv.
    v_idx = jax.lax.broadcasted_iota(jnp.int32, (SPW, HALF), 0)
    u_idx = jax.lax.broadcasted_iota(jnp.int32, (SPW, HALF), 1)
    se = (v_idx == 2 * u_idx).astype(x.dtype)
    so = (v_idx == 2 * u_idx + 1).astype(x.dtype)
    dn = (((2,), (0,)), ((), ()))
    xe = jax.lax.dot_general(
        x, se, dn, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    xo = jax.lax.dot_general(
        x, so, dn, preferred_element_type=jnp.float32
    ).astype(x.dtype)
    scale = scale_ref[0, :]            # (64,)

    @pl.when(t == 0)
    def _init():
        out_ref[:] = jnp.zeros_like(out_ref)  # relu >= 0: 0 is safe

    def even_rows(src, r0, n, m):
        """src[:, r0 : r0+2n : 2, m : m+CW] without strided slicing: a
        contiguous 2n-row window, the free (2n)->(n, 2) sublane split,
        and a static index."""
        win = jax.lax.slice(src, (0, r0, m), (src.shape[0], r0 + 2 * n, m + CW))
        return win.reshape(win.shape[0], n, 2, CW)[:, :, 0, :]

    parts = []
    for k in range(49):
        dy, dx = k // 7, k % 7
        src = xe if dx % 2 == 0 else xo
        # conv row cr (chunk-rel) uses slab row 2*cr + dy
        parts.append(even_rows(src, dy, CHUNK, dx // 2))
    p = jnp.stack(parts, axis=1)       # (B, 49, CHUNK, CW) bf16
    y = jax.lax.dot_general(
        p, k7_ref[:].astype(p.dtype),  # bf16 weights like the XLA path
        dimension_numbers=(((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32,
    )                                  # (B, CHUNK, CW, 64) f32
    z = y * scale + b0s[:, :, 0:64]
    z = jnp.maximum(z, 0.0).astype(out_ref.dtype)

    # column pool: max over 3 taps at stride 2 -> (B, CHUNK, PW, 64)
    def tap(tt):
        w = jax.lax.slice(z, (0, 0, tt, 0), (B, CHUNK, tt + 2 * PW, 64))
        return w.reshape(B, CHUNK, PW, 2, 64)[:, :, :, 0, :]
    zc = jnp.maximum(jnp.maximum(tap(0), tap(1)), tap(2))

    # row scatter-max: conv row c feeds pool rows (c-1)//2 and c//2
    # (clamped); both indices are grid-dependent, so the writes use
    # pl.ds with masking.
    for cr in range(CHUNK):
        c = CHUNK * t + cr
        row = zc[:, cr : cr + 1, :, :]
        for po in range(2):
            prow = (c - 1) // 2 + po
            ok = (prow >= 0) & (prow <= c // 2) & (prow < TP) & (c < ncr_total)

            @pl.when(ok)
            def _scatter(prow=prow, row=row):
                cur = out_ref[:, pl.ds(prow, 1), :, :]
                out_ref[:, pl.ds(prow, 1), :, :] = jnp.maximum(cur, row)


class GreyStem:
    """Callable wrapper holding the static geometry for one canvas size.

    ``__call__(g_padded, k7, bias0p, scale)`` with
      g_padded: (B, SP+2, SP) bf16 - canvas zero-padded by 3 (reference
                ZeroPadding2D) plus 2 extra zero rows so every block's
                39-row slab stays in range,
      k7:       (49, 64) f32,
      bias0p:   (CH+4, CW, 128) f32 - (bias0 * scale + shift), row-padded,
      scale:    (1, 64) f32,
    returns the pooled stem output (B, PH, PW, 64) bf16.
    """

    def __init__(self, canvas_size: int, batch: int, dtype=jnp.bfloat16,
                 interpret: bool = False):
        self.interpret = interpret
        self.S = canvas_size
        self.SP = canvas_size + 6          # padded extent (614)
        assert self.SP % 2 == 0, "s2d parity needs an even padded extent"
        self.SPW = -(-self.SP // 128) * 128  # lane-aligned width (640)
        self.CH = self.CW = (self.SP - 7) // 2 + 1   # conv out (304)
        self.PH = self.PW = (self.CH - 3) // 2 + 1   # pool out (151)
        self.B = batch
        self.TP = 8                        # pool rows per block
        self.CHUNK = 4                     # conv rows per grid step
        self.NCR = 2 * self.TP + 1         # conv rows per block (17)
        self.NT = -(-self.NCR // self.CHUNK)  # chunk grid dim (5)
        # last slab start: 4*TP*(NB-1) + 2*CHUNK*(NT-1), +16 rows
        self.GP = self.S + 16              # zero-row headroom for all slabs
        self.dtype = dtype
        self.NB = -(-self.PH // self.TP)   # block grid dim

    @functools.cached_property
    def _call(self):
        kern = functools.partial(
            _stem_kernel,
            B=self.B, CH=self.CH, CW=self.CW, PH=self.PH, PW=self.PW,
            TP=self.TP, CHUNK=self.CHUNK,
        )
        return pl.pallas_call(
            kern,
            grid=(self.NB, self.NT),
            in_specs=[
                pl.BlockSpec(memory_space=pl.ANY),            # g
                pl.BlockSpec(memory_space=pltpu.VMEM),           # k7
                pl.BlockSpec(memory_space=pl.ANY),            # bias0p
                pl.BlockSpec(memory_space=pltpu.VMEM),           # scale
            ],
            out_specs=pl.BlockSpec(
                (self.B, self.TP, self.PW, 64),
                lambda i, t: (0, i, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            out_shape=jax.ShapeDtypeStruct(
                (self.B, self.PH, self.PW, 64), self.dtype
            ),
            scratch_shapes=[
                pltpu.VMEM((self.B, 16, self.SPW), self.dtype),
                pltpu.VMEM((self.CHUNK, self.CW, 128), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024,
            ),
            interpret=self.interpret,
        )

    def __call__(self, g_padded, k7, bias0p, scale):
        return self._call(g_padded, k7, bias0p, scale)


def pad_grey_canvas(grey: jnp.ndarray, canvas_size: int) -> jnp.ndarray:
    """(B, S, S) grey canvas -> (B, S+16, SPW) bf16: the reference 3-px
    zero ring, 2 trailing zero rows (kernel slab headroom), and the
    width rounded up to 128 lanes (DMA tile alignment)."""
    g = grey.astype(jnp.bfloat16)
    sp = canvas_size + 6
    spw = -(-sp // 128) * 128
    return jnp.pad(g, ((0, 0), (3, 13), (3, spw - canvas_size - 3)))


def stem_constants(kernel, bias, bn_stats, canvas_size: int,
                   mean_bgr) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Fold params + geometry into the kernel's (k7, bias0p, scale) args.

    kernel: (7, 7, 3, 64) stem conv weight; bias: (64,) conv bias;
    bn_stats: bn_conv1's batch_stats dict (gamma/beta/mean/var,
    models/layers.py::FrozenBatchNorm, eps 1e-3);
    mean_bgr: per-channel means subtracted by preprocessing.

    bias0p[i, j, o] = (bias[o] - sum_c mean_c * (M (*) W_c)[i, j, o])
                      * scale[o] + shift[o]
    with M the canvas indicator in padded coords (the reference centers
    the WHOLE canvas - including the dead band right of the valid
    window - and only the ZeroPadding2D ring stays true zero), i.e.
    conv(centered canvas) == conv(raw grey) + bias0 exactly.
    scale/shift are the FrozenBatchNorm affine form.
    """
    import numpy as onp

    gamma = onp.asarray(bn_stats["gamma"], onp.float64)
    beta = onp.asarray(bn_stats["beta"], onp.float64)
    mean = onp.asarray(bn_stats["mean"], onp.float64)
    var = onp.asarray(bn_stats["var"], onp.float64)
    scale = gamma / onp.sqrt(var + 1e-3)  # FrozenBatchNorm.epsilon
    shift = beta - mean * scale

    k = onp.asarray(kernel, onp.float32)          # (7,7,3,64)
    k7 = k.sum(axis=2).reshape(49, 64)

    sp = canvas_size + 6
    ch = (sp - 7) // 2 + 1
    # canvas mask in padded coords (only the 3-px conv ring excluded)
    M = onp.zeros((sp, sp), onp.float32)
    M[3 : 3 + canvas_size, 3 : 3 + canvas_size] = 1.0
    km = onp.einsum("yxco,c->yxo", k, onp.asarray(mean_bgr, onp.float32))
    b0 = onp.zeros((ch, ch, 64), onp.float32)
    # sliding-window correlation of M with km (loop is 49 adds on a
    # 304^2 map - host-side, run once per RADNet)
    for dy in range(7):
        for dx in range(7):
            b0 -= M[dy : dy + 2 * ch : 2, dx : dx + 2 * ch : 2, None] * km[dy, dx]
    b0 += onp.asarray(bias, onp.float32)
    b0p = b0 * scale.astype(onp.float32) + shift.astype(onp.float32)
    b0p = onp.concatenate([b0p, onp.zeros((4, ch, 64), onp.float32)], axis=0)
    # channel pad 64 -> 128: the kernel DMAs row slabs of this map and
    # the minor dim must be lane-tile aligned.
    b0p = onp.concatenate([b0p, onp.zeros_like(b0p)], axis=-1)
    return (
        jnp.asarray(k7),
        jnp.asarray(b0p),
        jnp.asarray(scale.reshape(1, 64), jnp.float32),
    )
