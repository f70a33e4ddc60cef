"""Pallas TPU kernel for batched RoI crop-and-resize pooling.

Same math as :func:`radnet_tpu.ops.roi_align.roi_pool_matmul` (bilinear
interpolation expressed as two dense contractions, ``out = Ry @ F @ Rx^T``)
but fused into a single Pallas kernel:

* grid = (tile, roi-block, channel-block); each program holds its feature
  channel slab ``(H, W, C_BLOCK)`` in VMEM and pools a block of RoIs
  against it, so the feature map is read from HBM exactly once per
  (roi-block x channel-block) instead of materializing the ``(R, P, W, C)``
  intermediate in HBM;
* the first contraction is one large ``(R_BLOCK*P, H) @ (H, W*C_BLOCK)``
  MXU matmul (stacking RoIs recovers MXU row occupancy that a per-RoI
  ``14 x H`` matmul would waste);
* interpolation matrices are built in-kernel from ``broadcasted_iota``
  (``relu(1 - |center - index|)`` is exactly the bilinear weight profile).

The XLA einsum path remains the default - measured on a v5e, XLA fuses the
einsum formulation into the surrounding program at ~0.1 ms for 8x300 RoIs,
while this standalone kernel costs ~21 ms (240 small grid programs with no
cross-op fusion).  The kernel is kept as the explicit-Pallas implementation
(selected with ``batched_roi_pool(..., method='pallas')``), validated
against the reference implementations in interpret mode on CPU and
compiled/verified on TPU hardware.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(
    fmap_ref, rois_ref, out_ref, *, pool_size: int, h: int, w: int, roi_block: int
):
    # Compute in f32: the bf16 path trips Mosaic's reshape/tiling rules at
    # odd sublane extents (e.g. H=38), and the whole op is sub-0.1ms anyway.
    f = fmap_ref[0].astype(jnp.float32)  # (H, W, CB)
    br = roi_block
    # The RoI table rides along whole (TPU block shapes must tile the last
    # two dims); each program slices out its block dynamically.
    ri = pl.program_id(1)
    rois = rois_ref[0, pl.ds(ri * br, br), :].astype(jnp.float32)  # (BR, 4)
    p = pool_size
    cb = f.shape[-1]

    x0, y0 = rois[:, 0], rois[:, 1]
    rw = jnp.maximum(rois[:, 2], 1.0)
    rh = jnp.maximum(rois[:, 3], 1.0)

    # TPU iota is integer-only; build float grids by casting.
    grid = (
        jax.lax.broadcasted_iota(jnp.int32, (br, p), 1).astype(jnp.float32) + 0.5
    ) / p

    def centers(origin, size, extent):
        c = origin[:, None] + jnp.maximum(grid * size[:, None] - 0.5, 0.0)
        c = jnp.minimum(c, (origin + size - 1.0)[:, None])
        return jnp.clip(c, 0.0, extent - 1.0)

    sy = centers(y0, rh, h)  # (BR, P)
    sx = centers(x0, rw, w)  # (BR, P)

    iy = jax.lax.broadcasted_iota(jnp.int32, (br, p, h), 2).astype(jnp.float32)
    ix = jax.lax.broadcasted_iota(jnp.int32, (br, p, w), 2).astype(jnp.float32)
    ry = jnp.maximum(0.0, 1.0 - jnp.abs(sy[..., None] - iy))  # (BR, P, H)
    rx = jnp.maximum(0.0, 1.0 - jnp.abs(sx[..., None] - ix))  # (BR, P, W)

    dtype = f.dtype
    # (BR*P, H) @ (H, W*CB) -> (BR*P, W*CB): one big MXU matmul.
    tmp = jnp.dot(
        ry.reshape(br * p, h).astype(dtype),
        f.reshape(h, w * cb),
        preferred_element_type=jnp.float32,
    ).astype(dtype)
    tmp = tmp.reshape(br, p, w, cb)

    # Batched contraction over W: (BR, Q, W) x (BR, P, W, CB) -> (BR, Q, P, CB)
    out = jax.lax.dot_general(
        rx.astype(dtype),
        tmp,
        dimension_numbers=(((2,), (2,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    )
    out_ref[0] = out.transpose(0, 2, 1, 3).astype(out_ref.dtype)  # (BR, P, Q, CB)


@functools.partial(
    jax.jit,
    static_argnames=("pool_size", "roi_block", "channel_block", "interpret"),
)
def roi_pool_pallas(
    fmaps: jnp.ndarray,
    rois_xywh: jnp.ndarray,
    *,
    pool_size: int,
    roi_block: int = 10,
    channel_block: int = 128,
    interpret: bool = False,
) -> jnp.ndarray:
    """Batched RoI pooling: ``(B, H, W, C)`` + ``(B, R, 4)`` ->
    ``(B, R, P, P, C)``.  R must be padded to a multiple of ``roi_block``
    and C to a multiple of ``channel_block`` (both are config-controlled
    static shapes in this framework)."""
    b, h, w, c = fmaps.shape
    out_dtype = fmaps.dtype
    if fmaps.dtype == jnp.bfloat16:
        # Mosaic rejects bf16 VMEM blocks whose sublane extent is not a
        # multiple of 16 (feature maps here are 38); feed the kernel f32.
        fmaps = fmaps.astype(jnp.float32)
    r = rois_xywh.shape[1]
    cb = min(channel_block, c)
    br = min(roi_block, r)
    if r % br or c % cb:
        raise ValueError(f"R={r} % {br} or C={c} % {cb} != 0")
    p = pool_size

    grid = (b, r // br, c // cb)
    result = pl.pallas_call(
        functools.partial(_kernel, pool_size=p, h=h, w=w, roi_block=br),
        grid=grid,
        in_specs=[
            pl.BlockSpec(
                (1, h, w, cb), lambda bi, ri, ci: (bi, 0, 0, ci),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (1, r, 4), lambda bi, ri, ci: (bi, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ],
        out_specs=pl.BlockSpec(
            (1, br, p, p, cb), lambda bi, ri, ci: (bi, ri, 0, 0, ci),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((b, r, p, p, c), jnp.float32),
        interpret=interpret,
    )(fmaps, rois_xywh)
    return result.astype(out_dtype)
