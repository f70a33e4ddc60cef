"""Vectorized RoI crop-and-resize pooling.

Replaces the reference's ``RoiPoolingConv`` layer
(/root/reference/faster_rcnn/RoiPoolingConv.py:48-88), which crops each RoI
in a *python loop over rois* with dynamic shapes and resizes via
``tf.image.resize_images``.  Here every RoI of every tile is pooled by one
batched bilinear gather - 4 fixed-shape gathers over the flattened feature
map - which XLA fuses and tiles cleanly; there are no dynamic shapes and no
per-RoI dispatch.

Sampling convention: half-pixel-center bilinear (the modern
``tf.image.resize`` convention) over the integer crop ``[x, x+w) x [y, y+h)``.
The reference used TF1's legacy ``align_corners=False`` resize; since this
framework trains its own weights the (slightly better) half-pixel variant is
used - behaviour is pinned by unit tests, not by bit-parity with TF1.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


def roi_pool(
    fmap: jnp.ndarray,
    rois_xywh: jnp.ndarray,
    *,
    pool_size: int,
) -> jnp.ndarray:
    """Pool RoIs from a single feature map.

    Args:
      fmap: ``(H, W, C)`` feature map.
      rois_xywh: ``(R, 4)`` RoIs as (x, y, w, h) in feature-map units
        (integer-valued floats, as produced by the proposal NMS).
      pool_size: output side length (7 for VGG16 - vgg16.py:85, 14 for
        ResNet50 - resnet50.py:249).

    Returns:
      ``(R, pool_size, pool_size, C)``.
    """
    h_map, w_map, _ = fmap.shape
    rois = rois_xywh.astype(jnp.float32)
    x, y, w, h = rois[:, 0], rois[:, 1], rois[:, 2], rois[:, 3]
    w = jnp.maximum(w, 1.0)
    h = jnp.maximum(h, 1.0)

    # Half-pixel sample centers inside the crop, clamped to the crop.
    grid = (jnp.arange(pool_size, dtype=jnp.float32) + 0.5) / pool_size
    sy = y[:, None] + jnp.clip(grid[None, :] * h[:, None] - 0.5, 0.0, None)
    sy = jnp.minimum(sy, (y + h - 1.0)[:, None])
    sx = x[:, None] + jnp.clip(grid[None, :] * w[:, None] - 0.5, 0.0, None)
    sx = jnp.minimum(sx, (x + w - 1.0)[:, None])

    sy = jnp.clip(sy, 0.0, h_map - 1.0)  # (R, P)
    sx = jnp.clip(sx, 0.0, w_map - 1.0)  # (R, P)

    y0 = jnp.floor(sy)
    x0 = jnp.floor(sx)
    wy1 = sy - y0  # weight of the +1 row
    wx1 = sx - x0
    y0i = y0.astype(jnp.int32)
    x0i = x0.astype(jnp.int32)
    y1i = jnp.minimum(y0i + 1, h_map - 1)
    x1i = jnp.minimum(x0i + 1, w_map - 1)

    flat = fmap.reshape(h_map * w_map, -1)

    def gather(yi, xi):
        # yi: (R, P) row indices, xi: (R, P) col indices -> (R, P, P, C)
        idx = yi[:, :, None] * w_map + xi[:, None, :]
        return jnp.take(flat, idx, axis=0)

    v00 = gather(y0i, x0i)
    v01 = gather(y0i, x1i)
    v10 = gather(y1i, x0i)
    v11 = gather(y1i, x1i)

    wy1b = wy1[:, :, None, None]
    wx1b = wx1[:, None, :, None]
    top = v00 * (1.0 - wx1b) + v01 * wx1b
    bot = v10 * (1.0 - wx1b) + v11 * wx1b
    return (top * (1.0 - wy1b) + bot * wy1b).astype(fmap.dtype)


def _sample_centers(rois: jnp.ndarray, pool_size: int, extent: int, center_stride: int = 1):
    """Clamped half-pixel sample centers along one axis: ``(R, P)``.

    ``rois`` here is ``(R, 2)`` = (origin, size) for the axis.

    ``center_stride=k`` produces the centers of positions ``0, k, 2k, ...``
    of a virtual ``pool_size * k`` grid.  Pooling ``P`` outputs at stride 2
    is bit-identical to pooling ``2P`` and then taking every other position
    - which is exactly what a stride-2 1x1 conv consuming the pool would
    do, so the strided pool lets that conv run at stride 1 on a 4x smaller
    tensor (see models/resnet.py::ResNet50RoIHead).
    """
    o, s = rois[:, 0], jnp.maximum(rois[:, 1], 1.0)
    virtual = pool_size * center_stride
    grid = (
        jnp.arange(pool_size, dtype=jnp.float32) * center_stride + 0.5
    ) / virtual
    c = o[:, None] + jnp.clip(grid[None, :] * s[:, None] - 0.5, 0.0, None)
    c = jnp.minimum(c, (o + s - 1.0)[:, None])
    return jnp.clip(c, 0.0, extent - 1.0)


def _interp_matrix(centers: jnp.ndarray, extent: int) -> jnp.ndarray:
    """Bilinear interpolation weights as a dense matrix ``(R, P, extent)``.

    ``relu(1 - |center - h|)`` is exactly the 2-point bilinear weight
    profile (1 at the integer itself), so sampling becomes a matmul - the
    MXU-native formulation of a gather.
    """
    h = jnp.arange(extent, dtype=jnp.float32)
    return jnp.maximum(0.0, 1.0 - jnp.abs(centers[..., None] - h[None, None, :]))


def roi_pool_matmul(
    fmap: jnp.ndarray,
    rois_xywh: jnp.ndarray,
    *,
    pool_size: int,
    center_stride: int = 1,
) -> jnp.ndarray:
    """RoI pooling as two dense contractions instead of gathers.

    Numerically identical to :func:`roi_pool` (same clamped half-pixel
    centers), but expressed as ``out = Ry @ F @ Rx^T`` with per-RoI
    interpolation matrices, so the whole pooling stage runs on the MXU.
    On TPU, gathers of (R, P, P, C) from a feature map serialize through
    the scatter/gather unit; these two einsums are a few ms of dense
    matmul time instead.
    """
    h_map, w_map, _ = fmap.shape
    rois = rois_xywh.astype(jnp.float32)
    sy = _sample_centers(rois[:, 1::2], pool_size, h_map, center_stride)  # (R, P) rows
    sx = _sample_centers(rois[:, 0::2], pool_size, w_map, center_stride)  # (R, P) cols
    ry = _interp_matrix(sy, h_map)  # (R, P, H)
    rx = _interp_matrix(sx, w_map)  # (R, P, W)

    # Contract in the feature dtype (bf16 on TPU) with fp32 accumulation.
    ry = ry.astype(fmap.dtype)
    rx = rx.astype(fmap.dtype)
    rows = jnp.einsum(
        "rph,hwc->rpwc", ry, fmap, preferred_element_type=jnp.float32
    ).astype(fmap.dtype)
    out = jnp.einsum(
        "rqw,rpwc->rpqc", rx, rows, preferred_element_type=jnp.float32
    )
    return out.astype(fmap.dtype)


def batched_roi_pool(
    fmaps, rois_xywh, *, pool_size: int, method: str = "matmul", center_stride: int = 1
):
    """vmap over the tile batch: ``(B, H, W, C)`` + ``(B, R, 4)`` ->
    ``(B, R, P, P, C)``.  ``method``: 'matmul' (MXU einsum path, default),
    'gather' (4-point bilinear gathers) or 'pallas' (fused VMEM kernel,
    radnet_tpu.ops.pallas_roi)."""
    if method == "pallas":
        from radnet_tpu.ops.pallas_roi import roi_pool_pallas

        if center_stride != 1:
            raise NotImplementedError("pallas path has no center_stride")
        return roi_pool_pallas(fmaps, rois_xywh, pool_size=pool_size)
    fn = functools.partial(
        roi_pool_matmul if method == "matmul" else roi_pool,
        pool_size=pool_size,
        **({"center_stride": center_stride} if method == "matmul" else {}),
    )
    return jax.vmap(fn)(fmaps, rois_xywh)
