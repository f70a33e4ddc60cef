"""Anchor grid generation as a single broadcasted computation.

The reference builds anchors twice with different conventions; both are kept
(they are *not* interchangeable, the parity tests pin each):

* :func:`feature_anchors_xywh` - the proposal-decode grid of
  ``rpn_to_roi`` (/root/reference/faster_rcnn/rpn.py:106-152): feature-map
  units, centered on the integer cell index (no +0.5), laid out with the
  anchor index ``a = size_idx * n_ratios + ratio_idx`` to match the RPN
  head's channel order.
* :func:`image_anchors_xyxy` - the target-assignment grid of
  ``calc_region_props`` (/root/reference/faster_rcnn/utils.py:616-638):
  resized-image pixels, centered at ``stride * (cell + 0.5)``, with the
  same channel order (``anchor_ratio_idx + n_ratios * anchor_size_idx``,
  utils.py:725).

Both return arrays shaped ``(H, W, A, 4)`` so downstream code reshapes /
flattens explicitly; generation is pure jnp (no python loops over cells).
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def anchor_shapes(
    scales: tuple[float, ...], ratios: tuple[tuple[float, float], ...]
) -> np.ndarray:
    """(A, 2) array of (anchor_w, anchor_h) in image pixels, ordered
    size-major then ratio (matching rpn.py:108-152 / utils.py:616-620)."""
    shapes = [
        (scale * rw, scale * rh)
        for scale in scales
        for (rw, rh) in ratios
    ]
    return np.asarray(shapes, dtype=np.float32)


@functools.lru_cache(maxsize=16)
def _feature_anchors_np(
    feat_h: int,
    feat_w: int,
    scales: tuple[float, ...],
    ratios: tuple[tuple[float, float], ...],
    stride: int,
) -> np.ndarray:
    shapes = anchor_shapes(scales, ratios) / float(stride)  # feature units
    xs = np.arange(feat_w, dtype=np.float32)
    ys = np.arange(feat_h, dtype=np.float32)
    cx = np.broadcast_to(xs[None, :, None], (feat_h, feat_w, len(shapes)))
    cy = np.broadcast_to(ys[:, None, None], (feat_h, feat_w, len(shapes)))
    w = np.broadcast_to(shapes[None, None, :, 0], cx.shape)
    h = np.broadcast_to(shapes[None, None, :, 1], cx.shape)
    # (x1, y1, w, h) with the top-left at center - size/2 (rpn.py:127-130).
    return np.stack([cx - w / 2.0, cy - h / 2.0, w, h], axis=-1)


def feature_anchors_xywh(
    feat_h: int,
    feat_w: int,
    scales,
    ratios,
    stride: int,
) -> jnp.ndarray:
    """Decode-path anchors ``(H, W, A, 4)`` in (x1, y1, w, h) feature units."""
    key_scales = tuple(float(s) for s in scales)
    key_ratios = tuple((float(r[0]), float(r[1])) for r in ratios)
    # numpy on purpose: traced as a host constant, never committed to a
    # device (committing it would force cross-device fetches at lowering
    # time when the same grid is reused under a different mesh/platform).
    return _feature_anchors_np(feat_h, feat_w, key_scales, key_ratios, stride)


@functools.lru_cache(maxsize=16)
def _image_anchors_np(
    feat_h: int,
    feat_w: int,
    scales: tuple[float, ...],
    ratios: tuple[tuple[float, float], ...],
    stride: int,
) -> np.ndarray:
    shapes = anchor_shapes(scales, ratios)  # image pixels
    xs = (np.arange(feat_w, dtype=np.float32) + 0.5) * stride
    ys = (np.arange(feat_h, dtype=np.float32) + 0.5) * stride
    cx = np.broadcast_to(xs[None, :, None], (feat_h, feat_w, len(shapes)))
    cy = np.broadcast_to(ys[:, None, None], (feat_h, feat_w, len(shapes)))
    w = np.broadcast_to(shapes[None, None, :, 0], cx.shape)
    h = np.broadcast_to(shapes[None, None, :, 1], cx.shape)
    return np.stack(
        [cx - w / 2.0, cy - h / 2.0, cx + w / 2.0, cy + h / 2.0], axis=-1
    )


def image_anchors_xyxy(
    feat_h: int,
    feat_w: int,
    scales,
    ratios,
    stride: int,
) -> jnp.ndarray:
    """Target-assignment anchors ``(H, W, A, 4)`` xyxy in resized-image px."""
    key_scales = tuple(float(s) for s in scales)
    key_ratios = tuple((float(r[0]), float(r[1])) for r in ratios)
    return _image_anchors_np(feat_h, feat_w, key_scales, key_ratios, stride)


def anchor_validity_mask(
    anchors_xyxy: jnp.ndarray, width, height
) -> jnp.ndarray:
    """Anchors fully inside ``[0, width] x [0, height]``.

    The reference drops boundary-crossing anchors from both labels and the
    best-anchor bookkeeping (utils.py:629,638); with a padded canvas the
    bound is the *valid* image extent, not the canvas.
    Returns a boolean array of shape ``anchors_xyxy.shape[:-1]``.
    """
    return (
        (anchors_xyxy[..., 0] >= 0)
        & (anchors_xyxy[..., 1] >= 0)
        & (anchors_xyxy[..., 2] <= width)
        & (anchors_xyxy[..., 3] <= height)
    )
