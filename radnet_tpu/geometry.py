"""Pure-JAX box geometry: IoU, coordinate conversions, encode/decode.

Device-side, fixed-shape, vmappable replacements for the reference's scalar
python box math:

* ``iou_matrix``           <- utils.union/intersection/iou
  (/root/reference/faster_rcnn/utils.py:77-109), all-pairs instead of
  one-pair-at-a-time python loops.
* ``encode_boxes``         <- the (tx, ty, tw, th) target construction in
  calc_region_props (utils.py:684-687) and calc_iou (rpn.py:253-256).
* ``decode_boxes``         <- apply_regr_np (/root/reference/faster_rcnn/
  rpn.py:299-344): center-offset + log-size decode with round-to-nearest.

All functions are float32; boxes are ``(..., 4)`` in ``(x1, y1, x2, y2)``
("xyxy") or ``(x, y, w, h)`` ("xywh") layout as documented per function.
"""

from __future__ import annotations

import jax.numpy as jnp

EPS = 1e-6


def xyxy_to_xywh(boxes: jnp.ndarray) -> jnp.ndarray:
    """(x1, y1, x2, y2) -> (x1, y1, w, h), as train.py's in-place
    ``R[:, 2] -= R[:, 0]`` conversion (RADNet.py:564-565)."""
    x1, y1, x2, y2 = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x1, y1, x2 - x1, y2 - y1], axis=-1)


def xywh_to_xyxy(boxes: jnp.ndarray) -> jnp.ndarray:
    x, y, w, h = jnp.split(boxes, 4, axis=-1)
    return jnp.concatenate([x, y, x + w, y + h], axis=-1)


def box_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of xyxy boxes, clamped at zero for degenerate boxes."""
    w = jnp.maximum(boxes[..., 2] - boxes[..., 0], 0.0)
    h = jnp.maximum(boxes[..., 3] - boxes[..., 1], 0.0)
    return w * h


def iou_matrix(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """All-pairs IoU between xyxy boxes ``a: (N, 4)`` and ``b: (M, 4)``.

    Matches the reference's scalar ``iou`` semantics (utils.py:99-109):
    degenerate boxes (x1 >= x2 or y1 >= y2) get IoU 0, and the union carries
    a ``1e-6`` stabilizer in the denominator.
    Returns ``(N, M)`` float32.
    """
    a = a.astype(jnp.float32)
    b = b.astype(jnp.float32)
    lt = jnp.maximum(a[:, None, :2], b[None, :, :2])  # (N, M, 2)
    rb = jnp.minimum(a[:, None, 2:], b[None, :, 2:])  # (N, M, 2)
    wh = jnp.maximum(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = area_a[:, None] + area_b[None, :] - inter
    iou = inter / (union + EPS)
    valid_a = (a[:, 2] > a[:, 0]) & (a[:, 3] > a[:, 1])
    valid_b = (b[:, 2] > b[:, 0]) & (b[:, 3] > b[:, 1])
    return jnp.where(valid_a[:, None] & valid_b[None, :], iou, 0.0)


def pairwise_iou(a: jnp.ndarray) -> jnp.ndarray:
    """Self IoU matrix ``(N, N)`` used by the fixed-shape NMS."""
    return iou_matrix(a, a)


def encode_boxes(anchors_xyxy: jnp.ndarray, gt_xyxy: jnp.ndarray) -> jnp.ndarray:
    """Regression targets (tx, ty, tw, th) of ``gt`` w.r.t. ``anchors``.

    tx = (cx_gt - cx_a) / w_a ; tw = log(w_gt / w_a)   (utils.py:684-687).
    Shapes broadcast; returns ``(..., 4)`` float32.
    """
    aw = anchors_xyxy[..., 2] - anchors_xyxy[..., 0]
    ah = anchors_xyxy[..., 3] - anchors_xyxy[..., 1]
    acx = (anchors_xyxy[..., 0] + anchors_xyxy[..., 2]) / 2.0
    acy = (anchors_xyxy[..., 1] + anchors_xyxy[..., 3]) / 2.0

    gw = gt_xyxy[..., 2] - gt_xyxy[..., 0]
    gh = gt_xyxy[..., 3] - gt_xyxy[..., 1]
    gcx = (gt_xyxy[..., 0] + gt_xyxy[..., 2]) / 2.0
    gcy = (gt_xyxy[..., 1] + gt_xyxy[..., 3]) / 2.0

    # Guard the degenerate-denominator cases; callers mask invalid rows.
    aw_safe = jnp.where(aw > 0, aw, 1.0)
    ah_safe = jnp.where(ah > 0, ah, 1.0)
    tx = (gcx - acx) / aw_safe
    ty = (gcy - acy) / ah_safe
    tw = jnp.log(jnp.maximum(gw, EPS) / aw_safe)
    th = jnp.log(jnp.maximum(gh, EPS) / ah_safe)
    return jnp.stack([tx, ty, tw, th], axis=-1).astype(jnp.float32)


def decode_boxes(
    anchors_xywh: jnp.ndarray,
    deltas: jnp.ndarray,
    *,
    round_outputs: bool = True,
) -> jnp.ndarray:
    """Apply (tx, ty, tw, th) deltas to ``(x, y, w, h)`` anchors.

    Vectorized equivalent of apply_regr_np (rpn.py:299-344): center shift by
    ``t * size``, log-size scaling, then round-to-nearest (the reference
    rounds through np.round / int(round(.)) in both decode paths,
    rpn.py:335-338,360-363).  ``exp`` is clamped to keep bf16/fp32 finite
    where the reference leaned on float64.
    """
    x, y, w, h = (anchors_xywh[..., i] for i in range(4))
    tx, ty, tw, th = (deltas[..., i] for i in range(4))

    cx = x + w / 2.0
    cy = y + h / 2.0
    cx1 = tx * w + cx
    cy1 = ty * h + cy
    w1 = jnp.exp(jnp.clip(tw, -10.0, 10.0)) * w
    h1 = jnp.exp(jnp.clip(th, -10.0, 10.0)) * h
    x1 = cx1 - w1 / 2.0
    y1 = cy1 - h1 / 2.0
    out = jnp.stack([x1, y1, w1, h1], axis=-1)
    if round_outputs:
        out = jnp.round(out)
    return out.astype(jnp.float32)


def clip_boxes_xyxy(boxes: jnp.ndarray, width: jnp.ndarray, height: jnp.ndarray) -> jnp.ndarray:
    """Clip xyxy boxes into ``[0, width-1] x [0, height-1]`` as rpn_to_roi
    clips proposals to the feature map (rpn.py:147-150)."""
    x1 = jnp.clip(boxes[..., 0], 0.0, width - 1.0)
    y1 = jnp.clip(boxes[..., 1], 0.0, height - 1.0)
    x2 = jnp.clip(boxes[..., 2], 0.0, width - 1.0)
    y2 = jnp.clip(boxes[..., 3], 0.0, height - 1.0)
    return jnp.stack([x1, y1, x2, y2], axis=-1)
