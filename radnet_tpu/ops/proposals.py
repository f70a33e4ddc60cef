"""RPN output -> RoI proposals, fully on device (the ``rpn_to_roi`` stage).

Vectorized, fixed-shape equivalent of /root/reference/faster_rcnn/rpn.py:
68-172: undo the regression std-scaling, decode all anchors at once, clamp
sizes, clip to the (valid) feature-map extent, drop degenerates, then run
the fixed-shape greedy NMS to ``post_nms_top_n`` slots.  The reference does
this in numpy per tile with a python anchor loop; here a whole tile batch is
one compiled program (vmap over the leading axis).
"""

from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp

from radnet_tpu.geometry import decode_boxes
from radnet_tpu.ops.anchors import feature_anchors_xywh
from radnet_tpu.ops.nms import nms_fixed_point, topk_candidates


class Proposals(NamedTuple):
    boxes: jnp.ndarray  # (post_nms_top_n, 4) xyxy, integer-valued, fm coords
    scores: jnp.ndarray  # (post_nms_top_n,)
    valid: jnp.ndarray  # (post_nms_top_n,) bool


def decode_proposals(
    rpn_cls: jnp.ndarray,
    rpn_regr: jnp.ndarray,
    valid_fw: jnp.ndarray,
    valid_fh: jnp.ndarray,
    *,
    scales: tuple,
    ratios: tuple,
    stride: int,
    std_scaling: float = 4.0,
    pre_nms_top_n: int = 1024,
    post_nms_top_n: int = 300,
    nms_thresh: float = 0.7,
    use_regr: bool = True,
    anchors_xywh: jnp.ndarray | None = None,
) -> Proposals:
    """Proposals for one image.

    Args:
      rpn_cls: ``(H, W, A)`` post-sigmoid objectness.
      rpn_regr: ``(H, W, 4A)`` raw regression output (std-scaled,
        rpn.py:91 divides it back out).
      valid_fw / valid_fh: scalar feature-map extent of the real image
        inside the padded canvas; cells beyond it are masked out and boxes
        are clipped to it (the reference clips to the full map because it
        never pads, rpn.py:147-150).
    """
    feat_h, feat_w, num_anchors = rpn_cls.shape
    anchors = (
        anchors_xywh
        if anchors_xywh is not None
        else feature_anchors_xywh(feat_h, feat_w, scales, ratios, stride)
    )

    deltas = rpn_regr.astype(jnp.float32).reshape(feat_h, feat_w, num_anchors, 4)
    deltas = deltas / std_scaling

    if use_regr:
        boxes_xywh = decode_boxes(anchors, deltas, round_outputs=True)
    else:
        boxes_xywh = anchors

    # Clamp sizes to >= 1 feature cell (rpn.py:137-138), convert to xyxy,
    # clip to the valid extent (rpn.py:143-150).
    x, y, w, h = (boxes_xywh[..., i] for i in range(4))
    w = jnp.maximum(w, 1.0)
    h = jnp.maximum(h, 1.0)
    x2 = x + w
    y2 = y + h
    x1 = jnp.clip(x, 0.0, valid_fw - 1.0)
    y1 = jnp.clip(y, 0.0, valid_fh - 1.0)
    x2 = jnp.clip(x2, 0.0, valid_fw - 1.0)
    y2 = jnp.clip(y2, 0.0, valid_fh - 1.0)

    boxes = jnp.stack([x1, y1, x2, y2], axis=-1).reshape(-1, 4)
    scores = rpn_cls.astype(jnp.float32).reshape(-1)

    # Degenerate boxes are dropped (rpn.py:163-166); additionally mask
    # anchors whose cell lies in the zero-padded canvas region.
    cell_x = jax.lax.broadcasted_iota(jnp.int32, (feat_h, feat_w, num_anchors), 1)
    cell_y = jax.lax.broadcasted_iota(jnp.int32, (feat_h, feat_w, num_anchors), 0)
    in_valid = (cell_x < valid_fw) & (cell_y < valid_fh)
    nondegenerate = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    valid = nondegenerate & in_valid.reshape(-1)

    cand_boxes, cand_scores, cand_valid = topk_candidates(
        boxes, scores, valid, min(pre_nms_top_n, boxes.shape[0])
    )
    out_boxes, out_scores, out_valid = nms_fixed_point(
        cand_boxes,
        cand_scores,
        cand_valid,
        nms_thresh,
        max_out=post_nms_top_n,
        cast_int=True,
    )
    return Proposals(out_boxes, out_scores, out_valid)


def batched_decode_proposals(rpn_cls, rpn_regr, valid_fw, valid_fh, **kw):
    """vmap of :func:`decode_proposals` over the tile batch axis."""
    fn = functools.partial(decode_proposals, **kw)
    return jax.vmap(fn)(rpn_cls, rpn_regr, valid_fw, valid_fh)
