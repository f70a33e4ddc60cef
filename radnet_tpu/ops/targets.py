"""On-device, fixed-shape target assignment for RPN and detector stages.

Replaces the two hottest CPU components of the reference with vectorized
XLA programs:

* :func:`rpn_targets` <- ``calc_region_props``
  (/root/reference/faster_rcnn/utils.py:554-822): the reference loops
  ``scales x ratios x W x H x boxes`` in python per image; here it is one
  ``(num_anchors, num_gt)`` IoU matrix plus masked reductions, vmappable
  over the tile batch and jit-compatible (it runs *inside* the fused train
  step, so targets for the second stage never leave the device).
* :func:`proposal_targets` <- ``calc_iou`` (rpn.py:176-296) +
  ``get_selected_samples`` (train.py:93-129): second-stage class/regression
  target construction and the balanced pos/neg RoI subsampling, as matrix
  ops + rank-based random selection with ``jax.random``.

Semantics intentionally preserved from the reference (each pinned by unit
tests):
  - strict IoU bands: pos iff iou > rpn_max_overlap, neutral iff
    rpn_min < iou < rpn_max (the *intended* reading of the ``bbox_typ``
    typo at utils.py:720; see SURVEY.md §7 "known bugs"),
  - boundary-crossing anchors excluded entirely (utils.py:629,638),
  - best-anchor-per-GT fallback (utils.py:741-766),
  - the 1:1 pos:neg rebalance hidden in the subsampler: when
    ``n_pos + n_neg > 256`` it keeps only ``n_pos`` negatives
    (``np.random.choice(n_neg, n_neg - n_pos)`` disables the rest,
    utils.py:802-813),
  - second-stage IoU on *rounded* feature-map coordinates (rpn.py:197-214).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from radnet_tpu.geometry import encode_boxes, iou_matrix
from radnet_tpu.ops.anchors import anchor_validity_mask, image_anchors_xyxy


class RpnTargets(NamedTuple):
    y_rpn_cls: jnp.ndarray  # (H, W, 2A): [valid | overlap]
    y_rpn_regr: jnp.ndarray  # (H, W, 8A): [4x overlap | std-scaled targets]
    n_pos: jnp.ndarray  # () int32, positive anchors after the pos cap


def _keep_random_subset(
    mask: jnp.ndarray, budget: jnp.ndarray, rng: jax.Array
) -> jnp.ndarray:
    """Randomly keep exactly ``min(budget, count)`` True elements of ``mask``.

    Cheaper program than a random-rank construction (an argsort - a
    (key, index) pair sort - plus a scatter): composite integer keys
    ``random_bits << idx_bits | index`` are
    value-sorted once and thresholded at the ``budget``-th smallest.  The
    keys are unique by construction, so the kept count is exact; the index
    tie-break inside equal random words makes the selection minutely
    non-uniform (2^16 random buckets over ~17k anchors), which is
    training-equivalent to the reference's uniform ``np.random.choice``
    (utils.py:793-813).
    """
    n = mask.shape[0]
    idx_bits = max(1, (n - 1).bit_length())
    rand_bits = min(16, 31 - idx_bits)
    rbits = jax.random.bits(rng, (n,), jnp.uint32) >> jnp.uint32(32 - rand_bits)
    keys = (rbits.astype(jnp.int32) << idx_bits) | jnp.arange(n, dtype=jnp.int32)
    keys = jnp.where(mask, keys, jnp.iinfo(jnp.int32).max)
    sorted_keys = jax.lax.sort(keys)
    thr = jax.lax.dynamic_index_in_dim(
        sorted_keys, jnp.clip(budget - 1, 0, n - 1), keepdims=False
    )
    return mask & (keys <= thr) & (budget > 0)


def rpn_targets(
    gt_boxes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    valid_width: jnp.ndarray,
    valid_height: jnp.ndarray,
    rng: jax.Array,
    *,
    feat_h: int,
    feat_w: int,
    scales: tuple,
    ratios: tuple,
    stride: int,
    rpn_min_overlap: float = 0.3,
    rpn_max_overlap: float = 0.7,
    max_regions: int = 256,
    std_scaling: float = 4.0,
    anchors_xyxy: jnp.ndarray | None = None,
    reference_neg_budget: bool = False,
    fallback_min_iou: float = 0.0,
) -> RpnTargets:
    """Anchor classification/regression targets for one (padded) image.

    Args:
      gt_boxes: ``(G, 4)`` xyxy in resized-image pixels (padded canvas
        coordinates; padding rows arbitrary).
      gt_mask: ``(G,)`` bool, False for padding rows.
      valid_width / valid_height: scalar extent of the real (unpadded)
        image inside the canvas; anchors crossing it are excluded like the
        reference excludes image-boundary crossers.
      rng: PRNG key for the pos/neg subsampling.
    """
    # Prefer caller-supplied anchors (passed as a jit *argument* so they are
    # never inlined into the lowered HLO - the remote-compile transport
    # rejects oversized modules); fall back to building them here for eager
    # and test use.
    anchors = (
        anchors_xyxy
        if anchors_xyxy is not None
        else image_anchors_xyxy(feat_h, feat_w, scales, ratios, stride)
    )
    n_anchors_per_cell = anchors.shape[2]
    anchors_flat = jnp.asarray(anchors).reshape(-1, 4)  # (N, 4), N = H*W*A
    n = anchors_flat.shape[0]

    a_valid = anchor_validity_mask(anchors_flat, valid_width, valid_height)

    iou = iou_matrix(anchors_flat, gt_boxes)  # (N, G)
    iou = iou * gt_mask[None, :].astype(iou.dtype)

    best_iou = jnp.max(iou, axis=1)  # (N,)
    best_gt = jnp.argmax(iou, axis=1)  # (N,)

    pos = a_valid & (best_iou > rpn_max_overlap)
    neutral = a_valid & ~pos & (best_iou > rpn_min_overlap) & (best_iou < rpn_max_overlap)
    neg = a_valid & ~pos & ~neutral

    # Regression targets w.r.t. each anchor's best-IoU GT (utils.py:684-713).
    regr_all = encode_boxes(anchors_flat, gt_boxes[best_gt])  # (N, 4)

    overlap = pos
    valid = pos | neg

    # ------------------------------------------------------------------ #
    # Best-anchor-per-GT guarantee (utils.py:741-766): any GT with no
    # positive anchor gets its best-IoU valid anchor forced positive.
    # Scatter per-GT in scan order so a later GT overwrites an earlier one
    # on conflicts, like the reference's sequential loop.
    # ------------------------------------------------------------------ #
    iou_masked = jnp.where(a_valid[:, None], iou, 0.0)  # (N, G)
    gt_has_pos = jnp.any(iou_masked > rpn_max_overlap, axis=0)  # (G,)
    gt_best_anchor = jnp.argmax(iou_masked, axis=0)  # (G,)
    gt_best_iou = jnp.max(iou_masked, axis=0)  # (G,)
    # The reference forces a positive for any nonzero IoU (utils.py:745);
    # ``fallback_min_iou`` adds an optional floor - forcing positives onto
    # near-zero-IoU anchors teaches mismatched anchor channels to fire on
    # everything (saturation spiral observed with badly-scaled anchors).
    need_fallback = gt_mask & ~gt_has_pos & (gt_best_iou > fallback_min_iou)

    regr_fallback = encode_boxes(
        anchors_flat[gt_best_anchor], gt_boxes
    )  # (G, 4) target of GT g w.r.t. its best anchor

    # Vectorized scatter with the sequential loop's conflict rule: the
    # reference applies fallbacks GT-by-GT, so when two GTs share a best
    # anchor the LATER one's regression target wins (utils.py:741-766).
    # Per anchor that is the max needing-fallback GT index over an (N, G)
    # match matrix - a masked VPU reduction instead of a G-step fori_loop
    # of tiny scatters (measured ~1.3 ms/batch of the fused train step).
    match = need_fallback[None, :] & (
        gt_best_anchor[None, :] == jnp.arange(n)[:, None]
    )  # (N, G)
    win_g = jnp.max(
        jnp.where(match, jnp.arange(gt_boxes.shape[0])[None, :], -1), axis=1
    )  # (N,) index of the winning GT, -1 if none
    has_fb = win_g >= 0
    overlap = overlap | has_fb
    valid = valid | has_fb
    regr_all = jnp.where(
        has_fb[:, None], regr_fallback[jnp.maximum(win_g, 0)], regr_all
    )

    # ------------------------------------------------------------------ #
    # Subsample to the region budget (utils.py:783-813).
    # ------------------------------------------------------------------ #
    rng_pos, rng_neg = jax.random.split(rng)
    pos_mask = overlap & valid
    neg_mask = valid & ~overlap
    n_pos = jnp.sum(pos_mask)
    n_neg = jnp.sum(neg_mask)
    half = max_regions // 2

    keep_pos = _keep_random_subset(pos_mask, jnp.asarray(half), rng_pos)
    n_pos_kept = jnp.minimum(n_pos, half)

    # Negative budget. The reference keeps exactly n_pos negatives when over
    # budget (``np.random.choice(n_neg, n_neg - n_pos)`` disables the rest,
    # utils.py:802-813). That 1:1 rebalance starves the RPN of negative
    # supervision whenever positives are scarce (a handful of anchors out of
    # ~17k see gradient), which we observed to trigger an
    # objectness-inflation death spiral in long training runs.  The default
    # here is therefore the classic Faster R-CNN budget - fill negatives up
    # to ``max_regions - n_pos`` - with ``reference_neg_budget=True``
    # replicating the reference exactly.
    if reference_neg_budget:
        neg_budget = jnp.where(n_pos_kept + n_neg > max_regions, n_pos_kept, n_neg)
    else:
        neg_budget = jnp.minimum(n_neg, max_regions - n_pos_kept)
    keep_neg = _keep_random_subset(neg_mask, neg_budget, rng_neg)

    # Subsampling only clears the *validity* mask; ``overlap`` keeps the full
    # positive set, so the regression mask (repeat(overlap, 4)) still covers
    # subsample-disabled positives, exactly like the reference
    # (utils.py:798,813 flip y_is_box_valid only; packing at :815-816).
    valid = keep_pos | keep_neg

    overlap_f = overlap.astype(jnp.float32).reshape(feat_h, feat_w, n_anchors_per_cell)
    valid_f = valid.astype(jnp.float32).reshape(feat_h, feat_w, n_anchors_per_cell)
    regr = jnp.where(overlap[:, None], regr_all, 0.0).reshape(
        feat_h, feat_w, 4 * n_anchors_per_cell
    )

    # Packing (utils.py:815-816) + the generator's std scaling of the target
    # half (utils.py:299).
    y_rpn_cls = jnp.concatenate([valid_f, overlap_f], axis=-1)
    y_rpn_regr = jnp.concatenate(
        [jnp.repeat(overlap_f, 4, axis=-1), regr * std_scaling], axis=-1
    )
    return RpnTargets(y_rpn_cls, y_rpn_regr, n_pos_kept.astype(jnp.int32))


class ProposalTargets(NamedTuple):
    rois: jnp.ndarray  # (R, 4) (x, y, w, h) feature-map coords
    y_class: jnp.ndarray  # (R, n_classes) one-hot
    y_regr: jnp.ndarray  # (R, 8K) [labels | std-scaled coords]
    roi_valid: jnp.ndarray  # (R,) bool - False when no RoI survived at all
    n_pos: jnp.ndarray  # () int32, positives before subsampling


def proposal_targets(
    proposals: jnp.ndarray,
    prop_valid: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_classes: jnp.ndarray,
    gt_mask: jnp.ndarray,
    rng: jax.Array,
    *,
    n_classes: int,
    n_rois: int,
    stride: int,
    classifier_min_overlap: float = 0.1,
    classifier_max_overlap: float = 0.5,
    classifier_regr_std: tuple = (8.0, 8.0, 4.0, 4.0),
) -> ProposalTargets:
    """Second-stage targets + balanced RoI sampling for one image.

    Args:
      proposals: ``(P, 4)`` xyxy proposals in feature-map coords (already
        integer-valued from the proposal NMS, rpn.py:453).
      prop_valid: ``(P,)`` bool.
      gt_boxes: ``(G, 4)`` xyxy in resized-image pixels.
      gt_classes: ``(G,)`` int class ids (bg id excluded by construction).
      gt_mask: ``(G,)`` bool.
    Returns ``n_rois`` sampled RoIs with their targets.  ``bg`` is assumed
    to be class id ``n_classes - 1`` as in the reference mapping
    (config.py:100-108).
    """
    n_fg = n_classes - 1
    # GT boxes on the rounded feature grid (rpn.py:197-200).
    gta = jnp.round(gt_boxes.astype(jnp.float32) / float(stride))
    props = jnp.round(proposals.astype(jnp.float32))

    iou = iou_matrix(props, gta) * gt_mask[None, :].astype(jnp.float32)  # (P, G)
    best_iou = jnp.max(iou, axis=1)
    best_gt = jnp.argmax(iou, axis=1)

    keep = prop_valid & (best_iou >= classifier_min_overlap)
    is_fg = keep & (best_iou >= classifier_max_overlap)
    is_bg = keep & ~is_fg

    cls_id = jnp.where(is_fg, gt_classes[best_gt], n_fg)  # bg = last id
    y_class = jax.nn.one_hot(cls_id, n_classes)

    # Per-class regression targets, std-scaled (rpn.py:246-275).
    t = encode_boxes(props, gta[best_gt])  # (P, 4)
    std = jnp.asarray(classifier_regr_std, jnp.float32)
    t_scaled = t * std[None, :]
    onehot_fg = jax.nn.one_hot(cls_id, n_fg) * is_fg[:, None]  # (P, K)
    labels = jnp.repeat(onehot_fg, 4, axis=-1)  # (P, 4K): 4 slots per class
    coords = labels * jnp.tile(t_scaled, (1, n_fg))
    y_regr = jnp.concatenate([labels, coords], axis=-1)  # (P, 8K)

    x1, y1, x2, y2 = (props[:, i] for i in range(4))
    rois_xywh = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)

    # ------------------------------------------------------------------ #
    # Balanced subsampling to n_rois slots (train.py:93-129): up to
    # n_rois//2 positives, the rest negatives; wrap-around reuse when a
    # pool is too small (the reference's replace=True fallback).
    # ------------------------------------------------------------------ #
    rng_pos, rng_neg = jax.random.split(rng)
    n_pos = jnp.sum(is_fg)
    n_neg = jnp.sum(is_bg)
    k_pos = jnp.minimum(n_pos, n_rois // 2)

    r_pos = jax.random.uniform(rng_pos, (props.shape[0],))
    r_neg = jax.random.uniform(rng_neg, (props.shape[0],))
    pos_order = jnp.argsort(jnp.where(is_fg, r_pos, jnp.inf))
    neg_order = jnp.argsort(jnp.where(is_bg, r_neg, jnp.inf))

    slot = jnp.arange(n_rois)
    neg_slot = slot - k_pos
    safe_np = jnp.maximum(n_pos, 1)
    safe_nn = jnp.maximum(n_neg, 1)
    pos_idx = pos_order[slot % safe_np]
    neg_idx = neg_order[neg_slot % safe_nn]
    use_pos = (slot < k_pos) | (n_neg == 0)
    sel = jnp.where(use_pos, pos_idx, neg_idx)

    any_roi = (n_pos + n_neg) > 0
    roi_valid = jnp.full((n_rois,), any_roi)

    return ProposalTargets(
        rois=rois_xywh[sel],
        y_class=y_class[sel],
        y_regr=y_regr[sel],
        roi_valid=roi_valid,
        n_pos=n_pos.astype(jnp.int32),
    )
