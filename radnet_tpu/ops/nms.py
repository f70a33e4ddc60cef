"""Fixed-shape non-maximum suppression for XLA, plus the cluster-average NMS.

The reference has three greedy-NMS call sites with different thresholds
(proposals @0.7, per-class tiles @0.2, cross-image-type merge @0.4 -
/root/reference/faster_rcnn/rpn.py:380-455, RADNet.py:556-574,698-702) and a
custom *cluster-averaging* NMS for cross-tile de-duplication
(RADNet.py:156-240).  All of them are numpy `while` loops with dynamic
output sizes - unusable under jit.

:func:`nms_fixed` is the device-side replacement: score-sorted greedy
suppression expressed as a ``lax.fori_loop`` of ``max_out`` steps over a
statically-shaped candidate set, emitting ``(max_out, 4)`` boxes plus a
validity mask.  Suppression uses strict ``iou > thresh`` like the reference
(rpn.py:447).  :func:`batched_nms` vmaps it over a leading axis (batch or
class) - one compiled program handles the whole tile batch; the per-tile
per-class suppression inside the cascade uses :func:`nms_fixed_point`.

:func:`final_nms_cluster` keeps the cluster-average semantics on the host
(numpy): it runs once per panel on at most a few hundred boxes, so the
pythonic form costs nothing and stays bit-identical to the reference.
"""

from __future__ import annotations

import functools

import numpy as np
import jax
import jax.numpy as jnp

from radnet_tpu.geometry import iou_matrix

# A numpy scalar, NOT jnp: a module-level jnp constant materializes on
# the default device at import, which initializes the (tunneled) backend
# before any CLI can even print --help; np.float32 weakly types the same
# way inside jit.
NEG_INF = np.float32(-np.inf)


@functools.partial(jax.jit, static_argnames=("max_out", "cast_int"))
def nms_fixed(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    *,
    max_out: int,
    cast_int: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS with static output shape.

    Args:
      boxes: ``(N, 4)`` xyxy.
      scores: ``(N,)``.
      valid: ``(N,)`` bool; invalid candidates never get picked.
      iou_thresh: suppress candidates with ``iou > thresh`` vs a pick.
      max_out: number of output slots (reference ``max_boxes=300``).
      cast_int: floor the picked boxes to integers, mirroring the
        ``boxes[pick].astype("int")`` of the reference (rpn.py:453) -
        proposals live on the non-negative feature grid so floor == trunc.

    Returns:
      (picked_boxes ``(max_out, 4)``, picked_scores ``(max_out,)``,
      picked_valid ``(max_out,)`` bool).  Unused slots are zero boxes with
      score 0 and valid False.
    """
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    live = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)

    def body(i, carry):
        live, out_boxes, out_scores, out_valid = carry
        best = jnp.argmax(live)
        best_score = live[best]
        ok = best_score > NEG_INF
        best_box = boxes[best]
        # IoU of the pick against every candidate; one row, no N^2 buffer.
        row = iou_matrix(best_box[None, :], boxes)[0]
        suppress = (row > iou_thresh) | (jnp.arange(n) == best)
        live = jnp.where(ok & suppress, NEG_INF, live)
        out_boxes = out_boxes.at[i].set(jnp.where(ok, best_box, 0.0))
        out_scores = out_scores.at[i].set(jnp.where(ok, best_score, 0.0))
        out_valid = out_valid.at[i].set(ok)
        return live, out_boxes, out_scores, out_valid

    init = (
        live,
        jnp.zeros((max_out, 4), jnp.float32),
        jnp.zeros((max_out,), jnp.float32),
        jnp.zeros((max_out,), bool),
    )
    _, out_boxes, out_scores, out_valid = jax.lax.fori_loop(0, max_out, body, init)
    if cast_int:
        out_boxes = jnp.floor(out_boxes)
    return out_boxes, out_scores, out_valid


@functools.partial(jax.jit, static_argnames=("iou_thresh", "max_out", "cast_int"))
def nms_fixed_point(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_thresh: float,
    *,
    max_out: int,
    cast_int: bool = False,
) -> tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Greedy NMS computed as a parallel fixed-point iteration.

    The greedy-kept set is the unique solution of
      kept[i] = valid[i] and no j with (score[j] > score[i], kept[j],
      iou[i, j] > thresh)
    (induction over descending score).  Jacobi-iterating that relation
    converges to the same set in <= suppression-chain-length rounds - a
    handful in practice - replacing ``max_out`` (300) *sequential* argmax
    steps with a few (N, N) masked matrix reductions that the VPU eats.
    Identical output contract to :func:`nms_fixed` (which remains as the
    sequential reference implementation; equivalence is pinned by tests).
    """
    n = boxes.shape[0]
    boxes = boxes.astype(jnp.float32)
    s = jnp.where(valid, scores.astype(jnp.float32), NEG_INF)

    # Strict score dominance; index as tiebreak for exact-equal scores so
    # the relation stays a strict partial order (argsort-stable like the
    # reference's ascending argsort + last-first scan, rpn.py:415-424).
    # On TPU the relation is computed by a fused Pallas kernel (int8 out,
    # no (N, N) f32 temporaries - ops/pallas_nms.py); the XLA expression
    # is the fallback for other platforms and the numerical reference
    # (equivalence pinned by tests/test_nms.py).
    def _dominates_xla(boxes, s):
        idx = jnp.arange(n)
        higher = (s[None, :] > s[:, None]) | (
            (s[None, :] == s[:, None]) & (idx[None, :] > idx[:, None])
        )
        overlap = iou_matrix(boxes, boxes) > iou_thresh
        return higher & overlap  # [i, j]: j can suppress i

    if n % 128 == 0:
        from radnet_tpu.ops.pallas_nms import dominates_matrix

        dominates = jax.lax.platform_dependent(
            boxes,
            s,
            tpu=lambda b, sc: dominates_matrix(b[None], sc[None], iou_thresh)[0],
            default=_dominates_xla,
        )
    else:
        dominates = _dominates_xla(boxes, s)

    def cond(carry):
        kept, changed, rounds = carry
        return changed & (rounds < n)

    def body(carry):
        kept, _, rounds = carry
        suppressed = jnp.any(dominates & kept[None, :], axis=1)
        new_kept = valid & ~suppressed
        return new_kept, jnp.any(new_kept != kept), rounds + 1

    kept0 = valid
    kept, _, _ = jax.lax.while_loop(cond, body, (kept0, jnp.asarray(True), 0))

    kept_scores = jnp.where(kept, s, NEG_INF)
    k = min(max_out, n)
    top_scores, top_idx = jax.lax.top_k(kept_scores, k)
    out_valid = top_scores > NEG_INF
    out_boxes = jnp.where(out_valid[:, None], boxes[top_idx], 0.0)
    out_scores = jnp.where(out_valid, top_scores, 0.0)
    if k < max_out:  # fewer candidates than output slots: pad
        pad = max_out - k
        out_boxes = jnp.concatenate([out_boxes, jnp.zeros((pad, 4), jnp.float32)])
        out_scores = jnp.concatenate([out_scores, jnp.zeros((pad,), jnp.float32)])
        out_valid = jnp.concatenate([out_valid, jnp.zeros((pad,), bool)])
    if cast_int:
        out_boxes = jnp.floor(out_boxes)
    return out_boxes, out_scores, out_valid


def batched_nms(boxes, scores, valid, iou_thresh, *, max_out, cast_int=False):
    """vmap of :func:`nms_fixed` over a leading batch axis."""
    fn = functools.partial(
        nms_fixed, iou_thresh=iou_thresh, max_out=max_out, cast_int=cast_int
    )
    return jax.vmap(fn)(boxes, scores, valid)


def topk_candidates(boxes, scores, valid, k: int):
    """Score top-k pre-selection to bound the NMS candidate set.

    The reference feeds all ~17k anchors into NMS (rpn.py:154-170); on
    device we pre-select the ``k`` best-scoring valid candidates (invalid
    ones score ``-inf``), which is lossless whenever fewer than ``k``
    candidates could ever be picked or suppress a pick.
    """
    masked = jnp.where(valid, scores, NEG_INF)
    top_scores, idx = jax.lax.top_k(masked, k)
    return boxes[idx], top_scores, top_scores > NEG_INF


# --------------------------------------------------------------------------- #
# Host-side cluster-averaging NMS (cross-tile de-duplication).
# --------------------------------------------------------------------------- #
def final_nms_cluster(
    boxes: np.ndarray,
    probs: np.ndarray,
    obj_avg_threshold: float = 0.2,
    obj_confidence_threshold: float = 0.8,
    n_obj_avg: int = 5,
) -> tuple[np.ndarray, np.ndarray]:
    """Cluster-average NMS (reference RADNet.final_nms, RADNet.py:156-240).

    Greedily groups boxes around the highest-probability remaining box at
    ``iou > obj_avg_threshold``; within a cluster keeps the members above
    ``obj_confidence_threshold`` (or, if none qualify, the ``n_obj_avg``
    highest-probability members) and emits their mean box / mean prob.

    Host-side numpy by design: runs once per panel over O(100) boxes.
    """
    boxes = np.asarray(boxes, dtype=np.float64)
    probs = np.asarray(probs, dtype=np.float64)
    if boxes.size == 0:
        return np.zeros((0, 4), dtype=np.int64), np.zeros((0,), dtype=np.float64)

    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    order = np.argsort(probs)  # ascending; the best is last
    picked_groups: list[np.ndarray] = []

    while order.size > 0:
        last = order.size - 1
        i = order[last]
        rest = order[:last]

        iw = np.maximum(0.0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        ih = np.maximum(0.0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        inter = iw * ih
        overlap = inter / (area[i] + area[rest] - inter + 1e-6)

        cluster_pos = np.concatenate([np.nonzero(overlap > obj_avg_threshold)[0], [last]])
        cluster = order[cluster_pos]  # ascending prob; best member last

        if probs[cluster].max() < obj_confidence_threshold:
            members = cluster[-n_obj_avg:]
        else:
            members = cluster[probs[cluster] > obj_confidence_threshold]

        picked_groups.append(members)
        order = np.delete(order, cluster_pos)

    new_boxes = np.array(
        [np.rint(boxes[g].mean(axis=0)).astype("int") for g in picked_groups]
    )
    new_probs = np.array([probs[g].mean() for g in picked_groups])
    return new_boxes, new_probs


def nms_numpy(
    boxes: np.ndarray,
    probs: np.ndarray,
    overlap_thresh: float = 0.9,
    max_boxes: int = 300,
) -> tuple[np.ndarray, np.ndarray]:
    """Host-side greedy NMS for tiny candidate sets.

    Same contract as the reference's ``non_max_suppression_fast``
    (rpn.py:380-455) including the int cast of the returned boxes; used only
    on already-reduced host data (e.g. the cross-image-type merge,
    RADNet.py:698-702).
    """
    if len(boxes) == 0:
        return np.zeros((0, 4), dtype=np.int64), np.zeros((0,))
    boxes = np.asarray(boxes, dtype=np.float64)
    probs = np.asarray(probs, dtype=np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    order = np.argsort(probs)
    pick = []
    while order.size > 0:
        last = order.size - 1
        i = order[last]
        pick.append(i)
        rest = order[:last]
        iw = np.maximum(0.0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        ih = np.maximum(0.0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        inter = iw * ih
        overlap = inter / (area[i] + area[rest] - inter + 1e-6)
        order = np.delete(order, np.concatenate([[last], np.nonzero(overlap > overlap_thresh)[0]]))
        if len(pick) >= max_boxes:
            break
    return boxes[pick].astype("int"), probs[pick]
