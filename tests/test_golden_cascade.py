"""Golden end-to-end cascade parity (VERDICT r1 #9).

With tiny fixed weights, the reference's per-tile host flow -
``rpn_to_roi`` (decode + greedy NMS, rpn.py:68-172), detector on the
proposals, per-RoI selection + class-specific decode
(``apply_spatial_pyramid_pooling``, RADNet.py:104-152), per-class NMS@0.2
(RADNet.py:570-574) - is re-implemented here in plain numpy (from the
SURVEY semantics, not the reference code) and compared against the single
fused jitted program ``RADNet._predict_tiles_impl``.  The conv forwards
(trunk / RPN head / RoI head) are shared - the parity under test is the
entire post-network cascade: anchor grid, decode rounding, clipping,
degenerate handling, NMS tie behavior, threshold semantics, coordinate
scaling.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.inference import RADNet
from radnet_tpu.models.detector import FasterRCNN, build_model
from tests.util import tiny_config


# ---------------------------------------------------------------------- #
# Reference-semantics numpy flow (no jax)
# ---------------------------------------------------------------------- #
def ref_anchor_grid(feat_h, feat_w, scales, ratios, stride):
    """(H, W, A, 4) (x1, y1, w, h) feature-unit anchors, size-major order
    (rpn.py:106-152)."""
    anchors = np.zeros((feat_h, feat_w, len(scales) * len(ratios), 4))
    a = 0
    for scale in scales:
        for (rw, rh) in ratios:
            w = scale * rw / stride
            h = scale * rh / stride
            for yy in range(feat_h):
                for xx in range(feat_w):
                    anchors[yy, xx, a] = (xx - w / 2.0, yy - h / 2.0, w, h)
            a += 1
    return anchors


def ref_apply_regr(anchors_xywh, deltas):
    """apply_regr_np semantics (rpn.py:299-344): center shift, float64
    log-size, round-to-nearest."""
    x, y, w, h = (anchors_xywh[..., i].astype(np.float64) for i in range(4))
    tx, ty, tw, th = (deltas[..., i].astype(np.float64) for i in range(4))
    cx, cy = x + w / 2.0, y + h / 2.0
    cx1, cy1 = tx * w + cx, ty * h + cy
    w1 = np.exp(np.clip(tw, -10.0, 10.0)) * w
    h1 = np.exp(np.clip(th, -10.0, 10.0)) * h
    return np.round(np.stack([cx1 - w1 / 2.0, cy1 - h1 / 2.0, w1, h1], -1))


def ref_greedy_nms(boxes, scores, thresh, max_boxes):
    """non_max_suppression_fast semantics (rpn.py:380-455): ascending
    argsort, pick the last (ties -> larger index first), suppress strictly
    iou > thresh."""
    if len(boxes) == 0:
        return np.zeros((0, 4)), np.zeros((0,))
    boxes = boxes.astype(np.float64)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    order = np.argsort(scores, kind="stable")
    pick = []
    while order.size > 0:
        i = order[-1]
        pick.append(i)
        rest = order[:-1]
        iw = np.maximum(0.0, np.minimum(x2[i], x2[rest]) - np.maximum(x1[i], x1[rest]))
        ih = np.maximum(0.0, np.minimum(y2[i], y2[rest]) - np.maximum(y1[i], y1[rest]))
        inter = iw * ih
        iou = inter / (area[i] + area[rest] - inter + 1e-6)
        order = rest[iou <= thresh]
        if len(pick) >= max_boxes:
            break
    return boxes[pick], scores[pick]


def ref_rpn_to_roi(rpn_cls, rpn_regr, cfg, feat_hw):
    """rpn_to_roi semantics (rpn.py:68-172) on the valid feature extent."""
    fh, fw = feat_hw
    scales = cfg.anchor_box_scales
    ratios = [tuple(r) for r in cfg.anchor_box_ratios]
    anchors = ref_anchor_grid(fh, fw, scales, ratios, cfg.rpn_stride)
    a = len(scales) * len(ratios)
    deltas = rpn_regr.astype(np.float64).reshape(fh, fw, a, 4) / cfg.std_scaling
    xywh = ref_apply_regr(anchors, deltas)
    x, y = xywh[..., 0], xywh[..., 1]
    w = np.maximum(xywh[..., 2], 1.0)
    h = np.maximum(xywh[..., 3], 1.0)
    x2, y2 = x + w, y + h
    x1 = np.clip(x, 0, fw - 1.0)
    y1 = np.clip(y, 0, fh - 1.0)
    x2 = np.clip(x2, 0, fw - 1.0)
    y2 = np.clip(y2, 0, fh - 1.0)
    boxes = np.stack([x1, y1, x2, y2], -1).reshape(-1, 4)
    scores = rpn_cls.astype(np.float64).reshape(-1)
    keep = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    picked, pscores = ref_greedy_nms(
        boxes[keep], scores[keep], cfg.rpn_nms_thresh, cfg.post_nms_top_n
    )
    return np.floor(picked), pscores  # astype(int) of non-negative boxes


def ref_detection_stage(det_cls, det_regr, rois_xywh, cfg):
    """apply_spatial_pyramid_pooling selection + decode (RADNet.py:104-152)
    followed by per-class NMS@0.2 (RADNet.py:570-574)."""
    n_fg = cfg.n_classes - 1
    per_class = {c: ([], []) for c in range(n_fg)}
    for r in range(det_cls.shape[0]):
        prob = det_cls[r].max()
        cls = int(det_cls[r].argmax())
        if prob < cfg.bbox_threshold or cls == cfg.bg_class_id:
            continue
        tx, ty, tw, th = det_regr[r, 4 * cls : 4 * cls + 4].astype(np.float64)
        sx, sy, sw, sh = cfg.classifier_regr_std
        dec = ref_apply_regr(
            rois_xywh[r][None], np.array([[tx / sx, ty / sy, tw / sw, th / sh]])
        )[0]
        x, y, w, h = dec
        box = cfg.rpn_stride * np.array([x, y, x + w, y + h])
        per_class[cls][0].append(box)
        per_class[cls][1].append(prob)
    out = {}
    for c in range(n_fg):
        b, s = per_class[c]
        nb, ns = ref_greedy_nms(
            np.array(b).reshape(-1, 4),
            np.array(s),
            cfg.detection_nms_thresh,
            cfg.max_detections_per_tile,
        )
        out[c] = (nb, ns)
    return out


# ---------------------------------------------------------------------- #
# The parity test
# ---------------------------------------------------------------------- #
@pytest.mark.parametrize("seed", [0, 3])
def test_fused_cascade_matches_reference_flow(seed):
    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.2  # random weights: get a few detections
    cfg.pre_nms_top_n = 96  # all 4*4*6 anchors -> top-k preselect lossless
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(seed))
    # The output heads are zero-initialized like the reference, which makes
    # every detector score exactly 1/n_classes - an all-ties degenerate
    # case where greedy NMS is pure tie-breaking.  Give them random values
    # so scores/boxes are distinct, as with any trained model.
    params = jax.tree_util.tree_map(np.asarray, state.params)
    prng = np.random.default_rng(seed + 100)
    for leaf_name in ("dense_class", "dense_regress"):
        k = params["head"][leaf_name]["kernel"]
        params["head"][leaf_name]["kernel"] = prng.normal(
            0, 0.3, k.shape
        ).astype(np.float32)
    # Likewise the RPN: random init saturates the objectness sigmoid to
    # exactly 1.0 for every anchor (all ties).  Tiny kernels keep the
    # logits near zero -> distinct scores, small but nonzero box deltas.
    for leaf_name, scale in (("rpn_out_class", 1e-4), ("rpn_out_regress", 2e-3)):
        k = params["rpn"][leaf_name]["kernel"]
        params["rpn"][leaf_name]["kernel"] = prng.normal(0, scale, k.shape).astype(
            np.float32
        )
    state = state.replace(params=params)
    radnet = RADNet(cfg, model, state.params, state.batch_stats)
    radnet.bbox_threshold = cfg.bbox_threshold

    rng = np.random.default_rng(seed)
    img = rng.normal(0, 60, (1, 64, 64, 3)).astype(np.float32)
    wh = np.full((1, 2), 64.0, np.float32)  # full canvas valid -> extent 4

    # Device: the single fused program.
    dev_boxes, dev_scores, dev_valid = jax.device_get(
        radnet._predict_tiles(jnp.asarray(img), jnp.asarray(wh))
    )

    # Reference flow: shared conv forwards, numpy cascade.
    variables = radnet.variables
    fmap = model.apply(variables, jnp.asarray(img), method=FasterRCNN.features)
    rpn_cls, rpn_regr = jax.device_get(
        model.apply(variables, fmap, method=FasterRCNN.rpn)
    )
    # Guard the test's own validity: scores must be spread, not saturated
    # ties (the cascade would then compare pure tie-breaking order).
    assert np.unique(rpn_cls).size > 50, "RPN scores degenerate to ties"
    proposals, _ = ref_rpn_to_roi(rpn_cls[0], rpn_regr[0], cfg, (4, 4))
    assert proposals.shape[0] > 0
    rois_xywh = np.stack(
        [
            proposals[:, 0],
            proposals[:, 1],
            proposals[:, 2] - proposals[:, 0],
            proposals[:, 3] - proposals[:, 1],
        ],
        -1,
    ).astype(np.float32)
    det_cls, det_regr = jax.device_get(
        model.apply(
            variables,
            fmap,
            jnp.asarray(rois_xywh[None]),
            method=FasterRCNN.roi_heads,
            deterministic=True,
        )
    )
    ref_out = ref_detection_stage(det_cls[0], det_regr[0], rois_xywh, cfg)

    # Compare per class as sorted sets of (x1, y1, x2, y2, score).
    for c in range(cfg.n_classes - 1):
        ref_b, ref_s = ref_out[c]
        v = dev_valid[0, c]
        got = sorted(
            (round(float(b[0]), 3), round(float(b[1]), 3),
             round(float(b[2]), 3), round(float(b[3]), 3), round(float(s), 4))
            for b, s in zip(dev_boxes[0, c][v], dev_scores[0, c][v])
        )
        want = sorted(
            (round(float(b[0]), 3), round(float(b[1]), 3),
             round(float(b[2]), 3), round(float(b[3]), 3), round(float(s), 4))
            for b, s in zip(ref_b, ref_s)
        )
        assert got == want, f"class {c}: fused {got} != reference flow {want}"
