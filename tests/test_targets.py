"""Target assignment vs an independent loop implementation of the reference
semantics (calc_region_props, utils.py:554-822; calc_iou, rpn.py:176-296)."""

import numpy as np
import jax
import jax.numpy as jnp

from radnet_tpu.ops import targets
from radnet_tpu.ops.anchors import image_anchors_xyxy


STRIDE = 16
SCALES = (64.0, 128.0)
RATIOS = ((1.0, 1.0), (1.0, 2.0), (2.0, 1.0))
FH = FW = 12  # small 192x192 image


def _iou(a, b):
    if a[0] >= a[2] or a[1] >= a[3] or b[0] >= b[2] or b[1] >= b[3]:
        return 0.0
    x = max(a[0], b[0])
    y = max(a[1], b[1])
    w = min(a[2], b[2]) - x
    h = min(a[3], b[3]) - y
    inter = 0.0 if (w < 0 or h < 0) else w * h
    ua = (a[2] - a[0]) * (a[3] - a[1]) + (b[2] - b[0]) * (b[3] - b[1]) - inter
    return inter / (ua + 1e-6)


def loop_rpn_targets(gt, width, height):
    """Loop-based re-statement of the reference's anchor labelling
    (utils.py:616-766) with the neutral band implemented as intended."""
    n_ratios = len(RATIOS)
    n_anch = len(SCALES) * n_ratios
    overlap = np.zeros((FH, FW, n_anch))
    valid = np.zeros((FH, FW, n_anch))
    regr = np.zeros((FH, FW, 4 * n_anch))
    n_pos_per_gt = np.zeros(len(gt), int)
    best_for_gt = [None] * len(gt)  # (iou, (jy, ix, a), tgt)

    for si, s in enumerate(SCALES):
        for ri, (rw, rh) in enumerate(RATIOS):
            aw, ah = s * rw, s * rh
            a = ri + n_ratios * si
            for ix in range(FW):
                x1 = STRIDE * (ix + 0.5) - aw / 2
                x2 = STRIDE * (ix + 0.5) + aw / 2
                if x1 < 0 or x2 > width:
                    continue
                for jy in range(FH):
                    y1 = STRIDE * (jy + 0.5) - ah / 2
                    y2 = STRIDE * (jy + 0.5) + ah / 2
                    if y1 < 0 or y2 > height:
                        continue
                    btype = "neg"
                    best_loc_iou = 0.0
                    best_regr = None
                    for gi, g in enumerate(gt):
                        cur = _iou(g, (x1, y1, x2, y2))
                        cx, cy = (g[0] + g[2]) / 2, (g[1] + g[3]) / 2
                        cxa, cya = (x1 + x2) / 2, (y1 + y2) / 2
                        tgt = (
                            (cx - cxa) / (x2 - x1),
                            (cy - cya) / (y2 - y1),
                            np.log((g[2] - g[0]) / (x2 - x1)),
                            np.log((g[3] - g[1]) / (y2 - y1)),
                        )
                        if best_for_gt[gi] is None or cur > best_for_gt[gi][0]:
                            if cur > 0:
                                best_for_gt[gi] = (cur, (jy, ix, a), tgt)
                        if cur > 0.7:
                            btype = "pos"
                            n_pos_per_gt[gi] += 1
                            if cur > best_loc_iou:
                                best_loc_iou = cur
                                best_regr = tgt
                        elif 0.3 < cur < 0.7 and btype != "pos":
                            btype = "neutral"
                    if btype == "pos":
                        valid[jy, ix, a] = 1
                        overlap[jy, ix, a] = 1
                        regr[jy, ix, 4 * a : 4 * a + 4] = best_regr
                    elif btype == "neg":
                        valid[jy, ix, a] = 1

    for gi in range(len(gt)):
        if n_pos_per_gt[gi] == 0 and best_for_gt[gi] is not None:
            _, (jy, ix, a), tgt = best_for_gt[gi]
            valid[jy, ix, a] = 1
            overlap[jy, ix, a] = 1
            regr[jy, ix, 4 * a : 4 * a + 4] = tgt
    return valid, overlap, regr


def _run_jax(gt, width, height, max_regions=10_000, reference_neg_budget=True):
    g = np.zeros((8, 4), np.float32)
    mask = np.zeros(8, bool)
    g[: len(gt)] = gt
    mask[: len(gt)] = True
    return targets.rpn_targets(
        jnp.asarray(g),
        jnp.asarray(mask),
        jnp.float32(width),
        jnp.float32(height),
        jax.random.PRNGKey(0),
        feat_h=FH,
        feat_w=FW,
        scales=SCALES,
        ratios=RATIOS,
        stride=STRIDE,
        max_regions=max_regions,  # large => no subsampling
        std_scaling=4.0,
        reference_neg_budget=reference_neg_budget,
    )


def test_rpn_targets_match_loop_reference():
    rng = np.random.default_rng(7)
    for trial in range(3):
        n_gt = rng.integers(1, 5)
        xy = rng.uniform(0, 120, (n_gt, 2))
        wh = rng.uniform(20, 100, (n_gt, 2))
        gt = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
        width = height = float(FH * STRIDE)

        want_valid, want_overlap, want_regr = loop_rpn_targets(gt, width, height)
        out = _run_jax(gt, width, height)
        got_cls = np.asarray(out.y_rpn_cls)
        got_regr = np.asarray(out.y_rpn_regr)
        A = len(SCALES) * len(RATIOS)

        np.testing.assert_array_equal(got_cls[..., :A], want_valid, err_msg=f"trial {trial} valid")
        np.testing.assert_array_equal(got_cls[..., A:], want_overlap, err_msg=f"trial {trial} overlap")
        np.testing.assert_array_equal(got_regr[..., : 4 * A], np.repeat(want_overlap, 4, -1))
        np.testing.assert_allclose(
            got_regr[..., 4 * A :], want_regr * 4.0, atol=2e-3,
            err_msg=f"trial {trial} regr",
        )


def test_rpn_targets_subsampling_budget_reference_mode():
    # Dense small GT everywhere => many positives; cap must hold.
    gt = np.array(
        [[x, y, x + 64, y + 64] for x in (10, 80) for y in (10, 80)],
        np.float32,
    )
    out = _run_jax(gt, FH * STRIDE, FW * STRIDE, max_regions=16)
    cls = np.asarray(out.y_rpn_cls)
    A = len(SCALES) * len(RATIOS)
    valid = cls[..., :A]
    overlap = cls[..., A:]
    n_pos = int((valid * overlap).sum())
    n_neg = int((valid * (1 - overlap)).sum())
    assert n_pos <= 8
    # over budget => negatives rebalanced to n_pos (utils.py:802-813)
    assert n_neg == n_pos
    assert int(out.n_pos) == n_pos


def test_rpn_targets_classic_neg_budget():
    # default mode fills negatives up to max_regions - n_pos
    gt = np.array([[10.0, 10.0, 74.0, 74.0]], np.float32)
    out = _run_jax(
        gt, FH * STRIDE, FW * STRIDE, max_regions=32, reference_neg_budget=False
    )
    cls = np.asarray(out.y_rpn_cls)
    A = len(SCALES) * len(RATIOS)
    valid = cls[..., :A]
    overlap = cls[..., A:]
    n_pos = int((valid * overlap).sum())
    n_neg = int((valid * (1 - overlap)).sum())
    assert n_pos + n_neg == 32  # budget filled (plenty of negatives exist)


def test_rpn_targets_padding_masks_anchors():
    # valid extent is half the canvas; no positive/negative anchor may
    # involve the padded right/bottom half beyond the boundary rule.
    gt = np.array([[4.0, 4.0, 90.0, 90.0]], np.float32)
    out = _run_jax(gt, 96.0, 96.0)
    cls = np.asarray(out.y_rpn_cls)
    A = len(SCALES) * len(RATIOS)
    anchors = np.asarray(image_anchors_xyxy(FH, FW, SCALES, RATIOS, STRIDE))
    inside = (
        (anchors[..., 0] >= 0)
        & (anchors[..., 1] >= 0)
        & (anchors[..., 2] <= 96.0)
        & (anchors[..., 3] <= 96.0)
    )
    valid = cls[..., :A].astype(bool)
    assert not np.any(valid & ~inside)


def ref_calc_iou(R, gta, gt_classes, n_classes, std):
    """Loop re-statement of calc_iou (rpn.py:176-296), feature coords."""
    rois, y1s, y2s = [], [], []
    for r in R:
        x1, y1, x2, y2 = (int(round(v)) for v in r)
        best_iou, best_g = 0.0, -1
        for gi, g in enumerate(gta):
            cur = _iou((g[0], g[1], g[2], g[3]), (x1, y1, x2, y2))
            if cur > best_iou:
                best_iou, best_g = cur, gi
        if best_iou < 0.1:
            continue
        w, h = x2 - x1, y2 - y1
        rois.append([x1, y1, w, h])
        onehot = [0] * n_classes
        coords = [0.0] * (4 * (n_classes - 1))
        labels = [0.0] * (4 * (n_classes - 1))
        if best_iou >= 0.5:
            cls = gt_classes[best_g]
            g = gta[best_g]
            cxg, cyg = (g[0] + g[2]) / 2, (g[1] + g[3]) / 2
            cx, cy = x1 + w / 2, y1 + h / 2
            tx, ty = (cxg - cx) / w, (cyg - cy) / h
            tw, th = np.log((g[2] - g[0]) / w), np.log((g[3] - g[1]) / h)
            onehot[cls] = 1
            p = 4 * cls
            coords[p : p + 4] = [std[0] * tx, std[1] * ty, std[2] * tw, std[3] * th]
            labels[p : p + 4] = [1, 1, 1, 1]
        else:
            onehot[n_classes - 1] = 1
        y1s.append(onehot)
        y2s.append(labels + coords)
    return np.array(rois), np.array(y1s), np.array(y2s)


def test_proposal_targets_match_loop_reference():
    rng = np.random.default_rng(11)
    n_classes = 4
    gt_img = np.array([[32, 32, 160, 160], [200, 40, 280, 120]], np.float32)
    gt_cls = np.array([0, 2])
    gta = np.round(gt_img / STRIDE)

    # proposals: some overlapping each GT, some in background
    props = np.array(
        [
            [2, 2, 10, 10],  # on gt0 (2..10)
            [1, 1, 11, 11],
            [12, 2, 18, 8],  # on gt1 (12.5->12 ..17.5->18? rounded)
            [0, 18, 5, 22],  # background-ish, low iou
            [30, 30, 34, 34],  # far away -> dropped
        ],
        np.float32,
    )
    want_rois, want_y1, want_y2 = ref_calc_iou(
        props, gta, gt_cls, n_classes, (8.0, 8.0, 4.0, 4.0)
    )

    g = np.zeros((8, 4), np.float32)
    mask = np.zeros(8, bool)
    cls = np.zeros(8, np.int32)
    g[:2] = gt_img
    cls[:2] = gt_cls
    mask[:2] = True

    out = targets.proposal_targets(
        jnp.asarray(props),
        jnp.ones(len(props), bool),
        jnp.asarray(g),
        jnp.asarray(cls),
        jnp.asarray(mask),
        jax.random.PRNGKey(0),
        n_classes=n_classes,
        n_rois=64,  # big enough to include every kept RoI
        stride=STRIDE,
    )
    got_rois = np.asarray(out.rois)
    got_y1 = np.asarray(out.y_class)
    got_y2 = np.asarray(out.y_regr)

    # every reference-kept RoI must appear among the sampled slots with
    # identical targets
    for i in range(len(want_rois)):
        matches = np.where((got_rois == want_rois[i]).all(axis=1))[0]
        assert matches.size > 0, f"roi {want_rois[i]} missing"
        j = matches[0]
        np.testing.assert_array_equal(got_y1[j], want_y1[i])
        np.testing.assert_allclose(got_y2[j], want_y2[i], atol=1e-4)

    # the dropped proposal must not appear
    assert not np.any((got_rois == np.array([30, 30, 4, 4])).all(axis=1))
    assert int(out.n_pos) == int((want_y1[:, -1] == 0).sum())


def test_proposal_targets_no_valid_rois():
    props = jnp.asarray(np.array([[30, 30, 34, 34]], np.float32))
    out = targets.proposal_targets(
        props,
        jnp.ones(1, bool),
        jnp.zeros((4, 4), jnp.float32),
        jnp.zeros(4, jnp.int32),
        jnp.zeros(4, bool),
        jax.random.PRNGKey(0),
        n_classes=4,
        n_rois=8,
        stride=STRIDE,
    )
    assert not bool(np.asarray(out.roi_valid).any())


def test_proposal_targets_balanced_sampling():
    # 1 fg proposal + many bg (iou ~0.19 vs the gt): slots = [fg, bg...]
    props = np.array([[2, 2, 10, 10]] + [[0, 0, 6, 6]] * 10, np.float32)
    gt = np.zeros((8, 4), np.float32)
    gt[0] = [32, 32, 160, 160]
    mask = np.zeros(8, bool)
    mask[0] = True
    out = targets.proposal_targets(
        jnp.asarray(props),
        jnp.ones(len(props), bool),
        jnp.asarray(gt),
        jnp.zeros(8, jnp.int32),
        jnp.asarray(mask),
        jax.random.PRNGKey(1),
        n_classes=4,
        n_rois=8,
        stride=STRIDE,
    )
    y1 = np.asarray(out.y_class)
    n_fg_slots = int((y1[:, -1] == 0).sum())
    assert n_fg_slots == 1
    assert int(out.n_pos) == 1
    assert bool(np.asarray(out.roi_valid).all())
