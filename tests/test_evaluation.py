"""VOC mAP evaluation semantics (test.py:48-173 behaviour)."""

import numpy as np

from radnet_tpu.evaluation import (
    evaluate_detections,
    evaluate_detections_multi,
    interpolated_average_precision,
    match_detections,
)


def det(cls, prob, box):
    return {"class": cls, "prob": prob, "x1": box[0], "y1": box[1], "x2": box[2], "y2": box[3]}


def gt(cls, box):
    return {"class": cls, "x1": box[0], "y1": box[1], "x2": box[2], "y2": box[3]}


def test_perfect_detection_ap():
    # Reference AP quirk preserved (test.py:169-172): the Riemann sum runs
    # over consecutive recall points only, so the first segment (0 -> r[0])
    # never contributes.  Two perfect hits therefore give AP = 0.5, not 1.
    dets = [
        det("boat", 0.9, (0, 0, 10, 10)),
        det("boat", 0.7, (50, 50, 60, 60)),
    ]
    gts = [gt("boat", (0, 0, 10, 10)), gt("boat", (50, 50, 60, 60))]
    result = evaluate_detections(dets, gts)
    np.testing.assert_allclose(result["per_class"]["boat"], 0.5)


def test_unmatched_gt_becomes_false_negative():
    dets = [det("boat", 0.9, (0, 0, 10, 10))]
    gts = [gt("boat", (0, 0, 10, 10)), gt("boat", (50, 50, 60, 60))]
    T, P = match_detections(dets, gts)
    assert T["boat"] == [1, 1]
    assert P["boat"] == [0.9, 0.0]
    # The FN row carries score 0 and is excluded from tp/fp counting
    # (test.py:135-138), so recall never grows past the matched point and
    # the interpolated sum collapses to 0 - reference semantics.
    result = evaluate_detections(dets, gts)
    assert result["per_class"]["boat"] == 0.0


def test_each_gt_matched_once():
    # two predictions on the same GT: only the higher-prob one matches
    dets = [det("boat", 0.9, (0, 0, 10, 10)), det("boat", 0.8, (1, 1, 10, 10))]
    gts = [gt("boat", (0, 0, 10, 10))]
    T, _ = match_detections(dets, gts)
    assert T["boat"] == [1, 0]


def test_wrong_class_never_matches():
    dets = [det("human", 0.9, (0, 0, 10, 10))]
    gts = [gt("boat", (0, 0, 10, 10))]
    T, P = match_detections(dets, gts)
    assert T["human"] == [0]
    assert T["boat"] == [1] and P["boat"] == [0.0]


def test_multi_threshold_map():
    """mAP@[.5:.95]: AP@0.50 must equal the single-threshold evaluation
    exactly; a detection at IoU ~0.68 counts below 0.68 and not above,
    so the averaged mAP sits strictly between the extremes."""
    # IoU of (0,0,10,10) vs (0,0,10,14.7) = 10*10 / (10*14.7) = 0.680...
    dets = [
        det("boat", 0.9, (0, 0, 10, 10)),
        det("boat", 0.7, (50, 50, 60, 60)),  # exact hit at every threshold
    ]
    gts = [gt("boat", (0, 0, 10, 14.7)), gt("boat", (50, 50, 60, 60))]
    coco = evaluate_detections_multi(dets, gts)
    single = evaluate_detections(dets, gts, 0.5)
    np.testing.assert_allclose(coco["AP50"], single["mAP"])
    assert set(coco["per_threshold"]) == {f"{0.5 + 0.05 * i:.2f}" for i in range(10)}
    # thresholds .50-.65 (4): both match; .70+ (6): only the exact hit.
    ap_lo = coco["per_threshold"]["0.50"]["mAP"]
    ap_hi = coco["per_threshold"]["0.95"]["mAP"]
    assert ap_lo > ap_hi
    np.testing.assert_allclose(
        coco["mAP_50_95"], (4 * ap_lo + 6 * ap_hi) / 10
    )
    assert coco["per_class_avg"]["boat"] == coco["mAP_50_95"]
    assert coco["AP75"] == ap_hi


def test_interpolated_ap_matches_hand_computed():
    # 3 preds sorted: hit(0.9), miss(0.8), hit(0.7); 2 GT total.
    y_true = [1, 0, 1]
    y_score = [0.9, 0.8, 0.7]
    ap, precision, recall, ip, ir = interpolated_average_precision(y_true, y_score)
    np.testing.assert_allclose(precision, [1.0, 0.5, 2 / 3])
    np.testing.assert_allclose(recall, [0.5, 0.5, 1.0])
    # interp precision: from the right, running max = [1, 2/3, 2/3]
    np.testing.assert_allclose(ip, [1.0, 2 / 3, 2 / 3])
    # Riemann sum: 2/3*(0.5-0.5) + 2/3*(1-0.5) = 1/3
    np.testing.assert_allclose(ap, 1 / 3)
