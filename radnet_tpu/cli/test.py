"""Evaluation driver - counterpart of /root/reference/test.py.

Full test-set inference + VOC mAP: per-image tiled prediction with
wall-clock timing, annotated panel PNGs under ``<model>/test/``, per-class
AP and mAP, a precision/recall curve PNG under ``viz/``, and
``test_accuracy.json`` (test.py:177-262).  Panels are pipelined through
the device (dispatch k+1 before collecting k), unlike the reference's
strictly serial loop (test.py:202-205).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

import numpy as np

from radnet_tpu.cli.common import draw_detections
from radnet_tpu.data.dataset import get_data, get_image
from radnet_tpu.evaluation import evaluate_detections
from radnet_tpu.inference import load_radnet


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name", default="faster_rcnn_resnet50_raod_base")
    p.add_argument("--test-annot", default="data/test.csv")
    p.add_argument("--test-data", default="data/test")
    p.add_argument("--gt-iou-threshold", type=float, default=0.5)  # test.py:42
    p.add_argument("--viz-img-type", default=None,
                   help="image type used for the annotated output PNGs")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument(
        "--coco-map",
        action="store_true",
        help="also report COCO-style mAP@[.5:.95] (per-threshold APs written "
        "to test_accuracy_coco.json; test_accuracy.json stays in the "
        "reference's single-threshold format)",
    )
    p.add_argument(
        "--compare",
        default=None,
        metavar="REF_JSON",
        help="path to a reference-format test_accuracy.json "
        "(/root/reference/test.py:258-259); prints per-class AP deltas and "
        "a pass/fail verdict against the 0.5-pt mAP parity target, so "
        "parity is one command the day reference numbers exist",
    )
    p.add_argument(
        "--parity-tolerance",
        type=float,
        default=0.005,
        help="max acceptable mAP shortfall vs --compare (0.005 = 0.5 pts)",
    )
    from radnet_tpu.cli.common import (
        add_mesh_args,
        add_platform_arg,
        add_quantize_arg,
    )

    add_mesh_args(p)
    add_platform_arg(p)
    add_quantize_arg(p)
    return p


def compare_accuracy(
    ours: dict, ref: dict, tolerance: float = 0.005
) -> tuple[bool, str]:
    """Per-class AP deltas + a parity verdict vs a reference accuracy dict.

    Returns ``(parity_ok, report)``.  Parity = our mAP is no more than
    ``tolerance`` below the reference's (exceeding it is fine); per-class
    rows are informational.  Classes missing on either side are reported
    as n/a and excluded from the verdict (the reference may have been run
    on a different class subset).
    """
    lines = [f"{'class':<12} {'ref AP':>8} {'ours':>8} {'delta':>8}"]
    for key in sorted((set(ref) | set(ours)) - {"mAP"}):
        r, o = ref.get(key), ours.get(key)
        if r is None or o is None:
            lines.append(f"{key:<12} {r if r is not None else 'n/a':>8} "
                         f"{o if o is not None else 'n/a':>8} {'n/a':>8}")
            continue
        lines.append(f"{key:<12} {r:>8.4f} {o:>8.4f} {o - r:>+8.4f}")
    r_map, o_map = ref.get("mAP"), ours.get("mAP")
    if r_map is None or o_map is None:
        lines.append("mAP missing on one side; no verdict")
        return False, "\n".join(lines)
    delta = o_map - r_map
    ok = delta >= -tolerance
    lines.append(f"{'mAP':<12} {r_map:>8.4f} {o_map:>8.4f} {delta:>+8.4f}")
    lines.append(
        f"PARITY {'OK' if ok else 'FAIL'}: mAP delta {delta:+.4f} "
        f"(tolerance -{tolerance:.4f})"
    )
    return ok, "\n".join(lines)


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)
    model_path = os.path.join(args.models_path, args.model_name)

    from radnet_tpu.cli.common import mesh_from_args, quantize_from_args

    print("\n\nMaking predictions on TEST data.")
    radnet = load_radnet(
        model_path, mesh=mesh_from_args(args), quantize=quantize_from_args(args)
    )
    data_test, _, _ = get_data(args.test_annot, args.test_data, radnet.C.img_types)
    if args.limit:
        data_test = data_test[: args.limit]

    all_dets: list = []
    all_gt: list = []
    elapsed = []
    viz_type = args.viz_img_type or radnet.C.img_types[0]

    def _load(img_meta):
        """predict_from_path's image loading (RADNet.py:482-500), split out
        so the next panel's decode can overlap the device flight."""
        if radnet.C.use_img_type:
            return [
                get_image(img_meta["filepath"], [t], random_type=False)
                for t in radnet.C.img_types
            ]
        return [get_image(img_meta["filepath"], radnet.C.img_types, random_type=False)]

    def _finish(img_meta, detections):
        try:
            img = get_image(
                img_meta["filepath"], [viz_type], random_type=False, writable=True
            )
            draw_detections(img, detections)
            import cv2

            out_name = img_meta["filepath"].split("/")[-1]
            cv2.imwrite(os.path.join(model_path, "test", out_name), img)
        except FileNotFoundError:
            pass

        all_dets.extend(detections)
        all_gt.extend(img_meta["bboxes"])

    # Pipelined eval: dispatch panel k+1 before collecting panel k, so
    # host decode/merge/PNG work overlaps device compute (the same
    # dispatch/collect overlap serve.py and bench.py use; results are
    # pinned identical to serial predict() by test).  The reference
    # predicts strictly serially and reports per-image wall time
    # (test.py:202-205); here "Average prediction time" is the honest
    # pipelined equivalent - mean inter-completion gap.
    pending = None
    t_last = time.time()
    for idx, img_meta in enumerate(data_test):
        print(f"{img_meta['filepath']} ({idx + 1}/{len(data_test)})")
        handles = radnet.predict_dispatch(_load(img_meta))
        if pending is not None:
            prev_meta, prev_handles = pending
            detections = radnet.predict_collect(prev_handles)
            elapsed.append(time.time() - t_last)
            t_last = time.time()
            _finish(prev_meta, detections)
        pending = (img_meta, handles)
    if pending is not None:
        prev_meta, prev_handles = pending
        detections = radnet.predict_collect(prev_handles)
        elapsed.append(time.time() - t_last)
        _finish(prev_meta, detections)

    result = evaluate_detections(all_dets, all_gt, args.gt_iou_threshold)

    # PR curve (test.py:231-256).
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    plt.figure(figsize=(12, 12))
    for key, curve in result["curves"].items():
        ap = result["per_class"][key]
        (line,) = plt.plot(
            curve["recall"], curve["precision"], linestyle="-",
            label=f"{key}: {100 * ap:.2f} %",
        )
        plt.plot(
            curve["interpolated_recall"], curve["interpolated_precision"],
            linestyle="--", color=line.get_color(),
        )
        print(f"{key} AP: {ap}\n")

    plt.ylabel("Precision (TP / TP + FP)")
    plt.xlabel("Recall (TP / TP + FN)")
    plt.ylim(0.0, 1.0)
    plt.xlim(0.0, 1.0)
    plt.title(f"mAP: {100 * result['mAP']:.2f} %")
    plt.legend()
    os.makedirs(os.path.join(model_path, "viz"), exist_ok=True)
    plt.savefig(os.path.join(model_path, "viz", "precision_recall.png"))

    accuracy = dict(result["per_class"])
    accuracy["mAP"] = result["mAP"]
    with open(os.path.join(model_path, "test_accuracy.json"), "w") as f:
        json.dump(accuracy, f, indent=4)

    print("mAP: " + str(result["mAP"]))
    if args.coco_map:
        from radnet_tpu.evaluation import evaluate_detections_multi

        coco = evaluate_detections_multi(all_dets, all_gt)
        with open(os.path.join(model_path, "test_accuracy_coco.json"), "w") as f:
            json.dump(coco, f, indent=4)
        print(
            f"mAP@[.5:.95]: {coco['mAP_50_95']:.4f}  "
            f"(AP50 {coco['AP50']:.4f}, AP75 {coco['AP75']:.4f})"
        )
    if elapsed:
        # Reference metric (test.py:262) first; the steady-state line
        # excludes panel 0, which pays the per-process compile + session
        # stall on the tunneled backend (CLAUDE.md pitfall #2).
        print(f"Average prediction time: {np.mean(elapsed):.3f}s")
        if len(elapsed) > 1:
            print(
                f"Steady-state prediction time (excl. first panel): "
                f"{np.mean(elapsed[1:]):.3f}s"
            )

    if args.compare:
        with open(args.compare) as f:
            ref = json.load(f)
        ok, report = compare_accuracy(accuracy, ref, args.parity_tolerance)
        print("\nParity vs " + args.compare)
        print(report)
        return 0 if ok else 2
    return 0


if __name__ == "__main__":
    sys.exit(main())
