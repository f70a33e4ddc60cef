"""RPN-recall debug driver - counterpart of /root/reference/test_rpn.py.

Draws the raw stage-1 region proposals for each test image via
``RADNet.predict_region_proposals`` (test_rpn.py:121) and reports the
fraction of GT boxes recalled by at least one proposal at IoU 0.5 - a
usable summary where the reference's mAP block was commented out
(test_rpn.py:146-168).
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2

from radnet_tpu.data.dataset import get_data, get_image
from radnet_tpu.evaluation import box_iou
from radnet_tpu.inference import load_radnet


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name", default="faster_rcnn_resnet50_raod_base")
    p.add_argument("--annot", default="data/train.csv")
    p.add_argument("--data", default="data/train")
    p.add_argument("--limit", type=int, default=None)
    p.add_argument("--iou", type=float, default=0.5)
    from radnet_tpu.cli.common import add_mesh_args, add_platform_arg

    add_mesh_args(p)
    add_platform_arg(p)
    return p


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)
    model_path = os.path.join(args.models_path, args.model_name)
    out_dir = os.path.join(model_path, "test_rpn")
    os.makedirs(out_dir, exist_ok=True)

    from radnet_tpu.cli.common import mesh_from_args

    radnet = load_radnet(model_path, mesh=mesh_from_args(args))
    data, _, _ = get_data(args.annot, args.data, radnet.C.img_types)
    if args.limit:
        data = data[: args.limit]

    recalled = total = 0
    for idx, img_meta in enumerate(data):
        img = get_image(
            img_meta["filepath"], radnet.C.img_types, random_type=False, writable=True
        )
        proposals = radnet.predict_region_proposals(img)
        print(f"{img_meta['filepath']}: {len(proposals)} proposals")

        for p in proposals:
            cv2.rectangle(img, (p["x1"], p["y1"]), (p["x2"], p["y2"]), (255, 255, 255), 4)
        for g in img_meta["bboxes"]:
            cv2.rectangle(img, (g["x1"], g["y1"]), (g["x2"], g["y2"]), (0, 255, 0), 4)
            total += 1
            if any(
                box_iou(
                    (p["x1"], p["y1"], p["x2"], p["y2"]),
                    (g["x1"], g["y1"], g["x2"], g["y2"]),
                )
                >= args.iou
                for p in proposals
            ):
                recalled += 1
        cv2.imwrite(
            os.path.join(out_dir, img_meta["filepath"].split("/")[-1]), img
        )

    if total:
        print(f"RPN recall@{args.iou}: {recalled}/{total} = {recalled / total:.3f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
