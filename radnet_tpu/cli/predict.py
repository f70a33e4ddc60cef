"""Single-panel prediction driver - counterpart of /root/reference/predict.py.

Resolves the scan directory's per-type file layout (predict.py:56-85),
predicts across all configured image types, and writes the reference's
artifacts: ``img/predictions/{all,boat,human,other}_predictions.png`` and
``arrays/predictions.json`` (predict.py:96-181).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
from pathlib import Path

import cv2
import numpy as np

from radnet_tpu.cli.common import draw_detections
from radnet_tpu.inference import load_radnet


def resolve_type_path(scan_path: str, img_type: str) -> Path:
    """Map an image type to its file inside the scan layout
    (predict.py:59-81)."""
    path = Path(scan_path) / "img"
    grey = "grey" in img_type
    if "enhanced_topo" in img_type:
        path = path / "enhanced_topo_maps"
        name = (
            "enhanced_topo_map_object_level_grey.png"
            if grey
            else "enhanced_topo_map_object_level.png"
        )
    elif "blended_map" in img_type:
        path = path / "blended_maps"
        name = (
            "blended_map_object_level_grey.png"
            if grey
            else "blended_topo_map_object_level.png"
        )
    elif "topo" in img_type:
        path = path / "topo_maps"
        name = "topo_map_object_level_grey.png" if grey else "topo_map_object_level.png"
    else:
        raise ValueError(f"unknown image type {img_type!r}")
    return path / name


def _read(path: Path) -> np.ndarray:
    img = cv2.imdecode(np.fromfile(str(path), np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(path)
    return img


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name", default="faster_rcnn_resnet50_raod_base")
    p.add_argument("--scan-data-path", required=True)
    from radnet_tpu.cli.common import (
        add_mesh_args,
        add_platform_arg,
        add_quantize_arg,
    )

    add_mesh_args(p)
    add_platform_arg(p)
    add_quantize_arg(p)
    return p


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)
    model_path = os.path.join(args.models_path, args.model_name)

    from radnet_tpu.cli.common import mesh_from_args, quantize_from_args

    print("\n\nMaking predictions.")
    radnet = load_radnet(
        model_path, mesh=mesh_from_args(args), quantize=quantize_from_args(args)
    )

    images = [
        _read(resolve_type_path(args.scan_data_path, t)) for t in radnet.C.img_types
    ]
    detections = radnet.predict(images)

    viz_path = (
        Path(args.scan_data_path) / "img" / "blended_maps" / "blended_map_object_level_grey.png"
    )
    pred_dir = Path(args.scan_data_path) / "img" / "predictions"
    pred_dir.mkdir(parents=True, exist_ok=True)
    arr_dir = Path(args.scan_data_path) / "arrays"
    arr_dir.mkdir(parents=True, exist_ok=True)

    predictions = [
        {
            "label": d["class"],
            "confidence": float(d["prob"]),
            "x1": int(d["x1"]),
            "y1": int(d["y1"]),
            "x2": int(d["x2"]),
            "y2": int(d["y2"]),
        }
        for d in detections
    ]
    with open(arr_dir / "predictions.json", "w") as f:
        json.dump(predictions, f, indent=4)

    def render(filter_fn, out_name, color):
        try:
            img = _read(viz_path)
        except FileNotFoundError:
            return
        chosen = [d for d in detections if filter_fn(d)]
        if color is None:
            draw_detections(img, chosen)
        else:
            for d in chosen:
                cv2.rectangle(img, (d["x1"], d["y1"]), (d["x2"], d["y2"]), color, 8)
        cv2.imwrite(str(pred_dir / out_name), img)

    render(lambda d: True, "all_predictions.png", None)
    render(lambda d: d["class"] == "boat", "boat_predictions.png", (28, 26, 228))
    render(lambda d: d["class"] == "human", "human_predictions.png", (184, 126, 55))
    render(
        lambda d: d["class"] not in ("boat", "human"),
        "other_predictions.png",
        (0, 127, 255),
    )
    print(f"{len(detections)} detections written.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
