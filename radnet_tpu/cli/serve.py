"""Long-lived serving worker: panel paths in, detections out.

The reference has no serving mode - every ``predict.py`` invocation
rebuilds the model and pays model-load + first-inference costs per panel
(/root/reference/predict.py:40-96).  On a TPU backend those costs dominate
(compilation, weight upload, and - on tunneled backends - per-process
session setup), so production serving wants ONE process that compiles the
cascade once and then streams panels through it.

Protocol (newline-delimited, stdin -> stdout):

  input   one panel image path per line (optionally ``path<TAB>out.json``
          to also write the detections to a file)
  output  one JSON object per line:
          {"path": ..., "detections": [{"label", "confidence",
           "x1", "y1", "x2", "y2"}, ...], "sec": wall_seconds}
          or {"path": ..., "error": "..."} for unreadable inputs.

A blank line or EOF ends the session; ``READY`` is printed to stderr once
the model is loaded (harness hooks: wait for it before feeding panels).

Example:
  printf '%s\n' panel1.png panel2.png | \
      python serve.py --models-path models --model-name faster_rcnn_vgg16_x
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import cv2
import numpy as np


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name", default="faster_rcnn_resnet50_raod_base")
    p.add_argument(
        "--warmup-size",
        type=int,
        default=0,
        help="run one synthetic panel of this side length through the "
        "cascade before READY, so the first real panel pays no compile",
    )
    return p


def detections_to_json(detections) -> list[dict]:
    return [
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


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache
    from radnet_tpu.inference import load_radnet

    enable_compile_cache()
    args = build_argparser().parse_args(argv)

    import os

    radnet = load_radnet(os.path.join(args.models_path, args.model_name))

    if args.warmup_size:
        s = args.warmup_size
        warm = np.zeros((s, s, 3), np.uint8)
        radnet.predict([warm] * max(1, len(radnet.C.img_types)))

    print("READY", file=sys.stderr, flush=True)

    for line in sys.stdin:
        line = line.rstrip("\n")
        if not line:
            break
        path, _, out_file = line.partition("\t")
        t0 = time.time()
        try:
            img = cv2.imdecode(np.fromfile(path, np.uint8), cv2.IMREAD_COLOR)
            if img is None:
                raise FileNotFoundError(path)
            # One panel per image type slot, like predict_from_path when a
            # single file stands in for every type (predict.py:86-95).
            dets = radnet.predict([img] * max(1, len(radnet.C.img_types)))
            result = {
                "path": path,
                "detections": detections_to_json(dets),
                "sec": round(time.time() - t0, 3),
            }
        except Exception as e:  # keep serving on bad inputs
            result = {"path": path, "error": f"{type(e).__name__}: {e}"}
        if out_file:
            with open(out_file, "w") as f:
                json.dump(result, f, indent=2)
        print(json.dumps(result), flush=True)
    return 0


if __name__ == "__main__":
    sys.exit(main())
