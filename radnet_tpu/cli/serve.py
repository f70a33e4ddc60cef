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
          ``sec`` is wall time from reading the input line to emitting the
          result - it INCLUDES time queued behind other in-flight panels
          (grows with --pipeline-depth and input bursts).  Measure
          throughput as inter-result gaps (scripts/measure_serve.py), not
          by averaging ``sec``.

A blank line or EOF ends the session; ``READY`` is printed to stderr once
the model is loaded (harness hooks: wait for it before feeding panels).
Results are printed in input order.

Steady-state throughput is pipelined two ways: a reader thread decodes
panel k+1 while panel k is in flight, and the main loop dispatches panel
k+1's tile batches (grey-detect, cv2 prescale, canvas prep - the host
side of the cascade) to the device BEFORE collecting panel k's results,
so host prep and device compute overlap across consecutive panels (the
same overlap ``RADNet.predict_dispatch`` exploits within one call).
``--pipeline-depth N`` keeps up to N panels in flight for further
throughput at the cost of per-panel latency; results stay in input order.

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
    p.add_argument(
        "--pipeline-depth",
        type=int,
        default=1,
        help="panels kept in flight at once (>=1). Depth 1 already overlaps "
        "panel k+1's host prep with panel k's device compute; deeper "
        "pipelines additionally overlap result fetches with later panels' "
        "prep at the cost of per-panel latency. Results stay in input order.",
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
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)

    import os

    from radnet_tpu.cli.common import mesh_from_args, quantize_from_args

    radnet = load_radnet(
        os.path.join(args.models_path, args.model_name),
        mesh=mesh_from_args(args),
        quantize=quantize_from_args(args),
    )

    if args.warmup_size:
        # warmup (not a plain predict) force-compiles both tile-batch
        # program sizes, and runs once per channel rank: the device-tiling
        # programs are keyed on grey (2-D single-channel ship) vs color
        # (3-D) panels, so an all-grey warmup would leave the first real
        # color panel to pay a compile after READY (and vice versa).
        # Size the warmup like the production panels - the prescaled-panel
        # program is also keyed on the panel's bucketed shape.
        s = args.warmup_size
        rng = np.random.default_rng(0)
        color = rng.integers(1, 255, (s, s, 3), dtype=np.uint8)
        grey = np.repeat(color[..., :1], 3, axis=-1)
        radnet.warmup(grey)
        radnet.warmup(color)

    print("READY", file=sys.stderr, flush=True)

    # Reader thread: decode panel k+1 off the main thread while panel k is
    # in flight (cv2.imdecode of a giga-pixel PNG is 50-100+ ms of pure
    # host work that would otherwise sit on the serving critical path).
    import queue
    import threading

    depth = max(1, args.pipeline_depth)
    inbox: queue.Queue = queue.Queue(maxsize=depth)
    _EOF = object()

    def reader() -> None:
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
                inbox.put((path, out_file, t0, img, None))
            except Exception as e:  # keep serving on bad inputs
                inbox.put((path, out_file, t0, None, f"{type(e).__name__}: {e}"))
        inbox.put(_EOF)

    threading.Thread(target=reader, daemon=True).start()

    def emit(result: dict, out_file: str) -> None:
        if out_file:
            try:
                with open(out_file, "w") as f:
                    json.dump(result, f, indent=2)
            except OSError as e:
                # A bad output path must not kill the worker (or lose the
                # result): report it on the stdout record and keep serving.
                result = dict(result)
                result["out_file_error"] = f"{type(e).__name__}: {e}"
        print(json.dumps(result), flush=True)

    # Up to ``depth`` panels stay outstanding: dispatch k+1 (host prescale +
    # canvas prep run now, device batches queue behind k's) before
    # collecting the oldest in-flight panel.
    from collections import deque

    outstanding: deque = deque()  # (path, out_file, t0, pending), FIFO

    def collect_oldest() -> None:
        if not outstanding:
            return
        path, out_file, t0, pending = outstanding.popleft()
        try:
            dets = radnet.predict_collect(pending)
            result = {
                "path": path,
                "detections": detections_to_json(dets),
                "sec": round(time.time() - t0, 3),
            }
        except Exception as e:
            result = {"path": path, "error": f"{type(e).__name__}: {e}"}
        emit(result, out_file)

    def drain() -> None:
        while outstanding:
            collect_oldest()

    while True:
        item = inbox.get()
        if item is _EOF:
            drain()
            break
        path, out_file, t0, img, err = item
        if err is not None:
            drain()  # preserve output order
            emit({"path": path, "error": err}, out_file)
            continue
        try:
            # The panel stands in for every configured image type
            # (predict.py:86-95); predicting it once is output-identical
            # to replicating it per type (the cross-type NMS merge of
            # identical detection sets is a dedup no-op) at 1/n_types the
            # cost.
            pending = radnet.predict_dispatch([img])
        except Exception as e:
            drain()
            emit({"path": path, "error": f"{type(e).__name__}: {e}"}, out_file)
            continue
        outstanding.append((path, out_file, t0, pending))
        while len(outstanding) > depth:
            collect_oldest()
    return 0


if __name__ == "__main__":
    sys.exit(main())
