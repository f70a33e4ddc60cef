#!/usr/bin/env python
"""Measure serve.py steady-state throughput as inter-result wall gaps.

Spawns ONE serving worker (so per-process compile + session-setup costs are
paid once, off the measurement), streams panel paths through stdin, and
records the wall-clock gap between consecutive result lines.  The per-result
``sec`` field includes pipeline queue time, so gaps are the honest
throughput number (BASELINE.md round-3 serving methodology).

Example (from synth_data/):
  python /root/repo/scripts/measure_serve.py \
      --models-path models --model-name faster_rcnn_vgg16_synth5 \
      --panels data/enhanced_topo_grey/test/*.png --repeat 3 \
      --pipeline-depth 2
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
import threading
import time

import numpy as np


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--models-path", default="models")
    ap.add_argument("--model-name", required=True)
    ap.add_argument("--panels", nargs="+", required=True)
    ap.add_argument("--repeat", type=int, default=1, help="stream the panel list N times")
    ap.add_argument("--pipeline-depth", type=int, default=1)
    ap.add_argument("--warmup-size", type=int, default=0)
    ap.add_argument("--skip", type=int, default=1,
                    help="results to drop from the stats (first panel pays "
                    "session setup + any cold compiles)")
    args = ap.parse_args()

    cmd = [
        sys.executable, "/root/repo/serve.py",
        "--models-path", args.models_path,
        "--model-name", args.model_name,
        "--pipeline-depth", str(args.pipeline_depth),
    ]
    if args.warmup_size:
        cmd += ["--warmup-size", str(args.warmup_size)]

    proc = subprocess.Popen(
        cmd, stdin=subprocess.PIPE, stdout=subprocess.PIPE,
        stderr=subprocess.PIPE, text=True, bufsize=1,
    )

    ready = threading.Event()

    def watch_stderr():
        for line in proc.stderr:
            if line.strip() == "READY":
                ready.set()

    threading.Thread(target=watch_stderr, daemon=True).start()
    # NEVER kill the worker (a killed tunneled-TPU client's stale session
    # wedges the NEXT process, CLAUDE.md pitfall #2): on timeout or error,
    # close stdin so the worker drains and exits cleanly on EOF.
    if not ready.wait(timeout=2400):
        print("worker never became READY; sending EOF and waiting", file=sys.stderr)
        proc.stdin.close()
        proc.wait()
        return 1

    paths = args.panels * args.repeat
    gaps: list[float] = []
    n_dets: list[int] = []

    def feeder():
        for p in paths:
            proc.stdin.write(p + "\n")
            proc.stdin.flush()
        proc.stdin.write("\n")
        proc.stdin.flush()

    threading.Thread(target=feeder, daemon=True).start()

    t_last = time.perf_counter()
    for _ in range(len(paths)):
        line = proc.stdout.readline()
        now = time.perf_counter()
        gaps.append(now - t_last)
        t_last = now
        rec = json.loads(line)
        if "error" in rec:
            print("worker error:", rec, file=sys.stderr)
            proc.stdin.close()
            proc.wait()
            return 1
        n_dets.append(len(rec["detections"]))
    proc.stdin.close()
    proc.wait()

    steady = gaps[args.skip:] if len(gaps) > args.skip else gaps
    print(json.dumps({
        "pipeline_depth": args.pipeline_depth,
        "panels": len(paths),
        "first_result_sec": round(gaps[0], 3),
        "steady_median_sec_per_panel": round(float(np.median(steady)), 4),
        "steady_mean_sec_per_panel": round(float(np.mean(steady)), 4),
        "panels_per_sec": round(1.0 / float(np.median(steady)), 3),
        "mean_detections": round(float(np.mean(n_dets)), 1),
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
