#!/usr/bin/env python
"""Sweep the inference tile-batch size on the real device.

The cascade dispatches tiles in fixed ``infer_tile_batch`` batches
(inference.py::_batch_schedule).  Larger batches amortize per-dispatch
tunnel latency and may raise MXU utilization; smaller batches waste less
tail padding on 36-tile panels.  This sweep measures, per batch size:

* device seconds/tile of the jitted tile program (perturbed inputs,
  dispatch-queue timing - the bench.py discipline);
* end-to-end pipelined panel seconds on the bench panel geometry
  (36 tiles at the reference tiling, grey 4000^2 panel).

Run on the TPU:  python scripts/sweep_tile_batch.py --batches 8 12 16 24 36
"""

from __future__ import annotations

import argparse
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batches", type=int, nargs="+", default=[8, 12, 16, 24, 36])
    ap.add_argument("--panel-runs", type=int, default=6)
    ap.add_argument("--tile-reps", type=int, default=4)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from bench import build_radnet, time_tile_batches
    from radnet_tpu.config import Config
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.inference import RADNet
    from radnet_tpu.models.detector import build_model

    dev = jax.devices()[0]
    rng = np.random.default_rng(0)
    grey = rng.integers(0, 255, (4000, 4000), dtype=np.uint8)
    panel = np.stack([grey] * 3, axis=-1)

    # One model/params shared across sweeps (same weights, fair timing).
    config = Config(network="resnet50")
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))

    results = []
    for bs in args.batches:
        cfg = Config(network="resnet50")
        cfg.infer_tile_batch = bs
        radnet = RADNet(cfg, model, state.params, state.batch_stats)

        # device-only tile time at this batch size
        batch_np = rng.normal(
            0, 1, (bs, cfg.canvas_size, cfg.canvas_size, 3)
        ).astype(np.float32)
        wh_np = np.full((bs, 2), float(cfg.img_size), np.float32)
        t0 = time.perf_counter()
        dev_tile_s = time_tile_batches(radnet, cfg, dev, args.tile_reps, batch_np, wh_np)
        compile_s = time.perf_counter() - t0

        # pipelined panel time (serving pattern)
        stream = []
        for i in range(args.panel_runs):
            p = panel.copy()
            p[i, i] ^= 0xFF
            stream.append(p)
        radnet.predict([panel])  # compile panel-path programs
        t0 = time.perf_counter()
        pending = radnet.predict_dispatch([stream[0]])
        for p in stream[1:]:
            nxt = radnet.predict_dispatch([p])
            radnet.predict_collect(pending)
            pending = nxt
        radnet.predict_collect(pending)
        pipelined = (time.perf_counter() - t0) / len(stream)

        row = {
            "infer_tile_batch": bs,
            "device_sec_per_tile": round(dev_tile_s, 5),
            "sec_per_panel_pipelined": round(pipelined, 4),
            "panels_per_sec": round(1.0 / pipelined, 3),
            "first_pass_sec": round(compile_s, 1),
        }
        results.append(row)
        print(json.dumps(row), flush=True)

    best = min(results, key=lambda r: r["sec_per_panel_pipelined"])
    print(json.dumps({"best": best}))
    return 0


if __name__ == "__main__":
    sys.exit(main())
