#!/usr/bin/env python
"""Benchmark: tiled single-panel inference throughput on one chip.

Measures the headline metric from BASELINE.md - panel prediction
throughput of the full tiled cascade (backbone + RPN + proposal NMS + RoI
heads + detection NMS) - on the default device, and compares against a CPU
run of the same compiled pipeline as the baseline proxy.

Why a proxy: the reference is a Keras 2 / TF 1 program and this image
ships no TensorFlow, so the reference itself cannot execute here (see
BASELINE.md).  The reference's own pipeline is CPU-bound batch-1 python;
our CPU run of the *batched* XLA pipeline is a strictly-favourable stand-in
for it, so ``vs_baseline`` reported here is a lower bound on the speedup
over the true reference.

Prints exactly one JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""

from __future__ import annotations

import json
import sys
import time

import numpy as np


def build_radnet(device=None):
    import jax
    from radnet_tpu.config import Config
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.inference import RADNet
    from radnet_tpu.models.detector import build_model

    config = Config(network="resnet50")
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    params, stats = state.params, state.batch_stats
    if device is not None:
        params = jax.device_put(params, device)
        stats = jax.device_put(stats, device)
    return RADNet(config, model, params, stats), config


def time_tile_batches(radnet, config, device, n_batches: int, batch_np, wh_np):
    """Seconds per tile for the jitted tile-batch program on ``device``."""
    import jax
    import jax.numpy as jnp

    images = jax.device_put(jnp.asarray(batch_np), device)
    wh = jax.device_put(jnp.asarray(wh_np), device)
    # compile
    out = radnet._predict_tiles(images, wh)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n_batches):
        out = radnet._predict_tiles(images, wh)
    jax.block_until_ready(out)
    dt = time.perf_counter() - t0
    return dt / (n_batches * images.shape[0])


def _enable_compile_cache():
    """Persist compiled executables across runs (the axon tunnel makes
    first compiles expensive; the cache amortizes them)."""
    import jax

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass


def main() -> int:
    _enable_compile_cache()
    import jax

    default_dev = jax.devices()[0]
    try:
        cpu_dev = jax.devices("cpu")[0]
    except RuntimeError:
        cpu_dev = None

    radnet, config = build_radnet()

    # Synthetic 4000x4000 panel -> 36 tiles at the reference geometry
    # (tile 2000, step 400 - config.py:36-37).
    rng = np.random.default_rng(0)
    panel = rng.integers(0, 255, (4000, 4000, 3), dtype=np.uint8)

    from radnet_tpu.data.tiling import plan_tiles

    tiles = plan_tiles(panel.shape[1], panel.shape[0], config.tile_size, config.tile_overlap)
    n_tiles = len(tiles)

    # Full host->device predict (includes tiling, resize, merge).
    t0 = time.perf_counter()
    radnet.predict([panel])  # compile + first run
    compile_and_first = time.perf_counter() - t0
    runs = 3
    t0 = time.perf_counter()
    for _ in range(runs):
        radnet.predict([panel])
    panel_sec = (time.perf_counter() - t0) / runs
    panels_per_sec = 1.0 / panel_sec

    # Device-only per-tile time for the vs-CPU ratio.
    bs = config.infer_tile_batch
    batch_np = rng.normal(0, 1, (bs, config.canvas_size, config.canvas_size, 3)).astype(
        np.float32
    )
    wh_np = np.full((bs, 2), float(config.img_size), np.float32)
    dev_tile_s = time_tile_batches(radnet, config, default_dev, 4, batch_np, wh_np)

    vs_baseline = float("nan")
    if cpu_dev is not None and cpu_dev.platform != default_dev.platform:
        cpu_radnet, _ = build_radnet(device=cpu_dev)
        cpu_tile_s = time_tile_batches(cpu_radnet, config, cpu_dev, 1, batch_np, wh_np)
        vs_baseline = cpu_tile_s / dev_tile_s
    elif cpu_dev is not None:
        vs_baseline = 1.0

    print(
        json.dumps(
            {
                "metric": "panel_predict_throughput",
                "value": round(panels_per_sec, 4),
                "unit": "panels/s (4000x4000 panel, 36 tiles, resnet50)",
                "vs_baseline": round(vs_baseline, 2)
                if np.isfinite(vs_baseline)
                else None,
                "detail": {
                    "sec_per_panel": round(panel_sec, 3),
                    "tiles_per_sec": round(n_tiles / panel_sec, 2),
                    "device_sec_per_tile": round(dev_tile_s, 4),
                    "compile_and_first_run_sec": round(compile_and_first, 1),
                    "device": str(default_dev),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
