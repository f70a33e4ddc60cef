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
import os
import sys
import time

import numpy as np


def build_radnet(device=None, quantize=None):
    import jax
    from radnet_tpu.config import Config
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.inference import RADNet
    from radnet_tpu.models.detector import build_model

    config = Config(network="resnet50", infer_quantize=quantize)
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    params, stats = state.params, state.batch_stats
    if device is not None:
        params = jax.device_put(params, device)
        stats = jax.device_put(stats, device)
    return RADNet(config, model, params, stats), config


def time_tile_batches(radnet, config, device, n_batches: int, batch_np, wh_np):
    """Seconds per tile for the jitted tile-batch program on ``device``.

    The tunneled executor memoizes identical (executable, args) calls, so
    each iteration perturbs the batch to force real execution.
    """
    import jax
    import jax.numpy as jnp

    images = jax.device_put(jnp.asarray(batch_np), device)
    wh = jax.device_put(jnp.asarray(wh_np), device)
    # perturb WITHIN the input dtype: a float perturbation of a uint8
    # batch would silently time a different (f32-entry) specialization
    perturbed = [
        (images + jnp.asarray(i % 7 + 1, images.dtype)) for i in range(n_batches)
    ]

    def _barrier(out):
        # Scalar VALUE fetch: block_until_ready can return before device
        # completion on the tunneled backend (CLAUDE.md pitfall #3).  The
        # device stream executes in order, so forcing the last batch's
        # output forces them all; the on-device index keeps the fetch at
        # 4 bytes.
        float(jax.tree_util.tree_leaves(out)[0].ravel()[0])

    # compile
    out = radnet._predict_tiles(images, wh)
    _barrier(out)
    t0 = time.perf_counter()
    for i in range(n_batches):
        out = radnet._predict_tiles(perturbed[i], wh)
    _barrier(out)
    dt = time.perf_counter() - t0
    return dt / (n_batches * images.shape[0])


def tile_batch_np(radnet, config, rng, bs):
    """A tile batch in the production host-path contract: uint8 canvases,
    space-to-depth'd on the host for resnet50 (config.infer_host_s2d)."""
    canvases = rng.integers(
        0, 255, (bs, config.canvas_size, config.canvas_size, 3), dtype=np.uint8
    )
    if getattr(radnet, "_use_host_s2d", False):
        from radnet_tpu.data.pipeline import s2d_canvas_np

        return np.stack([s2d_canvas_np(c) for c in canvases])
    return canvases


def cascade_mfu(radnet, device_tile_sec: float, batch: int, peak_flops: float = 197e12):
    """Achieved MFU of the tile cascade from XLA's own cost model."""
    import jax
    import jax.numpy as jnp

    cfg = radnet.C
    if getattr(radnet, "_use_host_s2d", False):
        h2 = (cfg.canvas_size + 6) // 2
        images = jnp.zeros((batch, h2, h2, 12), jnp.uint8)
        mean = radnet._s2d_mean
    else:
        images = jnp.zeros((batch, cfg.canvas_size, cfg.canvas_size, 3), jnp.float32)
        mean = None
    wh = jnp.full((batch, 2), float(cfg.img_size), jnp.float32)
    try:
        comp = radnet._predict_tiles_jit.lower(
            radnet.variables, images, wh, radnet._feat_anchors, mean
        ).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")
    batch_sec = device_tile_sec * batch
    return flops / batch_sec / peak_flops


def time_train_step(config_overrides=None, n_steps: int = 60, peak_flops: float = 197e12):
    """(steps/s, images/s, train MFU) of the production training path:
    the donated fused step dispatched in ``train_bundle_steps``-step scan
    bundles, exactly as the train CLIs run it (engine/steps.py::
    make_train_bundle - bundling amortizes the fixed per-dispatch latency,
    ~11 ms/step through the tunnel, with a bit-identical trajectory).
    MFU from XLA's own cost model: compiled flops / measured step time /
    chip peak (197 TF bf16 on v5e)."""
    import jax
    import jax.numpy as jnp

    from radnet_tpu.config import Config
    from radnet_tpu.engine.steps import make_train_bundle, make_train_step
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.models.detector import build_model

    config = Config(network="vgg16", compute_dtype="bfloat16")
    for k, v in (config_overrides or {}).items():
        setattr(config, k, v)
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    train_step = make_train_step(model, config, donate=True)  # production path

    rng = np.random.default_rng(0)
    b, s, g = config.batch_size, config.canvas_size, config.max_gt_boxes
    batch = {
        "image": jnp.asarray(rng.normal(0, 1, (b, s, s, 3)).astype(np.float32)),
        "gt_boxes": jnp.asarray(
            np.tile(np.array([[[20.0, 20.0, 200.0, 200.0]] + [[0.0] * 4] * (g - 1)],
                             np.float32), (b, 1, 1))
        ),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_mask": jnp.asarray(np.tile(np.array([[True] + [False] * (g - 1)]), (b, 1))),
        "valid_wh": jnp.full((b, 2), float(config.img_size), jnp.float32),
        "sample_valid": jnp.ones((b,), bool),
    }
    key = jax.random.PRNGKey(1)
    K = max(1, int(config.train_bundle_steps))

    def _barrier(metrics):
        # A scalar VALUE fetch is the only completion barrier the tunneled
        # backend cannot misreport: block_until_ready(state.params) has
        # returned before device completion here (measured batch-8 "3445
        # steps/s" - CLAUDE.md pitfall #3).  The loop threads state, so
        # fetching the last step's loss forces the whole chain.  Bundle
        # metrics are (K,)-shaped; index down to a 4-byte fetch.
        float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0])

    if K > 1:
        bundle = make_train_bundle(model, config, K, donate=True)
        batches = [batch] * K
        state, key, metrics = bundle(state, batches, key)  # compile
        _barrier(metrics)
        n_bundles = max(1, n_steps // K)
        t0 = time.perf_counter()
        for _ in range(n_bundles):
            state, key, metrics = bundle(state, batches, key)
        _barrier(metrics)
        dt = (time.perf_counter() - t0) / (n_bundles * K)
    else:
        state, metrics = train_step(state, batch, key)  # compile
        _barrier(metrics)
        t0 = time.perf_counter()
        for i in range(n_steps):
            key, sub = jax.random.split(key)
            state, metrics = train_step(state, batch, sub)
        _barrier(metrics)
        dt = (time.perf_counter() - t0) / n_steps
    try:
        comp = train_step._jitted.lower(
            state, batch, key, train_step._anchors
        ).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        flops = float(ca.get("flops", float("nan")))
        train_mfu = flops / dt / peak_flops
    except Exception:
        train_mfu = float("nan")
    return 1.0 / dt, b / dt, train_mfu


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
    # Grey 3-channel panel - the domain's format (enhanced topographic
    # visualizations are greyscale stored as 3 identical channels), which
    # the inference engine exploits by shipping a single channel.
    grey = rng.integers(0, 255, (4000, 4000), dtype=np.uint8)
    panel = np.stack([grey] * 3, axis=-1)

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

    # Pipelined throughput - the production serving pattern (cli/serve.py):
    # one panel outstanding, panel k+1's host prep (grey detect, prescale,
    # canvas build) dispatched before panel k's results are collected, so
    # host work overlaps device compute.  Panels are perturbed per
    # iteration to defeat the executor's identical-call memoizer.
    # Steady-state measurement (BENCH_r03 lesson): a whole-stream average
    # over few panels folds the first panel's un-overlapped flight and any
    # one-off tunnel stall into every panel; the MEDIAN inter-result gap
    # over a longer stream is the number serving actually sustains and is
    # robust to the documented +-25% host-bandwidth variance.
    stream = []
    for i in range(10):
        p = panel.copy()
        p[i, i] ^= 0xFF
        stream.append(p)
    result_t = []
    pending = radnet.predict_dispatch([stream[0]])
    for p in stream[1:]:
        nxt = radnet.predict_dispatch([p])
        radnet.predict_collect(pending)
        result_t.append(time.perf_counter())
        pending = nxt
    radnet.predict_collect(pending)
    result_t.append(time.perf_counter())
    pipelined_sec = float(np.median(np.diff(result_t)))
    panels_per_sec = 1.0 / pipelined_sec

    # Device-only per-tile time for the vs-CPU ratio, in the production
    # host-path contract (uint8 canvases; host-s2d for resnet50).
    bs = config.infer_tile_batch
    batch_np = tile_batch_np(radnet, config, rng, bs)
    wh_np = np.full((bs, 2), float(config.img_size), np.float32)
    # 12 timed batches: at 4 the measurement mixes ramp effects into the
    # mean and disagrees with the 30-iteration carry-threaded ablation by
    # up to 15%; 12 keeps the run short while converging on the same
    # number (scripts/ablate_cascade.py is the cross-check).
    dev_tile_s = time_tile_batches(radnet, config, default_dev, 12, batch_np, wh_np)

    # Optional int8 RoI-head path (config.infer_quantize / --quantize int8):
    # same params, head matmuls on the MXU's int8 peak.  Device-only tile
    # time; the headline stays the full-precision parity path.
    try:
        q_radnet, q_cfg = build_radnet(quantize="int8")
        int8_tile_s = time_tile_batches(q_radnet, q_cfg, default_dev, 12, batch_np, wh_np)
    except Exception:
        int8_tile_s = float("nan")

    # vs_baseline: the CPU-proxy tile time is PINNED in BASELINE.json
    # (measured once on this host) so BENCH_r*.json is comparable across
    # rounds - the live proxy re-measurement swings ~2x run-to-run with
    # host load.  The live proxy (~50 s to measure) is only run as a
    # fallback when no pinned value exists; detail.cpu_tile_sec_live is
    # null otherwise.
    cpu_tile_live = float("nan")
    pinned_cpu_tile = float("nan")
    try:
        with open(os.path.join(os.path.dirname(os.path.abspath(__file__)), "BASELINE.json")) as f:
            pinned_cpu_tile = float(
                json.load(f).get("pinned", {}).get("cpu_tile_sec_proxy", float("nan"))
            )
    except Exception:
        pass
    if cpu_dev is not None and cpu_dev.platform != default_dev.platform:
        if not np.isfinite(pinned_cpu_tile):
            cpu_radnet, _ = build_radnet(device=cpu_dev)
            cpu_tile_live = time_tile_batches(
                cpu_radnet, config, cpu_dev, 1, batch_np, wh_np
            )
        baseline_tile = pinned_cpu_tile if np.isfinite(pinned_cpu_tile) else cpu_tile_live
        vs_baseline = baseline_tile / dev_tile_s
    elif cpu_dev is not None:
        vs_baseline = 1.0
    else:
        vs_baseline = float("nan")

    mfu = cascade_mfu(radnet, dev_tile_s, bs)
    try:
        train_steps_s, train_imgs_s, train_mfu = time_train_step()
    except Exception:
        train_steps_s, train_imgs_s, train_mfu = (float("nan"),) * 3

    print(
        json.dumps(
            {
                "metric": "panel_predict_throughput",
                "value": round(panels_per_sec, 4),
                "unit": "panels/s (4000x4000 panel, 36 tiles, resnet50, "
                "pipelined serving pattern)",
                "vs_baseline": round(vs_baseline, 2)
                if np.isfinite(vs_baseline)
                else None,
                "detail": {
                    "sec_per_panel_serial": round(panel_sec, 3),
                    "sec_per_panel_pipelined": round(pipelined_sec, 3),
                    "tiles_per_sec": round(n_tiles / pipelined_sec, 2),
                    "device_sec_per_tile": round(dev_tile_s, 5),
                    "int8_device_sec_per_tile": round(int8_tile_s, 5)
                    if np.isfinite(int8_tile_s)
                    else None,
                    "mfu": round(mfu, 3) if np.isfinite(mfu) else None,
                    "train_steps_per_sec": round(train_steps_s, 2)
                    if np.isfinite(train_steps_s)
                    else None,
                    "train_images_per_sec": round(train_imgs_s, 1)
                    if np.isfinite(train_imgs_s)
                    else None,
                    "train_mfu": round(train_mfu, 3)
                    if np.isfinite(train_mfu)
                    else None,
                    "cpu_tile_sec_pinned": round(pinned_cpu_tile, 4)
                    if np.isfinite(pinned_cpu_tile)
                    else None,
                    "cpu_tile_sec_live": round(cpu_tile_live, 4)
                    if np.isfinite(cpu_tile_live)
                    else None,
                    "compile_and_first_run_sec": round(compile_and_first, 1),
                    "device": str(default_dev),
                },
            }
        )
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
