#!/usr/bin/env python
"""Stage-by-stage timing + MFU of the inference cascade on the default device.

Splits the fused tile program (inference.RADNet._predict_tiles_impl) into
its stages, times each compiled piece separately, and reports achieved
FLOP/s against the XLA cost model (``compiled.cost_analysis()['flops']``).

Usage: python scripts/profile_cascade.py [--network resnet50] [--batch 8]
       [--trace-dir /tmp/trace]  (trace-dir writes a jax.profiler trace)
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

# v5e bf16 peak; used only for the MFU denominator.
PEAK_FLOPS = {"TPU v5 lite": 197e12, "TPU v5e": 197e12}
DEFAULT_PEAK = 197e12


def timed(fn, args, iters=8):
    """NOTE (CLAUDE.md pitfall #3): on the tunneled backend the executor
    memoizes identical calls and block_until_ready can return early, so
    stage times here are best-effort lower bounds; cross-check against
    fetch-inclusive end-to-end numbers (bench.py).  Inputs are perturbed
    per iteration to at least defeat the memoizer."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)

    def perturb(a, i):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 3:
            return a + jnp.asarray(i, a.dtype)
        return a

    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*[perturb(a, i) for a in args])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters, out


def flops_of(jitted, args):
    try:
        comp = jitted.lower(*args).compile()
        ca = comp.cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="resnet50")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--trace-dir", default=None)
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radnet_tpu.config import Config
    from radnet_tpu.engine.steps import feature_extent
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.inference import RADNet
    from radnet_tpu.models.detector import FasterRCNN, build_model
    from radnet_tpu.ops.proposals import batched_decode_proposals

    config = Config(network=args.network)
    if args.batch:
        config.infer_tile_batch = args.batch
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    radnet = RADNet(config, model, state.params, state.batch_stats)
    variables = radnet.variables

    bs = config.infer_tile_batch
    s = config.canvas_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 1, (bs, s, s, 3)).astype(np.float32))
    wh = jnp.full((bs, 2), float(config.img_size), jnp.float32)
    dev = jax.devices()[0]
    peak = next(
        (v for k, v in PEAK_FLOPS.items() if k in str(getattr(dev, "device_kind", ""))),
        DEFAULT_PEAK,
    )

    # ---------------- stage programs ---------------- #
    @jax.jit
    def stage_features(variables, images):
        return model.apply(variables, images, method=FasterRCNN.features)

    @jax.jit
    def stage_rpn_props(variables, fmap, wh, anchors):
        rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)
        props = batched_decode_proposals(
            rpn_cls,
            rpn_regr,
            feature_extent(wh[:, 0], config.network),
            feature_extent(wh[:, 1], config.network),
            scales=tuple(config.anchor_box_scales),
            ratios=tuple(tuple(r) for r in config.anchor_box_ratios),
            stride=config.rpn_stride,
            std_scaling=config.std_scaling,
            pre_nms_top_n=config.pre_nms_top_n,
            post_nms_top_n=config.post_nms_top_n,
            nms_thresh=config.rpn_nms_thresh,
            anchors_xywh=anchors,
        )
        return props.boxes, props.scores, props.valid

    @jax.jit
    def stage_roi_heads(variables, fmap, rois):
        return model.apply(
            variables, fmap, rois, method=FasterRCNN.roi_heads, deterministic=True
        )

    full = radnet._predict_tiles_jit

    # ---------------- run ---------------- #
    fmap = stage_features(variables, images)
    boxes, scores, valid = stage_rpn_props(variables, fmap, wh, radnet._feat_anchors)
    x1, y1, x2, y2 = (boxes[..., i] for i in range(4))
    rois = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)

    rows = []
    for name, fn, fargs in (
        ("features (trunk)", stage_features, (variables, images)),
        ("rpn+decode+nms", stage_rpn_props, (variables, fmap, wh, radnet._feat_anchors)),
        ("roi_heads", stage_roi_heads, (variables, fmap, rois)),
        ("FULL cascade", full, (variables, images, wh, radnet._feat_anchors)),
    ):
        dt, _ = timed(fn, fargs)
        fl = flops_of(fn, fargs)
        rows.append((name, dt, fl))

    print(f"\ndevice={dev} peak={peak/1e12:.0f} TF bf16  batch={bs} tiles @{s}^2 {args.network}")
    print(f"{'stage':<20}{'ms/batch':>10}{'ms/tile':>9}{'GFLOP':>9}{'TFLOP/s':>9}{'MFU%':>6}")
    for name, dt, fl in rows:
        tf = fl / dt / 1e12 if np.isfinite(fl) else float("nan")
        print(
            f"{name:<20}{dt*1e3:>10.2f}{dt*1e3/bs:>9.2f}{fl/1e9:>9.1f}"
            f"{tf:>9.1f}{100*tf*1e12/peak:>6.1f}"
        )

    if args.trace_dir:
        import jax.profiler

        with jax.profiler.trace(args.trace_dir):
            out = full(variables, images, wh, radnet._feat_anchors)
            jax.block_until_ready(out)
        print(f"trace written to {args.trace_dir}")
    return 0


if __name__ == "__main__":
    import sys

    sys.exit(main())
