#!/usr/bin/env python
"""Trustworthy stage ablation of the inference cascade.

`profile_cascade.py` times each stage as a separately-fetched program,
which the tunneled backend misreports (executor memoization + early
`block_until_ready` returns - CLAUDE.md pitfall #3: its stage rows sum to
10x the full-cascade time).  Like `ablate_train.py`, this script times
CUMULATIVE stage prefixes the one way the tunnel cannot lie about: a
scalar carry threads each iteration's input through the previous
iteration's output, forcing sequential real execution with a single
scalar fetch at the end.

Stage prefixes of `inference.RADNet._predict_tiles_impl`
(radnet_tpu/inference.py:225-314; reference cascade RADNet.py:543-604):

  trunk          preprocess + backbone feature map
  +rpn+props     + RPN heads + proposal decode + proposal NMS @0.7
  +roi head      + RoI pooling + detector head (cls+regr)
  FULL cascade   + per-RoI select/decode + per-class NMS @0.2

Deltas between consecutive rows attribute time to each stage.

Usage: python scripts/ablate_cascade.py [--network resnet50] [--batch 8]
       [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # v5e bf16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="resnet50")
    ap.add_argument("--batch", type=int, default=None,
                    help="tiles per batch (default config.infer_tile_batch)")
    ap.add_argument("--iters", type=int, default=30)
    args = ap.parse_args()

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
    from radnet_tpu.data.pipeline import preprocess_on_device
    from radnet_tpu.ops.proposals import batched_decode_proposals

    config = Config(network=args.network)
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    radnet = RADNet(config, model, state.params, state.batch_stats)
    variables = radnet.variables
    anchors = radnet._feat_anchors

    b = args.batch or config.infer_tile_batch
    s = config.canvas_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 64, (b, s, s, 3)).astype(np.float32) + 127)
    wh = jnp.full((b, 2), float(config.img_size), jnp.float32)

    scales = tuple(config.anchor_box_scales)
    ratios = tuple(tuple(r) for r in config.anchor_box_ratios)

    def _props(variables, imgs, wh, anchors):
        """inference.py:238-257 (trunk + RPN + proposal decode/NMS)."""
        x = preprocess_on_device(imgs)
        fmap = model.apply(variables, x, method=FasterRCNN.features)
        rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)
        props = batched_decode_proposals(
            rpn_cls, rpn_regr,
            feature_extent(wh[:, 0], config.network),
            feature_extent(wh[:, 1], config.network),
            scales=scales, ratios=ratios, stride=config.rpn_stride,
            std_scaling=config.std_scaling,
            pre_nms_top_n=config.pre_nms_top_n,
            post_nms_top_n=config.post_nms_top_n,
            nms_thresh=config.rpn_nms_thresh,
            anchors_xywh=anchors,
        )
        return fmap, props

    # Every stage takes params/anchors as jit ARGUMENTS (closing over them
    # would inline them as HLO constants and blow the remote-compile
    # transport - CLAUDE.md pitfalls #1/#10).
    @jax.jit
    def stage_trunk(carry, variables, imgs):
        x = preprocess_on_device(imgs + carry * 1e-12)
        f = model.apply(variables, x, method=FasterRCNN.features)
        return carry + f.astype(jnp.float32).mean() * 1e-12

    @jax.jit
    def stage_props(carry, variables, imgs, wh, anchors):
        _, props = _props(variables, imgs + carry * 1e-12, wh, anchors)
        return carry + (
            props.boxes.sum() + props.scores.astype(jnp.float32).sum()
        ) * 1e-12

    @jax.jit
    def stage_head(carry, variables, imgs, wh, anchors):
        fmap, props = _props(variables, imgs + carry * 1e-12, wh, anchors)
        x1, y1, x2, y2 = (props.boxes[..., i] for i in range(4))
        rois = jnp.stack([x1, y1, x2 - x1, y2 - y1], axis=-1)
        det_cls, det_regr = model.apply(
            variables, fmap, rois, method=FasterRCNN.roi_heads, deterministic=True
        )
        return carry + (
            det_cls.astype(jnp.float32).sum() + det_regr.astype(jnp.float32).sum()
        ) * 1e-12

    @jax.jit
    def stage_full(carry, variables, imgs, wh, anchors):
        out = radnet._predict_tiles_impl(variables, imgs + carry * 1e-12, wh, anchors)
        return carry + sum(o.astype(jnp.float32).sum() for o in out) * 1e-12

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)  # compile
        float(carry)  # real fetch: block_until_ready can return early here
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)  # barrier by value fetch (CLAUDE.md pitfall #3)
        return (time.perf_counter() - t0) / iters

    def flops_of(jitted, argspec):
        try:
            ca = jitted.lower(*argspec).compile().cost_analysis()
            if isinstance(ca, list):
                ca = ca[0]
            return float(ca.get("flops", float("nan")))
        except Exception:
            return float("nan")

    it = args.iters
    z = jnp.float32(0.0)
    rows = [
        ("trunk", timed(stage_trunk, (variables, images), it),
         flops_of(stage_trunk, (z, variables, images))),
        ("+rpn+props", timed(stage_props, (variables, images, wh, anchors), it),
         flops_of(stage_props, (z, variables, images, wh, anchors))),
        ("+roi head", timed(stage_head, (variables, images, wh, anchors), it),
         flops_of(stage_head, (z, variables, images, wh, anchors))),
        ("FULL cascade", timed(stage_full, (variables, images, wh, anchors), it),
         flops_of(stage_full, (z, variables, images, wh, anchors))),
    ]

    dev = jax.devices()[0]
    print(f"\ndevice={dev} batch={b} tiles @{s}^2 {config.network} "
          f"iters={it} (carry-threaded, cumulative)")
    print(f"{'prefix':<14}{'ms/batch':>10}{'ms/tile':>9}{'GFLOP':>9}{'MFU%':>6}")
    for name, dt, fl in rows:
        mfu = fl / dt / PEAK * 100 if np.isfinite(fl) else float("nan")
        print(f"{name:<14}{dt*1e3:>10.2f}{dt*1e3/b:>9.2f}"
              f"{fl/1e9 if np.isfinite(fl) else float('nan'):>9.1f}{mfu:>6.1f}")
    t = {name: dt for name, dt, _ in rows}
    print(
        "\nstage deltas (ms/batch): "
        f"rpn+decode+nms={((t['+rpn+props'] - t['trunk']) * 1e3):.2f}  "
        f"roi_head={((t['+roi head'] - t['+rpn+props']) * 1e3):.2f}  "
        f"select+classwise_nms={((t['FULL cascade'] - t['+roi head']) * 1e3):.2f}"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
