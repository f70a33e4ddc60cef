#!/usr/bin/env python
"""A/B probes inside the proposal stage (rpn heads / decode+topk / NMS).

The cascade ablation attributes 3.8 ms/8-tile batch to rpn+decode+NMS;
this decomposes it (carry-threaded, scalar value fetch - CLAUDE.md
pitfall #3) and A/Bs the candidate cost levers (pre_nms_top_n, the
fixed-point dominance iteration).

Usage: python scripts/probe_props.py [--batch 8] [--iters 30]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=8)
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
    from radnet_tpu.ops.nms import topk_candidates

    config = Config(network="resnet50")
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    radnet = RADNet(config, model, state.params, state.batch_stats)
    variables = radnet.variables
    anchors = radnet._feat_anchors

    b, s = args.batch, config.canvas_size
    rng = np.random.default_rng(0)
    images = jnp.asarray(rng.normal(0, 64, (b, s, s, 3)).astype(np.float32) + 127)
    wh = jnp.full((b, 2), float(config.img_size), jnp.float32)
    scales = tuple(config.anchor_box_scales)
    ratios = tuple(tuple(r) for r in config.anchor_box_ratios)

    def props_fn(pre_n):
        @jax.jit
        def fn(carry, variables, imgs, wh, anchors):
            x = preprocess_on_device(imgs + carry * 1e-12)
            fmap = model.apply(variables, x, method=FasterRCNN.features)
            rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)
            props = batched_decode_proposals(
                rpn_cls, rpn_regr,
                feature_extent(wh[:, 0], config.network),
                feature_extent(wh[:, 1], config.network),
                scales=scales, ratios=ratios, stride=config.rpn_stride,
                std_scaling=config.std_scaling,
                pre_nms_top_n=pre_n,
                post_nms_top_n=config.post_nms_top_n,
                nms_thresh=config.rpn_nms_thresh,
                anchors_xywh=anchors,
            )
            return carry + (props.boxes.sum() + props.scores.sum()) * 1e-12

        return fn

    @jax.jit
    def rpn_only(carry, variables, imgs):
        x = preprocess_on_device(imgs + carry * 1e-12)
        fmap = model.apply(variables, x, method=FasterRCNN.features)
        rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)
        return carry + (
            rpn_cls.astype(jnp.float32).sum() + rpn_regr.astype(jnp.float32).sum()
        ) * 1e-12

    @jax.jit
    def decode_topk_only(carry, variables, imgs, wh, anchors):
        """Everything up to (and incl.) the pre-NMS top-k, no NMS."""
        from radnet_tpu.geometry import decode_boxes

        x = preprocess_on_device(imgs + carry * 1e-12)
        fmap = model.apply(variables, x, method=FasterRCNN.features)
        rpn_cls, rpn_regr = model.apply(variables, fmap, method=FasterRCNN.rpn)

        def one(cls_i, regr_i, fw, fh):
            fh_, fw_, na = cls_i.shape
            deltas = regr_i.astype(jnp.float32).reshape(fh_, fw_, na, 4) / config.std_scaling
            bx = decode_boxes(anchors, deltas, round_outputs=True)
            xy, w_, h_ = bx[..., :2], jnp.maximum(bx[..., 2], 1.0), jnp.maximum(bx[..., 3], 1.0)
            x1 = jnp.clip(bx[..., 0], 0.0, fw - 1.0)
            y1 = jnp.clip(bx[..., 1], 0.0, fh - 1.0)
            x2 = jnp.clip(bx[..., 0] + w_, 0.0, fw - 1.0)
            y2 = jnp.clip(bx[..., 1] + h_, 0.0, fh - 1.0)
            boxes = jnp.stack([x1, y1, x2, y2], -1).reshape(-1, 4)
            scores = cls_i.astype(jnp.float32).reshape(-1)
            valid = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            return topk_candidates(boxes, scores, valid, 2048)

        out = jax.vmap(one)(
            rpn_cls, rpn_regr,
            feature_extent(wh[:, 0], config.network),
            feature_extent(wh[:, 1], config.network),
        )
        return carry + (out[0].sum() + out[1].sum()) * 1e-12

    def timed(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)
        float(carry)
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)
        return (time.perf_counter() - t0) / iters

    it = args.iters
    rows = [
        ("rpn heads only", timed(rpn_only, (variables, images), it)),
        ("+decode+topk(2048)", timed(decode_topk_only, (variables, images, wh, anchors), it)),
        ("full props pre=2048", timed(props_fn(2048), (variables, images, wh, anchors), it)),
        ("full props pre=1024", timed(props_fn(1024), (variables, images, wh, anchors), it)),
        ("full props pre=512", timed(props_fn(512), (variables, images, wh, anchors), it)),
    ]
    print(f"batch={b} @608^2 resnet50, iters={it}")
    for name, dt_s in rows:
        print(f"{name:<22}{dt_s*1e3:>8.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
