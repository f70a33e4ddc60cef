#!/usr/bin/env python
"""Trustworthy stage ablation of the fused train step.

`profile_train.py`'s stateless stage timings lie through the tunneled
backend (eager perturbation dispatch + early block_until_ready returns -
CLAUDE.md pitfall #3: it reported trunk fwd "401 ms" while the loss fwd
that CONTAINS the trunk read "67 ms").  This script times every stage the
one way the tunnel cannot lie about: a scalar carry is threaded through
each compiled program so iteration k+1's input depends on iteration k's
output, forcing sequential real execution, with one scalar fetch at the
end.

Stages are CUMULATIVE, so stage-to-stage deltas attribute time:

  rpn targets    on-device anchor-target generation only
  trunk fwd      backbone forward only
  loss fwd       trunk + RPN + proposal decode/NMS + detector targets +
                 RoI head + all four losses (eval-mode forward)
  FULL step      + backward + Adam update (state-threaded, = bench's number)

Usage: python scripts/ablate_train.py [--network vgg16] [--batch 8]
       [--iters 30] [--trainable-trunk]
"""

from __future__ import annotations

import argparse
import functools
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # v5e bf16


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--network", default="vgg16")
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--iters", type=int, default=30)
    ap.add_argument("--trainable-trunk", action="store_true")
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    from radnet_tpu.config import Config
    from radnet_tpu.engine.steps import _device_anchors, compute_losses, make_train_step
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.models.detector import FasterRCNN, build_model
    from radnet_tpu.ops.targets import rpn_targets

    config = Config(network=args.network, compute_dtype="bfloat16")
    model = build_model(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        base_net_trainable=args.trainable_trunk,
    )
    anchors = _device_anchors(config)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    b, s, g = args.batch, config.canvas_size, config.max_gt_boxes
    rng = np.random.default_rng(0)
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

    tgt_fn = functools.partial(
        rpn_targets,
        feat_h=config.feat_size,
        feat_w=config.feat_size,
        scales=tuple(config.anchor_box_scales),
        ratios=tuple(tuple(r) for r in config.anchor_box_ratios),
        stride=config.rpn_stride,
        rpn_min_overlap=config.rpn_min_overlap,
        rpn_max_overlap=config.rpn_max_overlap,
        max_regions=config.rpn_max_regions,
        std_scaling=config.std_scaling,
        reference_neg_budget=config.rpn_reference_neg_budget,
        fallback_min_iou=config.rpn_fallback_min_iou,
    )

    @jax.jit
    def stage_targets(carry, batch, key, img_anchors):
        gt = batch["gt_boxes"] + carry * 1e-12
        tgts = jax.vmap(functools.partial(tgt_fn, anchors_xyxy=img_anchors))(
            gt,
            batch["gt_mask"],
            batch["valid_wh"][:, 0],
            batch["valid_wh"][:, 1],
            jax.random.split(key, gt.shape[0]),
        )
        return carry + sum(t.astype(jnp.float32).sum() for t in jax.tree_util.tree_leaves(tgts)) * 1e-12

    # params/anchors enter every stage as jit ARGUMENTS - closing over
    # them would inline the VGG head (~400 MB) as HLO constants and blow
    # the remote-compile transport (CLAUDE.md pitfall #1, HTTP 413).
    @jax.jit
    def stage_trunk(carry, variables, batch):
        img = batch["image"] + carry * 1e-12
        f = model.apply(variables, img, method=FasterRCNN.features)
        return carry + f.astype(jnp.float32).mean() * 1e-12

    @jax.jit
    def stage_loss_fwd(carry, variables, batch, key, anchors):
        b2 = dict(batch)
        b2["image"] = batch["image"] + carry * 1e-12
        _, metrics = compute_losses(
            model, config, variables["params"], variables["batch_stats"],
            b2, key, True, anchors=anchors,
        )
        return carry + metrics["total_loss"].astype(jnp.float32) * 1e-12

    train_step = make_train_step(model, config, trunk_trainable=args.trainable_trunk)
    train_step_donated = make_train_step(
        model, config, trunk_trainable=args.trainable_trunk, donate=True
    )

    def timed_carry(fn, extra, iters):
        carry = jnp.float32(0.0)
        carry = fn(carry, *extra)  # compile
        float(carry)  # real fetch: block_until_ready can return early here
        t0 = time.perf_counter()
        for _ in range(iters):
            carry = fn(carry, *extra)
        float(carry)  # barrier by value fetch (CLAUDE.md pitfall #3)
        return (time.perf_counter() - t0) / iters

    def timed_state(iters, step_fn=None):
        step_fn = step_fn or train_step
        st = state if step_fn is train_step else create_train_state(
            model, config, jax.random.PRNGKey(0),
            base_net_trainable=args.trainable_trunk,
        )
        k = key
        st, m = step_fn(st, batch, k)  # compile
        float(m["total_loss"])  # real fetch barrier (CLAUDE.md pitfall #3)
        t0 = time.perf_counter()
        for _ in range(iters):
            k, sub = jax.random.split(k)
            st, m = step_fn(st, batch, sub)
        float(m["total_loss"])
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
        ("rpn targets", timed_carry(stage_targets, (batch, key, anchors[0]), it),
         flops_of(stage_targets, (z, batch, key, anchors[0]))),
        ("trunk fwd", timed_carry(stage_trunk, (variables, batch), it),
         flops_of(stage_trunk, (z, variables, batch))),
        ("loss fwd (all)", timed_carry(stage_loss_fwd, (variables, batch, key, anchors), it),
         flops_of(stage_loss_fwd, (z, variables, batch, key, anchors))),
        ("FULL train step", timed_state(it),
         flops_of(train_step._jitted, (state, batch, key, train_step._anchors))),
        # The production configuration (drivers pass donate=True): params +
        # Adam moments update in place instead of being copied.
        ("FULL (donated)", timed_state(it, train_step_donated),
         flops_of(train_step._jitted, (state, batch, key, train_step._anchors))),
    ]

    dev = jax.devices()[0]
    print(f"\ndevice={dev} batch={b} @{s}^2 {config.network} "
          f"trainable_trunk={args.trainable_trunk} iters={it} (carry-threaded)")
    print(f"{'stage':<18}{'ms/step':>9}{'ms/img':>8}{'GFLOP':>9}{'MFU%':>6}")
    for name, dt, fl in rows:
        mfu = fl / dt / PEAK * 100 if np.isfinite(fl) else float("nan")
        print(f"{name:<18}{dt*1e3:>9.2f}{dt*1e3/b:>8.2f}"
              f"{fl/1e9 if np.isfinite(fl) else float('nan'):>9.1f}{mfu:>6.1f}")
    t = {name: dt for name, dt, _ in rows}
    print(f"\ndeltas: loss_fwd - trunk = {(t['loss fwd (all)'] - t['trunk fwd'])*1e3:.2f} ms "
          f"(RPN+targets+proposals+detector targets+head+losses); "
          f"full - loss_fwd = {(t['FULL train step'] - t['loss fwd (all)'])*1e3:.2f} ms "
          f"(backward+Adam+state copies); donation saves "
          f"{(t['FULL train step'] - t['FULL (donated)'])*1e3:.2f} ms")
    return 0


if __name__ == "__main__":
    sys.exit(main())
