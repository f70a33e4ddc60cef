#!/usr/bin/env python
"""Stage-by-stage timing + MFU of the fused train step on the default device.

Companion of profile_cascade.py for the training path: times the RPN
target generator, the trunk forward, the full loss forward, and the
complete optimizer step as separately-compiled programs, with XLA
cost-model FLOPs for an MFU estimate.

Usage: python scripts/profile_train.py [--network vgg16] [--batch 8]
       [--trainable-trunk]
"""

from __future__ import annotations

import argparse
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

PEAK = 197e12  # v5e bf16


def timed(fn, args, iters=10):
    """See CLAUDE.md pitfall #3: stage timings through the tunnel are
    best-effort (the FULL train step threads state and is trustworthy;
    stateless stages can under-report).  Inputs perturb per iteration to
    defeat the executor's identical-call memoizer."""
    import jax
    import jax.numpy as jnp

    out = fn(*args)
    jax.block_until_ready(out)

    def perturb(a, i):
        if hasattr(a, "dtype") and jnp.issubdtype(a.dtype, jnp.floating) and a.ndim >= 3:
            return a + jnp.asarray(i, a.dtype)
        return a

    def perturb_tree(t, i):
        return jax.tree_util.tree_map(lambda a: perturb(a, i), t)

    t0 = time.perf_counter()
    for i in range(iters):
        out = fn(*[perturb_tree(a, i) for a in args])
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def flops_of(jitted, args):
    try:
        ca = jitted.lower(*args).compile().cost_analysis()
        if isinstance(ca, list):
            ca = ca[0]
        return float(ca.get("flops", float("nan")))
    except Exception:
        return float("nan")


def main() -> int:
    p = argparse.ArgumentParser()
    p.add_argument("--network", default="vgg16")
    p.add_argument("--batch", type=int, default=None)
    p.add_argument("--trainable-trunk", action="store_true")
    args = p.parse_args()

    import jax
    import jax.numpy as jnp

    try:
        jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)
    except Exception:
        pass

    import functools

    from radnet_tpu.config import Config
    from radnet_tpu.engine.steps import (
        _device_anchors,
        compute_losses,
        make_train_step,
    )
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.models.detector import FasterRCNN, build_model
    from radnet_tpu.ops.targets import rpn_targets

    config = Config(network=args.network, compute_dtype="bfloat16")
    if args.batch:
        config.batch_size = args.batch
    model = build_model(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        base_net_trainable=args.trainable_trunk,
    )
    anchors = _device_anchors(config)

    b, s, g = config.batch_size, config.canvas_size, config.max_gt_boxes
    rng = np.random.default_rng(0)
    batch = {
        "image": jnp.asarray(
            rng.integers(0, 255, (b, s, s, 3)).astype(np.uint8)
        ),
        "gt_boxes": jnp.asarray(
            np.tile(
                np.array([[[20.0, 20.0, 200.0, 200.0]] + [[0.0] * 4] * (g - 1)],
                         np.float32), (b, 1, 1))
        ),
        "gt_classes": jnp.zeros((b, g), jnp.int32),
        "gt_mask": jnp.asarray(np.tile(np.array([[True] + [False] * (g - 1)]), (b, 1))),
        "valid_wh": jnp.full((b, 2), float(config.img_size), jnp.float32),
        "sample_valid": jnp.ones((b,), bool),
    }
    key = jax.random.PRNGKey(1)
    variables = {"params": state.params, "batch_stats": state.batch_stats}

    @jax.jit
    def stage_targets(batch, key, img_anchors):
        fn = functools.partial(
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
            anchors_xyxy=img_anchors,
        )
        return jax.vmap(fn)(
            batch["gt_boxes"], batch["gt_mask"],
            batch["valid_wh"][:, 0], batch["valid_wh"][:, 1],
            jax.random.split(key, b),
        )

    @jax.jit
    def stage_trunk(variables, images):
        from radnet_tpu.data.pipeline import preprocess_on_device

        return model.apply(
            variables, preprocess_on_device(images), method=FasterRCNN.features
        )

    @jax.jit
    def stage_loss_fwd(params, batch_stats, batch, key, anchors):
        return compute_losses(
            model, config, params, batch_stats, batch, key, False,
            anchors=anchors, trunk_frozen=not args.trainable_trunk,
        )

    full = make_train_step(model, config, trunk_trainable=args.trainable_trunk)

    rows = []
    for name, fn, fargs in (
        ("rpn targets", stage_targets, (batch, key, anchors[0])),
        ("trunk fwd", stage_trunk, (variables, batch["image"])),
        ("loss fwd (all)", stage_loss_fwd,
         (state.params, state.batch_stats, batch, key, anchors)),
    ):
        dt = timed(fn, fargs)
        fl = flops_of(fn, fargs)
        rows.append((name, dt, fl))

    # FULL step: thread the state (and split the key) through the loop -
    # the only timing pattern the tunneled backend cannot fake.
    st, _ = full(state, batch, key)
    jax.block_until_ready(st.params)
    k = key
    t0 = time.perf_counter()
    for _ in range(10):
        k, sub = jax.random.split(k)
        st, _ = full(st, batch, sub)
    jax.block_until_ready(st.params)
    rows.append(("FULL train step", (time.perf_counter() - t0) / 10, float("nan")))

    dev = jax.devices()[0]
    print(f"\ndevice={dev} batch={b} @{s}^2 {config.network} "
          f"trainable_trunk={args.trainable_trunk}")
    print(f"{'stage':<18}{'ms/step':>9}{'ms/img':>8}{'GFLOP':>9}{'MFU%':>6}")
    for name, dt, fl in rows:
        mfu = fl / dt / PEAK * 100 if np.isfinite(fl) else float("nan")
        print(f"{name:<18}{dt*1e3:>9.2f}{dt*1e3/b:>8.2f}"
              f"{fl/1e9:>9.1f}{mfu:>6.1f}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
