#!/usr/bin/env python
"""Measured steps/s cost of --train-schedule alternating vs joint.

Same carry-threaded + scalar-value-fetch discipline as ablate_train.py
(CLAUDE.md pitfall #3).  The alternating step runs the trunk
forward(+backward) twice (phases 1 and 3) plus a third forward for
proposals (phase 2), so with a trainable trunk expect roughly half the
joint steps/s; this script records the actual number for BASELINE.md.

Usage: python scripts/measure_alternating.py [--batch 8] [--steps 40]
       [--trainable-trunk]
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
    ap.add_argument("--steps", type=int, default=40)
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
    from radnet_tpu.engine.steps import make_alternating_train_step, make_train_step
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.models.detector import build_model

    config = Config(
        network="vgg16",
        compute_dtype="bfloat16",
        batch_size=args.batch,
        base_net_trainable=args.trainable_trunk,
    )
    model = build_model(config)

    rng = np.random.default_rng(0)
    b, s, g = args.batch, config.canvas_size, config.max_gt_boxes
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

    def run(schedule, _warm=[False]):
        state = create_train_state(
            model, config, jax.random.PRNGKey(0), schedule=schedule
        )
        if not _warm[0]:
            # The FIRST timed loop of a process reads ~2x (tunnel warm-up
            # spreads across it; measured joint#1 51.8 vs joint#2 25.2
            # ms/step on identical code) - burn it on a short throwaway.
            _warm[0] = True
            run(schedule)
        if schedule == "alternating":
            step = make_alternating_train_step(model, config, donate=True)
        else:
            step = make_train_step(model, config, donate=True)
        key = jax.random.PRNGKey(1)
        state, metrics = step(state, batch, key)  # compile
        float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0])
        t0 = time.perf_counter()
        for _ in range(args.steps):
            key, sub = jax.random.split(key)
            state, metrics = step(state, batch, sub)
        float(jax.tree_util.tree_leaves(metrics)[0].ravel()[0])
        dt = (time.perf_counter() - t0) / args.steps
        return dt

    dt_joint = run("joint")
    dt_alt = run("alternating")
    print(
        f"batch={b} trainable_trunk={args.trainable_trunk}\n"
        f"joint:       {dt_joint*1e3:7.2f} ms/step  {1/dt_joint:6.2f} steps/s\n"
        f"alternating: {dt_alt*1e3:7.2f} ms/step  {1/dt_alt:6.2f} steps/s\n"
        f"cost: {dt_alt/dt_joint:.2f}x"
    )
    return 0


if __name__ == "__main__":
    sys.exit(main())
