#!/usr/bin/env python
"""End-to-end learning validation on synthetic data.

Trains the detector on a tiny synthetic dataset (bright rectangles on dark
panels; class determined by aspect ratio: wide = 'boat', tall = 'human')
and verifies that the full pipeline - device-side target assignment, fused
train step, proposal decode, RoI heads, inference cascade, VOC evaluation -
actually learns: detections must land on the rectangles.

Usage: python scripts/overfit_check.py [--steps 300] [--network vgg16]
Prints a JSON summary; exits nonzero if recall stays at zero.

Note: use vgg16 for this check.  ResNet50 + FrozenBatchNorm is not
trainable from random initialization (frozen identity statistics do not
normalize a random trunk - activation variance grows with depth); the
reference has the same constraint and always loads ImageNet weights for
ResNet50 (resnet50.py:213).  Load pretrained weights via
radnet_tpu.models.weights for real ResNet50 training.
"""

from __future__ import annotations

import argparse
import json
import sys

import numpy as np

sys.path.insert(0, ".")


def make_panel(rng, size=600, n_boxes=2):
    img = np.full((size, size, 3), 30, np.uint8)
    boxes = []
    for _ in range(n_boxes):
        wide = rng.random() < 0.5
        w = int(rng.integers(120, 220)) if wide else int(rng.integers(50, 90))
        h = int(rng.integers(50, 90)) if wide else int(rng.integers(120, 220))
        x1 = int(rng.integers(0, size - w))
        y1 = int(rng.integers(0, size - h))
        img[y1 : y1 + h, x1 : x1 + w] = 220
        boxes.append(
            {
                "class": "boat" if wide else "human",
                "x1": x1,
                "y1": y1,
                "x2": x1 + w,
                "y2": y1 + h,
            }
        )
    return img, boxes


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--steps", type=int, default=300)
    ap.add_argument("--network", default="vgg16")
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--n-panels", type=int, default=16)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")

    import jax.numpy as jnp

    from radnet_tpu.config import Config
    from radnet_tpu.data.pipeline import batch_samples, make_sample
    from radnet_tpu.engine.steps import make_train_step
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.evaluation import evaluate_detections
    from radnet_tpu.inference import RADNet
    from radnet_tpu.models.detector import build_model

    config = Config(
        network=args.network,
        class_mapping={"boat": 0, "human": 1, "bg": 2},
        tile_size=600,
        tile_overlap=600,
        base_net_weights=None,
        use_noise=False,
        use_brightness=False,
        batch_size=8,
    )
    model = build_model(config)
    state = create_train_state(
        model, config, jax.random.PRNGKey(0),
        learning_rate=args.lr, base_net_trainable=True,
    )
    train_step = make_train_step(model, config, trunk_trainable=True, donate=True)

    rng = np.random.default_rng(0)
    panels = [make_panel(rng) for _ in range(args.n_panels)]
    samples = [
        make_sample(img, boxes, config, config.class_mapping)
        for img, boxes in panels
    ]

    key = jax.random.PRNGKey(1)
    import time

    # Pre-stage a handful of fixed batches on device once: this measures the
    # device step rate rather than the (environment-specific) host->device
    # tunnel bandwidth; the real training CLI streams batches with a
    # background prefetcher instead.
    n_batches = 4
    device_batches = []
    for bi in range(n_batches):
        picks = rng.choice(len(samples), size=config.batch_size, replace=True)
        batch = batch_samples([samples[i] for i in picks])
        device_batches.append(jax.device_put({k: jnp.asarray(v) for k, v in batch.items()}))

    t0 = time.time()
    metrics = {}
    compile_time = None
    for step_i in range(args.steps):
        batch = device_batches[step_i % n_batches]
        key, sub = jax.random.split(key)
        state, metrics = train_step(state, batch, sub)
        if step_i == 0:
            jax.block_until_ready(metrics["total_loss"])
            compile_time = time.time() - t0
        if step_i % 50 == 0:
            m = jax.device_get(metrics)
            print(
                f"step {step_i}: total={float(m['total_loss']):.3f} "
                f"rpn_cls={float(m['loss_rpn_cls']):.3f} "
                f"det_acc={float(m['detector_acc']):.3f} "
                f"overlap={float(m['mean_overlapping_bboxes']):.1f}",
                file=sys.stderr,
            )
    jax.block_until_ready(state.params)
    train_time = time.time() - t0 - (compile_time or 0.0)

    radnet = RADNet(config, model, state.params, state.batch_stats)
    radnet.bbox_threshold = 0.5
    all_dets, all_gt = [], []
    for img, boxes in panels[:8]:
        dets = radnet.predict([img])
        all_dets.extend(dets)
        all_gt.extend([dict(b) for b in boxes])

    result = evaluate_detections(all_dets, all_gt, 0.5)
    from radnet_tpu.evaluation import match_detections

    T, P = match_detections(all_dets, all_gt, 0.5)
    tp = sum(
        int(t)
        for cls in T
        for t, p in zip(T[cls], P[cls])
        if p > 0
    )
    n_gt = len(all_gt)

    summary = {
        "steps": args.steps,
        "compile_seconds": round(compile_time or 0.0, 1),
        "train_seconds": round(train_time, 1),
        "steps_per_sec": round((args.steps - 1) / train_time, 2),
        "images_per_sec": round((args.steps - 1) * config.batch_size / train_time, 1),
        "final_total_loss": float(jax.device_get(metrics)["total_loss"]),
        "n_detections": len(all_dets),
        "n_gt": n_gt,
        "recall": round(tp / max(n_gt, 1), 3),
        "mAP": result["mAP"],
        "per_class": result["per_class"],
    }
    print(json.dumps(summary, indent=2))
    ok = len(all_dets) > 0 and any(v > 0 for v in result["per_class"].values())
    return 0 if ok else 1


if __name__ == "__main__":
    sys.exit(main())
