"""Data-pipeline sanity checker - counterpart of /root/reference/test_data.py.

Pulls samples from the tile generator, prints their shapes and positive-
anchor counts, and renders the GT boxes plus every positive anchor over the
tile image to PNG files (the reference draws with matplotlib interactively
and writes ``test.png``, test_data.py:203-318; here each inspected sample
becomes ``test_data_<i>.png`` so it also runs headless/CI).
"""

from __future__ import annotations

import argparse
import os
import sys

import cv2
import jax
import numpy as np

from radnet_tpu.config import Config
from radnet_tpu.data.dataset import get_data
from radnet_tpu.data.pipeline import tile_sample_generator
from radnet_tpu.ops import targets as targets_ops
from radnet_tpu.ops.anchors import image_anchors_xyxy


def build_argparser() -> argparse.ArgumentParser:
    from radnet_tpu.cli.common import add_platform_arg

    p = argparse.ArgumentParser(description=__doc__)
    add_platform_arg(p)
    p.add_argument("--seed", type=int, default=27)  # test_data.py:28
    p.add_argument("--train-annot", default="data/train.csv")
    p.add_argument("--train-data", default="data/train")
    p.add_argument("--n-samples", type=int, default=4)
    p.add_argument("--out-dir", default="test_data_viz")
    p.add_argument("--network", default=None)
    p.add_argument("--config-json", default=None)
    p.add_argument(
        "--analyze-anchors",
        action="store_true",
        help="report object-size statistics vs the configured anchors",
    )
    p.add_argument(
        "--usage-samples",
        type=int,
        default=0,
        help="with --analyze-anchors: also run N generator samples through "
        "target assignment and report positives per (scale, ratio) anchor "
        "(the reference's anchors_summary, test_data.py:70-126)",
    )
    return p


def _kmeans_wh(wh: "np.ndarray", k: int = 3, seed: int = 27, iters: int = 50):
    """KMeans over (w, h) box sizes — the reference clustered bbox
    width/height with sklearn KMeans(3) to suggest anchor scales
    (test_data.py:177-184, commented out).  Tiny numpy Lloyd's loop so we
    don't depend on sklearn."""
    import numpy as np

    rng = np.random.RandomState(seed)
    k = min(k, len(wh))
    centers = wh[rng.choice(len(wh), size=k, replace=False)].astype(np.float64)
    for _ in range(iters):
        d = ((wh[:, None, :] - centers[None, :, :]) ** 2).sum(-1)
        lab = d.argmin(1)
        new = np.stack(
            [wh[lab == j].mean(0) if (lab == j).any() else centers[j] for j in range(k)]
        )
        if np.allclose(new, centers):
            break
        centers = new
    order = np.argsort(centers.prod(1))
    return centers[order]


def analyze_anchors(data, config, usage_samples: int = 0, seed: int = 27) -> dict:
    """Object-size statistics vs the configured anchor grid.

    The working resolution of a box is its size after the tile resize
    (``img_size / tile_size``).  Badly matched anchors degrade training:
    with no anchor near a GT's scale, every positive comes from the
    low-IoU best-anchor fallback, which teaches mismatched anchor channels
    to fire on everything (see ops/targets.py).  The reference shipped a
    commented-out KMeans version of this analysis (test_data.py:54-184).
    """
    import numpy as np

    scale = config.img_size / float(config.tile_size)
    sizes, ratios, whs = [], [], []
    for img in data:
        for b in img["bboxes"]:
            w = (b["x2"] - b["x1"]) * scale
            h = (b["y2"] - b["y1"]) * scale
            if w > 0 and h > 0:
                sizes.append(float(np.sqrt(w * h)))
                ratios.append(float(w / h))
                whs.append((w, h))
    sizes = np.asarray(sizes)
    ratios = np.asarray(ratios)
    q = lambda a, p: float(np.percentile(a, p)) if a.size else float("nan")
    report = {
        "n_boxes": int(sizes.size),
        "size_px_resized": {p: round(q(sizes, p), 1) for p in (5, 25, 50, 75, 95)},
        "aspect_w_over_h": {p: round(q(ratios, p), 2) for p in (5, 50, 95)},
        "configured_scales": list(config.anchor_box_scales),
        "suggested_scales": [
            int(round(q(sizes, p))) for p in (10, 35, 65, 90)
        ]
        if sizes.size
        else [],
    }
    lo, hi = min(config.anchor_box_scales), max(config.anchor_box_scales)
    if sizes.size:
        outside = float(((sizes < lo / 2) | (sizes > hi * 2)).mean())
        report["frac_boxes_far_outside_anchor_range"] = round(outside, 3)
        # KMeans(3) over (w, h) as in the reference (test_data.py:177-184):
        # each cluster center suggests one anchor scale (geometric size).
        centers = _kmeans_wh(np.asarray(whs), k=3, seed=seed)
        report["kmeans_wh_clusters"] = [
            {"w": round(float(w), 1), "h": round(float(h), 1),
             "scale": int(round(np.sqrt(w * h)))}
            for w, h in centers
        ]
    if usage_samples > 0:
        report["anchor_usage"] = _anchor_usage(data, config, usage_samples, seed)
    return report


def _anchor_usage(data, config, n_samples: int, seed: int) -> dict:
    """Positives assigned to each (scale, ratio) anchor over N generator
    samples — the reference's ``anchors_summary`` loop (test_data.py:70-126).
    An anchor config with ~0 positives is dead weight; if ALL counts are low
    relative to GT boxes, the scales are mismatched (pitfall: RPN collapse)."""
    import jax
    import numpy as np

    f = config.feat_size
    scales = tuple(config.anchor_box_scales)
    ratios = tuple(tuple(r) for r in config.anchor_box_ratios)
    counts = np.zeros((len(scales), len(ratios)), np.int64)
    n_gt = 0
    class_count: dict = {}
    for img in data:
        for b in img["bboxes"]:
            class_count[b["class"]] = class_count.get(b["class"], 0) + 1
    gen = tile_sample_generator(
        data, config, class_count, config.class_mapping,
        train_mode=True, seed=seed,
    )
    for i in range(n_samples):
        sample = next(gen)
        out = targets_ops.rpn_targets(
            sample["gt_boxes"], sample["gt_mask"],
            sample["valid_wh"][0], sample["valid_wh"][1],
            jax.random.PRNGKey(seed + i),
            feat_h=f, feat_w=f, scales=scales, ratios=ratios,
            stride=config.rpn_stride,
            rpn_min_overlap=config.rpn_min_overlap,
            rpn_max_overlap=config.rpn_max_overlap,
            max_regions=config.rpn_max_regions,
            std_scaling=config.std_scaling,
            reference_neg_budget=config.rpn_reference_neg_budget,
            fallback_min_iou=config.rpn_fallback_min_iou,
        )
        y_cls = np.asarray(out.y_rpn_cls)
        a = config.n_anchors
        pos = (y_cls[..., :a] * y_cls[..., a:]) > 0  # valid & positive
        # anchor index ai = scale_i * len(ratios) + ratio_i (ops/anchors.py)
        per_anchor = pos.reshape(-1, a).sum(0)
        counts += per_anchor.reshape(len(scales), len(ratios))
        n_gt += int(sample["gt_mask"].sum())
    return {
        "n_samples": n_samples,
        "n_gt_boxes": n_gt,
        "positives_per_anchor": {
            str(s): {str(tuple(r)): int(counts[i, j]) for j, r in enumerate(ratios)}
            for i, s in enumerate(scales)
        },
    }


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)
    config = Config.load(args.config_json) if args.config_json else Config()
    if args.network:
        config.network = args.network

    data, class_count, class_mapping = get_data(
        args.train_annot, args.train_data, config.img_types
    )

    if args.analyze_anchors:
        import json

        print(json.dumps(
            analyze_anchors(data, config, args.usage_samples, args.seed), indent=2))
        return 0
    gen = tile_sample_generator(
        data, config, class_count, config.class_mapping, train_mode=True, seed=args.seed
    )
    os.makedirs(args.out_dir, exist_ok=True)

    f = config.feat_size
    scales = tuple(config.anchor_box_scales)
    ratios = tuple(tuple(r) for r in config.anchor_box_ratios)
    anchors = np.asarray(image_anchors_xyxy(f, f, scales, ratios, config.rpn_stride))

    for i in range(args.n_samples):
        sample = next(gen)
        out = targets_ops.rpn_targets(
            sample["gt_boxes"],
            sample["gt_mask"],
            sample["valid_wh"][0],
            sample["valid_wh"][1],
            jax.random.PRNGKey(args.seed + i),
            feat_h=f,
            feat_w=f,
            scales=scales,
            ratios=ratios,
            stride=config.rpn_stride,
            rpn_min_overlap=config.rpn_min_overlap,
            rpn_max_overlap=config.rpn_max_overlap,
            max_regions=config.rpn_max_regions,
            std_scaling=config.std_scaling,
            # Match the train step's target semantics exactly
            # (engine/steps.py passes both): this tool diagnoses RPN
            # collapse precisely when these knobs are being tuned.
            reference_neg_budget=config.rpn_reference_neg_budget,
            fallback_min_iou=config.rpn_fallback_min_iou,
        )
        y_cls = np.asarray(out.y_rpn_cls)
        a = config.n_anchors
        pos = (y_cls[..., :a] * y_cls[..., a:]) > 0  # valid & overlap

        print(f"sample {i}: image {sample['image'].shape} "
              f"gt={int(sample['gt_mask'].sum())} n_pos={int(out.n_pos)} "
              f"y_rpn_cls={y_cls.shape}")

        img = np.ascontiguousarray(sample["image"])  # raw uint8 canvas
        for jy, ix, ai in zip(*np.nonzero(pos)):
            x1, y1, x2, y2 = anchors[jy, ix, ai].astype(int)
            cv2.rectangle(img, (x1, y1), (x2, y2), (0, 200, 255), 1)
        for g, m in zip(sample["gt_boxes"], sample["gt_mask"]):
            if m:
                x1, y1, x2, y2 = g.astype(int)
                cv2.rectangle(img, (x1, y1), (x2, y2), (0, 255, 0), 2)
        cv2.imwrite(os.path.join(args.out_dir, f"test_data_{i}.png"), img)

    print(f"Wrote {args.n_samples} visualizations to {args.out_dir}/")
    return 0


if __name__ == "__main__":
    sys.exit(main())
