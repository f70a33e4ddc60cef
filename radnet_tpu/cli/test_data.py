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
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=27)  # test_data.py:28
    p.add_argument("--train-annot", default="data/train.csv")
    p.add_argument("--train-data", default="data/train")
    p.add_argument("--n-samples", type=int, default=4)
    p.add_argument("--out-dir", default="test_data_viz")
    p.add_argument("--network", default=None)
    p.add_argument("--config-json", default=None)
    return p


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    config = Config.load(args.config_json) if args.config_json else Config()
    if args.network:
        config.network = args.network

    data, class_count, class_mapping = get_data(
        args.train_annot, args.train_data, config.img_types
    )
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
