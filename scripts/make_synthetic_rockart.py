#!/usr/bin/env python
"""Generate a synthetic rock-art-like dataset in the reference layout.

Panels are large dark textured images with bright carved figures:
  boat   - wide hull arc with vertical strokes
  human  - tall stick figure
  circle - ring
  wheel  - ring with spokes

Layout (matching utils.py:124-126 path injection and the CSV contract of
get_data, utils.py:134-167):
  <root>/{train,val,test}.csv
  <root>/data/<img_type>/{train,val,test}/panel_<i>.png
with csv rows img_path,label,xmin,ymin,xmax,ymax where img_path is
"<split>/panel_<i>.png" and data_path is "data/<split>"... the reference
uses data_path='data/train' + img_name, so we emit img_path='panel_i.png'
and data roots 'data/train' etc; the type directory is injected as the
second segment => files live at data/<img_type>/train/panel_i.png.

Usage: python scripts/make_synthetic_rockart.py --root synth_data
"""

from __future__ import annotations

import argparse
import os
import sys

import numpy as np

sys.path.insert(0, ".")

CLASSES = ["boat", "human", "circle", "wheel"]


def draw_figure(img, cls, x1, y1, w, h, rng):
    import cv2

    color = int(rng.integers(170, 240))
    th = max(2, min(w, h) // 12)
    if cls == "boat":
        # hull: lower arc + vertical crew strokes
        cv2.ellipse(
            img, (x1 + w // 2, y1 + int(h * 0.65)), (w // 2, int(h * 0.35)),
            0, 0, 180, color, th,
        )
        n = max(2, w // 30)
        for i in range(n):
            x = x1 + int((i + 0.5) * w / n)
            cv2.line(img, (x, y1 + int(h * 0.15)), (x, y1 + int(h * 0.65)), color, th)
    elif cls == "human":
        cx = x1 + w // 2
        r = max(3, w // 4)
        cv2.circle(img, (cx, y1 + r), r, color, th)
        cv2.line(img, (cx, y1 + 2 * r), (cx, y1 + int(h * 0.7)), color, th)
        cv2.line(img, (x1, y1 + int(h * 0.4)), (x1 + w, y1 + int(h * 0.35)), color, th)
        cv2.line(img, (cx, y1 + int(h * 0.7)), (x1, y1 + h), color, th)
        cv2.line(img, (cx, y1 + int(h * 0.7)), (x1 + w, y1 + h), color, th)
    elif cls == "circle":
        cv2.ellipse(
            img, (x1 + w // 2, y1 + h // 2), (w // 2, h // 2), 0, 0, 360, color, th
        )
    else:  # wheel
        c = (x1 + w // 2, y1 + h // 2)
        cv2.ellipse(img, c, (w // 2, h // 2), 0, 0, 360, color, th)
        cv2.line(img, (x1, y1 + h // 2), (x1 + w, y1 + h // 2), color, th)
        cv2.line(img, (x1 + w // 2, y1), (x1 + w // 2, y1 + h), color, th)


def make_panel(rng, size, n_figures):
    import cv2

    noise = rng.normal(40, 12, (size, size)).clip(0, 90)
    img = cv2.GaussianBlur(noise.astype(np.uint8), (0, 0), 3)
    img = np.stack([img] * 3, axis=-1)
    rows = []
    for _ in range(n_figures):
        cls = CLASSES[rng.integers(0, len(CLASSES))]
        if cls == "boat":
            w = int(rng.integers(180, 420))
            h = int(rng.integers(80, 170))
        elif cls == "human":
            w = int(rng.integers(60, 120))
            h = int(rng.integers(150, 320))
        else:
            d = int(rng.integers(80, 220))
            w = h = d
        x1 = int(rng.integers(10, size - w - 10))
        y1 = int(rng.integers(10, size - h - 10))
        draw_figure(img, cls, x1, y1, w, h, rng)
        rows.append((cls, x1, y1, x1 + w, y1 + h))
    return img, rows


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="synth_data")
    ap.add_argument("--panel-size", type=int, default=2400)
    ap.add_argument("--img-type", default="enhanced_topo_grey")
    ap.add_argument("--n-train", type=int, default=24)
    ap.add_argument("--n-val", type=int, default=6)
    ap.add_argument("--n-test", type=int, default=8)
    ap.add_argument("--figures-per-panel", type=int, default=10)
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()

    import cv2
    import pandas as pd

    rng = np.random.default_rng(args.seed)
    for split, n in (("train", args.n_train), ("val", args.n_val), ("test", args.n_test)):
        out_dir = os.path.join(args.root, "data", args.img_type, split)
        os.makedirs(out_dir, exist_ok=True)
        rows = []
        for i in range(n):
            img, figures = make_panel(rng, args.panel_size, args.figures_per_panel)
            name = f"panel_{i}.png"
            cv2.imwrite(os.path.join(out_dir, name), img)
            for cls, x1, y1, x2, y2 in figures:
                rows.append(
                    {"img_path": name, "label": cls, "xmin": x1, "ymin": y1,
                     "xmax": x2, "ymax": y2}
                )
        pd.DataFrame(rows).to_csv(os.path.join(args.root, f"{split}.csv"), index=False)
        print(f"{split}: {n} panels, {len(rows)} boxes")
    return 0


if __name__ == "__main__":
    sys.exit(main())
