"""Tile planning for giga-pixel panels.

Identical windowing math to the reference, which duplicates it in the
training generator (/root/reference/faster_rcnn/utils.py:352-373) and the
inference engine (RADNet.py:513-540): windows of ``tile_size`` advance by
``step`` (the reference calls it ``tile_overlap``, config.py:37), a final
edge-snapped window covers the remainder, and duplicates are removed.

This tiling axis is the framework's natural *sharding axis*: at inference
all tiles of a panel are batched through one compiled program, and the
batch is what gets sharded across the device mesh.
"""

from __future__ import annotations

import numpy as np


def _axis_windows(extent: int, tile_size: int, step: int) -> np.ndarray:
    starts = np.arange(0, extent, step)
    ends = starts + tile_size
    keep = ends <= extent
    starts, ends = starts[keep], ends[keep]
    starts = np.append(starts, [max(0, extent - tile_size)])
    ends = np.append(ends, [extent])
    return np.unique(np.stack([starts, ends], axis=1), axis=0)


def plan_tiles(width: int, height: int, tile_size: int, step: int) -> np.ndarray:
    """All tile windows for a ``width x height`` panel.

    Returns ``(T, 4)`` int array of (x1, y1, x2, y2), y-major ordering like
    the reference's nested ``for y: for x`` loop (utils.py:370-373).
    """
    xs = _axis_windows(width, tile_size, step)
    ys = _axis_windows(height, tile_size, step)
    tiles = [
        [x[0], y[0], x[1], y[1]]
        for y in ys
        for x in xs
    ]
    return np.asarray(tiles, dtype=np.int64)


def clip_boxes_to_tile(
    bboxes: np.ndarray, tile: np.ndarray, alpha: float
) -> tuple[np.ndarray, np.ndarray]:
    """Clip boxes into a tile; drop those keeping < ``alpha`` of their area.

    Mirror of augmentation.clip_box (/root/reference/faster_rcnn/
    augmentation.py:33-83) as used for tiles (utils.py:404-406): returns the
    clipped boxes of the survivors and a keep mask over the input rows.
    """
    bboxes = np.asarray(bboxes, dtype=np.float64)
    if bboxes.size == 0:
        return bboxes.reshape(0, 4), np.zeros((0,), dtype=bool)
    x1t, y1t, x2t, y2t = tile[:4]
    outside = (
        (bboxes[:, 0] > x2t)
        | (bboxes[:, 2] < x1t)
        | (bboxes[:, 1] > y2t)
        | (bboxes[:, 3] < y1t)
    )
    area = (bboxes[:, 2] - bboxes[:, 0]) * (bboxes[:, 3] - bboxes[:, 1])
    clipped = np.stack(
        [
            np.maximum(bboxes[:, 0], x1t),
            np.maximum(bboxes[:, 1], y1t),
            np.minimum(bboxes[:, 2], x2t),
            np.minimum(bboxes[:, 3], y2t),
        ],
        axis=1,
    )
    new_area = (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])
    lost = (area - new_area) / np.maximum(area, 1e-12)
    keep = (~outside) & (lost < (1.0 - alpha))
    return clipped[keep], keep
