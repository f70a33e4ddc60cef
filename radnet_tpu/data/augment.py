"""CPU augmentation stack with bbox-consistent geometric + photometric ops.

Re-implements the behaviour of /root/reference/faster_rcnn/augmentation.py
(same op inventory, same probabilities, same parameter ranges, same
background-mask-preserving noise) with numpy/cv2/scipy only - the reference
additionally relied on scikit-image, which this environment does not ship,
so ``rescale_intensity`` / ``random_noise`` equivalents are implemented
inline.

Every geometric op transforms the bbox list in place like the reference;
``bboxes`` is a list of dicts with keys ``class, x1, y1, x2, y2``.  All
randomness flows through an explicit ``np.random.Generator`` so training is
reproducible from a single seed (the reference used the global np.random
state).
"""

from __future__ import annotations

import copy
import math
from typing import Any

import cv2
import numpy as np
from scipy.stats import truncnorm


# --------------------------------------------------------------------------- #
# Helpers
# --------------------------------------------------------------------------- #
def get_truncated_normal(mean=0.0, sd=1.0, low=0.0, upp=1.0):
    """Truncated normal sampler (augmentation.py:14-15)."""
    return truncnorm((low - mean) / sd, (upp - mean) / sd, loc=mean, scale=sd)


def strap_img(img: np.ndarray) -> tuple[int, int, int, int]:
    """Bounding rows/cols of finite, nonzero content (augmentation.py:17-31).

    Same result as the reference's ``np.nonzero(...).min()/max()`` but via
    row/column ``any`` reductions - ``nonzero`` materializes every content
    index (megabytes per call on panel-sized tiles) just to take min/max,
    and profiled as ~25% of the whole augmentation stack.
    """
    ch = img[:, :, 1]
    if np.issubdtype(ch.dtype, np.floating):
        finite = np.isfinite(ch)
        mask = (ch != 0) & finite if finite.all() else finite
    else:  # integer images are always finite -> nonzero-content branch
        mask = ch != 0
    rows = np.flatnonzero(mask.any(axis=1))
    cols = np.flatnonzero(mask.any(axis=0))
    return rows[0], rows[-1], cols[0], cols[-1]


def clip_box(bbox: np.ndarray, img_box, alpha: float) -> tuple[np.ndarray, np.ndarray]:
    """Clip ``(N, 4+)`` xyxy boxes into ``img_box``; drop boxes that keep
    less than ``alpha`` of their area (augmentation.py:33-83)."""
    bbox = np.asarray(bbox, dtype=np.float64)
    if bbox.size == 0:
        return bbox.reshape(0, 4), np.zeros((0,), dtype=int)
    outside = (
        (bbox[:, 0] > img_box[2])
        | (bbox[:, 2] < img_box[0])
        | (bbox[:, 1] > img_box[3])
        | (bbox[:, 3] < img_box[1])
    )
    area = (bbox[:, 2] - bbox[:, 0]) * (bbox[:, 3] - bbox[:, 1])
    clipped = np.hstack(
        [
            np.maximum(bbox[:, 0], img_box[0]).reshape(-1, 1),
            np.maximum(bbox[:, 1], img_box[1]).reshape(-1, 1),
            np.minimum(bbox[:, 2], img_box[2]).reshape(-1, 1),
            np.minimum(bbox[:, 3], img_box[3]).reshape(-1, 1),
            bbox[:, 4:],
        ]
    )
    with np.errstate(divide="ignore", invalid="ignore"):
        delta = (area - (clipped[:, 2] - clipped[:, 0]) * (clipped[:, 3] - clipped[:, 1])) / area
    keep = (~outside) & (delta < (1.0 - alpha))
    return clipped[keep], keep.astype(int)


def _bboxes_to_array(bboxes: list[dict]) -> np.ndarray:
    return np.array([[b["x1"], b["y1"], b["x2"], b["y2"]] for b in bboxes], dtype=np.float64)


def _write_back(bboxes: list[dict], arr: np.ndarray, col_min=0, row_min=0) -> None:
    for i in range(arr.shape[0]):
        bboxes[i]["x1"] = int(arr[i, 0] - col_min)
        bboxes[i]["y1"] = int(arr[i, 1] - row_min)
        bboxes[i]["x2"] = int(math.ceil(arr[i, 2] - col_min))
        bboxes[i]["y2"] = int(math.ceil(arr[i, 3] - row_min))


# --------------------------------------------------------------------------- #
# Geometric ops (augmentation.py:85-301)
# --------------------------------------------------------------------------- #
def horizontal_flip(img, bboxes):
    cols = img.shape[1]
    img = cv2.flip(img, 1)
    for b in bboxes:
        b["x1"], b["x2"] = cols - b["x2"], cols - b["x1"]
    return img, bboxes


def vertical_flip(img, bboxes):
    rows = img.shape[0]
    img = cv2.flip(img, 0)
    for b in bboxes:
        b["y1"], b["y2"] = rows - b["y2"], rows - b["y1"]
    return img, bboxes


def ninety_degree_rotation(img, bboxes, rng: np.random.Generator):
    rows, cols = img.shape[:2]
    angle = rng.choice([90, 180, 270])
    if angle == 270:
        img = cv2.flip(np.transpose(img, (1, 0, 2)), 0)
    elif angle == 180:
        img = cv2.flip(img, -1)
    else:  # 90
        img = cv2.flip(np.transpose(img, (1, 0, 2)), 1)
    for b in bboxes:
        x1, x2, y1, y2 = b["x1"], b["x2"], b["y1"], b["y2"]
        if angle == 270:
            b["x1"], b["x2"], b["y1"], b["y2"] = y1, y2, cols - x2, cols - x1
        elif angle == 180:
            b["x1"], b["x2"], b["y1"], b["y2"] = cols - x2, cols - x1, rows - y2, rows - y1
        else:  # 90
            b["x1"], b["x2"], b["y1"], b["y2"] = rows - y2, rows - y1, x1, x2
    return img, bboxes


def any_degree_rotation(img, bboxes, rng: np.random.Generator, max_degrees=3.0):
    """Small-angle rotation with expanded canvas and corner-transformed
    boxes (augmentation.py:158-232)."""
    if not bboxes:
        return img, bboxes
    arr = _bboxes_to_array(bboxes)
    height, width = img.shape[:2]
    angle = rng.uniform(-max_degrees, max_degrees)
    cx, cy = width // 2, height // 2
    mat = cv2.getRotationMatrix2D((cx, cy), angle, 1.0)
    cos, sin = abs(mat[0, 0]), abs(mat[0, 1])
    new_w = int(height * sin + width * cos)
    new_h = int(height * cos + width * sin)
    mat[0, 2] += new_w / 2 - cx
    mat[1, 2] += new_h / 2 - cy
    img = cv2.warpAffine(img, mat, (new_w, new_h))

    # transform all four corners of every box, then take the hull aabb
    x1, y1 = arr[:, 0], arr[:, 1]
    x2, y2 = arr[:, 2], arr[:, 3]
    corners = np.stack(
        [x1, y1, x2, y1, x1, y2, x2, y2], axis=1
    ).reshape(-1, 2)
    corners = np.hstack([corners, np.ones((corners.shape[0], 1))])
    rotated = (mat @ corners.T).T.reshape(-1, 8)
    xs = rotated[:, 0::2]
    ys = rotated[:, 1::2]
    arr = np.stack([xs.min(1), ys.min(1), xs.max(1), ys.max(1)], axis=1)

    row_min, row_max, col_min, col_max = strap_img(img)
    img = img[row_min:row_max, col_min:col_max, :]
    arr, mask = clip_box(arr, [col_min, row_min, col_max, row_max], 0.5)
    bboxes = [bboxes[i] for i in range(mask.shape[0]) if mask[i] == 1]
    _write_back(bboxes, arr, col_min, row_min)
    return img, bboxes


def shear(img, bboxes, rng: np.random.Generator):
    """Horizontal shear +-0.3; negative factors via flip-shear-flip
    (augmentation.py:234-271)."""
    factor = rng.uniform(-0.3, 0.3)
    if factor < 0:
        img, bboxes = horizontal_flip(img, bboxes)
    height, width = img.shape[:2]
    arr = _bboxes_to_array(bboxes)
    mat = np.array([[1.0, abs(factor), 0.0], [0.0, 1.0, 0.0]])
    new_w = width + abs(factor * height)
    if arr.size:
        arr[:, [0, 2]] += (arr[:, [1, 3]] * abs(factor)).astype(int)
    img = cv2.warpAffine(img, mat, (int(new_w), height))
    row_min, row_max, col_min, col_max = strap_img(img)
    img = img[row_min:row_max, col_min:col_max, :]
    _write_back(bboxes, arr, col_min, row_min)
    if factor < 0:
        img, bboxes = horizontal_flip(img, bboxes)
    return img, bboxes


def random_crop(img, bboxes, rng: np.random.Generator):
    """40-80% crop (augmentation.py:273-301); present for completeness, not
    wired into :func:`augment` - matching the reference orchestrator."""
    height, width = img.shape[:2]
    new_w = rng.integers(int(0.4 * width), int(0.8 * width))
    new_h = rng.integers(int(0.4 * height), int(0.8 * height))
    col_min = rng.integers(0, width - new_w)
    row_min = rng.integers(0, height - new_h)
    col_max, row_max = col_min + new_w, row_min + new_h
    img = img[row_min:row_max, col_min:col_max, :]
    arr = _bboxes_to_array(bboxes)
    arr, mask = clip_box(arr, [col_min, row_min, col_max, row_max], 0.5)
    bboxes = [bboxes[i] for i in range(mask.shape[0]) if mask[i] == 1]
    _write_back(bboxes, arr, col_min, row_min)
    return img, bboxes


# --------------------------------------------------------------------------- #
# Photometric ops (augmentation.py:303-478)
# --------------------------------------------------------------------------- #
def brightness(img, bboxes, rng: np.random.Generator):
    """Brightness shift weighted by current brightness, zero background
    preserved (augmentation.py:303-333)."""
    background = img == 0
    imgf = img.astype(np.float32)
    max_b, min_b = 180.0, 75.0
    # Mean over non-background pixels, without materializing the selected
    # elements: background pixels are exactly 0 so they add nothing to the
    # sum (augmentation.py:314 computed img[~background].mean()).
    n_bg = np.count_nonzero(background)
    n_fg = img.size - n_bg
    if n_fg == 0:
        return img, bboxes
    avg = float(imgf.sum()) / n_fg
    if avg <= min_b or avg >= max_b:
        return img, bboxes
    p = (avg - min_b) / (max_b - min_b)
    if rng.random() < p:
        imgf -= rng.random() * (avg - min_b)
    else:
        imgf += rng.random() * (max_b - avg)
    imgf = np.clip(imgf, 0, 255).astype(np.uint8)
    imgf[background] = 0
    return imgf, bboxes


def contrast(img, bboxes, rng: np.random.Generator):
    """Intensity rescale (augmentation.py:335-351).  Equivalent to
    skimage.exposure.rescale_intensity with a random (low, high) window."""
    max_c, min_c = 180.0, 75.0
    lo = min_c * rng.random()
    hi = (255.0 - max_c) * rng.random() + max_c
    imgf = img.astype(np.float32)
    out = np.clip((imgf - lo) / max(hi - lo, 1e-6), 0.0, 1.0) * 255.0
    # rescale_intensity returns the INPUT dtype via a plain astype, i.e.
    # truncation - unlike img_as_ubyte (the noise ops), which rounds.
    return out.astype(np.uint8), bboxes


def _as_ubyte(x: np.ndarray) -> np.ndarray:
    """skimage.util.img_as_ubyte for float images in [0, 1]."""
    return np.rint(np.clip(x, 0.0, 1.0) * 255.0).astype(np.uint8)


def _apply_grey_aware(img, img_type, fn):
    """Apply ``fn`` (float[0,1] -> float[0,1]) channel-0-only for grey image
    types, duplicating to all channels, else to the whole image; zero
    background preserved (augmentation.py:363-397 pattern)."""
    # float32 instead of the reference's implicit float64: halves the
    # memory traffic of the noise ops (the hottest host-side stage) with
    # no observable effect after the final round-trip to uint8.
    if "grey" in img_type:
        background = img[:, :, 0] == 0
        noisy = _as_ubyte(fn(img[:, :, 0].astype(np.float32) / np.float32(255.0)))
        noisy[background] = 0
        out = img.copy()
        out[:, :, 0] = noisy
        out[:, :, 1] = noisy
        out[:, :, 2] = noisy
        return out
    background = img == 0
    noisy = _as_ubyte(fn(img.astype(np.float32) / np.float32(255.0)))
    noisy[background] = 0
    return noisy


def salt_and_pepper_noise(img, bboxes, img_type, rng: np.random.Generator):
    """(augmentation.py:353-397)"""
    amount = (0.3 - 0.01) * rng.random() + 0.01
    svp = get_truncated_normal(mean=0.5, sd=0.1, low=0, upp=1).rvs(1, random_state=rng)[0]

    def fn(x):
        out = x.copy()
        r = rng.random(x.shape, dtype=np.float32)
        out[r < amount * svp] = 1.0
        out[(r >= amount * svp) & (r < amount)] = 0.0
        return out

    return _apply_grey_aware(img, img_type, fn), bboxes


def gaussian_noise(img, bboxes, img_type, rng: np.random.Generator):
    """(augmentation.py:399-441)"""
    mean = 0.1 * rng.random() - 0.05
    var = (0.01 - 0.001) * rng.random() + 0.001

    def fn(x):
        noise = rng.standard_normal(x.shape, dtype=np.float32)
        return x + (noise * np.float32(var**0.5) + np.float32(mean))

    return _apply_grey_aware(img, img_type, fn), bboxes


def poisson_noise(img, bboxes, img_type, rng: np.random.Generator):
    """(augmentation.py:443-478).  skimage's poisson mode: scale by the
    number of unique values rounded up to a power of two, draw poisson."""

    def fn(x):
        # x is uint8/255, so the unique count is the number of occupied
        # uint8 bins - a bincount instead of the reference's full sort.
        bins = np.bincount(np.rint(x * 255.0).astype(np.uint8).ravel(), minlength=256)
        n_unique = max(int(np.count_nonzero(bins)), 2)
        vals = 2.0 ** np.ceil(np.log2(n_unique))
        return rng.poisson(x * vals) / np.float32(vals)

    return _apply_grey_aware(img, img_type, fn), bboxes


# --------------------------------------------------------------------------- #
# Orchestrator (augmentation.py:481-533)
# --------------------------------------------------------------------------- #
def augment(
    img_data: dict[str, Any],
    img: np.ndarray,
    config,
    do_augment: bool = True,
    rng: np.random.Generator | None = None,
) -> tuple[dict[str, Any], np.ndarray]:
    """Apply the reference's augmentation schedule to one image.

    Coin flips and probabilities match augmentation.py:495-528: flips /
    rot90 / small rotation at p=0.5, shear at p=0.25, brightness at p=0.5,
    then one of {s&p, gaussian, poisson, contrast} at p=0.5.
    """
    assert "bboxes" in img_data and "width" in img_data and "height" in img_data
    rng = rng or np.random.default_rng()
    img_data_aug = copy.deepcopy(img_data)
    # When the fused train step applies photometric augmentation on device
    # (ops/augment_device.py), the host stage skips it - same schedule,
    # executed where it is free.
    photometric = not getattr(config, "augment_photometric_on_device", False)

    if do_augment:
        boxes = img_data_aug["bboxes"]
        if config.use_horizontal_flips and rng.random() < 0.5:
            img, boxes = horizontal_flip(img, boxes)
        if config.use_vertical_flips and rng.random() < 0.5:
            img, boxes = vertical_flip(img, boxes)
        if config.use_90_rotations and rng.random() < 0.5:
            img, boxes = ninety_degree_rotation(img, boxes, rng)
        if config.use_rotations and rng.random() < 0.5:
            img, boxes = any_degree_rotation(img, boxes, rng)
        if config.use_shear and rng.random() < 0.25:
            img, boxes = shear(img, boxes, rng)
        if photometric and config.use_brightness and rng.random() < 0.5:
            img, boxes = brightness(img, boxes, rng)
        if photometric and config.use_noise and rng.random() < 0.5:
            r = rng.integers(0, 4)
            # Reference quirk preserved (augmentation.py:522-526): grey
            # handling keys on the FIRST configured type even when
            # use_img_type mixes grey and color tiles in one run.  The
            # device path (ops/augment_device.grey_mode) instead detects
            # greyness per sample for mixed-type configs - a documented
            # correctness-over-parity divergence.
            img_type = config.img_types[0]
            if r == 0:
                img, boxes = salt_and_pepper_noise(img, boxes, img_type, rng)
            elif r == 1:
                img, boxes = gaussian_noise(img, boxes, img_type, rng)
            elif r == 2:
                img, boxes = poisson_noise(img, boxes, img_type, rng)
            else:
                img, boxes = contrast(img, boxes, rng)
        img_data_aug["bboxes"] = boxes
        img_data_aug["width"] = img.shape[1]
        img_data_aug["height"] = img.shape[0]

    return img_data_aug, img
