"""Annotation reading and image loading.

Same data contract as the reference (/root/reference/faster_rcnn/utils.py:
111-220): a CSV with columns ``img_path,label,xmin,ymin,xmax,ymax``; images
are stored under per-type subdirectories injected as the second path
segment (utils.py:124-126); loading uses ``cv2.imdecode`` over a raw byte
read so non-ASCII paths survive (utils.py:127-130).  Images come back BGR.
"""

from __future__ import annotations

import collections
import os
import threading
import time
from typing import Any

import cv2
import numpy as np
import pandas as pd


def choose_img_type(
    types: list[str], rng: np.random.Generator | None = None
) -> str:
    """Draw one image type with the reference's weighting: the first type
    gets probability 0.3 (0.5 when there are <= 3 types) and the rest share
    the remainder uniformly (utils.py:115-122)."""
    if len(types) <= 1:
        return types[0]
    rng = rng or np.random.default_rng()
    first_prob = 0.5 if len(types) <= 3 else 0.3
    rest = (1.0 - first_prob) / (len(types) - 1)
    probs = [first_prob] + [rest] * (len(types) - 1)
    return rng.choice(types, p=probs)


def get_image(
    img_path: str,
    types: list[str],
    random_type: bool = False,
    rng: np.random.Generator | None = None,
    writable: bool = False,
) -> np.ndarray:
    """Load one image, injecting the image type as the 2nd path segment.

    With ``random_type`` the type is drawn with the reference's weighting:
    the first type gets probability 0.3 (0.5 when there are <= 3 types) and
    the rest share the remainder uniformly (utils.py:115-122).

    Returns a read-only view of the decoded-panel cache by default; pass
    ``writable=True`` when the caller draws on the image in place (the
    visualization CLIs) - that costs one copy on a cache hit.
    """
    img_type = choose_img_type(types, rng) if random_type else types[0]

    # Layout contract (utils.py:124-126): the image-type directory goes
    # right after the data root, ``<data_root>/<img_type>/<...>/<file>``.
    # The reference hardcodes insertion at index 1, which only works for a
    # single-segment relative root run from the dataset directory (its
    # documented usage); this framework also accepts multi-segment and
    # absolute roots, whose depth the bare filepath does not reveal - so
    # candidate positions are probed on disk, reference position first
    # (the reference's exact behavior whenever its layout assumption
    # holds).
    path = _resolve_typed_path(img_path, img_type)
    # The cache is process-global, so it keys on the RESOLVED path: the
    # typically-relative filepath from get_data would collide across
    # chdirs / same-layout datasets and silently serve stale panels.
    key = os.path.abspath(path)
    cached = _decoded_cache_get(key)
    if cached is not None:
        return cached.copy() if writable else cached
    img = cv2.imdecode(np.fromfile(path, np.uint8), cv2.IMREAD_COLOR)
    if img is None:
        raise FileNotFoundError(f"cannot decode image: {path}")
    _decoded_cache_put(key, img)
    return img.copy() if writable else img


_resolved_paths: dict[tuple[str, str], str] = {}
_resolved_paths_lock = threading.Lock()


def _resolve_typed_path(img_path: str, img_type: str) -> str:
    """Insertion position of the type segment, probed on disk and memoized.

    The reference position (index 1: right after the data root) is tried
    first - the reference's exact behavior whenever its single-segment
    relative-root layout assumption holds; for multi-segment or absolute
    roots (whose depth the bare filepath does not reveal) every other
    position is probed, including index 1 of absolute paths (a layout
    earlier releases of this framework produced).  Memoized per
    (img_path, img_type): panels are re-read every epoch and the probing
    stats would otherwise repeat per tile read.
    """
    # Absolute memo key: a relative filepath must not serve a stale
    # resolution across chdirs (same reason the decoded cache keys on the
    # resolved absolute path).
    memo_key = (os.path.abspath(img_path), img_type)
    with _resolved_paths_lock:
        hit = _resolved_paths.get(memo_key)
    if hit is not None:
        return hit

    parts = img_path.split("/")
    is_abs = img_path.startswith("/")
    ref_idx = 2 if is_abs else 1  # after the first real segment

    def joined(idx: int) -> str:
        p = parts[:idx] + [img_type] + parts[idx:]
        out = os.path.join(*p)
        return "/" + out.lstrip("/") if is_abs else out

    path = joined(ref_idx)
    if not os.path.isfile(path):
        for idx in range(1, len(parts)):
            if idx == ref_idx:
                continue
            cand = joined(idx)
            if os.path.isfile(cand):
                path = cand
                break
        else:
            # Unresolvable: return the reference position (the caller's
            # imdecode raises a path-bearing error) and do NOT memoize -
            # the file may appear later (e.g. datasets staged per split).
            return path
    with _resolved_paths_lock:
        _resolved_paths[memo_key] = path
    return path


# --------------------------------------------------------------------------- #
# Decoded-panel LRU cache.  Panels are revisited every epoch and PNG
# decoding a giga-pixel scan costs 50-100+ ms of the single host core the
# augmentation pipeline lives on; caching the decoded array amortizes it
# to zero for datasets that fit the budget.  Entries are returned
# read-only (augmentation never mutates its input; the flag makes any
# future in-place write a loud error instead of silent cache corruption);
# tile crops np.copy their slices already.
# --------------------------------------------------------------------------- #
DECODED_CACHE_MB = 1024  # set to 0 to disable

_decoded_cache: "collections.OrderedDict[str, np.ndarray]" = collections.OrderedDict()
_decoded_cache_lock = threading.Lock()
_decoded_cache_bytes = 0


def _decoded_cache_get(path: str):
    with _decoded_cache_lock:
        img = _decoded_cache.get(path)
        if img is not None:
            _decoded_cache.move_to_end(path)  # LRU refresh
        return img


def _decoded_cache_put(path: str, img: np.ndarray) -> None:
    global _decoded_cache_bytes
    budget = DECODED_CACHE_MB * 1024 * 1024
    if img.nbytes > budget:
        return
    img.setflags(write=False)
    with _decoded_cache_lock:
        # Membership must be checked under the lock: two workers decoding
        # the same panel concurrently would otherwise both insert, and the
        # overwritten entry's nbytes would never be decremented.
        prev = _decoded_cache.pop(path, None)
        if prev is not None:
            _decoded_cache_bytes -= prev.nbytes
        while _decoded_cache and _decoded_cache_bytes + img.nbytes > budget:
            _, evicted = _decoded_cache.popitem(last=False)
            _decoded_cache_bytes -= evicted.nbytes
        _decoded_cache[path] = img
        _decoded_cache_bytes += img.nbytes


def get_data(
    annot_path: str,
    data_path: str,
    img_types: list[str],
    read_images: bool = True,
) -> tuple[list[dict[str, Any]], dict[str, int], dict[str, int]]:
    """Parse the annotation CSV (utils.py:134-220).

    Returns:
      data: list of per-image dicts with filepath / width / height / depth /
        bboxes (each bbox: class, x1, y1, x2, y2 as ints).
      class_count: class name -> box count (bg appended with 0).
      class_mapping: class name -> index in first-seen order (bg appended).
    """
    t0 = time.time()
    df = pd.read_csv(annot_path)

    all_imgs: dict[str, dict[str, Any]] = {}
    class_count: dict[str, int] = {}
    class_mapping: dict[str, int] = {}

    for row in df.itertuples(index=False):
        img_name = getattr(row, "img_path")
        class_name = getattr(row, "label")
        class_count[class_name] = class_count.get(class_name, 0) + 1
        if class_name not in class_mapping:
            class_mapping[class_name] = len(class_mapping)

        if img_name not in all_imgs:
            filepath = data_path + "/" + img_name
            entry: dict[str, Any] = {"filepath": filepath, "bboxes": []}
            if read_images:
                img = get_image(filepath, img_types, random_type=False)
                entry["height"], entry["width"], entry["depth"] = img.shape
            all_imgs[img_name] = entry

        all_imgs[img_name]["bboxes"].append(
            {
                "class": class_name,
                "x1": int(getattr(row, "xmin")),
                "y1": int(getattr(row, "ymin")),
                "x2": int(getattr(row, "xmax")),
                "y2": int(getattr(row, "ymax")),
            }
        )

    data = list(all_imgs.values())
    if "bg" not in class_count:
        class_count["bg"] = 0
        class_mapping["bg"] = len(class_mapping)

    print(f"Read {annot_path}: {len(data)} images in {time.time() - t0:.2f}s")
    return data, class_count, class_mapping


class SampleSelector:
    """Round-robin class balancing (utils.py:19-59)."""

    def __init__(self, class_count: dict[str, int]):
        self.classes = [c for c, n in class_count.items() if n > 0]
        self._pos = 0
        self.curr_class = self.classes[0] if self.classes else None

    def _advance(self) -> None:
        self._pos = (self._pos + 1) % len(self.classes)
        self.curr_class = self.classes[self._pos]

    def skip_image_for_balanced_class(self, img_data: dict[str, Any]) -> bool:
        """True if the image lacks the currently wanted class."""
        return not any(b["class"] == self.curr_class for b in img_data["bboxes"])

    def skip_tile_for_balanced_class(self, img_data: dict[str, Any]) -> bool:
        """Like the image variant, but advances the wanted class on a hit."""
        if any(b["class"] == self.curr_class for b in img_data["bboxes"]):
            self._advance()
            return False
        return True
