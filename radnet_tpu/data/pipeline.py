"""Host data pipeline: fixed-shape sample construction, tile generators,
batching and device prefetch.

This is the TPU-native replacement of the reference's
``get_generator`` / ``get_tile_generator`` (/root/reference/faster_rcnn/
utils.py:222-552).  Key differences, by design:

* The reference emits variable-shaped (1, H, W, 3) images; here every
  sample is resized (longest side -> ``img_size``, aspect preserved) and
  zero-padded onto a fixed square ``canvas_size`` canvas, with the valid
  extent carried alongside - XLA compiles exactly one program shape.  For
  the square tiles that dominate both training and inference this is the
  same resize as the reference's shortest-side rule (utils.py:65-75).
* The reference runs the anchor-target generator (``calc_region_props``)
  on the host per sample - its hottest CPU loop.  Here the host only ships
  the (padded) GT boxes; RPN targets are computed *on device inside the
  fused train step* (radnet_tpu.ops.targets.rpn_targets).
* Samples are batched (``batch_size`` tiles/step vs the reference's fixed
  batch of 1) and prefetched to the device on a background thread.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Any, Iterator

import cv2
import numpy as np

import jax

from radnet_tpu.config import Config
from radnet_tpu.data import augment as aug
from radnet_tpu.data.dataset import SampleSelector, choose_img_type, get_image
from radnet_tpu.data.tiling import clip_boxes_to_tile, plan_tiles

# Keras 'caffe'-mode preprocessing constant: the reference converts BGR->RGB
# (utils.py:292) and then keras preprocess_input flips back to BGR and
# subtracts the ImageNet BGR means (resnet50.py:37-39, vgg16.py:25-27).  The
# double flip cancels; net effect is BGR minus these means.
IMAGENET_BGR_MEAN = np.array([103.939, 116.779, 123.68], dtype=np.float32)


def preprocess_image(img_bgr: np.ndarray) -> np.ndarray:
    """BGR uint8 -> float32, ImageNet-mean-centered (caffe convention).

    Host-side variant; the hot paths ship uint8 canvases and run
    :func:`preprocess_on_device` inside jit instead (4x fewer bytes over
    the host->device link).
    """
    return img_bgr.astype(np.float32) - IMAGENET_BGR_MEAN


def preprocess_on_device(images):
    """uint8 (or float) BGR canvases -> mean-centered float32, under jit."""
    import jax.numpy as jnp

    if images.dtype == jnp.uint8:
        return images.astype(jnp.float32) - jnp.asarray(IMAGENET_BGR_MEAN)
    return images.astype(jnp.float32)


def s2d_canvas_np(canvas: np.ndarray) -> np.ndarray:
    """Host-side space-to-depth of one (S, S, 3) uint8 canvas ->
    ((S+6)/2, (S+6)/2, 12) with the StemConv channel order
    (row-parity p)*6 + (col-parity q)*3 + c.

    Byte-for-byte the tensor the device-side s2d build produces from the
    zero-padded canvas (models/resnet.py::StemConv) - moving it to the
    host removes the trunk's worst layout stage from the device program
    (the (B, H, W, 3/12) channel-minor ops run at 3-12/128 lane
    occupancy; the s2d build alone measured 1.53 ms per 8-tile batch -
    BASELINE.md round 4).  Pure numpy data movement, ~1 MB/tile.
    """
    s = canvas.shape[0]
    xpad = np.zeros((s + 6, s + 6, 3), canvas.dtype)
    xpad[3 : 3 + s, 3 : 3 + s] = canvas
    h = s + 6
    xw = xpad.reshape(h, h // 2, 6)          # free reshape: W s2d
    return np.concatenate([xw[0::2], xw[1::2]], axis=-1)  # H s2d


def s2d_mean_offsets(canvas_size: int) -> np.ndarray:
    """The centering map for host-s2d canvases: subtracting it from the
    float s2d tensor equals (center the WHOLE canvas, zero-pad by 3,
    s2d) - i.e. the per-channel BGR mean masked to the canvas region so
    the 3-px ZeroPadding2D ring stays true zero.  Shape
    ((S+6)/2, (S+6)/2, 12) float32; pass as a jit ARGUMENT (CLAUDE.md
    pitfall #10)."""
    s = canvas_size
    mask = np.zeros((s + 6, s + 6), np.float32)
    mask[3 : 3 + s, 3 : 3 + s] = 1.0
    parts = []
    for p in (0, 1):
        for q in (0, 1):
            sub = mask[p::2, q::2]
            for c in range(3):
                parts.append(sub * IMAGENET_BGR_MEAN[c])
    return np.stack(parts, axis=-1)


def longest_side_dims(w: int, h: int, img_size: int) -> tuple[int, int]:
    """Longest-side-to-``img_size`` resize dims (aspect preserved, >=1 px).

    Single source of the prescale rounding rule: :func:`resize_to_canvas`,
    :func:`prescale_for_augment` and :func:`crop_tile_prescaled` must agree
    bit-for-bit (the tile cache's transparency depends on it)."""
    scale = float(img_size) / max(h, w)
    return max(1, int(round(w * scale))), max(1, int(round(h * scale)))


def resize_to_canvas(
    img: np.ndarray, img_size: int, canvas_size: int
) -> tuple[np.ndarray, float, int, int]:
    """Resize so the longest side equals ``img_size`` (aspect preserved),
    then zero-pad bottom/right to ``canvas_size``.

    Returns (canvas, scale, valid_w, valid_h)."""
    h, w = img.shape[:2]
    scale = float(img_size) / max(h, w)
    new_w, new_h = longest_side_dims(w, h, img_size)
    if (new_w, new_h) == (w, h):
        # Identity resize (common when the tile was prescaled to img_size
        # before augmentation): cv2's 1:1 bicubic lands exactly on source
        # pixels, so skipping it is bit-identical and saves ~1 ms/sample.
        resized = img
    else:
        resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    canvas = np.zeros((canvas_size, canvas_size, 3), dtype=resized.dtype)
    canvas[:new_h, :new_w] = resized
    return canvas, scale, new_w, new_h


def shortest_side_dims(w: int, h: int, img_size: int) -> tuple[int, int]:
    """The reference's resize rule: SHORTEST side to ``img_size``, other
    side scaled by the same factor and **truncated** to int - exact mirror
    of ``get_new_img_size`` (/root/reference/faster_rcnn/utils.py:65-75).
    For square inputs this equals :func:`longest_side_dims`."""
    if w <= h:
        f = float(img_size) / w
        return img_size, int(f * h)
    f = float(img_size) / h
    return int(f * w), img_size


def resize_to_canvas_shortest(
    img: np.ndarray, img_size: int, canvas_hw: tuple[int, int]
) -> tuple[np.ndarray, float, int, int]:
    """Shortest-side-to-``img_size`` resize onto a rectangular canvas.

    The reference feeds the resized (possibly much wider/taller than
    ``img_size``) image directly to its dynamic-shape graph; here it lands
    on a fixed ``canvas_hw`` bucket (zero-padded bottom/right) so XLA
    compiles one program per bucket.  If the resized dims exceed the
    bucket (aspect beyond the configured cap), the scale is reduced to
    fit - the shortest side then resolves below ``img_size``, which is
    still at least the longest-side-fit resolution.

    Returns (canvas, scale, valid_w, valid_h) with a SINGLE uniform scale
    like the reference's ``ratio`` (RADNet.py:53-74)."""
    h, w = img.shape[:2]
    new_w, new_h = shortest_side_dims(w, h, img_size)
    ch, cw = canvas_hw
    scale = float(img_size) / min(h, w)
    if new_w > cw or new_h > ch:
        # Reduce the SHORT side by the fit factor, then derive the long
        # side from the one uniform ratio actually returned: truncating
        # both dims independently drifts the long axis by a few pixels
        # when boxes are reverse-mapped with the single scale.
        g = min(cw / new_w, ch / new_h)
        if w <= h:
            new_w = max(1, int(new_w * g))
            scale = new_w / w
            new_h = min(ch, max(1, int(h * scale)))
        else:
            new_h = max(1, int(new_h * g))
            scale = new_h / h
            new_w = min(cw, max(1, int(w * scale)))
    if (new_w, new_h) == (w, h):
        resized = img
    else:
        resized = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    canvas = np.zeros((ch, cw, 3), dtype=resized.dtype)
    canvas[:new_h, :new_w] = resized
    return canvas, scale, new_w, new_h


def prescale_for_augment(
    img: np.ndarray,
    meta: dict[str, Any],
    config: Config,
) -> tuple[np.ndarray, dict[str, Any]]:
    """Resize ``img`` (longest side -> ``img_size``) and scale its bbox
    dicts, so the geometric augmentation runs at canvas scale
    (``Config.augment_at_canvas_scale``).  No-op when the image is already
    at or below the working size."""
    h, w = img.shape[:2]
    if max(h, w) <= config.img_size:
        return img, meta
    new_w, new_h = longest_side_dims(w, h, config.img_size)
    img = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_CUBIC)
    return img, scale_meta_boxes(meta, w, h, new_w, new_h)


def scale_meta_boxes(
    meta: dict[str, Any], w: int, h: int, new_w: int, new_h: int
) -> dict[str, Any]:
    """Scale ``meta``'s bbox dicts from (w, h) to (new_w, new_h) space
    (the box half of :func:`prescale_for_augment`)."""
    sx, sy = new_w / float(w), new_h / float(h)
    boxes = []
    for b in meta["bboxes"]:
        nb = dict(b)
        # Float coords: int floor/ceil here would inflate small boxes by
        # up to 2 px at canvas scale (~17% of a 12 px figure).  The
        # geometric ops handle floats (flip/rot90 arithmetic is exact;
        # the warp ops quantize via _write_back exactly like the
        # reference does at its own scale), and make_sample keeps floats.
        nb["x1"] = b["x1"] * sx
        nb["y1"] = b["y1"] * sy
        nb["x2"] = min(b["x2"] * sx, float(new_w))
        nb["y2"] = min(b["y2"] * sy, float(new_h))
        if nb["x2"] > nb["x1"] and nb["y2"] > nb["y1"]:
            boxes.append(nb)
    meta = dict(meta)
    meta["bboxes"] = boxes
    meta["width"] = new_w
    meta["height"] = new_h
    return meta


# --------------------------------------------------------------------------- #
# Prescaled-tile LRU cache.  The crop + bicubic prescale of a tile window
# is deterministic per (resolved panel path, window, target size) - only
# the augmentation after it is random - and together they are ~half of the
# warm per-sample host cost (measured 7 of 15 ms at the 2400-panel/1216-
# tile synthetic geometry).  Epoch 2+ revisits the same windows, so a
# byte-bounded cache turns both into a lookup.  Entries are read-only
# (augmentation is functional over its input, like the decoded-panel
# cache's contract in data/dataset.py).
# --------------------------------------------------------------------------- #
_tile_cache: "dict[tuple, np.ndarray]" = {}
_tile_cache_lock = threading.Lock()
_tile_cache_bytes = 0


def _tile_cache_clear() -> None:  # test hook
    global _tile_cache_bytes
    with _tile_cache_lock:
        _tile_cache.clear()
        _tile_cache_bytes = 0


def crop_tile_prescaled(
    img: np.ndarray,
    tile: tuple[int, int, int, int],
    config: Config,
    cache_key: tuple | None = None,
    prescale: bool = True,
) -> np.ndarray:
    """Crop ``tile`` (x1, y1, x2, y2) out of ``img`` and, when ``prescale``,
    resize its longest side down to ``config.img_size``.  With a
    ``cache_key`` the result is memoized in a byte-bounded LRU
    (``Config.prescaled_tile_cache_mb``); cached arrays are read-only."""
    global _tile_cache_bytes
    budget = config.prescaled_tile_cache_mb * 1024 * 1024
    if cache_key is not None and budget > 0:
        with _tile_cache_lock:
            hit = _tile_cache.get(cache_key)
            if hit is not None:
                return hit

    out = np.ascontiguousarray(img[tile[1] : tile[3], tile[0] : tile[2], :])
    if prescale:
        h, w = out.shape[:2]
        if max(h, w) > config.img_size:
            new_w, new_h = longest_side_dims(w, h, config.img_size)
            out = cv2.resize(out, (new_w, new_h), interpolation=cv2.INTER_CUBIC)

    if cache_key is not None and 0 < out.nbytes <= budget:
        out.setflags(write=False)
        with _tile_cache_lock:
            prev = _tile_cache.pop(cache_key, None)
            if prev is not None:
                _tile_cache_bytes -= prev.nbytes
            while _tile_cache and _tile_cache_bytes + out.nbytes > budget:
                # dicts preserve insertion order; popping the first item is
                # FIFO eviction - cheap and close enough to LRU for the
                # epoch-cyclic access pattern (every live key is touched
                # once per epoch, so recency and insertion age coincide).
                _tile_cache_bytes -= _tile_cache.pop(next(iter(_tile_cache))).nbytes
            _tile_cache[cache_key] = out
            _tile_cache_bytes += out.nbytes
    return out


def make_sample(
    img_bgr: np.ndarray,
    bboxes: list[dict[str, Any]],
    config: Config,
    class_mapping: dict[str, int],
) -> dict[str, np.ndarray]:
    """One fixed-shape training/eval sample from an augmented tile."""
    h, w = img_bgr.shape[:2]
    canvas, scale, valid_w, valid_h = resize_to_canvas(
        img_bgr, config.img_size, config.canvas_size
    )
    # Ship the raw uint8 canvas; mean-centering happens on device.
    image = np.ascontiguousarray(canvas, dtype=np.uint8)

    g = config.max_gt_boxes
    gt_boxes = np.zeros((g, 4), dtype=np.float32)
    gt_classes = np.zeros((g,), dtype=np.int32)
    gt_mask = np.zeros((g,), dtype=bool)
    sx = valid_w / float(w)
    sy = valid_h / float(h)
    for i, b in enumerate(bboxes[:g]):
        gt_boxes[i] = (b["x1"] * sx, b["y1"] * sy, b["x2"] * sx, b["y2"] * sy)
        gt_classes[i] = class_mapping[b["class"]]
        gt_mask[i] = True

    return {
        "image": image,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_mask": gt_mask,
        "valid_wh": np.array([valid_w, valid_h], dtype=np.float32),
        "sample_valid": np.asarray(True),
    }


def pad_sample(config: Config) -> dict[str, np.ndarray]:
    """An all-masked sample used to fill partial validation batches."""
    s = config.canvas_size
    return {
        "image": np.zeros((s, s, 3), dtype=np.uint8),
        "gt_boxes": np.zeros((config.max_gt_boxes, 4), dtype=np.float32),
        "gt_classes": np.zeros((config.max_gt_boxes,), dtype=np.int32),
        "gt_mask": np.zeros((config.max_gt_boxes,), dtype=bool),
        "valid_wh": np.array([config.canvas_size, config.canvas_size], np.float32),
        "sample_valid": np.asarray(False),
    }


def get_new_img_size(
    width: int, height: int, img_min_side: int = 300
) -> tuple[int, int]:
    """Shortest-side resize dims, the reference's sizing rule
    (utils.py:65-75).  The fixed-canvas pipeline uses the longest-side rule
    in :func:`resize_to_canvas` instead (identical for square tiles); this
    helper is kept for API parity and aspect computations."""
    if width <= height:
        f = float(img_min_side) / width
        return img_min_side, int(f * height)
    f = float(img_min_side) / height
    return int(f * width), img_min_side


def image_sample_generator(
    data: list[dict[str, Any]],
    config: Config,
    class_mapping: dict[str, int],
    train_mode: bool = True,
    seed: int = 0,
    image_loader=get_image,
) -> Iterator[dict[str, np.ndarray]]:
    """Full-image (non-tiled) sample stream - the reference's plain
    ``get_generator`` (utils.py:222-307): shuffle in train mode, augment,
    resize, yield one fixed-shape sample per image.  Finite in eval mode.

    Note: a full panel squeezed onto the 608-canvas loses small figures;
    tiling (:func:`tile_sample_generator`) is the production path, exactly
    as in the reference where train.py uses the tile generator.
    """
    rng = np.random.default_rng(seed)
    data = list(data)
    while True:
        if train_mode:
            rng.shuffle(data)
        for img_data in data:
            # Draw the type from the generator's seeded stream (the loader
            # contract is random_type=False - see tile_sample_generator);
            # delegating the draw to the loader used an unseeded fallback
            # rng, making the stream nondeterministic under use_img_type.
            img_type = (
                choose_img_type(config.img_types, rng)
                if config.use_img_type
                else config.img_types[0]
            )
            img = image_loader(img_data["filepath"], [img_type], random_type=False)
            meta = {
                "filepath": img_data["filepath"],
                "width": img.shape[1],
                "height": img.shape[0],
                "bboxes": [dict(b) for b in img_data["bboxes"]],
            }
            if train_mode and config.augment_at_canvas_scale:
                img, meta = prescale_for_augment(img, meta, config)
            meta, img = aug.augment(meta, img, config, do_augment=train_mode, rng=rng)
            if not meta["bboxes"]:
                continue
            yield make_sample(img, meta["bboxes"], config, class_mapping)
        if not train_mode:
            return


def tile_sample_generator(
    data: list[dict[str, Any]],
    config: Config,
    class_count: dict[str, int],
    class_mapping: dict[str, int],
    train_mode: bool = True,
    seed: int = 0,
    image_loader=get_image,
) -> Iterator[dict[str, np.ndarray]]:
    """Yield fixed-shape samples from tiled panels.

    Mirrors get_tile_generator (utils.py:310-552): class-balanced image /
    tile skipping, random tile selection up to ``max_n_tiles_{train,val}``,
    bbox clipping at ``tile_bbox_clip_threshold``, augmentation in train
    mode, optional full-image sample.  Infinite in train mode; one pass in
    eval mode (the reference signals the epoch end with StopIteration,
    utils.py:551-552).

    ``image_loader(filepath, img_types, random_type=False)`` contract: THIS
    generator draws the per-tile image type itself (so the tile cache can
    key on it) and always calls the loader with a single-element type list
    and ``random_type=False``; a custom loader must not do its own type
    selection.
    """
    rng = np.random.default_rng(seed)
    selector = SampleSelector(class_count)
    data = list(data)
    # The tile cache is process-global, so tiles are only cached when they
    # are a pure function of the key: the default loader reads pixels from
    # the filesystem, making (absolute path, img_type, window, size) a
    # complete identity.  Relative paths would collide across chdirs /
    # same-layout datasets, and a custom image_loader's output need not
    # depend on the path at all - those runs bypass the cache.
    cacheable = image_loader is get_image

    while True:
        if train_mode:
            rng.shuffle(data)
        for img_data in data:
            if (
                train_mode
                and config.balanced_classes
                and selector.skip_image_for_balanced_class(img_data)
            ):
                continue

            tiles = plan_tiles(
                img_data["width"], img_data["height"], config.tile_size, config.tile_overlap
            )
            if len(tiles) == 0:
                continue

            try:
                # First read is always the primary type (utils.py:344); the
                # per-tile re-read below applies the random type choice.
                img = image_loader(
                    img_data["filepath"], config.img_types, random_type=False
                )
            except (FileNotFoundError, OSError) as e:
                # Skip unreadable images and keep training, like the
                # reference's catch-and-continue blocks (utils.py:276-289,
                # 450-465).
                print(f"skipping {img_data['filepath']}: {e}")
                continue

            n_tiles = min(
                len(tiles),
                config.max_n_tiles_train if train_mode else config.max_n_tiles_val,
            )
            remaining = np.arange(len(tiles))
            emitted = 0
            while emitted < n_tiles and remaining.size > 0:
                pick = rng.integers(0, remaining.size)
                tile = tiles[remaining[pick]]
                remaining = np.delete(remaining, pick)

                img_type = config.img_types[0]
                if config.use_img_type:
                    # The type draw happens HERE even though the pixels are
                    # only read further down: the rng call sits at the same
                    # point of the stream as the reference's per-tile
                    # re-read (utils.py:390), and the tile cache keys on it.
                    img_type = choose_img_type(config.img_types, rng)
                # Box survival and class-balance skips are pure coordinate /
                # counter logic - decide them BEFORE paying the per-tile
                # re-read + crop + bicubic prescale (on sparse panels most
                # picked tiles have no surviving boxes, and boxless tiles
                # must not evict real tiles from the byte-bounded cache).
                boxes_arr = np.array(
                    [[b["x1"], b["y1"], b["x2"], b["y2"]] for b in img_data["bboxes"]]
                )
                clipped, keep = clip_boxes_to_tile(
                    boxes_arr, tile, config.tile_bbox_clip_threshold
                )
                tile_boxes = [
                    dict(img_data["bboxes"][i])
                    for i in range(len(keep))
                    if keep[i]
                ]
                if not tile_boxes:
                    continue
                for i in range(clipped.shape[0]):
                    tile_boxes[i]["x1"] = int(clipped[i, 0] - tile[0])
                    tile_boxes[i]["y1"] = int(clipped[i, 1] - tile[1])
                    tile_boxes[i]["x2"] = int(np.ceil(clipped[i, 2] - tile[0]))
                    tile_boxes[i]["y2"] = int(np.ceil(clipped[i, 3] - tile[1]))

                tw, th = int(tile[2] - tile[0]), int(tile[3] - tile[1])
                tile_data = {
                    "filepath": img_data["filepath"],
                    "width": tw,
                    "height": th,
                    "bboxes": tile_boxes,
                }
                if (
                    train_mode
                    and config.balanced_classes
                    and selector.skip_tile_for_balanced_class(tile_data)
                ):
                    continue

                if config.use_img_type:
                    # The reference re-reads the image per tile so each tile
                    # can come from a randomly chosen image type
                    # (utils.py:390).
                    img = image_loader(
                        img_data["filepath"], [img_type], random_type=False
                    )
                prescale = train_mode and config.augment_at_canvas_scale
                tile_img = crop_tile_prescaled(
                    img,
                    tuple(int(v) for v in tile),
                    config,
                    cache_key=(
                        (
                            os.path.abspath(img_data["filepath"]),
                            img_type,
                            tuple(int(v) for v in tile),
                            config.img_size if prescale else 0,
                        )
                        if cacheable
                        else None
                    ),
                    prescale=prescale,
                )
                if (tile_img.shape[1], tile_img.shape[0]) != (tw, th):
                    # The image half of the prescale already happened inside
                    # crop_tile_prescaled (possibly as a cache hit); bring
                    # the boxes to the same scale.
                    tile_data = scale_meta_boxes(
                        tile_data, tw, th, tile_img.shape[1], tile_img.shape[0]
                    )
                tile_data, tile_img = aug.augment(
                    tile_data, tile_img, config, do_augment=train_mode, rng=rng
                )
                if not tile_data["bboxes"]:
                    continue
                emitted += 1
                yield make_sample(tile_img, tile_data["bboxes"], config, class_mapping)

            if config.include_full_img and img_data["bboxes"]:
                full_data = {
                    "filepath": img_data["filepath"],
                    "width": img_data["width"],
                    "height": img_data["height"],
                    "bboxes": [dict(b) for b in img_data["bboxes"]],
                }
                full_img = img
                if train_mode and config.augment_at_canvas_scale:
                    full_img, full_data = prescale_for_augment(
                        full_img, full_data, config
                    )
                full_data, full_img = aug.augment(
                    full_data, full_img, config, do_augment=train_mode, rng=rng
                )
                if full_data["bboxes"]:
                    yield make_sample(
                        full_img, full_data["bboxes"], config, class_mapping
                    )

        if not train_mode:
            return


def batch_samples(samples: list[dict[str, np.ndarray]]) -> dict[str, np.ndarray]:
    return {k: np.stack([s[k] for s in samples]) for k in samples[0]}


def batched(
    sample_iter: Iterator[dict[str, np.ndarray]],
    batch_size: int,
    config: Config,
    drop_remainder: bool = False,
) -> Iterator[dict[str, np.ndarray]]:
    """Group samples into fixed-size batches; partial final batches are
    padded with masked samples (eval) unless dropped."""
    buf: list[dict[str, np.ndarray]] = []
    for s in sample_iter:
        buf.append(s)
        if len(buf) == batch_size:
            yield batch_samples(buf)
            buf = []
    if buf and not drop_remainder:
        while len(buf) < batch_size:
            buf.append(pad_sample(config))
        yield batch_samples(buf)


def parallel_sample_generator(
    data: list[dict[str, Any]],
    config: Config,
    class_count: dict[str, int],
    class_mapping: dict[str, int],
    *,
    num_workers: int = 4,
    seed: int = 0,
    queue_size: int = 64,
    image_loader=get_image,
) -> Iterator[dict[str, np.ndarray]]:
    """Training-mode sample stream from ``num_workers`` augmentation threads.

    The reference feeds training from a single python generator doing
    imread + augmentation + target-gen inline (utils.py:310-552), which
    caps the whole run at one CPU core.  Here each worker runs its own
    :func:`tile_sample_generator` over the full dataset with a distinct
    seed (shuffle order and augmentation draws differ per worker); cv2 /
    numpy release the GIL for the heavy ops, so workers genuinely overlap.
    Infinite stream; ordering is nondeterministic across workers by design
    (training-only - validation uses the sequential generator).
    """
    q: queue.Queue = queue.Queue(maxsize=queue_size)
    stop = threading.Event()

    class _WorkerError:
        """Sentinel carrying a worker exception to the consumer."""

        def __init__(self, exc: BaseException):
            self.exc = exc

    def worker(wid: int) -> None:
        try:
            gen = tile_sample_generator(
                data,
                config,
                class_count,
                class_mapping,
                train_mode=True,
                seed=seed + 1000 * wid,
                image_loader=image_loader,
            )
            while not stop.is_set():
                try:
                    sample = next(gen)
                except StopIteration:  # pragma: no cover - train mode is infinite
                    return
                q.put(sample)
        except BaseException as e:
            # Propagate instead of dying silently: with all workers dead the
            # consumer would block on q.get() forever and training would
            # hang with no error (mirrors prefetch_to_device's pattern).
            q.put(_WorkerError(e))

    threads = [
        threading.Thread(target=worker, args=(w,), daemon=True)
        for w in range(num_workers)
    ]
    for t in threads:
        t.start()
    try:
        while True:
            item = q.get()
            if isinstance(item, _WorkerError):
                raise item.exc
            yield item
    finally:
        stop.set()


def make_device_preparer(config: Config, seed: int = 0, train: bool = True):
    """On-device batch finisher to run inside the prefetch thread.

    Applies the photometric augmentation (train mode, when
    ``augment_photometric_on_device``) and the uint8 -> mean-centered
    float conversion as one small jitted program *before* the batch
    reaches the train step.  Two wins on TPU: the work overlaps the
    previous step's compute (the prefetch thread dispatches it), and the
    train step's entry layout becomes float - feeding uint8 straight into
    the big step costs a measured ~24 ms/step in entry-layout conversion
    vs ~4 ms for this standalone pass.  The in-step path
    (engine/steps.py) remains as the fallback for raw uint8 batches, and
    skips itself on the float batches this produces (dtype guard).
    """
    base_key = jax.random.PRNGKey(seed)
    from radnet_tpu.ops.augment_device import grey_mode

    grey = grey_mode(config)
    do_aug = bool(
        train
        and config.augment_photometric_on_device
        and (config.use_brightness or config.use_noise)
    )
    use_b, use_n = config.use_brightness, config.use_noise

    @jax.jit
    def _finish(images, key):
        import jax.numpy as jnp

        if do_aug:
            from radnet_tpu.ops.augment_device import photometric_augment

            images = photometric_augment(
                images, key, grey=grey, use_brightness=use_b, use_noise=use_n
            )  # float32, 0..255
        return images.astype(jnp.float32) - jnp.asarray(IMAGENET_BGR_MEAN)

    counter = [0]

    def prepare(batch):
        img = batch["image"]
        if img.dtype != np.uint8:
            return batch
        key = jax.random.fold_in(base_key, counter[0])
        counter[0] += 1
        out = dict(batch)
        out["image"] = _finish(img, key)
        return out

    return prepare


def prefetch_to_device(
    batch_iter: Iterator[dict[str, np.ndarray]],
    size: int = 2,
    sharding=None,
    prepare=None,
    synchronous: bool | None = None,
) -> Iterator[Any]:
    """Background-thread prefetch of host batches onto the device (or a
    sharded layout when ``sharding`` is given).  ``prepare``: optional
    device-side finisher (see :func:`make_device_preparer`) dispatched
    from the producer thread so it overlaps the consumer's compute.

    ``synchronous`` (default: auto = True on the CPU backend) disables
    the producer thread and runs the same pipeline inline.  The virtual
    multi-device CPU platform backs all devices with ONE task pool; a
    preparer program dispatched from this thread while the consumer's
    sharded train step executes interleaves two programs' per-device
    tasks on that pool, and the collective rendezvous then deadlocks
    (every pool thread blocked waiting for a participant whose task is
    queued behind them - observed on a 1-core host 2026-08-20, all 8
    pool threads in futex_wait forever).  On real TPU backends programs
    execute on device and the overlap is the point, so threading stays.
    """
    if synchronous is None:
        try:
            if sharding is not None:
                platform = next(iter(sharding.device_set)).platform
            else:
                platform = jax.default_backend()
        except Exception:
            platform = jax.default_backend()
        synchronous = platform == "cpu"
    def _inline():
        for batch in batch_iter:
            if sharding is not None:
                b = jax.device_put(batch, sharding)
            else:
                b = jax.device_put(batch)
            yield prepare(b) if prepare is not None else b

    if synchronous:
        return _inline()
    return _threaded_prefetch(batch_iter, size, sharding, prepare)


def _threaded_prefetch(batch_iter, size, sharding, prepare) -> Iterator[Any]:
    q: queue.Queue = queue.Queue(maxsize=size)
    sentinel = object()
    error: list[BaseException] = []
    stop = threading.Event()

    def _put(item) -> bool:
        """Bounded put that gives up when the consumer is gone - an
        abandoned producer would otherwise block forever on a full queue,
        pinning ``size`` prepared batches in device memory for the rest of
        the process (fit() pulls exactly epoch_length * n_epochs batches
        from an infinite stream, then stops)."""
        while not stop.is_set():
            try:
                q.put(item, timeout=0.1)
                return True
            except queue.Full:
                continue
        return False

    def producer():
        try:
            for batch in batch_iter:
                if stop.is_set():
                    return
                if sharding is not None:
                    batch = jax.device_put(batch, sharding)
                else:
                    batch = jax.device_put(batch)
                if prepare is not None:
                    batch = prepare(batch)
                if not _put(batch):
                    return
        except BaseException as e:  # re-raised on the consumer side
            error.append(e)
        finally:
            _put(sentinel)

    t = threading.Thread(target=producer, daemon=True, name="prefetch_to_device")
    t.start()
    try:
        while True:
            item = q.get()
            if item is sentinel:
                if error:
                    raise error[0]
                return
            yield item
    finally:
        # Runs on normal exhaustion AND on abandonment (GeneratorExit when
        # the consumer stops early): release the producer if it is blocked
        # on a full queue, then let it exit.
        stop.set()
        try:
            while True:
                q.get_nowait()
        except queue.Empty:
            pass
