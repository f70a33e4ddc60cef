"""Data engine tests: tiling plan, augmentation invariants, generator flow."""

import os

import numpy as np

from radnet_tpu.data import augment as aug
from radnet_tpu.data.dataset import SampleSelector, get_data
from radnet_tpu.data.pipeline import (
    batched,
    make_sample,
    resize_to_canvas,
    tile_sample_generator,
)
from radnet_tpu.data.tiling import clip_boxes_to_tile, plan_tiles
from tests.util import tiny_config


# --------------------------------------------------------------------------- #
# Tiling
# --------------------------------------------------------------------------- #
def test_plan_tiles_reference_geometry():
    # 4000x4000 panel, 2000 tiles, step 400 => 6x6 windows, edge-snapped.
    tiles = plan_tiles(4000, 4000, 2000, 400)
    assert tiles.shape == (36, 4)
    assert tiles[:, 0].min() == 0 and tiles[:, 2].max() == 4000
    widths = tiles[:, 2] - tiles[:, 0]
    assert (widths == 2000).all()


def test_plan_tiles_small_image_single_window():
    tiles = plan_tiles(500, 700, 2000, 400)
    # image smaller than tile: single edge-snapped window covering it
    assert tiles.shape == (1, 4)
    np.testing.assert_array_equal(tiles[0], [0, 0, 500, 700])


def test_clip_boxes_to_tile_threshold():
    boxes = np.array(
        [
            [100, 100, 200, 200],  # fully inside
            [-100, 100, 60, 200],  # half outside: keeps 60/160 < 0.75 -> drop
            [950, 100, 1050, 200],  # 50% outside -> drop at 0.75
            [980, 980, 1500, 1500],  # mostly outside -> drop
        ]
    )
    clipped, keep = clip_boxes_to_tile(boxes, np.array([0, 0, 1000, 1000]), 0.75)
    assert keep.tolist() == [True, False, False, False]
    np.testing.assert_array_equal(clipped[0], [100, 100, 200, 200])


# --------------------------------------------------------------------------- #
# Augmentation invariants
# --------------------------------------------------------------------------- #
def _img_with_box():
    img = np.zeros((80, 120, 3), np.uint8)
    img[20:60, 30:90] = 128  # content region
    boxes = [{"class": "boat", "x1": 30, "y1": 20, "x2": 90, "y2": 60}]
    return img, boxes


def test_horizontal_flip_roundtrip():
    img, boxes = _img_with_box()
    img2, boxes2 = aug.horizontal_flip(img.copy(), [dict(b) for b in boxes])
    assert boxes2[0]["x1"] == 120 - 90 and boxes2[0]["x2"] == 120 - 30
    img3, boxes3 = aug.horizontal_flip(img2, boxes2)
    np.testing.assert_array_equal(img3, img)
    assert boxes3 == boxes


def test_vertical_flip_roundtrip():
    img, boxes = _img_with_box()
    img2, boxes2 = aug.vertical_flip(img.copy(), [dict(b) for b in boxes])
    assert boxes2[0]["y1"] == 80 - 60 and boxes2[0]["y2"] == 80 - 20
    img3, boxes3 = aug.vertical_flip(img2, boxes2)
    np.testing.assert_array_equal(img3, img)
    assert boxes3 == boxes


def test_ninety_rotation_content_follows_box():
    rng = np.random.default_rng(5)
    for _ in range(6):
        img, boxes = _img_with_box()
        img2, boxes2 = aug.ninety_degree_rotation(img.copy(), [dict(b) for b in boxes], rng)
        b = boxes2[0]
        # box must stay within image bounds and have positive area
        h, w = img2.shape[:2]
        assert 0 <= b["x1"] < b["x2"] <= w
        assert 0 <= b["y1"] < b["y2"] <= h
        # content region inside the box must be nonzero
        crop = img2[b["y1"] : b["y2"], b["x1"] : b["x2"]]
        assert crop.mean() > 60


def test_any_degree_rotation_keeps_box_on_content():
    rng = np.random.default_rng(7)
    img, boxes = _img_with_box()
    img2, boxes2 = aug.any_degree_rotation(img.copy(), [dict(b) for b in boxes], rng)
    assert len(boxes2) == 1
    b = boxes2[0]
    h, w = img2.shape[:2]
    assert 0 <= b["x1"] < b["x2"] <= w + 1
    assert 0 <= b["y1"] < b["y2"] <= h + 1
    crop = img2[max(b["y1"], 0) : b["y2"], max(b["x1"], 0) : b["x2"]]
    assert crop.mean() > 30


def test_shear_preserves_box_validity():
    rng = np.random.default_rng(11)
    img, boxes = _img_with_box()
    img2, boxes2 = aug.shear(img.copy(), [dict(b) for b in boxes], rng)
    b = boxes2[0]
    assert b["x2"] > b["x1"] and b["y2"] > b["y1"]


def test_brightness_preserves_background():
    rng = np.random.default_rng(3)
    img, boxes = _img_with_box()
    out, _ = aug.brightness(img.copy(), boxes, rng)
    assert (out[img == 0] == 0).all()
    assert out.dtype == np.uint8


def test_noise_ops_preserve_background_and_dtype():
    rng = np.random.default_rng(3)
    img, boxes = _img_with_box()
    for fn in (aug.salt_and_pepper_noise, aug.gaussian_noise, aug.poisson_noise):
        out, _ = fn(img.copy(), boxes, "enhanced_topo_grey", rng)
        assert out.dtype == np.uint8
        assert (out[img[:, :, 0] == 0, 0] == 0).all(), fn.__name__
        # grey-aware: all three channels identical
        np.testing.assert_array_equal(out[:, :, 0], out[:, :, 1])


def test_contrast_output_range():
    rng = np.random.default_rng(9)
    img, boxes = _img_with_box()
    out, _ = aug.contrast(img.copy(), boxes, rng)
    assert out.dtype == np.uint8


def test_augment_disabled_is_identity():
    img, boxes = _img_with_box()
    data = {"filepath": "x", "width": 120, "height": 80, "bboxes": boxes}
    out_data, out_img = aug.augment(data, img, tiny_config(), do_augment=False)
    np.testing.assert_array_equal(out_img, img)
    assert out_data["bboxes"] == boxes


# --------------------------------------------------------------------------- #
# Sample construction + generator
# --------------------------------------------------------------------------- #
def test_resize_to_canvas_and_sample():
    cfg = tiny_config()
    img = np.full((120, 240, 3), 100, np.uint8)  # 2:1 landscape
    canvas, scale, vw, vh = resize_to_canvas(img, cfg.img_size, cfg.canvas_size)
    assert canvas.shape == (64, 64, 3)
    assert vw == 60 and vh == 30
    assert scale == 60 / 240
    # padding is zero
    assert (canvas[vh:, :, :] == 0).all() and (canvas[:, vw:, :] == 0).all()

    boxes = [{"class": "boat", "x1": 40, "y1": 20, "x2": 200, "y2": 100}]
    sample = make_sample(img, boxes, cfg, cfg.class_mapping)
    assert sample["image"].shape == (64, 64, 3)
    assert sample["gt_mask"][0] and not sample["gt_mask"][1]
    np.testing.assert_allclose(
        sample["gt_boxes"][0], np.array([40, 20, 200, 100]) * 0.25, atol=1e-5
    )


def test_sample_selector_round_robin():
    sel = SampleSelector({"boat": 3, "human": 2, "bg": 0})
    assert sel.classes == ["boat", "human"]
    img_boat = {"bboxes": [{"class": "boat"}]}
    img_human = {"bboxes": [{"class": "human"}]}
    assert not sel.skip_tile_for_balanced_class(img_boat)  # wanted boat -> hit
    assert sel.curr_class == "human"
    assert sel.skip_tile_for_balanced_class(img_boat)  # wants human now
    assert not sel.skip_tile_for_balanced_class(img_human)


def _write_synthetic_dataset(tmp_path, cfg, n_images=3):
    """Tiny on-disk dataset in the reference layout: data/<type>/img_i.png"""
    import cv2
    import pandas as pd

    img_type = cfg.img_types[0]
    rows = []
    rng = np.random.default_rng(0)
    for i in range(n_images):
        img = np.zeros((100, 100, 3), np.uint8)
        x1, y1 = rng.integers(5, 30, 2)
        w, h = rng.integers(30, 50, 2)
        img[y1 : y1 + h, x1 : x1 + w] = rng.integers(90, 200)
        name = f"img_{i}.png"
        d = tmp_path / "data" / img_type
        d.mkdir(parents=True, exist_ok=True)
        cv2.imwrite(str(d / name), img)
        cls = "boat" if i % 2 == 0 else "human"
        rows.append(
            {"img_path": name, "label": cls, "xmin": x1, "ymin": y1,
             "xmax": x1 + w, "ymax": y1 + h}
        )
    csv = tmp_path / "annot.csv"
    pd.DataFrame(rows).to_csv(csv, index=False)
    return str(csv), str(tmp_path / "data")


def test_get_data_and_generator_end_to_end(tmp_path, monkeypatch):
    cfg = tiny_config()
    cfg.tile_size = 100
    cfg.tile_overlap = 50
    cfg.use_noise = False  # keep CPU time down
    _write_synthetic_dataset(tmp_path, cfg)
    # The image-type directory is the second *relative* path segment
    # (utils.py:124-126), so address the dataset relatively.
    monkeypatch.chdir(tmp_path)
    csv, data_path = "annot.csv", "data"

    data, class_count, class_mapping = get_data(csv, data_path, cfg.img_types)
    assert len(data) == 3
    assert class_count["boat"] == 2 and class_count["human"] == 1
    assert class_mapping["bg"] == len(class_mapping) - 1
    assert data[0]["width"] == 100 and data[0]["height"] == 100

    gen = tile_sample_generator(
        data, cfg, class_count, cfg.class_mapping, train_mode=True, seed=1
    )
    seen = 0
    for sample in gen:
        assert sample["image"].shape == (64, 64, 3)
        assert sample["gt_mask"].any()
        seen += 1
        if seen >= 4:
            break
    assert seen == 4

    # validation generator terminates
    val_gen = tile_sample_generator(
        data, cfg, class_count, cfg.class_mapping, train_mode=False, seed=1
    )
    val_samples = list(val_gen)
    assert 1 <= len(val_samples) <= 6


def test_prescale_for_augment_scales_boxes():
    from radnet_tpu.data.pipeline import prescale_for_augment
    from radnet_tpu.config import Config

    cfg = Config(img_size=60, canvas_size=64)
    img = np.zeros((200, 400, 3), np.uint8)
    meta = {
        "width": 400,
        "height": 200,
        "bboxes": [{"class": "boat", "x1": 100, "y1": 50, "x2": 300, "y2": 150}],
    }
    out_img, out_meta = prescale_for_augment(img, meta, cfg)
    assert out_img.shape[:2] == (30, 60)  # longest side -> img_size
    b = out_meta["bboxes"][0]
    # box scales with the image (x by 60/400, y by 30/200) within rounding
    assert abs(b["x1"] - 15) <= 1 and abs(b["x2"] - 45) <= 1
    assert abs(b["y1"] - 7.5) <= 1 and abs(b["y2"] - 22.5) <= 1
    assert out_meta["width"] == 60 and out_meta["height"] == 30
    # input meta untouched
    assert meta["bboxes"][0]["x1"] == 100

    # no-op below working size
    small = np.zeros((40, 40, 3), np.uint8)
    s_img, s_meta = prescale_for_augment(small, {"width": 40, "height": 40, "bboxes": []}, cfg)
    assert s_img is small


def test_get_new_img_size_reference_semantics():
    from radnet_tpu.data.pipeline import get_new_img_size

    # shortest side -> img_min_side (utils.py:65-75)
    assert get_new_img_size(800, 600, 600) == (800, 600)
    assert get_new_img_size(600, 800, 600) == (600, 800)
    assert get_new_img_size(2000, 1000, 600) == (1200, 600)
    assert get_new_img_size(1000, 2000, 600) == (600, 1200)


def test_image_sample_generator_full_image(tmp_path, monkeypatch):
    from radnet_tpu.data.pipeline import image_sample_generator

    cfg = tiny_config()
    cfg.use_noise = False
    _write_synthetic_dataset(tmp_path, cfg)
    monkeypatch.chdir(tmp_path)
    data, class_count, _ = get_data("annot.csv", "data", cfg.img_types)

    gen = image_sample_generator(data, cfg, cfg.class_mapping, train_mode=False)
    samples = list(gen)
    assert len(samples) == 3  # one per image, then terminates (eval mode)
    for s in samples:
        assert s["image"].shape == (cfg.canvas_size, cfg.canvas_size, 3)
        assert s["gt_mask"].any()


def test_tile_generator_include_full_img(tmp_path, monkeypatch):
    """include_full_img adds a whole-panel sample per image
    (utils.py:484-548)."""
    cfg = tiny_config()
    cfg.tile_size = 100
    cfg.tile_overlap = 50
    cfg.use_noise = False
    cfg.include_full_img = True
    cfg.balanced_classes = False
    _write_synthetic_dataset(tmp_path, cfg)
    monkeypatch.chdir(tmp_path)
    data, class_count, _ = get_data("annot.csv", "data", cfg.img_types)

    with_full = list(
        tile_sample_generator(data, cfg, class_count, cfg.class_mapping,
                              train_mode=False, seed=1)
    )
    cfg.include_full_img = False
    without = list(
        tile_sample_generator(data, cfg, class_count, cfg.class_mapping,
                              train_mode=False, seed=1)
    )
    assert len(with_full) == len(without) + len(data)


def test_batched_pads_partial_batches():
    cfg = tiny_config()
    samples = [
        {
            "image": np.zeros((64, 64, 3), np.float32),
            "gt_boxes": np.zeros((8, 4), np.float32),
            "gt_classes": np.zeros((8,), np.int32),
            "gt_mask": np.zeros((8,), bool),
            "valid_wh": np.array([60.0, 60.0], np.float32),
            "sample_valid": np.asarray(True),
        }
    ] * 3
    batches = list(batched(iter(samples), 2, cfg))
    assert len(batches) == 2
    assert batches[0]["image"].shape == (2, 64, 64, 3)
    assert batches[1]["sample_valid"].tolist() == [True, False]


def test_parallel_generator_propagates_worker_errors(tmp_path, monkeypatch):
    """A worker crashing on a bad sample must surface in the consumer, not
    leave training blocked forever on an empty queue."""
    import pytest

    from radnet_tpu.data.pipeline import parallel_sample_generator

    cfg = tiny_config()
    cfg.tile_size = 100
    cfg.tile_overlap = 50
    cfg.use_noise = False
    _write_synthetic_dataset(tmp_path, cfg)
    monkeypatch.chdir(tmp_path)
    data, class_count, _ = get_data("annot.csv", "data", cfg.img_types)

    def bad_loader(*args, **kwargs):
        raise ValueError("corrupt sample")

    gen = parallel_sample_generator(
        data, cfg, class_count, cfg.class_mapping,
        num_workers=2, image_loader=bad_loader,
    )
    with pytest.raises(ValueError, match="corrupt sample"):
        next(gen)


def test_prefetch_to_device_releases_producer_on_abandonment():
    """A consumer that stops early (fit() pulls exactly epoch_length *
    n_epochs batches from the infinite train stream) must release the
    producer thread; a producer blocked forever on the full queue pins
    `size` prepared batches in device memory for the rest of the process."""
    import threading
    import time as _time

    from radnet_tpu.data.pipeline import prefetch_to_device

    def batches():
        while True:
            yield {"x": np.zeros((2, 2), np.float32)}

    gen = prefetch_to_device(batches(), size=2)
    next(gen)
    next(gen)
    gen.close()  # abandonment: GeneratorExit runs the finally block

    deadline = _time.time() + 5.0
    while _time.time() < deadline:
        if not any(
            t.name == "prefetch_to_device" and t.is_alive()
            for t in threading.enumerate()
        ):
            break
        _time.sleep(0.05)
    assert not any(
        t.name == "prefetch_to_device" and t.is_alive()
        for t in threading.enumerate()
    )


def test_get_image_absolute_root_type_injection(tmp_path):
    """An absolute data root must get the image type injected after the
    root's first segment (`<root>/<type>/...`), not as the first directory
    under the filesystem root (`/<type>/<root>/...`)."""
    import cv2

    from radnet_tpu.data import dataset

    os.makedirs(tmp_path / "data" / "t" / "train", exist_ok=True)
    ref = np.random.default_rng(1).integers(0, 255, (8, 9, 3), np.uint8)
    cv2.imwrite(str(tmp_path / "data" / "t" / "train" / "p.png"), ref)

    abs_path = str(tmp_path / "data" / "train" / "p.png")  # type segment omitted
    assert abs_path.startswith("/")
    img = dataset.get_image(abs_path, ["t"])
    assert img.shape == (8, 9, 3)


def test_resolve_typed_path_probing_and_memo(monkeypatch):
    """The resolver tries the reference position first, falls back to any
    on-disk position (including index 1 of absolute paths - a layout this
    framework's earlier releases produced), and memoizes hits."""
    import os.path as osp

    from radnet_tpu.data import dataset

    dataset._resolved_paths.clear()
    stats: list[str] = []

    def fake_isfile(p):
        stats.append(p)
        return p == "/t/root/train/p.png"  # old absolute layout, index 1

    monkeypatch.setattr(osp, "isfile", fake_isfile)
    assert dataset._resolve_typed_path("/root/train/p.png", "t") == "/t/root/train/p.png"
    # Memoized: the second call must not stat at all.
    n = len(stats)
    assert dataset._resolve_typed_path("/root/train/p.png", "t") == "/t/root/train/p.png"
    assert len(stats) == n

    # Unresolvable paths return the reference position and are NOT
    # memoized (the file may appear later).
    monkeypatch.setattr(osp, "isfile", lambda p: False)
    n_memo = len(dataset._resolved_paths)
    assert dataset._resolve_typed_path("a/b.png", "t") == "a/t/b.png"
    assert len(dataset._resolved_paths) == n_memo
    dataset._resolved_paths.clear()


def test_decoded_image_cache(tmp_path, monkeypatch):
    """get_image caches decoded panels (read-only), evicts by LRU budget."""
    import cv2

    from radnet_tpu.data import dataset

    os.makedirs(tmp_path / "data" / "t" / "x", exist_ok=True)
    for name in ("a.png", "b.png"):
        cv2.imwrite(
            str(tmp_path / "data" / "t" / "x" / name),
            np.random.default_rng(0).integers(0, 255, (10, 12, 3), np.uint8),
        )
    monkeypatch.chdir(tmp_path)
    dataset._decoded_cache.clear()
    dataset._decoded_cache_bytes = 0

    img1 = dataset.get_image("data/x/a.png", ["t"])
    assert not img1.flags.writeable  # cached entries are frozen
    img2 = dataset.get_image("data/x/a.png", ["t"])
    assert img2 is img1  # cache hit
    # Visualization CLIs draw in place: writable=True must hand out a
    # mutable copy even on a cache hit, leaving the cached entry frozen.
    img_w = dataset.get_image("data/x/a.png", ["t"], writable=True)
    assert img_w.flags.writeable and img_w is not img1
    img_w[0, 0] = 0
    assert not img1.flags.writeable
    # callers that crop tiles copy; the copy is writable again
    assert np.copy(img1[:5, :5]).flags.writeable

    # Budget just under two images: loading b evicts a (LRU).
    monkeypatch.setattr(
        dataset, "DECODED_CACHE_MB", (2 * img1.nbytes - 1) / (1024.0 * 1024.0)
    )
    dataset.get_image("data/x/b.png", ["t"])
    img3 = dataset.get_image("data/x/a.png", ["t"])  # reloaded, not cached id
    assert img3 is not img1
    assert dataset._decoded_cache_bytes <= 2 * img1.nbytes - 1

    dataset._decoded_cache.clear()
    dataset._decoded_cache_bytes = 0


def test_decoded_cache_overwrite_keeps_byte_accounting():
    """Two workers decoding the same panel race to insert; the overwrite
    must decrement the replaced entry's bytes or the accounted total
    drifts upward forever, silently shrinking effective capacity."""
    from radnet_tpu.data import dataset

    dataset._decoded_cache.clear()
    dataset._decoded_cache_bytes = 0
    a = np.zeros((8, 8, 3), np.uint8)
    b = np.zeros((8, 8, 3), np.uint8)
    dataset._decoded_cache_put("p", a)
    dataset._decoded_cache_put("p", b)  # concurrent-decode overwrite
    assert dataset._decoded_cache_bytes == b.nbytes
    dataset._decoded_cache.clear()
    dataset._decoded_cache_bytes = 0


def test_make_device_preparer():
    """The prefetch-thread finisher converts uint8 batches to mean-centered
    float (so the train step pays no entry-layout cost and skips its
    in-step augmentation), leaves float batches alone, and draws fresh
    augmentation keys per batch."""
    import jax.numpy as jnp

    from radnet_tpu.config import Config
    from radnet_tpu.data.pipeline import IMAGENET_BGR_MEAN, make_device_preparer

    cfg = Config(img_size=60, canvas_size=64)
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (2, 64, 64, 3)).astype(np.uint8)
    batch = {"image": jnp.asarray(img), "other": np.zeros(2)}

    # eval mode: pure preprocessing, exact mean-centering
    prep_eval = make_device_preparer(cfg, train=False)
    out = prep_eval(batch)
    np.testing.assert_allclose(
        np.asarray(out["image"]),
        img.astype(np.float32) - IMAGENET_BGR_MEAN,
        atol=1e-5,
    )

    # train mode: augmentation applied with per-batch keys -> two calls on
    # the same input give different images (noise fires at p=0.5 per
    # sample; 2 batches x 2 samples make a no-op run vanishingly unlikely)
    prep_train = make_device_preparer(cfg, seed=0, train=True)
    a = np.asarray(prep_train(batch)["image"])
    b = np.asarray(prep_train(batch)["image"])
    assert a.dtype == np.float32
    assert (a != b).any()

    # float batches pass through untouched
    fbatch = {"image": jnp.asarray(img.astype(np.float32))}
    assert prep_train(fbatch) is fbatch


# --------------------------------------------------------------------------- #
# Prescaled-tile cache
# --------------------------------------------------------------------------- #
def test_prescaled_tile_cache_is_transparent(tmp_path, monkeypatch):
    """Cache on vs off must yield a bit-identical sample stream (2 epochs:
    epoch 2 is all hits), including per-tile random image types."""
    import cv2

    from radnet_tpu.data import pipeline

    cfg = tiny_config()
    cfg.tile_size = 100  # one 100x100 tile per panel > img_size -> prescale
    cfg.tile_overlap = 50
    cfg.use_noise = False
    cfg.use_img_type = True
    cfg.img_types = ["typeA", "typeB"]
    _write_synthetic_dataset(tmp_path, cfg)
    # second image type: shifted copies so type choice changes pixel content
    src = tmp_path / "data" / "typeA"
    dst = tmp_path / "data" / "typeB"
    dst.mkdir(parents=True)
    for f in src.iterdir():
        img = cv2.imread(str(f))
        cv2.imwrite(str(dst / f.name), np.roll(img, 7, axis=0))
    monkeypatch.chdir(tmp_path)
    data, class_count, _ = get_data("annot.csv", "data", cfg.img_types)

    def collect(cache_mb):
        pipeline._tile_cache_clear()
        cfg.prescaled_tile_cache_mb = cache_mb
        gen = tile_sample_generator(
            data, cfg, class_count, cfg.class_mapping, train_mode=True, seed=3
        )
        return [next(gen) for _ in range(12)]

    plain, cached = collect(0), collect(64)
    assert pipeline._tile_cache  # the cached run actually populated it
    for a, b in zip(plain, cached):
        for k in a:
            np.testing.assert_array_equal(a[k], b[k], err_msg=k)


def test_prescaled_tile_cache_budget_and_hits():
    from radnet_tpu.data import pipeline

    pipeline._tile_cache_clear()
    cfg = tiny_config()
    cfg.prescaled_tile_cache_mb = 1
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (300, 300, 3)).astype(np.uint8)
    for i in range(2, 200):
        t = (0, 0, 100 + i, 100 + i)
        pipeline.crop_tile_prescaled(img, t, cfg, cache_key=("p", "a", t, 60))
    assert 0 < pipeline._tile_cache_bytes <= 1024 * 1024
    assert len(pipeline._tile_cache) < 198  # evictions happened

    t = (0, 0, 150, 150)
    a = pipeline.crop_tile_prescaled(img, t, cfg, cache_key=("q", "a", t, 60))
    b = pipeline.crop_tile_prescaled(img, t, cfg, cache_key=("q", "a", t, 60))
    assert a is b and not a.flags.writeable
    assert max(a.shape[:2]) == 60  # prescaled to img_size
    # distinct type/key -> distinct entry
    c = pipeline.crop_tile_prescaled(img, t, cfg, cache_key=("q", "b", t, 60))
    assert c is not a
    pipeline._tile_cache_clear()


def test_resize_to_canvas_identity_skip():
    """When the longest side already equals img_size the resize is skipped;
    guard that cv2's 1:1 bicubic really is the identity it replaces."""
    import cv2

    rng = np.random.default_rng(1)
    img = rng.integers(0, 255, (60, 45, 3)).astype(np.uint8)
    canvas, scale, new_w, new_h = resize_to_canvas(img, 60, 64)
    assert scale == 1.0 and (new_w, new_h) == (45, 60)
    np.testing.assert_array_equal(canvas[:60, :45], img)
    np.testing.assert_array_equal(
        cv2.resize(img, (45, 60), interpolation=cv2.INTER_CUBIC), img
    )


def test_prescaled_tile_cache_keys_on_absolute_path(tmp_path, monkeypatch):
    """Two datasets with the SAME relative layout but different pixels must
    never share cache entries across a chdir: the key uses the resolved
    panel path, not the relative filepath stored in img_data."""
    import cv2

    from radnet_tpu.data import pipeline

    cfg = tiny_config()
    cfg.tile_size = 100
    cfg.tile_overlap = 50
    cfg.use_noise = False
    root_a = tmp_path / "a"
    root_b = tmp_path / "b"
    root_a.mkdir()
    root_b.mkdir()
    _write_synthetic_dataset(root_a, cfg)
    _write_synthetic_dataset(root_b, cfg)
    for f in (root_b / "data" / cfg.img_types[0]).iterdir():
        cv2.imwrite(str(f), 255 - cv2.imread(str(f)))  # same layout, new pixels

    def first_samples(root, n=4):
        monkeypatch.chdir(root)
        data, class_count, _ = get_data("annot.csv", "data", cfg.img_types)
        gen = tile_sample_generator(
            data, cfg, class_count, cfg.class_mapping, train_mode=True, seed=7
        )
        return [next(gen) for _ in range(n)]

    pipeline._tile_cache_clear()
    cfg.prescaled_tile_cache_mb = 64
    a_cached = first_samples(root_a)  # populates the cache
    b_cached = first_samples(root_b)  # must NOT see dataset A's tiles
    pipeline._tile_cache_clear()
    cfg.prescaled_tile_cache_mb = 0
    b_plain = first_samples(root_b)
    for x, y in zip(b_cached, b_plain):
        for k in x:
            np.testing.assert_array_equal(x[k], y[k], err_msg=k)
    # Sanity: the datasets really differ (a stale hit would make them equal).
    assert any(
        (x["image"] != y["image"]).any() for x, y in zip(a_cached, b_cached)
    )


def test_prescaled_tile_cache_bypassed_for_custom_loader():
    """A custom image_loader's pixels need not be a function of the path,
    so those runs must not populate (or read) the process-global cache."""
    from radnet_tpu.data import pipeline

    cfg = tiny_config()
    cfg.tile_size = 100
    cfg.tile_overlap = 50
    cfg.use_noise = False
    cfg.balanced_classes = False
    cfg.prescaled_tile_cache_mb = 64
    pipeline._tile_cache_clear()

    def loader(path, img_types, random_type=False):
        return np.full((100, 100, 3), 77, np.uint8)

    data = [
        {
            "filepath": "x.png",
            "width": 100,
            "height": 100,
            "bboxes": [{"class": "boat", "x1": 10, "y1": 10, "x2": 60, "y2": 60}],
        }
    ]
    gen = tile_sample_generator(
        data, cfg, {"boat": 1}, cfg.class_mapping,
        train_mode=True, seed=0, image_loader=loader,
    )
    next(gen)
    assert not pipeline._tile_cache
    pipeline._tile_cache_clear()
