"""Inference engine end-to-end flow on synthetic data (random weights)."""

import numpy as np
import jax
import pytest

from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.inference import RADNet
from radnet_tpu.models.detector import build_model
from tests.util import tiny_config


@pytest.fixture(scope="module")
def radnet():
    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0  # random weights: accept everything the NMS keeps
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    return RADNet(cfg, model, state.params, state.batch_stats)


def test_predict_tiles_shapes(radnet):
    cfg = radnet.C
    t = cfg.infer_tile_batch
    imgs = np.random.default_rng(0).normal(0, 1, (t, 64, 64, 3)).astype(np.float32)
    wh = np.full((t, 2), 60.0, np.float32)
    boxes, scores, valid = jax.device_get(radnet._predict_tiles(imgs, wh))
    k = cfg.n_classes - 1
    d = cfg.max_detections_per_tile
    assert boxes.shape == (t, k, d, 4)
    assert scores.shape == (t, k, d)
    assert valid.shape == (t, k, d)
    # any produced box must be inside the (scaled) tile area, xyxy ordered
    b = boxes[valid]
    if b.size:
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_predict_full_panel_contract(radnet):
    panel = np.random.default_rng(1).integers(0, 255, (150, 200, 3), dtype=np.uint8)
    dets = radnet.predict([panel])
    assert isinstance(dets, list)
    for d in dets:
        assert set(d) == {"class", "prob", "x1", "y1", "x2", "y2"}
        assert d["class"] in radnet.C.class_mapping
        assert 0.0 <= d["prob"] <= 1.0
        assert d["x2"] > d["x1"] and d["y2"] > d["y1"]


def test_predict_multi_image_type_merge(radnet):
    rng = np.random.default_rng(2)
    imgs = [
        rng.integers(0, 255, (100, 120, 3), dtype=np.uint8),
        rng.integers(0, 255, (100, 120, 3), dtype=np.uint8),
    ]
    dets = radnet.predict(imgs)
    assert isinstance(dets, list)


def test_device_tiling_path(radnet):
    """Panels >= tile_size use on-device slicing/resize; contract holds."""
    cfg = radnet.C
    assert cfg.tile_size == 64
    panel = np.random.default_rng(5).integers(0, 255, (130, 140, 3), dtype=np.uint8)
    dets = radnet.predict([panel])
    assert isinstance(dets, list)
    for d in dets:
        assert 0 <= d["x1"] < d["x2"] <= 140 + cfg.tile_size
        assert 0 <= d["y1"] < d["y2"] <= 130 + cfg.tile_size


def test_predict_include_full_img_path():
    """include_full_img adds a whole-panel pass to the cascade
    (RADNet.py:606-665)."""
    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    cfg.include_full_img = True
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    r = RADNet(cfg, model, state.params, state.batch_stats)
    panel = np.random.default_rng(7).integers(0, 255, (90, 110, 3), dtype=np.uint8)
    dets = r.predict([panel])
    assert isinstance(dets, list)


def test_panel_bucket_pad(radnet):
    img = np.ones((600, 700, 3), np.uint8)
    padded = radnet._panel_bucket_pad(img)
    assert padded.shape == (1024, 1024, 3)
    assert (padded[:600, :700] == 1).all()
    assert (padded[600:, :, :] == 0).all()
    same = radnet._panel_bucket_pad(np.ones((512, 512, 3), np.uint8))
    assert same.shape == (512, 512, 3)


def test_predict_region_proposals(radnet):
    panel = np.random.default_rng(3).integers(0, 255, (100, 100, 3), dtype=np.uint8)
    props = radnet.predict_region_proposals(panel)
    assert isinstance(props, list)
    for p in props[:5]:
        assert p["class"] == "object" and p["prob"] == 1.0
