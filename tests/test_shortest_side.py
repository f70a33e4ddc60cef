"""Shortest-side resize parity for non-square inference windows.

The reference resizes the SHORTEST image side to ``img_size``
(``get_new_img_size``, /root/reference/faster_rcnn/utils.py:65-75); round 3
resized the longest side, under-resolving non-square windows (the
include_full_img pseudo-tile, sub-tile panels).  These tests pin the new
rectangular-canvas path against the reference formula.
"""

import numpy as np
import jax
import pytest

from radnet_tpu.data.pipeline import resize_to_canvas_shortest, shortest_side_dims
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.inference import RADNet
from radnet_tpu.models.detector import build_model
from tests.util import decisive_detector_params, tiny_config


def ref_get_new_img_size(width, height, img_min_side):
    """Literal transcription of utils.py:65-75."""
    if width <= height:
        f = float(img_min_side) / width
        return int(f * height), img_min_side, f  # (resized_h, resized_w=min, f)
    f = float(img_min_side) / height
    return img_min_side, int(f * width), f


def test_shortest_side_dims_matches_reference_formula():
    rng = np.random.default_rng(0)
    for _ in range(200):
        w, h = (int(x) for x in rng.integers(1, 5000, 2))
        for img_size in (300, 600, 60):
            rh, rw, f = ref_get_new_img_size(w, h, img_size)
            assert shortest_side_dims(w, h, img_size) == (rw, rh), (w, h, img_size)


def test_resize_to_canvas_shortest_scale_and_content():
    img = np.random.default_rng(1).integers(0, 255, (50, 120, 3), np.uint8)
    # shortest side 50 -> 60; longest 120 -> int(1.2*120)=144; canvas 2x64 wide
    canvas, scale, vw, vh = resize_to_canvas_shortest(img, 60, (64, 192))
    assert (vw, vh) == shortest_side_dims(120, 50, 60) == (144, 60)
    assert scale == pytest.approx(60.0 / 50.0)
    assert canvas.shape == (64, 192, 3)
    # padding stays zero, content occupies [:vh, :vw]
    assert canvas[vh:].sum() == 0 and canvas[:, vw:].sum() == 0
    assert canvas[:vh, :vw].sum() > 0


def test_resize_to_canvas_shortest_aspect_cap():
    # 10:1 aspect with a 2x-long canvas: scale reduced to fit.
    img = np.random.default_rng(2).integers(0, 255, (40, 400, 3), np.uint8)
    canvas, scale, vw, vh = resize_to_canvas_shortest(img, 60, (64, 128))
    assert vw <= 128 and vh <= 64
    assert scale == pytest.approx(vh / 40.0)
    # ONE uniform scale: the long side is derived from the reduced short
    # side (vw == int(w * scale)), so reverse-mapping boxes with `scale`
    # is exact along both axes.  (The pre-round-5 code truncated both
    # dims independently - vw was 128 here while scale implied 120,
    # drifting reverse-mapped boxes by up to 8 px on the long axis.)
    assert vw == int(400 * scale)
    assert vh == int(40 * scale)


def test_canvas_bucket_selection():
    cfg = tiny_config("vgg16")  # canvas 64, img_size 60
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    net = RADNet(cfg, model, state.params, state.batch_stats)
    assert net._canvas_for_window(64, 64) == (64, 64)  # square: standard
    # 40x64 window: shortest 40->60, other int(1.5*64)=96 -> 2-tall bucket
    assert net._canvas_for_window(40, 64) == (128, 64)
    # cap at infer_canvas_max_mult
    assert net._canvas_for_window(10, 640) == (64 * cfg.infer_canvas_max_mult, 64)
    cfg.infer_shortest_side = False
    assert net._canvas_for_window(40, 64) == (64, 64)


def test_predict_nonsquare_panel_uses_shortest_side_scales():
    """Through ``predict``: every non-square window must be resized by the
    reference's ratio f = img_size / min(w, h) (scale parity with
    get_new_img_size), on a rectangular canvas with its own anchor grid."""
    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    params = decisive_detector_params(state.params)
    net = RADNet(cfg, model, params, state.batch_stats)

    recorded = []
    orig = RADNet._rect_window_batches

    def spy(self, img, tiles, canvas_hw):
        for imgs, wh, scales, chunk, n in orig(self, img, tiles, canvas_hw):
            for i in range(n):
                w = int(chunk[i][2] - chunk[i][0])
                h = int(chunk[i][3] - chunk[i][1])
                recorded.append((w, h, scales[i], canvas_hw))
            yield imgs, wh, scales, chunk, n

    RADNet._rect_window_batches = spy
    try:
        # 40x100 panel with 64px tiles: windows are 40 wide (sub-tile in x)
        panel = np.random.default_rng(3).integers(0, 255, (100, 40, 3), np.uint8)
        dets = net.predict([panel])
    finally:
        RADNet._rect_window_batches = orig

    assert recorded, "non-square windows did not route through the shortest-side path"
    for w, h, scale, canvas_hw in recorded:
        assert w != h
        assert scale == pytest.approx(float(cfg.img_size) / min(w, h))
        assert canvas_hw != (cfg.canvas_size, cfg.canvas_size)
    # detections (random-init, threshold 0) land inside the panel
    for d in dets:
        assert 0 <= d["x1"] <= d["x2"] <= panel.shape[1]
        assert 0 <= d["y1"] <= d["y2"] <= panel.shape[0]


def test_full_img_pass_uses_shortest_side():
    """include_full_img's pseudo-tile (RADNet.py:606-665) goes through the
    shortest-side path for non-square panels."""
    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    cfg.include_full_img = True
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    params = decisive_detector_params(state.params)
    net = RADNet(cfg, model, params, state.batch_stats)

    panel = np.random.default_rng(4).integers(0, 255, (130, 200, 3), np.uint8)
    net.predict([panel])
    # the 200x130 full-image window: shortest 130->60 => other int(60/130*200)=92
    # -> a (64, 128) canvas bucket got compiled + its anchor grid cached
    assert any(hw != (cfg.canvas_size, cfg.canvas_size) for hw in net._anchor_cache)
