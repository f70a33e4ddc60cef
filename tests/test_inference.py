"""Inference engine end-to-end flow on synthetic data (random weights)."""

import numpy as np
import jax
import pytest

from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.inference import RADNet
from radnet_tpu.models.detector import build_model
from tests.util import decisive_detector_params, tiny_config


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


def _sorted_dets(dets):
    return sorted(
        (d["class"], d["x1"], d["y1"], d["x2"], d["y2"], round(d["prob"], 6))
        for d in dets
    )


def test_full_img_pass_ignores_device_tiling():
    """Regression: the full-image pseudo-tile [0,0,W,H] must NOT take the
    fixed-shape device-tiling path (which slices only a tile_size^2 window
    at the origin and lifts with the wrong ratio).  The reference resizes
    the WHOLE panel for this pass (RADNet.py:606-665).

    Isolate the full-image pass (max_n_tiles_train=0) on a panel larger
    than tile_size whose only content sits OUTSIDE the top-left
    tile_size^2 region, and assert the device-tiling-enabled run is
    bit-identical to the host-path run (both must route the pseudo-tile
    through the whole-panel resize)."""
    import dataclasses

    base = tiny_config("vgg16")
    base.bbox_threshold = 0.0
    base.include_full_img = True
    base.max_n_tiles_train = 0  # full-image pass only
    model = build_model(base)
    state = create_train_state(model, base, jax.random.PRNGKey(0))

    # 90x150 panel, all content outside the top-left 64x64 region.
    panel = np.zeros((90, 150, 3), dtype=np.uint8)
    panel[70:, 100:] = np.random.default_rng(11).integers(
        0, 255, (20, 50, 3), dtype=np.uint8
    )

    dets_by_mode = {}
    for device_tiling in (True, False):
        cfg = dataclasses.replace(base, infer_device_tiling=device_tiling)
        r = RADNet(cfg, model, state.params, state.batch_stats)
        dets_by_mode[device_tiling] = r.predict([panel])

    assert _sorted_dets(dets_by_mode[True]) == _sorted_dets(dets_by_mode[False])


@pytest.mark.parametrize("prescale", [True, False])
def test_device_vs_host_tiling_equivalence(prescale):
    """Both on-device tile paths - prescaled-panel slicing and full-res
    slice+MXU-bicubic - must produce detection sets matching the host cv2
    tile path on the same panel with the same weights (catches any
    ratio/slice regression in either device program)."""
    import dataclasses

    base = tiny_config("vgg16")
    base.bbox_threshold = 0.0
    model = build_model(base)
    state = create_train_state(model, base, jax.random.PRNGKey(0))
    # Decisive scores: with the true reference init the logits tie at
    # float resolution, so the two resamplers' detection sets tie-break
    # differently (tests/util.py::decisive_detector_params).
    params = decisive_detector_params(state.params)
    panel = np.random.default_rng(5).integers(0, 255, (130, 140, 3), dtype=np.uint8)

    dets = {}
    for device_tiling in (True, False):
        cfg = dataclasses.replace(
            base,
            infer_device_tiling=device_tiling,
            infer_panel_prescale=prescale,
        )
        r = RADNet(cfg, model, params, state.batch_stats)
        dets[device_tiling] = r.predict([panel])

    assert len(dets[True]) > 0  # a dead detector must not pass vacuously
    _match_det_sets(dets[True], dets[False])


def _match_det_sets(dev, host, max_unmatched_frac=0.15):
    """Greedy one-to-one matching: same class, boxes within a small pixel
    tolerance, probs close.

    The resamplers are genuinely different programs: the prescale path
    resizes the whole panel once (bicubic support crosses tile borders),
    the host path crops tiles first - so detections hugging tile edges can
    legitimately appear on one side only.  A small unmatched remainder is
    tolerated; a slicing/ratio/scale REGRESSION (what this matcher exists
    to catch) shifts or drops most of the set and still fails loudly."""
    # Orphans from both sides are pooled, so the budget is a fraction of
    # the pooled count (frac of ONE side would halve the advertised
    # tolerance when each side has its own legitimate tile-edge orphan).
    n = len(dev) + len(host)
    assert abs(len(dev) - len(host)) <= max_unmatched_frac * n, (len(dev), len(host))
    unmatched = list(host)
    missing = []
    for d in dev:
        best = None
        for h in unmatched:
            if h["class"] != d["class"]:
                continue
            if all(
                abs(d[k] - h[k]) <= 3 for k in ("x1", "y1", "x2", "y2")
            ) and abs(d["prob"] - h["prob"]) <= 0.05:
                best = h
                break
        if best is None:
            missing.append(d)
        else:
            unmatched.remove(best)
    assert len(missing) + len(unmatched) <= max_unmatched_frac * n, (
        f"{len(missing)} device dets without host match + "
        f"{len(unmatched)} host dets without device match of {n}"
    )


def test_grey_panel_single_channel_shipping_equivalence(monkeypatch):
    """A grey 3-channel panel (the domain's format) takes the
    single-channel prescale shipping path; with the optimization the ONLY
    variable (same prescale program both runs, grey detection suppressed on
    the second), detections must agree to float tolerance."""
    import dataclasses

    base = tiny_config("vgg16")
    base.bbox_threshold = 0.0  # compare the FULL detection set
    model = build_model(base)
    state = create_train_state(model, base, jax.random.PRNGKey(0))
    grey = np.zeros((130, 140), dtype=np.uint8)
    rng = np.random.default_rng(7)
    for _ in range(6):
        x, y = rng.integers(5, 100, 2)
        w, h = rng.integers(15, 30, 2)
        grey[y : y + h, x : x + w] = rng.integers(120, 255)
    panel = np.stack([grey] * 3, axis=-1)
    assert RADNet._grey_channel(panel) is not None
    assert RADNet._grey_channel(np.random.default_rng(8).integers(
        0, 255, (20, 20, 3), dtype=np.uint8)) is None

    params = decisive_detector_params(state.params)  # see util.py docstring
    cfg = dataclasses.replace(
        base, infer_device_tiling=True, infer_panel_prescale=True
    )
    dets = {}
    for mode in ("grey", "color"):
        if mode == "color":
            # Suppress grey detection: identical panel ships as 3 channels
            # through the same prescale program (cv2.resize is per-channel,
            # so the resampled pixels are identical).
            monkeypatch.setattr(RADNet, "_grey_channel", staticmethod(lambda img: None))
        r = RADNet(cfg, model, params, state.batch_stats)
        dets[mode] = r.predict([panel])
    assert len(dets["grey"]) > 0
    _match_det_sets(dets["grey"], dets["color"], max_unmatched_frac=0.0)


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


def test_max_head_rois_truncation():
    """With max_head_rois >= the surviving proposal count the cascade is
    bit-identical to the full one; with a tiny budget it still returns a
    subset drawn from the top-scoring proposals."""
    from radnet_tpu.models.detector import build_model as _build

    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    model = _build(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))

    t = cfg.infer_tile_batch
    imgs = np.random.default_rng(3).normal(0, 1, (t, 64, 64, 3)).astype(np.float32)
    wh = np.full((t, 2), 60.0, np.float32)

    full = RADNet(cfg, model, state.params, state.batch_stats)
    b0, s0, v0 = jax.device_get(full._predict_tiles(imgs, wh))

    import dataclasses as _dc

    cfg_eq = _dc.replace(cfg, max_head_rois=cfg.post_nms_top_n)
    eq = RADNet(cfg_eq, model, state.params, state.batch_stats)
    b1, s1, v1 = jax.device_get(eq._predict_tiles(imgs, wh))
    np.testing.assert_array_equal(v0, v1)
    np.testing.assert_allclose(b0[v0], b1[v1], rtol=0, atol=0)
    np.testing.assert_allclose(s0[v0], s1[v1], rtol=0, atol=0)

    cfg_small = _dc.replace(cfg, max_head_rois=2)
    small = RADNet(cfg_small, model, state.params, state.batch_stats)
    b2, s2, v2 = jax.device_get(small._predict_tiles(imgs, wh))
    # at most K=2 RoIs enter the head, so each tile can emit at most 2
    # detections across all classes
    per_tile = v2.reshape(v2.shape[0], -1).sum(axis=1)
    assert (per_tile <= 2).all()
    if v2.any():
        b = b2[v2]
        assert (b[:, 2] > b[:, 0]).all() and (b[:, 3] > b[:, 1]).all()


def test_interleaved_dispatch_collect_matches_serial(radnet):
    """The serving/bench pipeline (dispatch panel k+1 before collecting
    panel k - cli/serve.py, bench.py) must produce exactly the serial
    predict() results for each panel."""
    radnet.bbox_threshold = 0.0
    rng = np.random.default_rng(11)
    panels = [
        rng.integers(0, 255, (70, 80, 3), dtype=np.uint8) for _ in range(3)
    ]
    serial = [radnet.predict([p]) for p in panels]

    interleaved = []
    pending = radnet.predict_dispatch([panels[0]])
    for p in panels[1:]:
        nxt = radnet.predict_dispatch([p])
        interleaved.append(radnet.predict_collect(pending))
        pending = nxt
    interleaved.append(radnet.predict_collect(pending))

    key = lambda d: (d["class"], d["x1"], d["y1"], d["x2"], d["y2"], round(d["prob"], 6))
    for a, b in zip(serial, interleaved):
        assert sorted(map(key, a)) == sorted(map(key, b))


def test_batch_schedule_tail_subbatch(radnet):
    """Remainders that fit in bs//2 dispatch through the half program."""
    bs = radnet.tile_batch
    assert bs == radnet.C.infer_tile_batch == 2
    assert radnet._batch_schedule(5) == [(0, 2), (2, 2), (4, 1)]
    assert radnet._batch_schedule(4) == [(0, 2), (2, 2)]
    assert radnet._batch_schedule(1) == [(0, 1)]
    radnet.tile_batch = 8  # the schedule runs off the EFFECTIVE batch
    try:
        assert radnet._batch_schedule(36) == [
            (0, 8), (8, 8), (16, 8), (24, 8), (32, 4)]
        assert radnet._batch_schedule(8) == [(0, 8)]
        assert radnet._batch_schedule(1) == [(0, 4)]
        assert radnet._batch_schedule(5) == [(0, 8)]  # 5 > bs//2: no saving
        assert radnet._batch_schedule(12) == [(0, 8), (8, 4)]
        radnet.C.infer_tail_subbatch = False
        assert radnet._batch_schedule(12) == [(0, 8), (8, 8)]
    finally:
        radnet.tile_batch = bs
        radnet.C.infer_tail_subbatch = True


def test_tail_subbatch_detections_match_full_batches():
    """The half-size tail program yields the same detections as padded
    full batches (the padding tiles were never drained either way)."""
    rng = np.random.default_rng(11)
    panel = rng.integers(0, 255, (100, 228, 3), dtype=np.uint8)  # 21 tiles

    def run(tail):
        cfg = tiny_config("vgg16")
        cfg.bbox_threshold = 0.0
        cfg.infer_tail_subbatch = tail
        model = build_model(cfg)
        state = create_train_state(model, cfg, jax.random.PRNGKey(0))
        net = RADNet(cfg, model, state.params, state.batch_stats)
        from radnet_tpu.data.tiling import plan_tiles
        n = len(plan_tiles(panel.shape[1], panel.shape[0],
                           cfg.tile_size, cfg.tile_overlap))
        assert n % cfg.infer_tile_batch, "panel must exercise the tail"
        assert net._batch_schedule(n)[-1][1] == (1 if tail else 2)
        return net.predict([panel])

    a, b = run(True), run(False)
    ka = sorted((d["class"], d["x1"], d["y1"], d["x2"], d["y2"]) for d in a)
    kb = sorted((d["class"], d["x1"], d["y1"], d["x2"], d["y2"]) for d in b)
    assert ka == kb


def test_warmup_compiles_tail_program():
    """RADNet.warmup must also compile the half-size tail program so the
    first real panel after serve.py's READY never blocks on a compile,
    even when the warmup geometry's tile count is a batch multiple."""
    from radnet_tpu.data.tiling import plan_tiles

    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    r = RADNet(cfg, model, state.params, state.batch_stats)

    panel = np.random.default_rng(3).integers(0, 255, (96, 96, 3), dtype=np.uint8)
    tiles = plan_tiles(96, 96, cfg.tile_size, cfg.tile_overlap)
    # The interesting case: a plain predict of this panel never takes the
    # half program (no remainder), so only warmup's forcing pass covers it.
    assert len(tiles) % r.tile_batch == 0

    r.warmup(panel)
    fn = (
        r._predict_prescaled_tiles_jit
        if cfg.infer_panel_prescale and cfg.img_size < cfg.tile_size
        else r._predict_panel_tiles_jit
    )
    before = fn._cache_size()
    assert before >= 2  # full program + half tail program

    pending = []
    r._dispatch_tiles(panel, tiles[:1], pending)  # remainder 1 <= bs//2 -> tail
    r._drain_tiles(pending, {}, {})
    assert fn._cache_size() == before  # the tail dispatch hit a cached program


def test_warmup_small_panel_compiles_full_program():
    """The converse gap: a warmup panel with fewer tiles than the batch
    size schedules only the half program in its own predict; warmup must
    still force-compile the FULL-batch program, or the first big real
    panel pays the cascade compile after serve.py's READY."""
    from radnet_tpu.data.tiling import plan_tiles

    cfg = tiny_config("vgg16")
    cfg.bbox_threshold = 0.0
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    r = RADNet(cfg, model, state.params, state.batch_stats)

    side = cfg.tile_size  # exactly one tile: rem=1 <= bs//2 -> half only
    panel = np.random.default_rng(5).integers(0, 255, (side, side, 3), np.uint8)
    tiles = plan_tiles(side, side, cfg.tile_size, cfg.tile_overlap)
    assert 0 < len(tiles) < r.tile_batch

    r.warmup(panel)
    fn = (
        r._predict_prescaled_tiles_jit
        if cfg.infer_panel_prescale and cfg.img_size < cfg.tile_size
        else r._predict_panel_tiles_jit
    )
    before = fn._cache_size()
    assert before >= 2  # half program (from predict) + forced full program

    pending = []
    full = np.repeat(tiles[:1], r.tile_batch, axis=0)
    r._dispatch_tiles(panel, full, pending)  # full-batch dispatch
    r._drain_tiles(pending, {}, {})
    assert fn._cache_size() == before  # full program was already compiled
