"""On-device photometric augmentation: parity properties with the host
stack (tests/test_data_pipeline.py pins the same properties for
data/augment.py) plus train-step integration."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnet_tpu.ops.augment_device import (
    _brightness,
    _contrast,
    _gaussian,
    _noise_one_of_four,
    _poisson,
    _salt_and_pepper,
    photometric_augment,
)


def _canvas_batch(b=2, s=64, valid=40, seed=0):
    """uint8 canvases with content in the top-left valid region only."""
    rng = np.random.default_rng(seed)
    imgs = np.zeros((b, s, s, 3), np.uint8)
    grey = rng.integers(40, 200, (b, valid, valid), np.uint8)
    imgs[:, :valid, :valid] = grey[..., None]
    return imgs


def test_output_shape_dtype_and_range():
    imgs = _canvas_batch()
    out = photometric_augment(imgs, jax.random.PRNGKey(0), grey=True)
    assert out.shape == imgs.shape and out.dtype == jnp.float32
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0


def test_background_preserved_across_keys():
    """Zero padding must stay exactly zero whatever ops fire -
    augmentation.py:314-333 (brightness) and :363-397 (noise) both
    re-impose the zero background."""
    imgs = _canvas_batch()
    bg = imgs == 0
    for seed in range(6):
        out = np.asarray(
            photometric_augment(imgs, jax.random.PRNGKey(seed), grey=True)
        )
        assert (out[bg] == 0).all(), seed


def test_grey_channels_stay_identical():
    imgs = _canvas_batch()
    for seed in range(6):
        out = np.asarray(
            photometric_augment(imgs, jax.random.PRNGKey(seed), grey=True)
        )
        np.testing.assert_array_equal(out[..., 0], out[..., 1])
        np.testing.assert_array_equal(out[..., 1], out[..., 2])


def test_mixed_batch_grey_detected_per_sample():
    """grey=None (the production callers' mode for mixed-type configs,
    grey_mode): a batch mixing a grey canvas and a color canvas must keep
    the grey sample's channels identical while the color sample gets
    independent per-channel noise - the static flag corrupted one or the
    other (channel-0 noise broadcast over a color image, or chroma noise
    on a grey one)."""
    from radnet_tpu.ops.augment_device import grey_mode

    rng = np.random.default_rng(0)
    grey_plane = rng.integers(40, 200, (64, 64), np.uint8)
    grey_img = np.repeat(grey_plane[..., None], 3, axis=-1)
    color_img = rng.integers(40, 200, (64, 64, 3), np.uint8)
    imgs = np.stack([grey_img, color_img])

    grey_noised = color_noised = False
    for seed in range(12):
        out = np.asarray(
            photometric_augment(imgs, jax.random.PRNGKey(seed), grey=None)
        )
        np.testing.assert_array_equal(out[0, ..., 0], out[0, ..., 1], str(seed))
        np.testing.assert_array_equal(out[0, ..., 1], out[0, ..., 2], str(seed))
        grey_noised |= (out[0] != imgs[0]).any()
        # When noise hits the color sample, its channels must differ in a
        # way that cannot come from a broadcast channel-0 plane.
        if (out[1] != imgs[1]).any():
            color_noised = True
            assert not np.array_equal(out[1, ..., 0], out[1, ..., 1]), seed
    assert grey_noised and color_noised  # both variants exercised

    class _C:
        use_img_type = True
        img_types = ["enhanced_topo_grey", "blended_map"]

    assert grey_mode(_C()) is None
    _C.img_types = ["enhanced_topo_grey", "blended_map_grey"]
    assert grey_mode(_C()) is True
    _C.use_img_type = False
    _C.img_types = ["blended_map", "blended_map_grey"]
    assert grey_mode(_C()) is False  # only the primary type is ever read


def test_brightness_window_gate():
    """Images with mean brightness outside (75, 180) pass through
    unchanged (augmentation.py:318-321)."""
    dark = jnp.full((32, 32, 3), 10.0)
    out = _brightness(dark, jax.random.PRNGKey(0))
    np.testing.assert_array_equal(np.asarray(out), np.asarray(dark))

    mid = jnp.full((32, 32, 3), 120.0)
    # a shift happens for at least one key (a single draw can legitimately
    # be < 1 intensity level), and results stay uint8-quantized (floored)
    shifted = 0.0
    for seed in range(5):
        out = _brightness(mid, jax.random.PRNGKey(seed))
        shifted = max(shifted, float(jnp.abs(out - mid).max()))
        np.testing.assert_array_equal(np.asarray(out), np.floor(np.asarray(out)))
    assert shifted > 0


def test_brightness_ignores_background_in_mean():
    """The gate uses the mean over *content* pixels: a mid-brightness
    figure on a large zero background must still be eligible."""
    img = np.zeros((64, 64, 3), np.float32)
    img[:8, :8] = 120.0  # global mean ~1.9, content mean 120
    out = _brightness(jnp.asarray(img), jax.random.PRNGKey(1))
    assert float(jnp.abs(out[:8, :8] - 120.0).max()) > 0
    assert float(jnp.abs(out[8:, 8:]).max()) == 0.0


def test_contrast_range():
    img = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (32, 32, 3)).astype(np.float32)
    )
    out = _contrast(img, jax.random.PRNGKey(0))
    assert float(out.min()) >= 0.0 and float(out.max()) <= 255.0
    # rint quantization
    np.testing.assert_array_equal(np.asarray(out), np.rint(np.asarray(out)))


def test_salt_and_pepper_statistics():
    x = jnp.full((128, 128), 0.5)
    out = np.asarray(_salt_and_pepper(x, jax.random.PRNGKey(3)))
    frac_changed = float(((out == 1.0) | (out == 0.0)).mean())
    # amount is drawn in [0.01, 0.3]; changed fraction must land inside
    assert 0.005 < frac_changed < 0.35
    assert set(np.unique(out)).issubset({0.0, 0.5, 1.0})


def test_gaussian_noise_statistics():
    x = jnp.full((128, 128), 0.5)
    out = np.asarray(_gaussian(x, jax.random.PRNGKey(4)))
    # mean in [-0.05, 0.05] band around 0.5, sd <= 0.1
    assert abs(out.mean() - 0.5) < 0.06
    assert 0.005 < out.std() < 0.15


def test_poisson_preserves_scale():
    x = jnp.asarray(
        np.random.default_rng(0).integers(0, 255, (64, 64)).astype(np.float32)
        / 255.0
    )
    out = np.asarray(_poisson(x, jax.random.PRNGKey(5)))
    # Poisson(lam=x*vals)/vals has mean x: overall mean is preserved
    assert abs(out.mean() - float(x.mean())) < 0.05


def test_noise_one_of_four_all_branches():
    img = jnp.asarray(_canvas_batch(b=1)[0].astype(np.float32))
    seen = set()
    for seed in range(16):
        out = _noise_one_of_four(img, jax.random.PRNGKey(seed), grey=True)
        assert out.shape == img.shape
        r = int(jax.random.randint(jax.random.split(jax.random.PRNGKey(seed))[0], (), 0, 4))
        seen.add(r)
    assert seen == {0, 1, 2, 3}  # 16 seeds exercise every branch


def test_train_step_applies_device_augmentation():
    """make_train_step with the flag on runs on uint8 batches and yields
    finite losses; with float batches the augmentation is skipped."""
    from radnet_tpu.config import Config
    from radnet_tpu.engine.steps import make_train_step
    from radnet_tpu.engine.train_state import create_train_state
    from radnet_tpu.models.detector import build_model

    config = Config(
        network="vgg16",
        canvas_size=64,
        img_size=60,
        batch_size=2,
        max_gt_boxes=4,
        n_rois=4,
        pre_nms_top_n=64,
        post_nms_top_n=16,
        anchor_box_scales=[16, 32],
        compute_dtype="float32",
        vgg_fc_dim=64,
        class_mapping={"boat": 0, "bg": 1},
        augment_photometric_on_device=True,
    )
    model = build_model(config)
    state = create_train_state(model, config, jax.random.PRNGKey(0))
    step = make_train_step(model, config)

    batch = {
        "image": jnp.asarray(_canvas_batch(b=2, s=64, valid=60)),
        "gt_boxes": jnp.tile(
            jnp.asarray([[[4.0, 4.0, 40.0, 40.0]] + [[0.0] * 4] * 3], jnp.float32),
            (2, 1, 1),
        ),
        "gt_classes": jnp.zeros((2, 4), jnp.int32),
        "gt_mask": jnp.tile(jnp.asarray([[True, False, False, False]]), (2, 1)),
        "valid_wh": jnp.full((2, 2), 60.0, jnp.float32),
        "sample_valid": jnp.ones((2,), bool),
    }
    _, metrics = step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(metrics["total_loss"]))


def test_host_pipeline_skips_photometric_when_flag_on(monkeypatch):
    """augment() must not burn host time on brightness/noise when the
    device owns them."""
    from radnet_tpu.config import Config
    from radnet_tpu.data import augment as aug

    calls = []
    monkeypatch.setattr(
        aug, "brightness", lambda *a, **k: calls.append("b") or (a[0], a[1])
    )
    monkeypatch.setattr(
        aug,
        "gaussian_noise",
        lambda *a, **k: calls.append("n") or (a[0], a[1]),
    )

    img = _canvas_batch(b=1)[0]
    boxes = [{"class": "boat", "x1": 1, "y1": 1, "x2": 20, "y2": 20}]
    data = {"filepath": "x", "width": 64, "height": 64, "bboxes": boxes}

    cfg_on = Config(augment_photometric_on_device=True)
    cfg_off = Config(augment_photometric_on_device=False)
    # geometric ops off to isolate the photometric stage
    for cfg in (cfg_on, cfg_off):
        cfg.use_horizontal_flips = cfg.use_vertical_flips = False
        cfg.use_90_rotations = cfg.use_rotations = cfg.use_shear = False

    rng = np.random.default_rng(0)
    for _ in range(20):
        aug.augment(data, img, cfg_on, do_augment=True, rng=rng)
    assert calls == []
    for _ in range(20):
        aug.augment(data, img, cfg_off, do_augment=True, rng=rng)
    assert "b" in calls or "n" in calls


def test_color_path_background_per_channel():
    """Non-grey images: noise applies to all channels with per-element
    zero-background preservation (augmentation.py:254-257 pattern)."""
    rng = np.random.default_rng(7)
    imgs = np.zeros((1, 32, 32, 3), np.uint8)
    imgs[0, :16, :16] = rng.integers(40, 200, (16, 16, 3), np.uint8)
    imgs[0, 5, 5] = (0, 100, 200)  # a pixel with a zero in one channel only
    bg = imgs == 0
    for seed in range(6):
        out = np.asarray(
            photometric_augment(imgs, jax.random.PRNGKey(seed), grey=False)
        )
        assert (out[bg] == 0).all(), seed
        assert out.shape == imgs.shape
