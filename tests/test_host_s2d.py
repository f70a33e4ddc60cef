"""Host-built s2d stem canvases must be bit-equal to the image path.

The square-canvas host tile path for resnet50 ships space-to-depth'd
uint8 canvases (config.infer_host_s2d); the cascade then centers them
with the masked-mean map and feeds StemConv's prebuilt branch.  Both
pipelines compute the SAME values through the same kernel layout (s2d is
a permutation; the masked mean equals center-then-zero-pad), so
detections must match bit-for-bit, not just approximately.
"""

import dataclasses

import jax
import numpy as np
import pytest

from radnet_tpu.data.pipeline import (
    IMAGENET_BGR_MEAN,
    s2d_canvas_np,
    s2d_mean_offsets,
)
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.inference import RADNet
from radnet_tpu.models.detector import build_model
from tests.util import decisive_detector_params, tiny_config


def test_s2d_canvas_matches_device_build():
    """numpy s2d == the trunk's pad+reshape+concat on the same canvas."""
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    s = 64
    canvas = rng.integers(0, 255, (s, s, 3), np.uint8)
    host = s2d_canvas_np(canvas)

    x = jnp.asarray(canvas[None]).astype(jnp.float32)
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    b, h, w, c = xpad.shape
    xw = xpad.reshape(b, h, w // 2, 2 * c)
    dev = np.asarray(jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)[0])
    np.testing.assert_array_equal(host.astype(np.float32), dev)


def test_s2d_mean_offsets_equals_centered_pad():
    """centered-then-padded s2d == raw s2d minus the offsets map."""
    rng = np.random.default_rng(1)
    s = 64
    canvas = rng.integers(0, 255, (s, s, 3), np.uint8)
    centered = canvas.astype(np.float32) - IMAGENET_BGR_MEAN
    # reference order: center whole canvas, zero-pad, s2d
    xpad = np.zeros((s + 6, s + 6, 3), np.float32)
    xpad[3 : 3 + s, 3 : 3 + s] = centered
    xw = xpad.reshape(s + 6, (s + 6) // 2, 6)
    want = np.concatenate([xw[0::2], xw[1::2]], axis=-1)
    got = s2d_canvas_np(canvas).astype(np.float32) - s2d_mean_offsets(s)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-5)


def test_host_s2d_detections_bit_equal():
    cfg = tiny_config("resnet50")
    # force the HOST tile path (the prescaled device path builds its own
    # canvases and would bypass host s2d on both sides of the compare)
    cfg = dataclasses.replace(cfg, infer_device_tiling=False)
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    params = decisive_detector_params(state.params)

    on = RADNet(cfg, model, params, state.batch_stats)
    assert on._use_host_s2d
    off_cfg = dataclasses.replace(cfg, infer_host_s2d=False)
    off = RADNet(off_cfg, model, params, state.batch_stats)
    assert not off._use_host_s2d

    rng = np.random.default_rng(2)
    panel = rng.integers(0, 255, (150, 150, 3), np.uint8)
    panel[:] = np.repeat(panel[..., :1], 3, axis=-1)  # grey-like content
    on.bbox_threshold = off.bbox_threshold = 0.0
    d_on = on.predict([panel])
    d_off = off.predict([panel])

    key = lambda d: (d["class"], d["x1"], d["y1"], d["x2"], d["y2"], d["prob"])
    assert sorted(map(key, d_on)) == sorted(map(key, d_off))
    assert len(d_on) >= 1  # the comparison must compare something
