"""Matmul bicubic resize vs cv2.INTER_CUBIC."""

import cv2
import numpy as np
import jax.numpy as jnp

from radnet_tpu.ops.resize import resize_bicubic, resize_matrix


def test_resize_matrix_rows_sum_to_one():
    m = resize_matrix(100, 30)
    np.testing.assert_allclose(m.sum(axis=1), 1.0, atol=1e-6)
    assert m.shape == (30, 100)


def test_identity_scale_is_identity():
    m = resize_matrix(64, 64)
    np.testing.assert_allclose(m, np.eye(64), atol=1e-6)


def test_matches_cv2_inter_cubic():
    rng = np.random.default_rng(0)
    img = rng.integers(0, 255, (200, 200, 3), dtype=np.uint8)
    want = cv2.resize(img, (60, 60), interpolation=cv2.INTER_CUBIC).astype(np.float32)
    got = np.asarray(resize_bicubic(jnp.asarray(img), 60, 60))
    # same kernel (a=-0.75); residual differences are cv2's fixed-point
    # arithmetic and border handling
    # isolated pixels can differ where the source coordinate lands on a
    # tap boundary (float vs cv2 fixed-point floor ties); the bulk must
    # agree tightly
    diff = np.abs(got - want)
    assert np.median(diff) < 0.5
    assert diff.mean() < 1.0
    assert np.percentile(diff, 95) < 2.0


def test_smooth_image_near_exact():
    # on a smooth (linear) image all cubic variants agree closely
    xs = np.linspace(0, 255, 160, dtype=np.float32)
    img = np.broadcast_to(xs, (160, 160)).copy()[..., None].repeat(3, -1)
    want = cv2.resize(img, (48, 48), interpolation=cv2.INTER_CUBIC)
    got = np.asarray(resize_bicubic(jnp.asarray(img), 48, 48))
    np.testing.assert_allclose(got, want, atol=0.5)
