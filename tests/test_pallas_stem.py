"""The fused grey-stem Pallas kernel must match the reference stem path.

Reference semantics (models/resnet.py::ResNet50Trunk entry,
resnet50.py:182-188): broadcast the grey channel to BGR, mean-center the
WHOLE canvas, cast to bf16, ZeroPadding2D((3,3)), 7x7/2 conv + bias,
FrozenBatchNorm (eps 1e-3, bf16 affine), ReLU, 3x3/2 VALID max-pool.
The kernel convolves the raw integer grey values and applies the
centering as the bias0 map - same math, fewer roundings - so comparison
is at bf16 tolerance, not bit-exact.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from radnet_tpu.data.pipeline import IMAGENET_BGR_MEAN
from radnet_tpu.ops.pallas_stem import (
    GreyStem,
    pad_grey_canvas,
    stem_constants,
)


def _reference_stem(grey, kernel, bias, bn, dt=jnp.bfloat16):
    """The existing XLA path, plain-conv form (bit-equal to StemConv's
    s2d rewrite by construction - models/resnet.py docstring)."""
    img = jnp.broadcast_to(grey[..., None], grey.shape + (3,)).astype(jnp.float32)
    img = img - jnp.asarray(IMAGENET_BGR_MEAN, jnp.float32)
    x = img.astype(dt)
    xpad = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))
    y = jax.lax.conv_general_dilated(
        xpad, jnp.asarray(kernel, dt), (2, 2), "VALID",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    ) + jnp.asarray(bias, dt)
    k = bn["gamma"] / np.sqrt(bn["var"] + 1e-3)
    b = bn["beta"] - bn["mean"] * k
    y = y.astype(dt) * jnp.asarray(k, dt) + jnp.asarray(b, dt)
    y = jnp.maximum(y, 0)
    return jax.lax.reduce_window(
        y, -jnp.inf, jax.lax.max, (1, 3, 3, 1), (1, 2, 2, 1), "VALID"
    )


@pytest.mark.parametrize("canvas", [64, 128])
def test_grey_stem_matches_reference(canvas):
    rng = np.random.default_rng(0)
    B = 2
    content = canvas - 8  # content window smaller than the canvas
    grey = np.zeros((B, canvas, canvas), np.float32)
    grey[:, :content, :content] = rng.integers(
        0, 255, (B, content, content)
    ).astype(np.float32)

    kernel = rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32)
    bias = rng.normal(0, 0.05, (64,)).astype(np.float32)
    bn = {
        "gamma": rng.normal(1, 0.1, (64,)).astype(np.float32),
        "beta": rng.normal(0, 0.1, (64,)).astype(np.float32),
        "mean": rng.normal(0, 1.0, (64,)).astype(np.float32),
        "var": rng.uniform(0.5, 2.0, (64,)).astype(np.float32),
    }

    # f32 ground truth: the kernel accumulates exact bf16 products (grey
    # ints <= 255 and bf16 weights multiply exactly into f32), so it
    # tracks the f32 reference to weight-rounding error; the production
    # bf16 XLA path deviates MORE (it rounds the centered activations).
    ref32 = np.asarray(
        _reference_stem(jnp.asarray(grey), kernel, bias, bn, dt=jnp.float32),
        np.float32,
    )
    ref16 = np.asarray(
        _reference_stem(jnp.asarray(grey), kernel, bias, bn), np.float32
    )

    k7, b0p, scale = stem_constants(kernel, bias, bn, canvas, IMAGENET_BGR_MEAN)
    stem = GreyStem(canvas, B, interpret=True)
    gp = pad_grey_canvas(jnp.asarray(grey), canvas)
    out = np.asarray(stem(gp, k7, b0p, scale), np.float32)

    assert out.shape == ref32.shape
    mag = np.maximum(np.abs(ref32), 8.0)
    rel_kernel = (np.abs(out - ref32) / mag).max()
    rel_bf16path = (np.abs(ref16 - ref32) / mag).max()
    # kernel must sit in (or under) the bf16 path's own error band
    assert rel_kernel < max(0.02, 2.0 * rel_bf16path), (
        rel_kernel, rel_bf16path
    )


def test_stem_constants_interior_matches_vector_form():
    """Away from the ring, bias0 must equal the constant
    bias - sum_c mean_c * sum(W_c) scaled by bn."""
    rng = np.random.default_rng(1)
    kernel = rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32)
    bias = rng.normal(0, 0.05, (64,)).astype(np.float32)
    bn = {
        "gamma": np.ones(64, np.float32),
        "beta": np.zeros(64, np.float32),
        "mean": np.zeros(64, np.float32),
        "var": np.ones(64, np.float32),
    }
    canvas = 64
    k7, b0p, scale = stem_constants(kernel, bias, bn, canvas, IMAGENET_BGR_MEAN)
    km = np.einsum("yxco,c->o", kernel, IMAGENET_BGR_MEAN)
    expect = (bias - km) / np.sqrt(1.0 + 1e-3)
    interior = np.asarray(b0p)[4:-6, 4:-4, :64]  # 64..128 is DMA pad
    np.testing.assert_allclose(
        interior, np.broadcast_to(expect, interior.shape), rtol=1e-4, atol=1e-4
    )
