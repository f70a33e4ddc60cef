"""Image resizing as dense interpolation matmuls (MXU-native).

``jax.image.resize`` lowers to gathers, which serialize on TPU's
scatter/gather unit; for the fixed tile->canvas scale used everywhere in
this framework the interpolation weights are constant, so resizing becomes
``out = Ry @ img @ Rx^T`` - two dense contractions the MXU executes in
~100us for a 2000^2 -> 600^2 tile.

The weight profile is the cubic convolution kernel with a = -0.75,
matching OpenCV's INTER_CUBIC (the reference resizes every tile with
cv2.INTER_CUBIC, utils.py:272,442-446), with half-pixel-centered sampling
and edge clamping.
"""

from __future__ import annotations

import functools

import numpy as np
import jax.numpy as jnp


def _cubic_kernel(x: np.ndarray, a: float = -0.75) -> np.ndarray:
    """Cubic convolution kernel; a=-0.75 matches OpenCV INTER_CUBIC
    (modules/imgproc interpolateCubic uses A=-0.75)."""
    x = np.abs(x)
    w = np.where(
        x <= 1.0,
        (a + 2.0) * x**3 - (a + 3.0) * x**2 + 1.0,
        np.where(x < 2.0, a * x**3 - 5.0 * a * x**2 + 8.0 * a * x - 4.0 * a, 0.0),
    )
    return w


@functools.lru_cache(maxsize=32)
def resize_matrix(in_size: int, out_size: int) -> np.ndarray:
    """(out_size, in_size) bicubic interpolation matrix, rows sum to 1.

    Half-pixel sampling: src = (dst + 0.5) * in/out - 0.5; out-of-range
    taps are clamped to the edge (weight folded onto the edge sample),
    matching the replicate border handling of cv2.resize.
    """
    scale = in_size / out_size
    src = (np.arange(out_size, dtype=np.float64) + 0.5) * scale - 0.5
    base = np.floor(src).astype(np.int64)
    m = np.zeros((out_size, in_size), dtype=np.float64)
    for tap in (-1, 0, 1, 2):
        idx = base + tap
        w = _cubic_kernel(src - idx)
        np.add.at(m, (np.arange(out_size), np.clip(idx, 0, in_size - 1)), w)
    # normalize (clamped taps can perturb the partition of unity)
    m /= m.sum(axis=1, keepdims=True)
    return m.astype(np.float32)


def resize_bicubic(img: jnp.ndarray, out_h: int, out_w: int) -> jnp.ndarray:
    """Resize ``(H, W, C)`` via two dense contractions; float32 output."""
    h, w = img.shape[:2]
    ry = jnp.asarray(resize_matrix(h, out_h))  # (out_h, H)
    rx = jnp.asarray(resize_matrix(w, out_w))  # (out_w, W)
    x = img.astype(jnp.float32)
    tmp = jnp.einsum("oh,hwc->owc", ry, x)
    return jnp.einsum("pw,owc->opc", rx, tmp)
