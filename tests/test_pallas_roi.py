"""Pallas RoI-pool kernel vs the XLA reference paths (interpret mode)."""

import numpy as np
import jax.numpy as jnp

from radnet_tpu.ops.pallas_roi import roi_pool_pallas
from radnet_tpu.ops.roi_align import batched_roi_pool


def test_pallas_kernel_matches_einsum_path():
    rng = np.random.default_rng(0)
    b, h, w, c = 2, 16, 16, 256
    r = 8
    fmaps = jnp.asarray(rng.normal(size=(b, h, w, c)).astype(np.float32))
    rois = np.zeros((b, r, 4), np.float32)
    for bi in range(b):
        xy = rng.integers(0, 10, (r, 2))
        wh = rng.integers(1, 6, (r, 2))
        rois[bi] = np.concatenate([xy, wh], axis=1)
    rois = jnp.asarray(rois)

    want = np.asarray(batched_roi_pool(fmaps, rois, pool_size=7, method="matmul"))
    got = np.asarray(
        roi_pool_pallas(
            fmaps, rois, pool_size=7, roi_block=4, channel_block=128, interpret=True
        )
    )
    assert got.shape == (b, r, 7, 7, c)
    np.testing.assert_allclose(got, want, atol=1e-4)


def test_pallas_kernel_channel_blocking():
    rng = np.random.default_rng(1)
    fmaps = jnp.asarray(rng.normal(size=(1, 8, 8, 256)).astype(np.float32))
    rois = jnp.asarray([[[0.0, 0.0, 8.0, 8.0], [2.0, 2.0, 3.0, 3.0]]])
    full = np.asarray(
        roi_pool_pallas(fmaps, rois, pool_size=7, roi_block=2, channel_block=256, interpret=True)
    )
    blocked = np.asarray(
        roi_pool_pallas(fmaps, rois, pool_size=7, roi_block=2, channel_block=128, interpret=True)
    )
    np.testing.assert_allclose(full, blocked, atol=1e-5)
