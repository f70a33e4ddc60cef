"""RoI pooling behaviour tests (constant / linear-field invariances)."""

import numpy as np
import jax.numpy as jnp

from radnet_tpu.ops.roi_align import batched_roi_pool, roi_pool, roi_pool_matmul


def test_constant_map_pools_constant():
    fmap = jnp.full((20, 20, 3), 5.0)
    rois = jnp.array([[2.0, 3.0, 8.0, 6.0], [0.0, 0.0, 20.0, 20.0]])
    out = roi_pool(fmap, rois, pool_size=7)
    assert out.shape == (2, 7, 7, 3)
    np.testing.assert_allclose(np.asarray(out), 5.0, atol=1e-6)


def test_linear_field_is_interpolated():
    # f(x, y) = x; pooled samples must be within the roi's x-range and
    # monotone along the x axis.
    h = w = 32
    xs = np.broadcast_to(np.arange(w, dtype=np.float32), (h, w))
    fmap = jnp.asarray(xs[..., None])
    rois = jnp.array([[4.0, 8.0, 16.0, 12.0]])
    out = np.asarray(roi_pool(fmap, rois, pool_size=7))[0, :, :, 0]
    assert out.min() >= 4.0 - 1e-4
    assert out.max() <= 19.0 + 1e-4  # x + w - 1
    assert np.all(np.diff(out, axis=1) > 0)
    # rows identical (no y dependence)
    np.testing.assert_allclose(out, np.broadcast_to(out[0:1, :], out.shape), atol=1e-5)


def test_single_cell_roi():
    fmap = jnp.asarray(np.random.default_rng(0).normal(size=(10, 10, 4)).astype(np.float32))
    rois = jnp.array([[3.0, 4.0, 1.0, 1.0]])
    out = np.asarray(roi_pool(fmap, rois, pool_size=7))
    np.testing.assert_allclose(out[0], np.broadcast_to(np.asarray(fmap)[4, 3], (7, 7, 4)), atol=1e-5)


def test_batched_shapes():
    fmaps = jnp.zeros((3, 16, 16, 8))
    rois = jnp.tile(jnp.array([[1.0, 1.0, 4.0, 4.0]]), (3, 5, 1))
    out = batched_roi_pool(fmaps, rois, pool_size=14)
    assert out.shape == (3, 5, 14, 14, 8)


def test_matmul_path_matches_gather_path():
    rng = np.random.default_rng(1)
    fmap = jnp.asarray(rng.normal(size=(24, 24, 16)).astype(np.float32))
    rois = jnp.asarray(
        np.array(
            [
                [0.0, 0.0, 24.0, 24.0],
                [3.0, 5.0, 9.0, 7.0],
                [10.0, 10.0, 1.0, 1.0],
                [20.0, 20.0, 8.0, 8.0],  # clipped at the border internally
            ],
            np.float32,
        )
    )
    for pool in (7, 14):
        a = np.asarray(roi_pool(fmap, rois, pool_size=pool))
        b = np.asarray(roi_pool_matmul(fmap, rois, pool_size=pool))
        np.testing.assert_allclose(a, b, atol=1e-4)


def test_dtype_preserved():
    fmap = jnp.zeros((8, 8, 4), jnp.bfloat16)
    rois = jnp.array([[0.0, 0.0, 4.0, 4.0]])
    out = roi_pool(fmap, rois, pool_size=7)
    assert out.dtype == jnp.bfloat16


def test_strided_pool_matches_pool_then_stride():
    """7x7 pooling at center_stride=2 samples exactly the even positions of
    the 14x14 grid - the only positions stage-5's stride-2 1x1 convs read."""
    import jax.numpy as jnp

    from radnet_tpu.ops.roi_align import roi_pool_matmul

    rng = np.random.default_rng(0)
    fmap = jnp.asarray(rng.normal(0, 1, (12, 12, 8)).astype(np.float32))
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 6, 10),
                rng.uniform(0, 6, 10),
                rng.uniform(1, 6, 10),
                rng.uniform(1, 6, 10),
            ],
            -1,
        ).astype(np.float32)
    )
    full = np.asarray(roi_pool_matmul(fmap, rois, pool_size=14))
    strided = np.asarray(roi_pool_matmul(fmap, rois, pool_size=7, center_stride=2))
    np.testing.assert_allclose(strided, full[:, ::2, ::2, :], atol=1e-6)


def test_pre_strided_resnet_head_equivalence():
    """pre_strided head on the strided 7x7 pool == reference-form head
    (14x14 pool + stride-2 s5a) with the SAME parameters."""
    import jax
    import jax.numpy as jnp

    from radnet_tpu.models.resnet import ResNet50RoIHead
    from radnet_tpu.ops.roi_align import roi_pool_matmul

    rng = np.random.default_rng(1)
    fmap = jnp.asarray(rng.normal(0, 1, (12, 12, 16)).astype(np.float32))
    rois = jnp.asarray(
        np.stack(
            [
                rng.uniform(0, 6, 4),
                rng.uniform(0, 6, 4),
                rng.uniform(1, 6, 4),
                rng.uniform(1, 6, 4),
            ],
            -1,
        ).astype(np.float32)
    )
    pooled14 = roi_pool_matmul(fmap, rois, pool_size=14)
    pooled7 = roi_pool_matmul(fmap, rois, pool_size=7, center_stride=2)

    ref_head = ResNet50RoIHead(n_classes=3, pre_strided=False)
    new_head = ResNet50RoIHead(n_classes=3, pre_strided=True)
    params = ref_head.init(jax.random.PRNGKey(0), pooled14)
    cls_ref, regr_ref = ref_head.apply(params, pooled14)
    cls_new, regr_new = new_head.apply(params, pooled7)
    np.testing.assert_allclose(np.asarray(cls_new), np.asarray(cls_ref), atol=2e-5)
    np.testing.assert_allclose(np.asarray(regr_new), np.asarray(regr_ref), atol=2e-5)
