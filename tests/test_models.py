"""Model shape/compile tests for both backbones."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radnet_tpu.config import backbone_feat_size
from radnet_tpu.models.detector import build_model
from tests.util import tiny_config


@pytest.mark.parametrize("network", ["vgg16", "resnet50"])
def test_forward_shapes(network):
    cfg = tiny_config(network)
    model = build_model(cfg)
    s = cfg.canvas_size
    f = backbone_feat_size(network, s)
    assert f == cfg.feat_size

    img = jnp.zeros((1, s, s, 3), jnp.float32)
    rois = jnp.asarray([[[0.0, 0.0, 2.0, 2.0], [1.0, 1.0, 2.0, 2.0]]])
    variables = model.init(
        {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1)},
        img,
        rois,
    )
    (rpn_cls, rpn_regr), (det_cls, det_regr) = model.apply(variables, img, rois)

    a = cfg.n_anchors
    assert rpn_cls.shape == (1, f, f, a)
    assert rpn_regr.shape == (1, f, f, 4 * a)
    assert det_cls.shape == (1, 2, cfg.n_classes)
    assert det_regr.shape == (1, 2, 4 * (cfg.n_classes - 1))

    # objectness is a probability, class output sums to one (softmax)
    assert float(jnp.min(rpn_cls)) >= 0.0 and float(jnp.max(rpn_cls)) <= 1.0
    np.testing.assert_allclose(np.asarray(det_cls).sum(-1), 1.0, atol=1e-5)


def test_feat_size_formulas():
    # reference formulas: vgg //16 (vgg16.py:18-23); resnet pad+strided
    # stack (resnet50.py:19-35)
    assert backbone_feat_size("vgg16", 608) == 38
    assert backbone_feat_size("resnet50", 608) == 38
    assert backbone_feat_size("vgg16", 600) == 37
    assert backbone_feat_size("resnet50", 600) == 38


def test_frozen_bn_uses_stored_stats():
    from radnet_tpu.models.layers import FrozenBatchNorm

    bn = FrozenBatchNorm()
    x = jnp.asarray(np.random.default_rng(0).normal(3.0, 2.0, (2, 4, 4, 8)).astype(np.float32))
    variables = bn.init(jax.random.PRNGKey(0), x)
    # default stats: mean 0, var 1, gamma 1, beta 0 -> identity up to eps
    y = bn.apply(variables, x)
    np.testing.assert_allclose(np.asarray(y), np.asarray(x) / np.sqrt(1 + 1e-3), atol=1e-5)

    # custom stats are honoured
    stats = {
        "gamma": jnp.full((8,), 2.0),
        "beta": jnp.full((8,), 1.0),
        "mean": jnp.full((8,), 3.0),
        "var": jnp.full((8,), 4.0),
    }
    y = bn.apply({"params": {}, "batch_stats": stats}, x)
    want = (np.asarray(x) - 3.0) / np.sqrt(4.0 + 1e-3) * 2.0 + 1.0
    np.testing.assert_allclose(np.asarray(y), want, atol=1e-4)


def test_resnet_bf16_compute_keeps_fp32_params():
    cfg = tiny_config("resnet50")
    cfg.compute_dtype = "bfloat16"
    model = build_model(cfg)
    img = jnp.zeros((1, cfg.canvas_size, cfg.canvas_size, 3), jnp.float32)
    rois = jnp.asarray([[[0.0, 0.0, 2.0, 2.0]]])
    variables = model.init({"params": jax.random.PRNGKey(0)}, img, rois)
    leaves = jax.tree_util.tree_leaves(variables["params"])
    assert all(l.dtype == jnp.float32 for l in leaves)


def test_stem_conv_matches_plain_conv():
    """StemConv's space-to-depth rewrite is numerically the plain 7x7/2 conv.

    The s2d form (free W-reshape + H even/odd interleave, kernel re-laid-out
    to the (row-parity, col-parity, c) channel order) computes identical
    arithmetic terms, so f32 outputs must agree to accumulation-order
    rounding on the even-extent path and exactly dispatch the plain conv on
    the odd-extent fallback (resnet50.py:182).
    """
    from radnet_tpu.models.resnet import StemConv

    rng = np.random.default_rng(0)
    kernel = jnp.asarray(rng.normal(0, 0.05, (7, 7, 3, 64)).astype(np.float32))
    bias = jnp.asarray(rng.normal(0, 0.1, (64,)).astype(np.float32))
    variables = {"params": {"kernel": kernel, "bias": bias}}
    stem = StemConv()

    for hw in (38, 37):  # even: s2d path; odd: plain-conv fallback
        x = jnp.asarray(
            rng.normal(0, 64, (2, hw, hw, 3)).astype(np.float32) + 127
        )
        want = jax.lax.conv_general_dilated(
            x, kernel, (2, 2), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        ) + bias
        got = stem.apply(variables, x)
        np.testing.assert_allclose(
            np.asarray(got), np.asarray(want), rtol=1e-5, atol=1e-3
        )
