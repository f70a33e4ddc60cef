"""Loss functions vs hand-computed values with the reference's packing."""

import numpy as np
import jax.numpy as jnp

from radnet_tpu import losses


def test_smooth_l1_branches():
    x = jnp.array([0.5, -0.5, 2.0, -3.0])
    got = np.asarray(losses._smooth_l1(x))
    want = np.array([0.125, 0.125, 1.5, 2.5])
    np.testing.assert_allclose(got, want)


def test_rpn_loss_regr_masked_normalization():
    a = 1  # one anchor
    # one spatial cell: mask=1 on all 4 coords, target [1,0,0,0], pred 0
    y_true = jnp.zeros((1, 1, 1, 8))
    y_true = y_true.at[0, 0, 0, :4].set(1.0)
    y_true = y_true.at[0, 0, 0, 4].set(1.0)
    y_pred = jnp.zeros((1, 1, 1, 4))
    got = float(losses.rpn_loss_regr(y_true, y_pred, a))
    # sum = smooth_l1(1) = 0.5; denom = 4 + 4*eps
    np.testing.assert_allclose(got, 0.5 / (4 + 4 * losses.EPSILON), rtol=1e-5)


def test_rpn_loss_cls_only_valid_anchors_count():
    a = 2
    y_true = jnp.zeros((1, 1, 1, 4))
    # anchor 0 valid with label 1; anchor 1 invalid with label 0
    y_true = y_true.at[0, 0, 0, 0].set(1.0)  # valid mask anchor 0
    y_true = y_true.at[0, 0, 0, 2].set(1.0)  # label anchor 0 = 1
    y_pred = jnp.full((1, 1, 1, 2), 0.5)
    got = float(losses.rpn_loss_cls(y_true, y_pred, a))
    want = -np.log(0.5) / (1 + 2 * losses.EPSILON)
    np.testing.assert_allclose(got, want, rtol=1e-5)
    # flipping the invalid anchor's prediction must not change the loss
    y_pred2 = y_pred.at[0, 0, 0, 1].set(0.99)
    np.testing.assert_allclose(float(losses.rpn_loss_cls(y_true, y_pred2, a)), got, rtol=1e-6)


def test_class_loss_cls_mean_ce():
    y_true = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])  # (1, 2 rois, 2 cls)
    y_pred = jnp.asarray([[[0.8, 0.2], [0.4, 0.6]]])
    got = float(losses.class_loss_cls(y_true, y_pred))
    want = np.mean([-np.log(0.8), -np.log(0.6)])
    np.testing.assert_allclose(got, want, rtol=1e-5)

    # roi mask zeroes out the second roi
    mask = jnp.asarray([[1.0, 0.0]])
    got_m = float(losses.class_loss_cls(y_true, y_pred, mask))
    np.testing.assert_allclose(got_m, -np.log(0.8) / (1 + losses.EPSILON), rtol=1e-5)


def test_class_loss_regr_per_class_mask():
    k = 2  # fg classes
    # one roi of class 0: labels 1 on coords 0..3, target 2.0 on coord 0
    y_true = np.zeros((1, 1, 16), np.float32)
    y_true[0, 0, 0:4] = 1.0
    y_true[0, 0, 8] = 2.0
    y_pred = jnp.zeros((1, 1, 8))
    got = float(losses.class_loss_regr(jnp.asarray(y_true), y_pred, k))
    want = (2.0 - 0.5) / (4 + 8 * losses.EPSILON)  # smooth_l1(2)=1.5
    np.testing.assert_allclose(got, want, rtol=1e-5)


def test_detector_accuracy():
    y_true = jnp.asarray([[[1.0, 0.0], [0.0, 1.0]]])
    y_pred = jnp.asarray([[[0.9, 0.1], [0.7, 0.3]]])  # second wrong
    assert float(losses.detector_accuracy(y_true, y_pred)) == 0.5
    mask = jnp.asarray([[1.0, 0.0]])
    np.testing.assert_allclose(
        float(losses.detector_accuracy(y_true, y_pred, mask)),
        1.0 / (1 + losses.EPSILON),
        rtol=1e-5,
    )
