"""Detection losses with the reference's exact masking/packing conventions.

Mirrors /root/reference/faster_rcnn/losses.py:16-95 so the target tensors
produced by :mod:`radnet_tpu.ops.targets` are bit-compatible:

* ``y_rpn_cls``  = concat([is_valid (A), overlap (A)], channel axis)
* ``y_rpn_regr`` = concat([repeat(overlap, 4) (4A), targets*std (4A)], ch)
* ``y_det_cls``  = one-hot over ``n_classes`` (bg last)
* ``y_det_regr`` = concat([labels (4K), coords*std (4K)]), K = n_classes - 1

All losses are mask-normalized sums with the reference's ``epsilon = 1e-4``
denominator stabilizer, and lambda weights of 1.0 (losses.py:8-14).
"""

from __future__ import annotations

import jax.numpy as jnp

LAMBDA_RPN_REGR = 1.0
LAMBDA_RPN_CLASS = 1.0
LAMBDA_CLS_REGR = 1.0
LAMBDA_CLS_CLASS = 1.0
EPSILON = 1e-4


def _smooth_l1(x: jnp.ndarray) -> jnp.ndarray:
    """0.5 x^2 for |x| <= 1 else |x| - 0.5 (losses.py:36-42)."""
    x_abs = jnp.abs(x)
    return jnp.where(x_abs <= 1.0, 0.5 * x * x, x_abs - 0.5)


def rpn_loss_regr(y_true: jnp.ndarray, y_pred: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """Masked smooth-L1 over RPN regression channels (losses.py:16-44).

    ``y_true``: (B, H, W, 8*A) - first 4A channels are the positive-anchor
    mask, last 4A are the (std-scaled) targets. ``y_pred``: (B, H, W, 4*A).
    """
    mask = y_true[..., : 4 * num_anchors]
    target = y_true[..., 4 * num_anchors :]
    diff = target - y_pred.astype(jnp.float32)
    num = jnp.sum(mask * _smooth_l1(diff))
    den = jnp.sum(EPSILON + mask)
    return LAMBDA_RPN_REGR * num / den


def rpn_loss_cls(y_true: jnp.ndarray, y_pred: jnp.ndarray, num_anchors: int) -> jnp.ndarray:
    """Masked binary cross-entropy over RPN objectness (losses.py:47-66).

    ``y_true``: (B, H, W, 2*A) - first A channels validity mask, last A the
    0/1 objectness labels. ``y_pred``: (B, H, W, A) post-sigmoid scores.
    """
    valid = y_true[..., :num_anchors]
    label = y_true[..., num_anchors:]
    p = jnp.clip(y_pred.astype(jnp.float32), 1e-7, 1.0 - 1e-7)
    bce = -(label * jnp.log(p) + (1.0 - label) * jnp.log(1.0 - p))
    num = jnp.sum(valid * bce)
    den = jnp.sum(EPSILON + valid)
    return LAMBDA_RPN_CLASS * num / den


def class_loss_regr(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    num_classes: int,
    roi_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Masked smooth-L1 over per-class detector regression (losses.py:69-90).

    ``y_true``: (B, R, 8*K) with label mask then coords, K = num_classes
    (foreground classes only). ``roi_mask``: optional (B, R) validity for
    padded RoI slots (the reference always fills all ``n_rois`` slots,
    train.py:109-129; padding only appears in our fixed-shape eval path).
    """
    mask = y_true[..., : 4 * num_classes]
    target = y_true[..., 4 * num_classes :]
    if roi_mask is not None:
        mask = mask * roi_mask[..., None]
    diff = target - y_pred.astype(jnp.float32)
    num = jnp.sum(mask * _smooth_l1(diff))
    den = jnp.sum(EPSILON + mask)
    return LAMBDA_CLS_REGR * num / den


def class_loss_cls(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    roi_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Mean categorical cross-entropy over RoIs (losses.py:93-95).

    ``y_true``: (B, R, n_classes) one-hot; ``y_pred``: post-softmax probs.
    """
    p = jnp.clip(y_pred.astype(jnp.float32), 1e-7, 1.0)
    ce = -jnp.sum(y_true * jnp.log(p), axis=-1)  # (B, R)
    if roi_mask is None:
        return LAMBDA_CLS_CLASS * jnp.mean(ce)
    den = jnp.sum(roi_mask) + EPSILON
    return LAMBDA_CLS_CLASS * jnp.sum(ce * roi_mask) / den


def detector_accuracy(
    y_true: jnp.ndarray,
    y_pred: jnp.ndarray,
    roi_mask: jnp.ndarray | None = None,
) -> jnp.ndarray:
    """Classification accuracy over RoIs, the reference's Keras
    ``metrics={'dense_class_N': 'accuracy'}`` (train.py:249-251)."""
    hit = (jnp.argmax(y_pred, axis=-1) == jnp.argmax(y_true, axis=-1)).astype(
        jnp.float32
    )
    if roi_mask is None:
        return jnp.mean(hit)
    return jnp.sum(hit * roi_mask) / (jnp.sum(roi_mask) + EPSILON)
