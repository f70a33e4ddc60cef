"""Geometry ops vs hand-computed values and the reference numpy semantics."""

import numpy as np
import jax.numpy as jnp

from radnet_tpu import geometry


def ref_iou(a, b):
    """Scalar IoU with the reference's semantics (utils.py:77-109)."""
    if a[0] >= a[2] or a[1] >= a[3] or b[0] >= b[2] or b[1] >= b[3]:
        return 0.0
    x = max(a[0], b[0])
    y = max(a[1], b[1])
    w = min(a[2], b[2]) - x
    h = min(a[3], b[3]) - y
    inter = 0 if (w < 0 or h < 0) else w * h
    area_a = (a[2] - a[0]) * (a[3] - a[1])
    area_b = (b[2] - b[0]) * (b[3] - b[1])
    return inter / (area_a + area_b - inter + 1e-6)


def test_iou_matrix_matches_reference_scalar():
    rng = np.random.default_rng(0)
    a = rng.uniform(0, 50, size=(13, 4))
    b = rng.uniform(0, 50, size=(7, 4))
    # make half of them well-formed, keep some degenerate rows as-is
    a[:10, 2:] = a[:10, :2] + rng.uniform(1, 20, size=(10, 2))
    b[:5, 2:] = b[:5, :2] + rng.uniform(1, 20, size=(5, 2))
    got = np.asarray(geometry.iou_matrix(jnp.asarray(a), jnp.asarray(b)))
    want = np.array([[ref_iou(x, y) for y in b] for x in a])
    np.testing.assert_allclose(got, want, atol=1e-5)


def test_encode_decode_roundtrip():
    anchors = jnp.array([[10.0, 20.0, 30.0, 60.0], [0.0, 0.0, 16.0, 16.0]])
    gt = jnp.array([[12.0, 22.0, 40.0, 58.0], [2.0, 2.0, 18.0, 20.0]])
    t = geometry.encode_boxes(anchors, gt)
    anchors_xywh = geometry.xyxy_to_xywh(anchors)
    dec = geometry.decode_boxes(anchors_xywh, t, round_outputs=False)
    dec_xyxy = geometry.xywh_to_xyxy(dec)
    np.testing.assert_allclose(np.asarray(dec_xyxy), np.asarray(gt), atol=1e-2)


def test_decode_matches_reference_apply_regr_np():
    """Mirror apply_regr_np (rpn.py:299-344) on random data."""
    rng = np.random.default_rng(1)
    n = 64
    x = rng.uniform(-5, 30, n)
    y = rng.uniform(-5, 30, n)
    w = rng.uniform(1, 30, n)
    h = rng.uniform(1, 30, n)
    tx, ty = rng.normal(0, 0.2, (2, n))
    tw, th = rng.normal(0, 0.3, (2, n))

    cx = x + w / 2.0
    cy = y + h / 2.0
    cx1 = tx * w + cx
    cy1 = ty * h + cy
    w1 = np.exp(tw.astype(np.float64)) * w
    h1 = np.exp(th.astype(np.float64)) * h
    want = np.stack(
        [np.round(cx1 - w1 / 2.0), np.round(cy1 - h1 / 2.0), np.round(w1), np.round(h1)],
        axis=-1,
    )

    anchors = jnp.stack([jnp.asarray(v, jnp.float32) for v in (x, y, w, h)], axis=-1)
    deltas = jnp.stack([jnp.asarray(v, jnp.float32) for v in (tx, ty, tw, th)], axis=-1)
    got = np.asarray(geometry.decode_boxes(anchors, deltas))
    np.testing.assert_allclose(got, want, atol=1e-3)


def test_xywh_conversions():
    b = jnp.array([[1.0, 2.0, 5.0, 10.0]])
    xywh = geometry.xyxy_to_xywh(b)
    np.testing.assert_allclose(np.asarray(xywh), [[1, 2, 4, 8]])
    back = geometry.xywh_to_xyxy(xywh)
    np.testing.assert_allclose(np.asarray(back), np.asarray(b))


def test_clip_boxes():
    b = jnp.array([[-5.0, -2.0, 100.0, 50.0]])
    c = geometry.clip_boxes_xyxy(b, 38.0, 40.0)
    np.testing.assert_allclose(np.asarray(c), [[0, 0, 37, 39]])
