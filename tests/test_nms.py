"""Fixed-shape NMS vs a reference-semantics numpy implementation."""

import numpy as np
import jax.numpy as jnp

from radnet_tpu.ops import nms


def ref_nms(boxes, probs, overlap_thresh, max_boxes):
    """Greedy NMS with the reference's semantics (rpn.py:380-455)."""
    if len(boxes) == 0:
        return [], []
    boxes = boxes.astype(float)
    x1, y1, x2, y2 = boxes[:, 0], boxes[:, 1], boxes[:, 2], boxes[:, 3]
    area = (x2 - x1) * (y2 - y1)
    idxs = np.argsort(probs)
    pick = []
    while len(idxs) > 0:
        last = len(idxs) - 1
        i = idxs[last]
        pick.append(i)
        xx1 = np.maximum(x1[i], x1[idxs[:last]])
        yy1 = np.maximum(y1[i], y1[idxs[:last]])
        xx2 = np.minimum(x2[i], x2[idxs[:last]])
        yy2 = np.minimum(y2[i], y2[idxs[:last]])
        ww = np.maximum(0, xx2 - xx1)
        hh = np.maximum(0, yy2 - yy1)
        inter = ww * hh
        overlap = inter / (area[i] + area[idxs[:last]] - inter + 1e-6)
        idxs = np.delete(
            idxs, np.concatenate(([last], np.where(overlap > overlap_thresh)[0]))
        )
        if len(pick) >= max_boxes:
            break
    return boxes[pick].astype(int), probs[pick]


def _random_boxes(rng, n, size=40):
    xy = rng.uniform(0, size, (n, 2))
    wh = rng.uniform(2, 15, (n, 2))
    return np.concatenate([xy, xy + wh], axis=-1)


def test_nms_matches_reference_greedy():
    rng = np.random.default_rng(42)
    boxes = _random_boxes(rng, 100)
    probs = rng.uniform(0.01, 1.0, 100)
    for thresh in (0.2, 0.5, 0.9):
        want_boxes, want_probs = ref_nms(boxes.copy(), probs.copy(), thresh, 300)
        got_b, got_s, got_v = nms.nms_fixed(
            jnp.asarray(boxes, jnp.float32),
            jnp.asarray(probs, jnp.float32),
            jnp.ones(100, bool),
            thresh,
            max_out=300,
            cast_int=True,
        )
        got_b = np.asarray(got_b)[np.asarray(got_v)]
        got_s = np.asarray(got_s)[np.asarray(got_v)]
        assert len(got_b) == len(want_boxes), thresh
        np.testing.assert_allclose(got_b, want_boxes, atol=1e-4)
        np.testing.assert_allclose(got_s, want_probs, atol=1e-5)


def test_fixed_point_nms_equals_sequential_greedy():
    """The parallel fixed-point NMS must produce exactly the greedy set."""
    rng = np.random.default_rng(123)
    for trial in range(4):
        n = 200
        boxes = _random_boxes(rng, n, size=60)  # heavy overlap
        probs = rng.uniform(0.01, 1.0, n)
        valid = rng.random(n) > 0.1
        for thresh in (0.2, 0.5, 0.7):
            a = nms.nms_fixed(
                jnp.asarray(boxes, jnp.float32),
                jnp.asarray(probs, jnp.float32),
                jnp.asarray(valid),
                thresh,
                max_out=50,
            )
            b = nms.nms_fixed_point(
                jnp.asarray(boxes, jnp.float32),
                jnp.asarray(probs, jnp.float32),
                jnp.asarray(valid),
                thresh,
                max_out=50,
            )
            np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
            np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)
            np.testing.assert_allclose(np.asarray(a[1]), np.asarray(b[1]), atol=1e-6)


def test_nms_max_out_truncates():
    rng = np.random.default_rng(0)
    boxes = _random_boxes(rng, 50, size=1000)  # mostly non-overlapping
    probs = rng.uniform(0.1, 1, 50)
    got_b, got_s, got_v = nms.nms_fixed(
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(probs, jnp.float32),
        jnp.ones(50, bool),
        0.9,
        max_out=10,
    )
    assert int(np.asarray(got_v).sum()) == 10
    # picks must come out in descending score order
    s = np.asarray(got_s)
    assert np.all(np.diff(s) <= 1e-6)


def test_nms_respects_validity_mask():
    boxes = jnp.array([[0, 0, 10, 10], [100, 100, 110, 110]], jnp.float32)
    probs = jnp.array([0.9, 0.8], jnp.float32)
    valid = jnp.array([False, True])
    got_b, got_s, got_v = nms.nms_fixed(boxes, probs, valid, 0.5, max_out=5)
    v = np.asarray(got_v)
    assert v.sum() == 1
    np.testing.assert_allclose(np.asarray(got_b)[0], [100, 100, 110, 110])


def test_batched_nms_shapes():
    rng = np.random.default_rng(3)
    boxes = np.stack([_random_boxes(rng, 30) for _ in range(4)])
    probs = rng.uniform(0, 1, (4, 30))
    b, s, v = nms.batched_nms(
        jnp.asarray(boxes, jnp.float32),
        jnp.asarray(probs, jnp.float32),
        jnp.ones((4, 30), bool),
        0.5,
        max_out=8,
    )
    assert b.shape == (4, 8, 4) and s.shape == (4, 8) and v.shape == (4, 8)


def test_final_nms_cluster_merges_overlapping_boxes():
    # Three nearly identical low-confidence boxes + one far-away box.
    boxes = np.array(
        [[0, 0, 10, 10], [1, 1, 11, 11], [0, 1, 10, 11], [50, 50, 60, 60]],
        dtype=float,
    )
    probs = np.array([0.5, 0.6, 0.55, 0.7])
    out_boxes, out_probs = nms.final_nms_cluster(boxes, probs)
    assert len(out_boxes) == 2
    # cluster of the first three is averaged (all < 0.8 confidence -> mean
    # of the top-5 = all three members)
    far = out_boxes[np.argmax(out_probs == 0.7)] if 0.7 in out_probs else None
    sums = sorted(out_probs.tolist())
    assert abs(sums[0] - np.mean([0.5, 0.6, 0.55])) < 1e-9 or abs(
        sums[1] - np.mean([0.5, 0.6, 0.55])
    ) < 1e-9


def test_final_nms_cluster_high_confidence_members_only():
    boxes = np.array([[0, 0, 10, 10], [1, 1, 11, 11], [0, 1, 10, 11]], dtype=float)
    probs = np.array([0.95, 0.85, 0.3])
    out_boxes, out_probs = nms.final_nms_cluster(boxes, probs)
    assert len(out_boxes) == 1
    # only the two >0.8 members are averaged
    np.testing.assert_allclose(out_probs[0], 0.9)
    np.testing.assert_allclose(
        out_boxes[0], np.rint(boxes[:2].mean(axis=0)).astype(int)
    )


def test_topk_candidates():
    boxes = jnp.arange(40, dtype=jnp.float32).reshape(10, 4)
    scores = jnp.arange(10, dtype=jnp.float32)
    valid = jnp.ones(10, bool).at[9].set(False)
    b, s, v = nms.topk_candidates(boxes, scores, valid, 3)
    np.testing.assert_allclose(np.asarray(s), [8, 7, 6])
    assert bool(np.asarray(v).all())
