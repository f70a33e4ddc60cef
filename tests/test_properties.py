"""Property-based tests (hypothesis) for the critical invariants."""

import numpy as np
import jax.numpy as jnp
from hypothesis import given, settings, strategies as st

from radnet_tpu.ops import nms


@st.composite
def box_sets(draw):
    n = draw(st.integers(min_value=1, max_value=40))
    rng = np.random.default_rng(draw(st.integers(0, 2**31 - 1)))
    xy = rng.uniform(0, 40, (n, 2))
    wh = rng.uniform(1, 20, (n, 2))
    boxes = np.concatenate([xy, xy + wh], axis=-1).astype(np.float32)
    probs = rng.uniform(0.01, 1.0, n).astype(np.float32)
    valid = rng.random(n) > draw(st.floats(0.0, 0.5))
    thresh = draw(st.sampled_from([0.2, 0.5, 0.7, 0.9]))
    return boxes, probs, valid, thresh


@settings(max_examples=25, deadline=None)
@given(box_sets())
def test_fixed_point_nms_always_equals_greedy(data):
    boxes, probs, valid, thresh = data
    a = nms.nms_fixed(
        jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), thresh, max_out=16
    )
    b = nms.nms_fixed_point(
        jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), thresh, max_out=16
    )
    np.testing.assert_array_equal(np.asarray(a[2]), np.asarray(b[2]))
    np.testing.assert_allclose(np.asarray(a[0]), np.asarray(b[0]), atol=1e-5)


@settings(max_examples=25, deadline=None)
@given(box_sets())
def test_nms_output_is_mutually_nonsuppressing(data):
    """No kept box may overlap a higher-scoring kept box above thresh."""
    boxes, probs, valid, thresh = data
    out_b, out_s, out_v = nms.nms_fixed_point(
        jnp.asarray(boxes), jnp.asarray(probs), jnp.asarray(valid), thresh, max_out=16
    )
    kept = np.asarray(out_b)[np.asarray(out_v)]
    if len(kept) < 2:
        return
    from radnet_tpu.geometry import iou_matrix

    iou = np.array(iou_matrix(jnp.asarray(kept), jnp.asarray(kept)))
    np.fill_diagonal(iou, 0.0)
    assert iou.max() <= thresh + 1e-6
