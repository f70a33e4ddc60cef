"""Alternating (reference-exact) training schedule.

The reference updates the RPN first, computes proposals from the
*just-updated* RPN, then updates the detector with a SECOND Adam state
(/root/reference/train.py:288-402).  ``make_alternating_train_step`` fuses
those dynamics into one program; these tests pin it against a literal
two-phase loop built from separately-jitted sub-programs.
"""

import numpy as np
import jax
import jax.numpy as jnp
import optax
import pytest

from radnet_tpu import losses
from radnet_tpu.engine.steps import (
    _batch_rpn_targets,
    _device_anchors,
    _proposals_and_roi_targets,
    make_alternating_train_step,
)
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.models.detector import FasterRCNN, build_model
from tests.util import decisive_detector_params, synthetic_batch, tiny_config

LR = 1e-3


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config("vgg16")
    cfg.train_schedule = "alternating"
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), learning_rate=LR)
    # Decisive scores so NMS orderings can't legitimately flip between the
    # fused program and the separately compiled two-phase loop (see
    # tests/util.decisive_detector_params).
    state = state.replace(params=decisive_detector_params(state.params))
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg, batch=2).items()}
    return cfg, model, state, batch


def _two_phase_loop_reference(cfg, model, state, batch, rng):
    """The reference schedule as three SEPARATE programs (train_on_batch /
    predict_on_batch / train_on_batch boundaries of train.py:288-402)."""
    tx_rpn, tx_det = state.tx
    img_anchors, feat_anchors = _device_anchors(cfg)
    num_anchors = cfg.n_anchors
    sample_valid = batch["sample_valid"].astype(jnp.float32)
    rng_t, rng_p, rng_d = jax.random.split(rng, 3)
    images = batch["image"]  # float32 synthetic batches skip augmentation

    y_cls, y_regr = jax.jit(
        lambda: _batch_rpn_targets(cfg, batch, rng_t, img_anchors, sample_valid)
    )()

    # phase 1: model_rpn.train_on_batch
    @jax.jit
    def rpn_phase(params, opt):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            fmap = model.apply(variables, images, method=FasterRCNN.features)
            fmap = jax.lax.stop_gradient(fmap)  # trunk frozen in tiny cfg
            rc, rr = model.apply(variables, fmap, method=FasterRCNN.rpn)
            return losses.rpn_loss_cls(y_cls, rc, num_anchors) + losses.rpn_loss_regr(
                y_regr, rr, num_anchors
            )

        grads = jax.grad(loss_fn)(params)
        updates, opt = tx_rpn.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt

    params1, opt_rpn = rpn_phase(state.params, state.opt_state["rpn"])

    # phase 2: model_rpn.predict_on_batch with the UPDATED params
    @jax.jit
    def proposal_phase(params):
        variables = {"params": params, "batch_stats": state.batch_stats}
        fmap = model.apply(variables, images, method=FasterRCNN.features)
        rc, rr = model.apply(variables, fmap, method=FasterRCNN.rpn)
        return _proposals_and_roi_targets(
            cfg, rc, rr, batch, rng_p, feat_anchors, sample_valid
        )

    pt, roi_mask = proposal_phase(params1)

    # phase 3: model_classifier.train_on_batch
    @jax.jit
    def det_phase(params, opt):
        def loss_fn(p):
            variables = {"params": p, "batch_stats": state.batch_stats}
            fmap = model.apply(variables, images, method=FasterRCNN.features)
            fmap = jax.lax.stop_gradient(fmap)
            dc, dr = model.apply(
                variables, fmap, pt.rois, method=FasterRCNN.roi_heads,
                deterministic=False, rngs={"dropout": rng_d},
            )
            return losses.class_loss_cls(pt.y_class, dc, roi_mask) + losses.class_loss_regr(
                pt.y_regr, dr, cfg.n_classes - 1, roi_mask
            )

        grads = jax.grad(loss_fn)(params)
        updates, opt = tx_det.update(grads, opt, params)
        return optax.apply_updates(params, updates), opt

    params2, opt_det = det_phase(params1, state.opt_state["det"])
    return params2, opt_rpn, opt_det


def test_alternating_step_matches_two_phase_loop(setup):
    cfg, model, state, batch = setup
    rng = jax.random.PRNGKey(11)

    step = make_alternating_train_step(model, cfg)
    new_state, metrics = step(state, batch, rng)
    metrics = jax.device_get(metrics)
    for k, v in metrics.items():
        assert np.isfinite(v), (k, v)

    ref_params, ref_opt_rpn, ref_opt_det = _two_phase_loop_reference(
        cfg, model, state, batch, rng
    )

    flat_a, tree_a = jax.tree_util.tree_flatten(jax.device_get(new_state.params))
    flat_b, tree_b = jax.tree_util.tree_flatten(jax.device_get(ref_params))
    assert tree_a == tree_b
    for a, b in zip(flat_a, flat_b):
        np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)

    # Both Adam states advanced identically (mu/nu of the phase's params).
    for got, want in (
        (new_state.opt_state["rpn"], ref_opt_rpn),
        (new_state.opt_state["det"], ref_opt_det),
    ):
        ga, ta = jax.tree_util.tree_flatten(jax.device_get(got))
        gb, tb = jax.tree_util.tree_flatten(jax.device_get(want))
        assert ta == tb
        for a, b in zip(ga, gb):
            np.testing.assert_allclose(a, b, rtol=1e-5, atol=1e-6)


def test_alternating_updates_all_stages_once(setup):
    cfg, model, state, batch = setup
    step = make_alternating_train_step(model, cfg)
    new_state, _ = step(state, batch, jax.random.PRNGKey(3))
    assert int(new_state.step) == int(state.step) + 1

    def arr(tree, *keys):
        node = tree
        for k in keys:
            node = node[k]
        return np.asarray(jax.device_get(node))

    # RPN head moved (phase 1), detector head moved (phase 3).
    assert not np.allclose(
        arr(state.params, "rpn", "rpn_conv1", "kernel"),
        arr(new_state.params, "rpn", "rpn_conv1", "kernel"),
    )
    assert not np.allclose(
        arr(state.params, "head", "fc1", "kernel"),
        arr(new_state.params, "head", "fc1", "kernel"),
    )
    # Frozen trunk stayed put.
    np.testing.assert_array_equal(
        arr(state.params, "trunk", "block1_conv1", "kernel"),
        arr(new_state.params, "trunk", "block1_conv1", "kernel"),
    )


def test_alternating_state_structure(setup):
    cfg, model, state, _ = setup
    assert isinstance(state.tx, tuple) and len(state.tx) == 2
    assert set(state.opt_state.keys()) == {"rpn", "det"}

    # The rpn optimizer owns no detector-head moments and vice versa:
    # masked-out leaves carry no Adam state (optax MaskedNode), so the two
    # Adam states are disjoint over head/rpn exactly like the reference's
    # two compiled models.
    def moment_leaf_paths(opt_state):
        paths = set()

        def visit(path, leaf):
            keys = tuple(p.key for p in path if hasattr(p, "key"))
            if hasattr(leaf, "shape") and "mu" in str(path):
                paths.add(keys)

        jax.tree_util.tree_map_with_path(visit, opt_state)
        return paths

    rpn_paths = {p for p in moment_leaf_paths(state.opt_state["rpn"])}
    det_paths = {p for p in moment_leaf_paths(state.opt_state["det"])}
    assert not any("head" in p for p in rpn_paths)
    assert not any("rpn" in p for p in det_paths)
    assert any("rpn" in p for p in rpn_paths)
    assert any("head" in p for p in det_paths)
