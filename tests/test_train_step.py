"""Fused train step: losses finite, params update, frozen layers stay put."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from radnet_tpu.engine.steps import make_eval_step, make_train_step
from radnet_tpu.engine.train_state import create_train_state, trainability_labels
from radnet_tpu.models.detector import build_model
from tests.util import synthetic_batch, tiny_config


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config("vgg16")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0), learning_rate=1e-3)
    step = make_train_step(model, cfg)
    estep = make_eval_step(model, cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()}
    return cfg, model, state, step, estep, batch


def test_train_step_updates_and_metrics(setup):
    cfg, model, state, step, _, batch = setup
    state1, metrics = step(state, batch, jax.random.PRNGKey(1))
    metrics = jax.device_get(metrics)
    for k in (
        "loss_rpn_cls",
        "loss_rpn_regr",
        "loss_detector_cls",
        "loss_detector_regr",
        "total_loss",
        "detector_acc",
        "mean_overlapping_bboxes",
    ):
        assert np.isfinite(metrics[k]), k

    assert int(state1.step) == int(state.step) + 1

    # RPN params must move; frozen trunk blocks must not.
    before = state.params["rpn"]["rpn_conv1"]["kernel"]
    after = state1.params["rpn"]["rpn_conv1"]["kernel"]
    assert not np.allclose(np.asarray(before), np.asarray(after))

    frozen_b = state.params["trunk"]["block1_conv1"]["kernel"]
    frozen_a = state1.params["trunk"]["block1_conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(frozen_b), np.asarray(frozen_a))

    # base_net_trainable=False: block5 also frozen at initial training
    b5b = state.params["trunk"]["block5_conv3"]["kernel"]
    b5a = state1.params["trunk"]["block5_conv3"]["kernel"]
    np.testing.assert_array_equal(np.asarray(b5b), np.asarray(b5a))


def test_trainability_labels_cont_mode(setup):
    _, _, state, _, _, _ = setup
    labels = trainability_labels(state.params, "vgg16", base_net_trainable=True)
    assert labels["trunk"]["block1_conv1"]["kernel"] == "frozen"
    assert labels["trunk"]["block3_conv1"]["kernel"] == "train"
    assert labels["rpn"]["rpn_conv1"]["kernel"] == "train"
    assert labels["head"]["fc1"]["kernel"] == "train"


def test_eval_step_runs_and_masks_padding(setup):
    cfg, model, state, _, estep, _ = setup
    batch = synthetic_batch(cfg)
    batch["sample_valid"] = np.array([True, False])  # second sample padded
    batch = {k: jnp.asarray(v) for k, v in batch.items()}
    metrics = jax.device_get(estep(state, batch, jax.random.PRNGKey(2)))
    assert np.isfinite(metrics["total_loss"])

    # all-padded batch -> losses must be exactly zero-contribution (finite)
    batch_pad = synthetic_batch(cfg)
    batch_pad["sample_valid"] = np.array([False, False])
    batch_pad = {k: jnp.asarray(v) for k, v in batch_pad.items()}
    metrics_pad = jax.device_get(estep(state, batch_pad, jax.random.PRNGKey(2)))
    assert np.isfinite(metrics_pad["total_loss"])
    assert metrics_pad["mean_overlapping_bboxes"] == 0.0


def test_loss_decreases_over_steps(setup):
    cfg, model, state, step, _, batch = setup
    first = last = None
    for _ in range(8):
        state, metrics = step(state, batch, jax.random.PRNGKey(100))  # fixed targets
        total = float(metrics["loss_rpn_cls"])
        if first is None:
            first = total
        last = total
    assert last < first  # rpn objectness must be learnable on a fixed batch


def test_donated_train_step_matches_and_fits(tmp_path):
    """The production drivers run the step with donate=True (params + Adam
    moments update in place; measured 1.44x on v5e).  Metrics must match
    the non-donated step exactly, and fit() must snapshot the state before
    async checkpoint submission (the next epoch's first step donates the
    buffers the saver would otherwise still be fetching)."""
    import os

    import pandas as pd

    from radnet_tpu.engine.loop import fit

    cfg = tiny_config("vgg16")
    model = build_model(cfg)
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()}

    plain = make_train_step(model, cfg)
    donating = make_train_step(model, cfg, donate=True)
    assert donating._donates and not plain._donates

    s1 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    s2 = create_train_state(model, cfg, jax.random.PRNGKey(0))
    m1 = m2 = None
    for i in range(3):
        s1, m1 = plain(s1, batch, jax.random.PRNGKey(i))
        s2, m2 = donating(s2, batch, jax.random.PRNGKey(i))
    m1, m2 = jax.device_get((m1, m2))
    for k in m1:
        np.testing.assert_allclose(m1[k], m2[k], rtol=1e-6, err_msg=k)
    np.testing.assert_allclose(
        np.asarray(s1.params["rpn"]["rpn_conv1"]["kernel"]),
        np.asarray(s2.params["rpn"]["rpn_conv1"]["kernel"]),
        rtol=1e-6,
    )

    # Through fit with async checkpointing: 2 epochs so epoch 2's donating
    # steps run while epoch 1's ckpt_last fetch may still be in flight.
    def batches():
        while True:
            yield batch

    model_path = str(tmp_path / "donated")
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    state, record = fit(
        cfg, state, donating, batches(), model_path,
        epoch_length=3, n_epochs=2, verbose=False,
    )
    assert len(record) == 2
    assert os.path.isdir(os.path.join(model_path, "ckpt_last"))
    rec = pd.read_csv(os.path.join(model_path, "record.csv"))
    assert np.isfinite(rec["total_loss"]).all()
