"""Training loop + checkpoint/resume: record.csv contract, best-ckpt logic."""

import os

import numpy as np
import jax
import jax.numpy as jnp
import pandas as pd

from radnet_tpu.engine import checkpoint as ckpt
from radnet_tpu.engine.loop import RECORD_COLUMNS, fit
from radnet_tpu.engine.steps import make_eval_step, make_train_step
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.models.detector import build_model
from tests.util import synthetic_batch, tiny_config


import pytest


def _batch_iter(cfg, n=1000):
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()}
    for _ in range(n):
        yield batch


@pytest.fixture(scope="module")
def setup():
    cfg = tiny_config("vgg16")
    model = build_model(cfg)
    state = create_train_state(model, cfg, jax.random.PRNGKey(0))
    step = make_train_step(model, cfg)
    estep = make_eval_step(model, cfg)
    return cfg, model, state, step, estep


def test_fit_writes_record_and_checkpoints(tmp_path, setup):
    cfg, model, state, train_step, eval_step = setup
    model_path = str(tmp_path / "m")

    def val_factory():
        return _batch_iter(cfg, n=2)

    state, record = fit(
        cfg,
        state,
        train_step,
        _batch_iter(cfg),
        model_path,
        epoch_length=2,
        n_epochs=2,
        eval_step=eval_step,
        val_batches_factory=val_factory,
        verbose=False,
    )
    assert int(state.step) == 4

    rec = pd.read_csv(os.path.join(model_path, "record.csv"))
    assert list(rec.columns) == RECORD_COLUMNS
    assert len(rec) == 2
    assert np.isfinite(rec["total_loss"]).all()
    assert os.path.isdir(os.path.join(model_path, "ckpt_best"))
    assert os.path.isdir(os.path.join(model_path, "ckpt_last"))
    assert os.path.exists(os.path.join(model_path, "metrics.jsonl"))
    for png in ("accuracy.png", "rpn_loss.png", "detector_loss.png", "total_loss.png"):
        assert os.path.exists(os.path.join(model_path, "viz", png))


def test_checkpoint_roundtrip(tmp_path, setup):
    cfg, model, state, step, _ = setup
    batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()}
    state, _ = step(state, batch, jax.random.PRNGKey(1))

    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state, best_total_loss=1.25)

    template = create_train_state(model, cfg, jax.random.PRNGKey(99))
    restored, best = ckpt.restore_checkpoint(path, template)
    assert best == 1.25
    assert int(restored.step) == 1
    a = state.params["rpn"]["rpn_conv1"]["kernel"]
    b = restored.params["rpn"]["rpn_conv1"]["kernel"]
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    # params-only restore keeps a fresh optimizer (reference resume
    # semantics, cont_train.py:155,164)
    fresh = ckpt.restore_params_only(path, template)
    assert int(fresh.step) == 0
    np.testing.assert_array_equal(
        np.asarray(fresh.params["rpn"]["rpn_conv1"]["kernel"]), np.asarray(b)
    )

    # restored state continues training
    state2, metrics = step(restored, batch, jax.random.PRNGKey(2))
    assert np.isfinite(float(metrics["total_loss"]))


def test_checkpoint_overwrite_is_crash_safe(tmp_path, setup):
    """Overwriting a checkpoint must never destroy the previous one before
    the replacement is fully on disk (a save whose device fetch hangs used
    to delete ckpt_best first via force=True), and a crash inside the
    rename swap must remain restorable via the .old sibling."""
    import shutil

    cfg, model, state, step, _ = setup
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state, best_total_loss=2.0)
    ckpt.save_checkpoint(path, state, best_total_loss=1.0)  # overwrite
    template = create_train_state(model, cfg, jax.random.PRNGKey(99))
    _, best = ckpt.restore_checkpoint(path, template)
    assert best == 1.0
    assert not os.path.exists(path + ".new")
    assert not os.path.exists(path + ".old")

    # Simulate a crash between the two renames: only .old exists.
    os.rename(path, path + ".old")
    _, best = ckpt.restore_checkpoint(path, template)
    assert best == 1.0
    # A subsequent save cleans the stale .old and wins.
    ckpt.save_checkpoint(path, state, best_total_loss=0.5)
    _, best = ckpt.restore_checkpoint(path, template)
    assert best == 0.5
    assert not os.path.exists(path + ".old")
    shutil.rmtree(path)


def test_best_ckpt_watermark_uses_unrounded_losses(tmp_path, setup):
    """A 1e-3-scale improvement must still trigger a best checkpoint: the
    watermark compares unrounded epoch means (rounding to the record.csv
    3-decimal display quantizes sub-0.002 improvements away)."""
    cfg, model, state, _, _ = setup
    losses = iter([1.2345, 1.2341])  # both round to 1.234

    def fake_step(state, batch, rng):
        val = next(losses)
        metrics = {
            "loss_rpn_cls": np.float32(val),
            "loss_rpn_regr": np.float32(0.0),
            "loss_detector_cls": np.float32(0.0),
            "loss_detector_regr": np.float32(0.0),
            "detector_acc": np.float32(0.0),
            "mean_overlapping_bboxes": np.float32(0.0),
        }
        return state, metrics

    _, record = fit(
        cfg,
        state,
        fake_step,
        _batch_iter(cfg, n=2),
        str(tmp_path / "m"),
        epoch_length=1,
        n_epochs=2,
        verbose=False,
    )
    # Epoch 2 improved by 4e-4 over epoch 1; the watermark must register it.
    imp = float(record["model_improvement"].iloc[1])
    assert np.isfinite(imp) and imp < 0


def test_dashboard_generation(tmp_path, setup):
    """fit() renders a self-contained HTML dashboard from record.csv +
    metrics.jsonl (the no-TF counterpart of the reference's TensorBoard
    scalars, train.py:72-79)."""
    import json as _json
    import re

    cfg, model, state, train_step, _ = setup
    model_path = str(tmp_path / "m")
    fit(
        cfg, state, train_step, _batch_iter(cfg), model_path,
        epoch_length=2, n_epochs=2, verbose=False,
    )
    out = os.path.join(model_path, "dashboard.html")
    assert os.path.exists(out)
    doc = open(out).read()
    assert doc.count("<svg") >= 7  # per-step + per-epoch charts
    assert 'class="tile"' in doc and "tableview" in doc
    # embedded hover payloads parse and are consistent
    import html as _html

    for payload in re.findall(r'data-chart="(.*?)">', doc, re.S):
        d = _json.loads(_html.unescape(payload))
        for s in d["series"]:
            assert len(s["ys"]) == len(d["xvals"])


def test_async_saver_coalesces_and_batches(tmp_path, setup, monkeypatch):
    """Same-state submissions share one device fetch; queued saves for a
    path are replaced by newer ones; close() flushes and re-raises worker
    errors."""
    import time as _time

    from radnet_tpu.engine.loop import AsyncSaver

    cfg, model, state, *_ = setup
    fetches = []
    orig_fetch = ckpt.fetch_checkpoint_tree

    def counting_fetch(s, best):
        fetches.append(best)
        _time.sleep(0.05)  # widen the coalescing window
        return orig_fetch(s, best)

    monkeypatch.setattr(ckpt, "fetch_checkpoint_tree", counting_fetch)

    saver = AsyncSaver()
    best_p = str(tmp_path / "best")
    last_p = str(tmp_path / "last")
    saver.submit(best_p, state, 1.0)
    saver.submit(last_p, state, 1.0)  # same state -> batched with best
    saver.close()
    assert os.path.isdir(best_p) and os.path.isdir(last_p)
    assert len(fetches) <= 2  # 1 when batched; 2 if the worker won the race

    restored, best = ckpt.restore_checkpoint(last_p, state)
    assert best == 1.0


def test_async_saver_propagates_errors(tmp_path, setup, monkeypatch):
    from radnet_tpu.engine.loop import AsyncSaver

    cfg, model, state, *_ = setup

    def boom(*a, **k):
        raise RuntimeError("disk on fire")

    monkeypatch.setattr(ckpt, "fetch_checkpoint_tree", boom)
    saver = AsyncSaver()
    saver.submit(str(tmp_path / "x"), state, 0.0)
    with pytest.raises(RuntimeError, match="disk on fire"):
        saver.close()


def test_checkpoint_swap_window_prefers_complete_new(tmp_path, setup):
    """Crash exactly between the two swap renames leaves .old AND a fully
    written .new; the .new is the newest complete checkpoint and must win
    (both at restore time and when the next save finishes the swap)."""
    import shutil

    cfg, model, state, step, _ = setup
    path = str(tmp_path / "ck")
    ckpt.save_checkpoint(path, state, best_total_loss=1.0)
    # Fabricate the mid-swap state: a complete newer save at .new, the
    # previous checkpoint at .old, nothing at path.
    ckpt.save_checkpoint(str(tmp_path / "newer"), state, best_total_loss=2.0)
    os.rename(path, path + ".old")
    os.rename(str(tmp_path / "newer"), path + ".new")

    template = create_train_state(model, cfg, jax.random.PRNGKey(99))
    _, best = ckpt.restore_checkpoint(path, template)
    assert best == 2.0  # .new preferred over .old

    # The next save finishes the interrupted swap instead of discarding
    # .new as stale, then overwrites crash-safely as usual.
    ckpt.save_checkpoint(path, state, best_total_loss=0.5)
    _, best = ckpt.restore_checkpoint(path, template)
    assert best == 0.5
    assert not os.path.exists(path + ".new")
    assert not os.path.exists(path + ".old")

    # A lone .new (crash mid-write, possibly incomplete) is never trusted.
    ckpt.save_checkpoint(str(tmp_path / "x"), state, best_total_loss=3.0)
    os.rename(str(tmp_path / "x"), path + ".new")
    _, best = ckpt.restore_checkpoint(path, template)
    assert best == 0.5
    shutil.rmtree(path + ".new")
    shutil.rmtree(path)


def test_fit_flushes_checkpoints_on_error(tmp_path, setup):
    """An exception out of the epoch loop (prefetch error, KeyboardInterrupt)
    must still flush the queued ckpt_last before propagating - otherwise the
    daemon AsyncSaver dies with the interpreter mid-write."""
    cfg, model, state, train_step, _ = setup
    model_path = str(tmp_path / "m")

    def failing_batches():
        batch = {k: jnp.asarray(v) for k, v in synthetic_batch(cfg).items()}
        yield batch
        yield batch  # epoch 1 completes (and submits its checkpoints)
        raise RuntimeError("prefetch worker died")

    with pytest.raises(RuntimeError, match="prefetch worker died"):
        fit(
            cfg,
            state,
            train_step,
            failing_batches(),
            model_path,
            epoch_length=2,
            n_epochs=2,
            verbose=False,
        )

    # Epoch 1's ckpt_last survived the crash and is restorable.
    template = create_train_state(model, cfg, jax.random.PRNGKey(99))
    restored, _ = ckpt.restore_checkpoint(
        os.path.join(model_path, "ckpt_last"), template
    )
    assert int(restored.step) == 2


def test_fit_writes_tensorboard_events(tmp_path, setup):
    """fit() emits TensorBoard event files beside record.csv with the
    reference's per-step and per-epoch scalar tags (write_log,
    train.py:408-424, 607-630)."""
    import glob

    from tests.test_tbevents import _decode_event, _read_records

    cfg, model, state, train_step, _ = setup
    model_path = str(tmp_path / "m")
    fit(
        cfg, state, train_step, _batch_iter(cfg), model_path,
        epoch_length=2, n_epochs=2, verbose=False,
    )
    [path] = glob.glob(os.path.join(model_path, "events.out.tfevents.*"))
    events = [_decode_event(r) for r in _read_records(path)]
    assert events[0]["file_version"] == "brain.Event:2"

    step_tags = {"rpn_cls_loss", "rpn_reg_loss", "detector_cls_loss",
                 "detector_reg_loss", "detector_acc"}
    epoch_tags = {"Elapsed_time", "mean_overlapping_bboxes",
                  "mean_rpn_cls_loss", "mean_rpn_reg_loss",
                  "mean_detector_cls_loss", "mean_detector_reg_loss",
                  "mean_detector_acc", "total_loss"}
    step_events = [e for e in events[1:] if set(e["values"]) == step_tags]
    epoch_events = [e for e in events[1:] if set(e["values"]) == epoch_tags]
    assert len(step_events) == 4  # 2 epochs x 2 steps
    assert [e["step"] for e in step_events] == [0, 1, 2, 3]
    assert len(epoch_events) == 2
    assert [e["step"] for e in epoch_events] == [0, 1]
    assert len(step_events) + len(epoch_events) == len(events) - 1
    # Event scalars agree with record.csv (same epoch means, unrounded).
    rec = pd.read_csv(os.path.join(model_path, "record.csv"))
    for i, e in enumerate(epoch_events):
        assert e["values"]["total_loss"] == pytest.approx(
            float(rec["total_loss"].iloc[i]), abs=2e-3)
