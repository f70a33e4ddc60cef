"""Training loop: epochs, validation, best-checkpointing, record.csv, plots.

Re-creates the observable training contract of /root/reference/train.py:
273-707 and cont_train.py on top of the fused jitted step:

* ``record.csv`` with the exact column set of the reference
  (train.py:214-233), appended once per epoch;
* best-validation-loss checkpointing (train.py:565-599), plus a ``last``
  checkpoint for crash recovery;
* per-step metric logging to ``metrics.jsonl`` AND TensorBoard event
  files (the reference wrote summaries via ``write_log``, train.py:
  72-79; events are hand-encoded TF-free by ``utils/tbevents.py`` with
  the reference's exact tag names, per step and per epoch);
* post-training loss/accuracy curve PNGs under ``viz/``
  (train.py:648-707).

The model directory layout matches ``create_model_folder``
(train.py:81-91): ``<models>/<name>/{config.json, record.csv, viz/, test/,
ckpt_best/, ckpt_last/}``.
"""

from __future__ import annotations

import json
import os
import time
from typing import Any, Callable, Iterator

import jax
import numpy as np
import pandas as pd

from radnet_tpu.config import Config
from radnet_tpu.engine import checkpoint as ckpt
from radnet_tpu.engine.train_state import TrainState
from radnet_tpu.utils.tbevents import EventWriter

# metrics.jsonl key -> the reference's per-step TensorBoard tag
# (write_log calls, train.py:408-424).
_STEP_TAGS = {
    "loss_rpn_cls": "rpn_cls_loss",
    "loss_rpn_regr": "rpn_reg_loss",
    "loss_detector_cls": "detector_cls_loss",
    "loss_detector_regr": "detector_reg_loss",
    "detector_acc": "detector_acc",
}

RECORD_COLUMNS = [
    "elapsed_time",
    "mean_overlapping_bboxes",
    "val_mean_overlapping_bboxes",
    "loss_rpn_cls",
    "val_loss_rpn_cls",
    "loss_rpn_regr",
    "val_loss_rpn_regr",
    "loss_detector_cls",
    "val_loss_detector_cls",
    "loss_detector_regr",
    "val_loss_detector_regr",
    "total_loss",
    "val_total_loss",
    "detector_acc",
    "val_detector_acc",
    "model_improvement",
]


def create_model_folder(model_path: str) -> None:
    """(train.py:81-91) - but never deletes an existing folder."""
    os.makedirs(model_path, exist_ok=True)
    os.makedirs(os.path.join(model_path, "viz"), exist_ok=True)
    os.makedirs(os.path.join(model_path, "test"), exist_ok=True)


def _mean(metrics_list: list[dict[str, Any]], key: str) -> float:
    if not metrics_list:
        return float("nan")
    return float(np.mean([float(m[key]) for m in metrics_list]))


class AsyncSaver:
    """Checkpoint saves on a worker thread, so the device fetch (the
    dominant host<->device traffic of an epoch; can stall for minutes on
    the tunneled backend) overlaps the next epoch's training.

    Submissions coalesce per checkpoint kind: if a save for the same path
    is still queued when a newer state arrives, the queued one is
    replaced - only the newest state matters for both ``best`` and
    ``last``.  ``close()`` flushes everything; a failure in the worker is
    re-raised there (and on the next ``submit``) so training does not
    silently lose its checkpoints.  Trade-off vs synchronous saves: on a
    crash, record.csv may be one epoch ahead of what is on disk.
    """

    def __init__(self) -> None:
        import threading

        self._lock = threading.Lock()
        self._pending: dict[str, tuple[Any, float]] = {}
        self._wake = threading.Event()
        self._stop = False
        self._error: BaseException | None = None
        self._thread = threading.Thread(target=self._run, daemon=True)
        self._thread.start()

    def submit(self, path: str, state: TrainState, best_total_loss: float) -> None:
        if self._error is not None:
            raise self._error
        with self._lock:
            self._pending[path] = (state, best_total_loss)
        self._wake.set()

    def _run(self) -> None:
        while True:
            self._wake.wait()
            with self._lock:
                if not self._pending:
                    if self._stop:
                        return
                    self._wake.clear()
                    continue
                path, (state, best) = next(iter(self._pending.items()))
                del self._pending[path]
                # Batch queued saves of the SAME state (best + last of one
                # epoch): one device fetch serves all of them.
                also = [
                    p for p, (s, _) in self._pending.items() if s is state
                ]
                for p in also:
                    del self._pending[p]
            try:
                tree = ckpt.fetch_checkpoint_tree(state, best)
                for p in [path, *also]:
                    ckpt.save_checkpoint_tree(p, tree)
            except BaseException as e:  # surfaced on submit/close
                self._error = e
                return

    def close(self) -> None:
        self._stop = True
        self._wake.set()
        self._thread.join()
        if self._error is not None:
            raise self._error


def fit(
    config: Config,
    state: TrainState,
    train_step: Callable,
    train_batches: Iterator[Any],
    model_path: str,
    *,
    epoch_length: int = 173,
    n_epochs: int = 100,
    eval_step: Callable | None = None,
    val_batches_factory: Callable[[], Iterator[Any]] | None = None,
    seed: int = 64,
    best_total_loss: float = float("inf"),
    record: pd.DataFrame | None = None,
    verbose: bool = True,
    train_bundle: Callable | None = None,
) -> tuple[TrainState, pd.DataFrame]:
    """Run the training loop; returns the final state and the record table.

    ``train_bundle`` (optional, from ``make_train_bundle``) runs K
    optimizer steps per dispatch; full K-groups of an epoch go through it
    and the remainder through ``train_step``.  The trajectory is identical
    either way (the bundle replicates this loop's per-step RNG split);
    only dispatch overhead changes.
    """
    create_model_folder(model_path)
    record_path = os.path.join(model_path, "record.csv")
    metrics_log = open(os.path.join(model_path, "metrics.jsonl"), "a")
    # TensorBoard events beside record.csv, like the reference's
    # TensorBoard(model_path) callback (train.py:258-260).
    events = EventWriter(model_path)
    if record is None:
        record = pd.DataFrame(columns=RECORD_COLUMNS)

    rng = jax.random.PRNGKey(seed)
    start_time = time.time()
    train_step_count = int(state.step)
    saver = AsyncSaver()
    snapshot = None  # jitted on-device state copier (donating steps only)

    # Any exception out of the epoch loop (prefetch error, failed val
    # batch, KeyboardInterrupt) must still flush queued ckpt_best/ckpt_last
    # saves - otherwise the daemon saver dies with the interpreter and
    # record.csv ends up ahead of what is on disk.  On the happy path
    # close() re-raises saver errors; on the error path the original
    # exception wins and a saver failure is only printed.
    try:
        for epoch in range(n_epochs):
            if verbose:
                print(f"Epoch {epoch + 1}/{n_epochs}")
            epoch_metrics: list[dict[str, Any]] = []

            bundle_k = getattr(train_bundle, "_bundle_steps", 1) if train_bundle else 1
            done = 0
            while done < epoch_length:
                if bundle_k > 1 and epoch_length - done >= bundle_k:
                    batches = [next(train_batches) for _ in range(bundle_k)]
                    state, rng, metrics = train_bundle(state, batches, rng)
                    epoch_metrics.append(metrics)  # stacked (K,) scalars
                    done += bundle_k
                    train_step_count += bundle_k
                else:
                    batch = next(train_batches)
                    rng, step_rng = jax.random.split(rng)
                    state, metrics = train_step(state, batch, step_rng)
                    epoch_metrics.append(metrics)
                    done += 1
                    train_step_count += 1

            # Host sync once per epoch; log per-step scalars (bundled
            # entries carry a leading K axis - flatten after the fetch).
            fetched = jax.device_get(epoch_metrics)
            epoch_metrics = []
            for m in fetched:
                lead = np.ndim(next(iter(m.values())))
                if lead:
                    k = len(next(iter(m.values())))
                    epoch_metrics.extend(
                        {key: v[i] for key, v in m.items()} for i in range(k)
                    )
                else:
                    epoch_metrics.append(m)
            for i, m in enumerate(epoch_metrics):
                step_no = train_step_count - epoch_length + i
                metrics_log.write(
                    json.dumps(
                        {
                            "step": step_no,
                            **{k: float(v) for k, v in m.items()},
                        }
                    )
                    + "\n"
                )
                events.add_scalars(
                    step_no,
                    {
                        tag: float(m[k])
                        for k, tag in _STEP_TAGS.items()
                        if k in m
                    },
                )
            metrics_log.flush()

            # The best-checkpoint watermark compares UNROUNDED means (rounding
            # to 3 decimals would quantize away improvements smaller than
            # ~0.002); record.csv keeps the reference's 3-decimal display.
            loss_keys = (
                "loss_rpn_cls",
                "loss_rpn_regr",
                "loss_detector_cls",
                "loss_detector_regr",
            )
            curr_total_loss = sum(_mean(epoch_metrics, k) for k in loss_keys)
            row: dict[str, Any] = {
                "elapsed_time": round((time.time() - start_time) / 60, 3),
                "mean_overlapping_bboxes": round(_mean(epoch_metrics, "mean_overlapping_bboxes"), 3),
                **{k: round(_mean(epoch_metrics, k), 3) for k in loss_keys},
                "detector_acc": round(_mean(epoch_metrics, "detector_acc"), 3),
            }
            row["total_loss"] = round(curr_total_loss, 3)

            if verbose:
                print(
                    "(TRAINING) overlap={mean_overlapping_bboxes} rpn_cls={loss_rpn_cls} "
                    "rpn_regr={loss_rpn_regr} det_cls={loss_detector_cls} "
                    "det_regr={loss_detector_regr} acc={detector_acc} total={total_loss}".format(**row)
                )

            # -------------------------------------------------------------- #
            # Validation pass (train.py:476-563)
            # -------------------------------------------------------------- #
            if eval_step is not None and val_batches_factory is not None:
                val_metrics: list[dict[str, Any]] = []
                for batch in val_batches_factory():
                    rng, step_rng = jax.random.split(rng)
                    val_metrics.append(eval_step(state, batch, step_rng))
                val_metrics = jax.device_get(val_metrics)
                val_total = sum(_mean(val_metrics, k) for k in loss_keys)
                row["val_mean_overlapping_bboxes"] = round(_mean(val_metrics, "mean_overlapping_bboxes"), 3)
                for k in loss_keys:
                    row[f"val_{k}"] = round(_mean(val_metrics, k), 3)
                row["val_detector_acc"] = round(_mean(val_metrics, "detector_acc"), 3)
                row["val_total_loss"] = round(val_total, 3)
                watch = val_total
                if verbose:
                    print(f"(VALIDATION) total={val_total:.3f} best={best_total_loss:.3f}")
            else:
                for c in RECORD_COLUMNS:
                    if c.startswith("val_"):
                        row[c] = None
                watch = curr_total_loss

            # -------------------------------------------------------------- #
            # Best checkpoint on watched loss (train.py:565-599).
            # -------------------------------------------------------------- #
            improved = watch < best_total_loss
            if improved:
                row["model_improvement"] = watch - best_total_loss
                if verbose:
                    print(f"Total loss decreased from {best_total_loss} to {watch}, saving weights")
                best_total_loss = watch
            else:
                row["model_improvement"] = None
            # Async saves: the device fetch (the bulk of an epoch's
            # host<->device traffic) overlaps the next epoch; best + last of
            # one epoch share a single fetch (AsyncSaver batches same-state
            # submissions).
            #
            # A donating train step (make_train_step(donate=True))
            # invalidates the state buffers it consumes, so the state
            # handed to the async saver must be a SNAPSHOT - otherwise the
            # next epoch's first step donates the very buffers the saver
            # is still fetching.  One on-device copy per epoch (~ms) vs
            # the ~12 ms/step the donation buys; the jitted copy preserves
            # shardings on a mesh.
            if getattr(train_step, "_donates", False) or getattr(
                train_bundle, "_donates", False
            ):
                if snapshot is None:
                    import jax.numpy as jnp

                    snapshot = jax.jit(
                        lambda t: jax.tree_util.tree_map(jnp.copy, t)
                    )
                save_state = state.replace(
                    step=snapshot(state.step),  # donated too (int32 scalar)
                    params=snapshot(state.params),
                    batch_stats=snapshot(state.batch_stats),
                    opt_state=snapshot(state.opt_state),
                )
            else:
                save_state = state
            if improved:
                saver.submit(os.path.join(model_path, "ckpt_best"), save_state, best_total_loss)
            saver.submit(os.path.join(model_path, "ckpt_last"), save_state, best_total_loss)

            # Epoch-average summaries under the reference's exact tags,
            # indexed by global epoch number (write_log, train.py:607-630;
            # record.shape[0] keeps the index monotone across resumes).
            events.add_scalars(
                int(record.shape[0]),
                {
                    "Elapsed_time": (time.time() - start_time) / 60,
                    "mean_overlapping_bboxes": _mean(epoch_metrics, "mean_overlapping_bboxes"),
                    "mean_rpn_cls_loss": _mean(epoch_metrics, "loss_rpn_cls"),
                    "mean_rpn_reg_loss": _mean(epoch_metrics, "loss_rpn_regr"),
                    "mean_detector_cls_loss": _mean(epoch_metrics, "loss_detector_cls"),
                    "mean_detector_reg_loss": _mean(epoch_metrics, "loss_detector_regr"),
                    "mean_detector_acc": _mean(epoch_metrics, "detector_acc"),
                    "total_loss": curr_total_loss,
                },
            )

            record = pd.concat([record, pd.DataFrame([row])], ignore_index=True)
            record.to_csv(record_path, index=False)
    except BaseException:
        try:
            saver.close()  # best-effort flush of queued checkpoint saves
        except BaseException as save_err:
            print(f"checkpoint flush during shutdown failed: {save_err!r}")
        metrics_log.close()
        events.close()
        raise

    try:
        saver.close()  # flush pending checkpoint writes (re-raises worker errors)
    finally:
        # Even if the final checkpoint flush fails, every epoch completed:
        # close the logs and write the plots/dashboard before propagating.
        metrics_log.close()
        events.close()
        save_training_plots(record, os.path.join(model_path, "viz"))
        try:
            from radnet_tpu.utils.dashboard import generate_dashboard

            generate_dashboard(model_path)
        except Exception as e:  # dashboards must never fail a training run
            print(f"dashboard generation failed: {e}")
    return state, record


def save_training_plots(record: pd.DataFrame, viz_dir: str) -> None:
    """Loss/accuracy curves (train.py:648-707): accuracy.png, rpn_loss.png,
    detector_loss.png, total_loss.png."""
    os.makedirs(viz_dir, exist_ok=True)
    import matplotlib

    matplotlib.use("Agg")
    import matplotlib.pyplot as plt

    def _curve(ax, col):
        n = record.shape[0]
        x = np.arange(n)
        for series, color in ((col, "r"), (f"val_{col}", "b")):
            if series in record:
                y = pd.to_numeric(record[series], errors="coerce")
                ax.plot(x, y, color, alpha=0.3)
                ax.plot(x, y.rolling(window=min(20, max(n, 1))).mean(), color,
                        label="Train" if color == "r" else "Val")
        ax.set_title(col)
        ax.legend()

    pairs = [
        ("accuracy.png", ["mean_overlapping_bboxes", "detector_acc"]),
        ("rpn_loss.png", ["loss_rpn_cls", "loss_rpn_regr"]),
        ("detector_loss.png", ["loss_detector_cls", "loss_detector_regr"]),
    ]
    for fname, cols in pairs:
        fig, axes = plt.subplots(1, 2, figsize=(15, 5))
        for ax, col in zip(axes, cols):
            _curve(ax, col)
        fig.savefig(os.path.join(viz_dir, fname))
        plt.close(fig)

    fig, ax = plt.subplots(figsize=(16, 8))
    _curve(ax, "total_loss")
    fig.savefig(os.path.join(viz_dir, "total_loss.png"))
    plt.close(fig)
