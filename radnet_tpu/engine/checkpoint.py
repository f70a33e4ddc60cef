"""Orbax checkpointing of the full training state.

The reference saves *weights only* on best validation loss
(``model_all.save_weights``, /root/reference/train.py:565-599) - optimizer
moments are lost and resume restarts Adam from zero (SURVEY.md §5.4).  Here
a checkpoint is the complete state: params, frozen batch stats, optimizer
state, step counter and the best-loss watermark, so ``cont_train`` resumes
exactly.  A ``best`` checkpoint mirrors the reference's best-only file; a
``last`` checkpoint adds crash recovery the reference lacks.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp

from radnet_tpu.engine.train_state import TrainState


def _as_pytree(state: TrainState, best_total_loss: float) -> dict[str, Any]:
    return {
        "step": state.step,
        "params": state.params,
        "batch_stats": state.batch_stats,
        "opt_state": state.opt_state,
        "best_total_loss": np.asarray(best_total_loss, np.float32),
    }


def save_checkpoint(
    path: str, state: TrainState, best_total_loss: float = float("inf")
) -> None:
    path = os.path.abspath(path)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(path, _as_pytree(state, best_total_loss), force=True)


def restore_checkpoint(
    path: str, template_state: TrainState
) -> tuple[TrainState, float]:
    """Restore into the structure of ``template_state`` (same model/opt)."""
    path = os.path.abspath(path)
    template = _as_pytree(template_state, 0.0)
    abstract = jax.tree_util.tree_map(ocp.utils.to_shape_dtype_struct, template)
    with ocp.StandardCheckpointer() as ckptr:
        restored = ckptr.restore(path, abstract)
    # Orbax can fill structurally-missing entries with None instead of
    # raising (e.g. optimizer moments saved under a different trainability
    # partition); surface that as an error callers can handle.
    n_template = len(jax.tree_util.tree_leaves(template))
    n_restored = len(jax.tree_util.tree_leaves(restored))
    if n_restored != n_template:
        raise ValueError(
            f"checkpoint structure mismatch: {n_restored} leaves restored, "
            f"template has {n_template}"
        )
    state = template_state.replace(
        step=restored["step"],
        params=restored["params"],
        batch_stats=restored["batch_stats"],
        opt_state=restored["opt_state"],
    )
    return state, float(restored["best_total_loss"])


def restore_params_only(path: str, template_state: TrainState) -> TrainState:
    """Load params + batch stats from a checkpoint, keeping fresh optimizer
    state - the reference's ``load_weights(by_name=True)`` semantics
    (cont_train.py:155,164).

    Restores structure-free (no optimizer template), so it works across
    trainability-partition changes where the full restore cannot.
    """
    with ocp.StandardCheckpointer() as ckptr:
        raw = ckptr.restore(os.path.abspath(path))
    for key in ("params", "batch_stats"):
        t = jax.tree_util.tree_structure(getattr(template_state, key))
        r = jax.tree_util.tree_structure(raw[key])
        if t != r:
            raise ValueError(f"{key} tree mismatch: saved {r} vs template {t}")
    return template_state.replace(
        params=raw["params"], batch_stats=raw["batch_stats"]
    )
