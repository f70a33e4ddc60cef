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


def fetch_checkpoint_tree(
    state: TrainState, best_total_loss: float = float("inf")
) -> dict[str, Any]:
    """One device->host fetch of the full checkpoint pytree.

    Params + optimizer state are the bulk of host<->device traffic in a
    training epoch (~1.4 GB for the VGG16 head); fetching once and writing
    both the ``best`` and ``last`` checkpoints from the same host copy
    halves it (see ``engine/loop.py``)."""
    return jax.device_get(_as_pytree(state, best_total_loss))


def save_checkpoint_tree(path: str, tree: dict[str, Any]) -> None:
    """Crash-safe overwrite of a pre-fetched checkpoint tree: write
    beside, then swap.

    ``Checkpointer.save(force=True)`` deletes the destination *before*
    writing the replacement, so a crash mid-save (e.g. a device fetch that
    never returns) destroys the previous checkpoint.  Writing to a ``.new``
    sibling first keeps the old checkpoint intact until the new one is
    fully on disk; the swap window is two renames, not a device fetch.
    """
    path = os.path.abspath(path)
    new_path = path + ".new"
    old_path = path + ".old"
    # A ``.new`` that coexists with ``.old`` (and no ``path``) is the
    # newest COMPLETE checkpoint - the ``path`` -> ``.old`` rename only
    # happens after the save into ``.new`` returned - so finish the
    # interrupted swap instead of discarding it as stale.
    if (
        os.path.isdir(new_path)
        and os.path.isdir(old_path)
        and not os.path.exists(path)
    ):
        os.rename(new_path, path)
    for stale in (new_path, old_path):
        if os.path.exists(stale):
            import shutil

            shutil.rmtree(stale)
    with ocp.StandardCheckpointer() as ckptr:
        ckptr.save(new_path, tree)
    if os.path.exists(path):
        os.rename(path, old_path)
    os.rename(new_path, path)
    if os.path.exists(old_path):
        import shutil

        shutil.rmtree(old_path)


def save_checkpoint(
    path: str, state: TrainState, best_total_loss: float = float("inf")
) -> None:
    """Fetch + crash-safe write (see :func:`save_checkpoint_tree`)."""
    save_checkpoint_tree(path, fetch_checkpoint_tree(state, best_total_loss))


def _resolve_checkpoint_path(path: str) -> str:
    """Fall back to a swap-window sibling if a crash hit the swap.

    A ``.new`` coexisting with ``.old`` is guaranteed fully written (the
    ``path`` -> ``.old`` rename only happens after the save into ``.new``
    returned) and is newer than ``.old``, so it wins; a lone ``.new``
    (crash mid-write) is never trusted.
    """
    if os.path.isdir(path):
        return path
    new_path = path + ".new"
    old_path = path + ".old"
    if os.path.isdir(old_path):
        if os.path.isdir(new_path):
            return new_path
        return old_path
    return path


def restore_checkpoint(
    path: str, template_state: TrainState
) -> tuple[TrainState, float]:
    """Restore into the structure of ``template_state`` (same model/opt)."""
    path = _resolve_checkpoint_path(os.path.abspath(path))
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
        raw = ckptr.restore(_resolve_checkpoint_path(os.path.abspath(path)))
    for key in ("params", "batch_stats"):
        t = jax.tree_util.tree_structure(getattr(template_state, key))
        r = jax.tree_util.tree_structure(raw[key])
        if t != r:
            raise ValueError(f"{key} tree mismatch: saved {r} vs template {t}")
    return template_state.replace(
        params=raw["params"], batch_stats=raw["batch_stats"]
    )
