"""Resume-training driver - counterpart of /root/reference/cont_train.py.

Reloads the saved config from the model directory (the reference unpickles
it, cont_train.py:119; here it is config.json), restores the checkpoint,
and continues with the reference's resume hyperparameters: Adam 2e-5
(cont_train.py:170-177), seed 128 (:40), 1000 epochs (:52), trunk
trainability from ``base_net_cont_trainable`` (:151), and the best-loss
watermark seeded from record.csv's minimum val_total_loss (:203-206).

Improvement over the reference: optimizer moments and the step counter are
restored too (the reference only reloads weights, so Adam restarts cold -
SURVEY.md §5.4).  Pass ``--fresh-optimizer`` for the reference behaviour.
"""

from __future__ import annotations

import argparse
import os
import sys

import jax
import numpy as np
import pandas as pd

from radnet_tpu.config import Config
from radnet_tpu.data.dataset import get_data
from radnet_tpu.data.pipeline import (
    batched,
    make_device_preparer,
    parallel_sample_generator,
    prefetch_to_device,
    tile_sample_generator,
)
from radnet_tpu.engine import checkpoint as ckpt
from radnet_tpu.engine.loop import fit
from radnet_tpu.engine.steps import make_eval_step, make_train_bundle, make_train_step
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.models.detector import build_model


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=128)  # cont_train.py:40
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name", required=True)
    p.add_argument("--train-annot", default="data/train.csv")
    p.add_argument("--train-data", default="data/train")
    p.add_argument("--val-annot", default="data/val.csv")
    p.add_argument("--val-data", default="data/val")
    p.add_argument("--epoch-length", type=int, default=173)
    p.add_argument("--n-epochs", type=int, default=1000)  # cont_train.py:52
    p.add_argument("--no-validation", action="store_true")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--lr", type=float, default=2e-5)  # cont_train.py:170
    p.add_argument("--fresh-optimizer", action="store_true")
    from radnet_tpu.cli.common import add_mesh_args, add_platform_arg

    add_mesh_args(p)
    add_platform_arg(p)
    return p


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)
    np.random.seed(args.seed)

    model_path = os.path.join(args.models_path, args.model_name)
    config = Config.load(os.path.join(model_path, "config.json"))

    data_train, class_count, _ = get_data(args.train_annot, args.train_data, config.img_types)
    use_val = not args.no_validation
    if use_val:
        data_val, _, _ = get_data(args.val_annot, args.val_data, config.img_types)

    model = build_model(config)
    template = create_train_state(
        model,
        config,
        jax.random.PRNGKey(args.seed),
        learning_rate=args.lr,
        base_net_trainable=config.base_net_cont_trainable,  # cont_train.py:151
    )
    ckpt_path = ckpt._resolve_checkpoint_path(os.path.join(model_path, "ckpt_best"))
    if not os.path.isdir(ckpt_path):
        ckpt_path = os.path.join(model_path, "ckpt_last")
    if args.fresh_optimizer:
        state = ckpt.restore_params_only(ckpt_path, template)
        best = float("inf")
    else:
        try:
            state, best = ckpt.restore_checkpoint(ckpt_path, template)
        except Exception:
            # The optimizer partition changed between train and cont-train
            # (base_net_trainable vs base_net_cont_trainable labels different
            # leaves), so the saved moments do not line up - fall back to the
            # reference's weights-only resume (cont_train.py:155,164).
            print("Optimizer state incompatible with cont-train partition; "
                  "restoring params only (fresh optimizer).")
            state = ckpt.restore_params_only(ckpt_path, template)
            best = float("inf")

    # Seed the best-loss watermark from record.csv like cont_train.py:203-206.
    record = None
    record_path = os.path.join(model_path, "record.csv")
    if os.path.exists(record_path):
        record = pd.read_csv(record_path)
        if "val_total_loss" in record and record["val_total_loss"].notna().any():
            best = min(best, float(record["val_total_loss"].min()))

    from radnet_tpu.cli.common import mesh_from_args
    from radnet_tpu.cli.train import shard_for_mesh

    mesh = mesh_from_args(args)
    state, batch_sh = shard_for_mesh(config, state, mesh)

    if config.train_schedule == "alternating":
        from radnet_tpu.engine.steps import make_alternating_train_step

        train_step = make_alternating_train_step(
            model, config, trunk_trainable=config.base_net_cont_trainable,
            donate=True,
        )
        train_bundle = None
    else:
        train_step = make_train_step(
            model, config, trunk_trainable=config.base_net_cont_trainable, donate=True
        )
        train_bundle = (
            make_train_bundle(
                model, config, config.train_bundle_steps,
                trunk_trainable=config.base_net_cont_trainable, donate=True,
            )
            if config.train_bundle_steps > 1
            else None
        )
    eval_step = make_eval_step(model, config) if use_val else None

    train_samples = parallel_sample_generator(
        data_train, config, class_count, config.class_mapping,
        num_workers=args.num_workers, seed=args.seed,
    )
    train_batches = prefetch_to_device(
        batched(train_samples, config.batch_size, config, drop_remainder=True),
        sharding=batch_sh,
        prepare=make_device_preparer(config, seed=args.seed, train=True),
    )

    val_prepare = make_device_preparer(config, train=False)

    def val_factory():
        samples = tile_sample_generator(
            data_val, config, class_count, config.class_mapping,
            train_mode=False, seed=args.seed,
        )
        return prefetch_to_device(
            batched(samples, config.batch_size, config),
            sharding=batch_sh,
            prepare=val_prepare,
        )

    fit(
        config,
        state,
        train_step,
        train_batches,
        model_path,
        epoch_length=args.epoch_length,
        n_epochs=args.n_epochs,
        eval_step=eval_step,
        val_batches_factory=val_factory if use_val else None,
        seed=args.seed,
        best_total_loss=best,
        record=record,
        train_bundle=train_bundle,
    )
    print("Training Complete! Exiting.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
