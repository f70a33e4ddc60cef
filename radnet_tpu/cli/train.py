"""Training driver - counterpart of /root/reference/train.py.

Usage: ``python train.py [--flags]``.  The reference configures itself via
module-level constants (train.py:41-54); these become argparse flags with
the same defaults.  Output contract preserved: a model directory under
``--models-path`` containing config.json, record.csv, viz/ plots, test/
and checkpoints (the reference's weights.hdf5 becomes an Orbax checkpoint
pair, ckpt_best/ + ckpt_last/).
"""

from __future__ import annotations

import argparse
import os
import random
import sys

import jax
import numpy as np

from radnet_tpu.cli.common import silly_name_gen
from radnet_tpu.config import Config
from radnet_tpu.data.dataset import get_data
from radnet_tpu.data.pipeline import (
    batched,
    parallel_sample_generator,
    prefetch_to_device,
    tile_sample_generator,
)
from radnet_tpu.engine.loop import create_model_folder, fit
from radnet_tpu.engine.steps import make_eval_step, make_train_step
from radnet_tpu.engine.train_state import create_train_state
from radnet_tpu.models.detector import build_model


def build_argparser() -> argparse.ArgumentParser:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("--seed", type=int, default=64)  # train.py:41
    p.add_argument("--models-path", default="models")
    p.add_argument("--model-name", default="raod_base")
    p.add_argument("--train-annot", default="data/train.csv")
    p.add_argument("--train-data", default="data/train")
    p.add_argument("--val-annot", default="data/val.csv")
    p.add_argument("--val-data", default="data/val")
    p.add_argument("--epoch-length", type=int, default=173)  # steps/epoch
    p.add_argument("--n-epochs", type=int, default=100)
    p.add_argument("--no-validation", action="store_true")
    p.add_argument("--num-workers", type=int, default=4)
    p.add_argument("--network", default=None, help="vgg16 | resnet50")
    p.add_argument("--batch-size", type=int, default=None)
    p.add_argument("--lr", type=float, default=5e-5)  # Adam(1e-5*5), train.py:237
    p.add_argument(
        "--config-json",
        default=None,
        help="path to a Config JSON overriding the defaults entirely",
    )
    return p


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)

    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    config = Config.load(args.config_json) if args.config_json else Config()
    if args.network:
        config.network = args.network
        config.model_path = "faster_rcnn_" + config.network
    if args.batch_size:
        config.batch_size = args.batch_size

    # Data.
    data_train, class_count, _ = get_data(args.train_annot, args.train_data, config.img_types)
    use_val = not args.no_validation
    if use_val:
        data_val, _, _ = get_data(args.val_annot, args.val_data, config.img_types)

    # Model directory (train.py:159-184).
    if args.model_name:
        model_name = config.model_path + "_" + args.model_name
        if os.path.exists(os.path.join(args.models_path, model_name)):
            print("Model already exists.")
            return 1
    else:
        model_name = config.model_path + "_" + silly_name_gen(random.Random(args.seed))
    model_path = os.path.join(args.models_path, model_name)
    create_model_folder(model_path)
    config.weights_path = os.path.join(model_path, "ckpt_best")
    config.save(os.path.join(model_path, "config.json"))

    # Model + state.
    model = build_model(config)
    state = create_train_state(
        model, config, rng, learning_rate=args.lr,
        base_net_trainable=config.base_net_trainable,
    )
    train_step = make_train_step(model, config)
    eval_step = make_eval_step(model, config) if use_val else None

    # Pipelines.
    train_samples = parallel_sample_generator(
        data_train, config, class_count, config.class_mapping,
        num_workers=args.num_workers, seed=args.seed,
    )
    train_batches = prefetch_to_device(
        batched(train_samples, config.batch_size, config, drop_remainder=True)
    )

    def val_factory():
        samples = tile_sample_generator(
            data_val, config, class_count, config.class_mapping,
            train_mode=False, seed=args.seed,
        )
        return prefetch_to_device(batched(samples, config.batch_size, config))

    state, record = fit(
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
    )
    print("Training Complete! Exiting.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
