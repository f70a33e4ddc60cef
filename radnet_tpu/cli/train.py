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
    make_device_preparer,
    parallel_sample_generator,
    prefetch_to_device,
    tile_sample_generator,
)
from radnet_tpu.engine.loop import create_model_folder, fit
from radnet_tpu.engine.steps import make_eval_step, make_train_bundle, make_train_step
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
        "--train-schedule",
        choices=["joint", "alternating"],
        default=None,
        help="'joint' (default): fused approximate joint training. "
        "'alternating': the reference's exact dynamics - RPN update, "
        "proposals from the just-updated RPN, detector update with a "
        "second Adam state (train.py:288-402); ~2x the trunk work per "
        "step, for controlled comparisons. Saved into config.json so "
        "cont_train resumes with the same schedule",
    )
    p.add_argument(
        "--config-json",
        default=None,
        help="path to a Config JSON overriding the defaults entirely",
    )
    p.add_argument(
        "--weights",
        default=None,
        help="path to a Keras-format .h5 with pretrained backbone weights "
        "(searched in addition to the conventional locations)",
    )
    p.add_argument(
        "--allow-random-init",
        action="store_true",
        help="proceed from random init even when base_net_weights is set "
        "but no weight file is found (resnet50 + FrozenBatchNorm is NOT "
        "trainable from random init - see models/weights.py)",
    )
    from radnet_tpu.cli.common import add_mesh_args, add_platform_arg

    add_mesh_args(p)
    add_platform_arg(p)
    return p


def shard_for_mesh(config, state, mesh):
    """Place the train state + pick the batch sharding for a mesh run.

    Returns ``(state, batch_sharding_or_None)``.  The global batch size
    must divide over the data axis - each chip gets
    ``batch_size/data_axis`` samples of the fused step's tile batch.
    """
    if mesh is None:
        return state, None
    from radnet_tpu.parallel.mesh import batch_sharding, shard_train_state

    dp = dict(zip(mesh.axis_names, mesh.devices.shape))["data"]
    if config.batch_size % dp:
        raise SystemExit(
            f"batch_size={config.batch_size} is not divisible by the "
            f"data-parallel size {dp}; pass --batch-size a multiple of {dp}"
        )
    return shard_train_state(state, mesh), batch_sharding(mesh)


def apply_pretrained_weights(config, state, weights=None, allow_random_init=False):
    """Load pretrained backbone weights into the train state.

    The reference loads ImageNet weights at model build time
    (resnet50.py:213, vgg16.py:36-40); here the loader runs right after
    state creation.  When ``base_net_weights`` is configured but no file
    is found, resnet50 training FAILS by default: with FrozenBatchNorm the
    random-init batch statistics are identity garbage and the model cannot
    train (pass --allow-random-init to override; vgg16 only warns).
    """
    from radnet_tpu.models.weights import maybe_load_pretrained

    search = (weights,) if weights else ()
    params, stats, src = maybe_load_pretrained(
        config, state.params, state.batch_stats, search_paths=search
    )
    if src is not None:
        print(f"Loaded pretrained base-net weights from {src}")
        return state.replace(params=params, batch_stats=stats)
    if config.base_net_weights is not None:
        msg = (
            f"base_net_weights={config.base_net_weights!r} is set but no "
            f"weight file was found (looked at --weights and the "
            f"conventional locations; see models/weights.py)."
        )
        if config.network == "resnet50" and not allow_random_init:
            raise SystemExit(
                msg + " resnet50 with FrozenBatchNorm is NOT trainable from "
                "random init; provide --weights or pass --allow-random-init."
            )
        print("WARNING: " + msg + " Training from random init.")
    return state


def main(argv=None) -> int:
    from radnet_tpu.cli.common import enable_compile_cache

    enable_compile_cache()
    args = build_argparser().parse_args(argv)
    from radnet_tpu.cli.common import apply_platform

    apply_platform(args)

    np.random.seed(args.seed)
    rng = jax.random.PRNGKey(args.seed)

    config = Config.load(args.config_json) if args.config_json else Config()
    if args.network:
        config.network = args.network
        config.model_path = "faster_rcnn_" + config.network
    if args.batch_size:
        config.batch_size = args.batch_size
    if args.train_schedule:
        config.train_schedule = args.train_schedule

    # Data.
    data_train, class_count, _ = get_data(args.train_annot, args.train_data, config.img_types)
    use_val = not args.no_validation
    if use_val:
        data_val, _, _ = get_data(args.val_annot, args.val_data, config.img_types)

    # Model directory (train.py:159-184).
    if args.model_name:
        # Accept either the bare name or the already-prefixed form the
        # eval/predict CLIs use (faster_rcnn_<net>_<name>) - no double prefix.
        if args.model_name.startswith(config.model_path + "_"):
            model_name = args.model_name
        else:
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
    state = apply_pretrained_weights(
        config, state, weights=args.weights,
        allow_random_init=args.allow_random_init,
    )
    from radnet_tpu.cli.common import mesh_from_args

    mesh = mesh_from_args(args)
    state, batch_sh = shard_for_mesh(config, state, mesh)
    if config.train_schedule == "alternating":
        from radnet_tpu.engine.steps import make_alternating_train_step

        train_step = make_alternating_train_step(model, config, donate=True)
        train_bundle = None  # per-step dispatch; the mode exists for
        # reference-exact dynamics, not throughput (see engine/steps.py)
    else:
        train_step = make_train_step(model, config, donate=True)
        train_bundle = (
            make_train_bundle(model, config, config.train_bundle_steps, donate=True)
            if config.train_bundle_steps > 1
            else None
        )
    eval_step = make_eval_step(model, config) if use_val else None

    # Pipelines.
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
        train_bundle=train_bundle,
    )
    print("Training Complete! Exiting.")
    return 0


if __name__ == "__main__":
    sys.exit(main())
