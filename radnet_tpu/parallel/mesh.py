"""Mesh construction and sharding rules.

The reference is strictly single-process / single-device / batch-1 (see
SURVEY.md §2.12: no distribution backend of any kind exists there).  The
TPU-native scaling story is SPMD over a ``jax.sharding.Mesh``:

* ``data`` axis - data parallelism over the **tile batch**.  Tiling
  giga-pixel panels (utils.py:352-368) is the reference's long-input
  mechanism; tiles are independent, so the tile axis shards across chips
  with gradients reduced by XLA-inserted ``psum`` over ICI.
* ``model`` axis - tensor parallelism for the parameter-heavy detector
  head (the VGG16 head's fc1 is a 25088x4096 GEMM holding ~80% of the
  model's parameters, vgg16.py:96-100): fc1 is column-sharded and fc2
  row-sharded, giving one all-reduce per head application, the classic
  Megatron split expressed purely through shardings - XLA inserts the
  collectives.

Everything else (trunk convs, RPN, stats) is replicated: conv backbones
at these sizes are compute-, not memory-bound, so DP is the scaling axis
that matters and TP exists for the head where it genuinely pays.
"""

from __future__ import annotations

import sys
from typing import Any

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from radnet_tpu.engine.train_state import TrainState

DATA_AXIS = "data"
MODEL_AXIS = "model"


def make_mesh(
    n_devices: int | None = None,
    model_parallel: int = 1,
    devices: list | None = None,
) -> Mesh:
    """A (data x model) mesh over ``devices`` (default: all devices).

    When the default platform can't supply enough devices (e.g. a 1-chip
    dev box asked for an 8-way mesh) this falls back to the virtual CPU
    platform, which honours ``--xla_force_host_platform_device_count``.
    """
    if devices is None:
        try:
            devices = jax.devices()
        except RuntimeError:
            # Default platform failed to initialize (e.g. a libtpu
            # client/terminal mismatch on the tunneled backend); the
            # virtual CPU platform still works.
            devices = jax.devices("cpu")
        if n_devices and len(devices) < n_devices:
            devices = jax.devices("cpu")
    n = n_devices or len(devices)
    if len(devices) < n:
        raise ValueError(f"need {n} devices, have {len(devices)}")
    if n % model_parallel:
        raise ValueError(f"{n} devices not divisible by model_parallel={model_parallel}")
    grid = np.array(devices[:n]).reshape(n // model_parallel, model_parallel)
    return Mesh(grid, (DATA_AXIS, MODEL_AXIS))


def batch_sharding(mesh: Mesh) -> NamedSharding:
    """Batches shard their leading (tile) axis over the data axis."""
    return NamedSharding(mesh, P(DATA_AXIS))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


# Param-path suffixes -> PartitionSpec for the tensor-parallel head.
#
# VGG16 head (vgg16.py:96-100): the classic Megatron MLP split - fc1
# column-parallel, fc2 row-parallel, one all-reduce per head application.
#
# ResNet50 head (resnet50.py:231-280): the stage-5 bottlenecks carry the
# head's FLOPs and params (3x ~4.5M-param blocks on 2048-ch activations).
# Megatron-style split per block, one all-reduce each:
#   * conv2a (1x1, C_in->512)  row-parallel  - input channels sharded,
#     partial sums reduced by the XLA-inserted all-reduce;
#   * conv2b (3x3, 512->512)   replicated    - runs on the full 512;
#   * conv2c (1x1, 512->2048)  column-parallel - output channels (and
#     bias) sharded, so the block's 2048-ch OUTPUT activation is sharded
#     and feeds the next block's row-parallel conv2a directly.
#   * s5a's projection shortcut conv_sc is column-parallel to match the
#     sharded residual sum.
# The final dense_class/dense_regress read the pooled sharded 2048-vector
# row-parallel (input-dim sharded; their outputs are tiny and replicated).
_TP_RULES: list[tuple[tuple[str, ...], P]] = [
    (("head", "fc1", "kernel"), P(None, MODEL_AXIS)),  # column parallel
    (("head", "fc1", "bias"), P(MODEL_AXIS)),
    (("head", "fc2", "kernel"), P(MODEL_AXIS, None)),  # row parallel
]

# ResNet50 stage-5 head. Block names are unique to the head (trunk
# blocks are s2*-s4*), so suffix matching cannot touch trunk convs.
# The dense_class/dense_regress row-parallel rules live HERE (applied
# only when the param tree contains the stage-5 blocks): the VGG16 head
# has same-named output denses, but they follow the already all-reduced
# fc2 output, so row-sharding them would only add all-reduces.
_TP_RULES_RESNET_HEAD: list[tuple[tuple[str, ...], P]] = [
    (("head", "dense_class", "kernel"), P(MODEL_AXIS, None)),
    (("head", "dense_regress", "kernel"), P(MODEL_AXIS, None)),
    (("s5a", "conv_sc", "kernel"), P(None, None, None, MODEL_AXIS)),
    (("s5a", "conv_sc", "bias"), P(MODEL_AXIS)),
]
for _blk in ("s5a", "s5b", "s5c"):
    _TP_RULES_RESNET_HEAD += [
        ((_blk, "conv2a", "kernel"), P(None, None, MODEL_AXIS, None)),
        ((_blk, "conv2c", "kernel"), P(None, None, None, MODEL_AXIS)),
        ((_blk, "conv2c", "bias"), P(MODEL_AXIS)),
    ]


def make_param_shardings(params: Any, mesh: Mesh, *, warn_label: str | None = None) -> Any:
    """NamedSharding tree: TP rules for the head, replication elsewhere.

    Rule paths match as a SUFFIX of the leaf's dict-key path, so the same
    rules place both params (``head/fc1/kernel``) and optimizer moments
    that mirror them (``…/mu/head/fc1/kernel`` inside the optax state).

    ``warn_label``: when set and the mesh has a model axis > 1 but ZERO
    leaves matched a TP rule, print a warning - a --model-parallel request
    that silently replicates everything is a no-op the user should know
    about.
    """
    axis_sizes = dict(zip(mesh.axis_names, mesh.devices.shape))
    n_sharded = 0

    # The resnet-head rules (incl. the row-parallel output denses) apply
    # only when the tree really is a resnet50 stage-5 head: detect by the
    # head-unique s5a block in the leaf paths.
    leaf_paths = [
        tuple(p.key for p in path if hasattr(p, "key"))
        for path, _ in jax.tree_util.tree_flatten_with_path(params)[0]
    ]
    has_s5 = any("s5a" in keys for keys in leaf_paths)
    rules = _TP_RULES + (_TP_RULES_RESNET_HEAD if has_s5 else [])

    def spec_for(path: tuple, leaf) -> NamedSharding:
        nonlocal n_sharded
        keys = tuple(p.key for p in path if hasattr(p, "key"))
        shape = getattr(leaf, "shape", None)
        if shape is not None:
            for rule_path, spec in rules:
                if keys[-len(rule_path):] == rule_path and len(shape) == len(spec):
                    # Only shard if divisible; tiny test models fall back to
                    # replication rather than failing.
                    dims_ok = all(
                        s is None or shape[i] % axis_sizes[s] == 0
                        for i, s in enumerate(spec)
                    )
                    if dims_ok:
                        n_sharded += 1
                        return NamedSharding(mesh, spec)
        return NamedSharding(mesh, P())

    tree = jax.tree_util.tree_map_with_path(spec_for, params)
    if warn_label and axis_sizes.get(MODEL_AXIS, 1) > 1 and n_sharded == 0:
        # stderr: bench.py and the serving path promise machine-parseable
        # stdout (one JSON line), so diagnostics must not land there.
        print(
            f"WARNING: model axis is {axis_sizes[MODEL_AXIS]} but 0 "
            f"{warn_label} parameters matched a tensor-parallel rule - "
            "--model-parallel is a no-op for this network (everything is "
            "replicated). TP rules cover the vgg16 fc head and the "
            "resnet50 stage-5 head; tiny test-size layers whose dims "
            "don't divide the model axis also fall back to replication.",
            file=sys.stderr,
        )
    return tree


def shard_train_state(state: TrainState, mesh: Mesh) -> TrainState:
    """Place a host train state onto the mesh.

    Params follow the TP rules; batch stats are replicated; optimizer
    moments are placed by the SAME rules as the params they mirror (the
    suffix matching in :func:`make_param_shardings`).  Explicit placement
    matters at scale: the VGG fc1 Adam moments are ~2x100M floats, and
    relying on GSPMD to re-place replicated moments next to model-sharded
    params would at best cost a replicate<->shard reshard per step and at
    worst keep full-size moments on every chip.
    """
    param_sh = make_param_shardings(state.params, mesh, warn_label="model")
    opt_sh = make_param_shardings(state.opt_state, mesh)
    rep = replicated(mesh)
    return state.replace(
        step=jax.device_put(state.step, rep),
        params=jax.device_put(state.params, param_sh),
        batch_stats=jax.device_put(
            state.batch_stats, jax.tree_util.tree_map(lambda _: rep, state.batch_stats)
        ),
        opt_state=jax.device_put(state.opt_state, opt_sh),
    )
