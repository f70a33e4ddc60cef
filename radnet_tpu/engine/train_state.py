"""Train state and the trainability partition.

The reference freezes layers positionally: Keras ``model.layers[:CUT]``
with ``FINE_TUNING_CUT = 38`` for ResNet50 (conv1 + stage 2,
/root/reference/faster_rcnn/base_models/resnet50.py:15,218-222) and
``FINE_TUNING_CUT = 7`` for VGG16 (blocks 1-2, vgg16.py:16,55-59); layers
above the cut train only when ``base_net_trainable`` /
``base_net_cont_trainable`` is set (config.py:15-16).  Heads (RPN +
detector) always train.

Here the same partition is expressed structurally over the param tree and
enforced with ``optax.multi_transform`` masks, so the optimizer itself
never touches frozen parameters (and allocates no moments for them).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
import optax
from flax import struct

from radnet_tpu.config import Config
from radnet_tpu.models.detector import FasterRCNN

# Trunk sub-modules below the fine-tuning cut, per backbone.
_FROZEN_PREFIXES = {
    "resnet50": ("conv1", "bn_conv1", "s2a", "s2b", "s2c"),
    "vgg16": ("block1_conv1", "block1_conv2", "block2_conv1", "block2_conv2"),
}


class TrainState(struct.PyTreeNode):
    step: jnp.ndarray
    params: Any
    batch_stats: Any
    opt_state: Any
    # One GradientTransformation (joint schedule) or the static pair
    # (tx_rpn, tx_det) for the alternating schedule.
    tx: Any = struct.field(pytree_node=False)

    def apply_gradients(self, grads) -> "TrainState":
        updates, new_opt_state = self.tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt_state
        )


def trainability_labels(params: Any, network: str, base_net_trainable: bool):
    """Label each param leaf 'train' or 'frozen'."""
    frozen_prefixes = _FROZEN_PREFIXES[network]

    def label(path: tuple, _leaf) -> str:
        keys = [p.key for p in path if hasattr(p, "key")]
        if keys and keys[0] == "trunk":
            sub = keys[1] if len(keys) > 1 else ""
            if sub in frozen_prefixes:
                return "frozen"
            return "train" if base_net_trainable else "frozen"
        return "train"  # rpn + head always train (train.py:200-206)

    return jax.tree_util.tree_map_with_path(label, params)


def make_optimizer(
    params: Any, config: Config, learning_rate: float, base_net_trainable: bool
) -> optax.GradientTransformation:
    """Adam on trainable leaves, zero elsewhere (train.py:236-252 uses
    Adam(5e-5); cont_train.py:170-177 Adam(2e-5))."""
    labels = trainability_labels(params, config.network, base_net_trainable)
    return optax.multi_transform(
        {"train": optax.adam(learning_rate), "frozen": optax.set_to_zero()},
        labels,
    )


def make_phase_optimizer(
    params: Any,
    config: Config,
    learning_rate: float,
    base_net_trainable: bool,
    phase: str,
) -> optax.GradientTransformation:
    """Optimizer for one phase of the alternating schedule.

    The reference's two ``train_on_batch`` models each own a param subset
    (/root/reference/train.py:209-252): ``model_rpn`` = trunk + RPN heads,
    ``model_classifier`` = trunk + detector head, each compiled with its
    OWN Adam.  The phase optimizer masks the other stage's head to zero so
    its Adam moments exist only for the params that phase owns."""
    assert phase in ("rpn", "det"), phase
    base = trainability_labels(params, config.network, base_net_trainable)

    def relabel(path: tuple, label: str) -> str:
        keys = [p.key for p in path if hasattr(p, "key")]
        top = keys[0] if keys else ""
        if phase == "rpn" and top == "head":
            return "frozen"
        if phase == "det" and top == "rpn":
            return "frozen"
        return label

    labels = jax.tree_util.tree_map_with_path(relabel, base)
    return optax.multi_transform(
        {"train": optax.adam(learning_rate), "frozen": optax.set_to_zero()},
        labels,
    )


def create_train_state(
    model: FasterRCNN,
    config: Config,
    rng: jax.Array,
    learning_rate: float = 5e-5,
    base_net_trainable: bool | None = None,
    schedule: str | None = None,
) -> TrainState:
    """Initialize parameters and optimizer state.

    ``schedule`` (default ``config.train_schedule``): for "alternating",
    ``tx`` is the pair ``(tx_rpn, tx_det)`` and ``opt_state`` the dict
    ``{"rpn": ..., "det": ...}`` - two independent Adam states, exactly
    like the reference's two compiled models (train.py:236-252).  The
    TrainState pytree structure is otherwise identical, so checkpointing,
    sharding and the training loop are schedule-agnostic; only the step
    functions differ (engine/steps.py)."""
    if base_net_trainable is None:
        base_net_trainable = config.base_net_trainable
    if schedule is None:
        schedule = getattr(config, "train_schedule", "joint")
    s = config.canvas_size

    # One jitted program for the whole init: eager init would dispatch
    # hundreds of tiny ops (every conv kernel, every Adam moment), each of
    # which is a separate compile+execute round-trip on a remote-compiled
    # backend like the axon tunnel - minutes of latency for no work.
    @jax.jit
    def init_variables(rng):
        dummy_img = jnp.zeros((1, s, s, 3), jnp.float32)
        dummy_rois = jnp.asarray([[[0.0, 0.0, 4.0, 4.0]]])
        return model.init(
            {"params": rng, "dropout": jax.random.fold_in(rng, 1)},
            dummy_img,
            dummy_rois,
            deterministic=True,
        )

    variables = init_variables(rng)
    params = variables["params"]
    batch_stats = variables.get("batch_stats", {})
    if schedule == "alternating":
        tx_rpn = make_phase_optimizer(
            params, config, learning_rate, base_net_trainable, "rpn"
        )
        tx_det = make_phase_optimizer(
            params, config, learning_rate, base_net_trainable, "det"
        )
        tx = (tx_rpn, tx_det)
        opt_state = {
            "rpn": jax.jit(tx_rpn.init)(params),
            "det": jax.jit(tx_det.init)(params),
        }
    else:
        tx = make_optimizer(params, config, learning_rate, base_net_trainable)
        opt_state = jax.jit(tx.init)(params)
    return TrainState(
        step=jnp.zeros((), jnp.int32),
        params=params,
        batch_stats=batch_stats,
        opt_state=opt_state,
        tx=tx,
    )
