"""VGG16 backbone and dense detector head.

Re-design of /root/reference/faster_rcnn/base_models/vgg16.py as Flax
modules:

* :class:`VGG16Trunk` <- ``nn_base`` (vgg16.py:29-65): Keras
  ``VGG16(include_top=False)`` truncated at ``block5_conv3`` - 13 3x3
  convolutions in 5 blocks with 4 max-pools, stride-16, 512-channel output.
* :class:`VGG16RoIHead` <- ``classifier_layer`` (vgg16.py:67-123): 7x7 RoI
  pool -> flatten -> 2x (Dense 4096 + Dropout 0.5) -> softmax class head +
  per-class box-regression head.  RoIs are the batch axis (the reference's
  ``TimeDistributed`` wrapper), so the 25088x4096 matmul runs as one big
  MXU-friendly GEMM over every RoI of every tile.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

FEATURE_CHANNELS = 512
POOL_SIZE = 7  # vgg16.py:85


class VGG16Trunk(nn.Module):
    """Blocks 1-5 (through block5_conv3); stride-16 512-ch output."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(kernel_size=(3, 3), padding="SAME", dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        plan = [  # (block, n_convs, features, pool_after)
            (1, 2, 64, True),
            (2, 2, 128, True),
            (3, 3, 256, True),
            (4, 3, 512, True),
            (5, 3, 512, False),  # stop at block5_conv3 (vgg16.py:45)
        ]
        for block, n_convs, feats, pool in plan:
            for i in range(1, n_convs + 1):
                x = nn.Conv(feats, name=f"block{block}_conv{i}", **kw)(x)
                x = nn.relu(x)
            if pool:
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        return x


class VGG16RoIHead(nn.Module):
    """Dense head over pooled RoIs: ``(N, 7, 7, 512)`` ->
    (class probs ``(N, n_classes)``, box deltas ``(N, 4*(n_classes-1))``)."""

    n_classes: int
    dtype: Any = jnp.float32
    dropout_rate: float = 0.5  # vgg16.py:98,100
    fc_dim: int = 4096  # vgg16.py:97-99
    quantize: bool = False  # int8 fc1/fc2 at inference (models/quant.py)

    @nn.compact
    def __call__(self, rois: jnp.ndarray, *, deterministic: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
        # int8 only in deterministic (inference) mode: training always runs
        # float (the quantizer's round() has zero gradient).  Param trees
        # are identical either way (models/quant.py).
        if self.quantize and deterministic:
            from radnet_tpu.models.quant import QuantDense

            def dense(features, name):
                return QuantDense(features=features, dtype=self.dtype, name=name)
        else:
            def dense(features, name):
                return nn.Dense(
                    features, dtype=self.dtype, param_dtype=jnp.float32, name=name
                )

        x = rois.reshape(rois.shape[0], -1).astype(self.dtype)  # TD Flatten
        x = dense(self.fc_dim, "fc1")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)
        x = dense(self.fc_dim, "fc2")(x)
        x = nn.relu(x)
        x = nn.Dropout(self.dropout_rate, deterministic=deterministic)(x)

        x = x.astype(jnp.float32)
        cls = nn.Dense(
            self.n_classes,
            kernel_init=nn.initializers.zeros,
            param_dtype=jnp.float32,
            name="dense_class",
        )(x)
        cls = nn.softmax(cls, axis=-1)
        regr = nn.Dense(
            4 * (self.n_classes - 1),
            kernel_init=nn.initializers.zeros,
            param_dtype=jnp.float32,
            name="dense_regress",
        )(x)
        return cls, regr
