"""Region Proposal Network head.

Re-design of ``rpn_layer`` (/root/reference/faster_rcnn/rpn.py:12-66):
3x3/512 'same' ReLU conv on the shared feature map, then two 1x1 heads -
sigmoid objectness over ``num_anchors`` channels and linear box regression
over ``4 * num_anchors`` channels.  Initializers follow the reference
(normal / uniform / zeros, rpn.py:46,55,62).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def _keras_uniform(key, shape, dtype=jnp.float32):
    """Keras-2 'uniform' = RandomUniform(-0.05, 0.05) (symmetric).

    flax's ``nn.initializers.uniform(scale)`` samples [0, scale) - an
    all-positive cls-conv init would bias every anchor's pre-sigmoid
    objectness positive over ReLU features."""
    return jax.random.uniform(key, shape, dtype, -0.05, 0.05)


class RPNHead(nn.Module):
    num_anchors: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, fmap: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.Conv(
            512,
            (3, 3),
            padding="SAME",
            kernel_init=nn.initializers.normal(stddev=0.05),
            dtype=self.dtype,
            param_dtype=jnp.float32,
            name="rpn_conv1",
        )(fmap.astype(self.dtype))
        x = nn.relu(x)

        cls = nn.Conv(
            self.num_anchors,
            (1, 1),
            kernel_init=_keras_uniform,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="rpn_out_class",
        )(x.astype(jnp.float32))
        cls = nn.sigmoid(cls)

        regr = nn.Conv(
            4 * self.num_anchors,
            (1, 1),
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="rpn_out_regress",
        )(x.astype(jnp.float32))
        return cls, regr
