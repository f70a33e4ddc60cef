"""Shared layers: frozen batch-norm.

``FrozenBatchNorm`` re-creates the semantics of the reference's
``FixedBatchNormalization`` (/root/reference/faster_rcnn/
FixedBatchNormalization.py:22-85): normalization always uses stored
statistics (never batch statistics, never updated) so pretrained ResNet50
statistics survive fine-tuning; *all four* parameters (gamma, beta, mean,
variance) are non-trainable (FixedBatchNormalization.py:26-51).

TPU-first detail: because the layer is affine in ``x`` with constant
coefficients, it is expressed as a single fused scale-and-shift -
``x * k + b`` with ``k = gamma / sqrt(var + eps)`` - which XLA folds into
the neighbouring convolution instead of a separate normalization pass.
All four tensors live in the ``batch_stats`` collection so optimizers
never see them.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn


class FrozenBatchNorm(nn.Module):
    """Inference-statistics batch norm (never updates, never trains)."""

    epsilon: float = 1e-3  # FixedBatchNormalization.py:8
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        features = x.shape[-1]
        init = nn.initializers
        gamma = self.variable("batch_stats", "gamma", init.ones, None, (features,), jnp.float32).value
        beta = self.variable("batch_stats", "beta", init.zeros, None, (features,), jnp.float32).value
        mean = self.variable("batch_stats", "mean", init.zeros, None, (features,), jnp.float32).value
        var = self.variable("batch_stats", "var", init.ones, None, (features,), jnp.float32).value

        k = gamma / jnp.sqrt(var + self.epsilon)
        b = beta - mean * k
        return x.astype(self.dtype) * k.astype(self.dtype) + b.astype(self.dtype)
