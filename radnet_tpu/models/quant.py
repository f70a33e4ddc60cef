"""Int8 quantized inference layers for the detector heads.

TPU-native serving optimization with no counterpart in the reference
(which has no quantization anywhere): the RoI head carries ~87% of the
cascade FLOPs (BASELINE.md round-3 attribution) and is matmul-bound at
~82% of the bf16 roofline, so the remaining lever is the MXU's 2x int8
peak (v5e: 394 TOPS int8 vs 197 TFLOPs bf16).

Scheme - standard dynamic post-training quantization, chosen so results
track the float path closely without calibration data:

* weights: symmetric per-OUTPUT-CHANNEL int8, scale = amax/127 over the
  reduction axes.  Per-channel scales cost nothing (they fold into the
  dequant multiply) and remove the single-outlier-channel failure mode.
* activations: symmetric per-SAMPLE (per-RoI) int8, scale = amax/127 over
  each sample's own values.  A per-sample scale is exact to factor out of
  the conv/dot (it is constant across the reduction axes of one sample),
  and RoIs vary hugely in magnitude, so this beats a per-tensor scale.
* accumulation in int32 (``preferred_element_type``), dequantized to f32
  as ``acc * (s_x * s_w)``; bias/BN/relu stay in float and fuse into the
  conv epilogue as usual.

The modules are PARAM-COMPATIBLE with ``nn.Conv`` / ``nn.Dense`` (same
param names, shapes, dtypes, initializers), so checkpoints, weight ports
(models/weights.py) and the TP sharding rules (parallel/mesh.py) are
untouched: quantization is a pure compute-path substitution, toggled per
call.  Heads quantize ONLY in ``deterministic`` (inference/eval) mode -
training always runs the float path (a straight-through estimator is not
needed because the quant path is never differentiated).

Weights are (re)quantized inside the jitted program each call; at ~15M
head params vs ~3.5 TFLOP of head compute per tile batch this is noise,
and it keeps a single source of truth for the parameters.
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn


def quantize_sym(x: jnp.ndarray, axes: tuple[int, ...]):
    """Symmetric int8 quantization along ``axes`` (kept as size-1 dims).

    Returns ``(q, scale)`` with ``q`` int8 in [-127, 127] and
    ``x ~= q * scale``.  Zero slices get scale 127/127=... a floor keeps
    the division finite (their q is exactly 0 either way).
    """
    x = x.astype(jnp.float32)
    amax = jnp.max(jnp.abs(x), axis=axes, keepdims=True)
    scale = jnp.maximum(amax, jnp.float32(1e-12)) / jnp.float32(127.0)
    q = jnp.clip(jnp.round(x / scale), -127.0, 127.0).astype(jnp.int8)
    return q, scale


def int8_conv(x: jnp.ndarray, kernel: jnp.ndarray, strides, padding) -> jnp.ndarray:
    """NHWC x HWIO conv computed in int8 with int32 accumulation.

    x: (N, H, W, C) float; kernel: (kh, kw, C, O) float.
    Returns f32 (N, H', W', O) ~= float conv to quantization error.
    """
    xq, sx = quantize_sym(x, axes=(1, 2, 3))  # per-sample
    wq, sw = quantize_sym(kernel, axes=(0, 1, 2))  # per-out-channel (1,1,1,O)
    acc = jax.lax.conv_general_dilated(
        xq,
        wq,
        strides,
        padding,
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.int32,
    )
    return acc.astype(jnp.float32) * (sx * sw.reshape(1, 1, 1, -1))


def int8_dense(x: jnp.ndarray, kernel: jnp.ndarray) -> jnp.ndarray:
    """(N, D) @ (D, O) in int8 with int32 accumulation; f32 result."""
    xq, sx = quantize_sym(x, axes=(1,))  # per-sample (N, 1)
    wq, sw = quantize_sym(kernel, axes=(0,))  # per-out-channel (1, O)
    acc = jax.lax.dot_general(
        xq, wq, (((1,), (0,)), ((), ())), preferred_element_type=jnp.int32
    )
    return acc.astype(jnp.float32) * (sx * sw)


class QuantConv(nn.Module):
    """Drop-in for the ``nn.Conv`` configs used by the detector heads
    (NHWC, HWIO kernel, bias, lecun-normal init) computing in int8.

    All kernel sizes go through :func:`int8_conv` - including stride-1
    1x1s.  A round-4 experiment routed those through a per-pixel-scaled
    (B*H*W, C) int8 matmul (mirroring the float ``Conv1x1`` layout win)
    and REGRESSED: at the production head shape (3600 RoIs @7x7x1024) the
    dense form measures 30.4 ms vs 25.9 ms for the conv form and 29.4 ms
    float (scripts/probe_int8.py, v5e-1 2026-08-20; per-RoI-scale and
    bf16-epilogue dense variants measure the same).  XLA's int8 conv
    lowering handles the pointwise case better than its int8 dot here, so
    the conv form is the shipped path."""

    features: int
    kernel_size: tuple[int, int]
    strides: tuple[int, int] = (1, 1)
    padding: str = "SAME"
    dtype: Any = jnp.float32  # accepted for signature parity; output is f32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kh, kw = self.kernel_size
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (kh, kw, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        y = int8_conv(x, kernel, self.strides, self.padding)
        return y + bias


class QuantDense(nn.Module):
    """Drop-in for ``nn.Dense`` (kernel (D, O), bias, lecun-normal init)
    computing in int8."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        return int8_dense(x, kernel) + bias
