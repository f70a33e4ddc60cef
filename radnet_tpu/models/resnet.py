"""ResNet50 backbone (stages 1-4) and per-RoI stage-5 detector head.

Re-design of /root/reference/faster_rcnn/base_models/resnet50.py as Flax
modules:

* :class:`ResNet50Trunk` <- ``nn_base`` (resnet50.py:150-228): zero-pad 3,
  7x7/2 conv, frozen BN, 3x3/2 maxpool, then stages 2-4 of bottleneck
  blocks; stride-16, 1024-channel output.
* :class:`ResNet50RoIHead` <- ``classifier_layer`` (resnet50.py:231-280):
  stage-5 bottlenecks applied per RoI on the pooled 14x14 crop, 7x7 average
  pool, then the softmax class head and the per-class box-regression head.
  The reference wraps stage 5 in Keras ``TimeDistributed`` over the RoI
  axis; here RoIs simply *are* the batch axis (``(B*R, 14, 14, C)``), which
  is exactly what the MXU wants - one large batched convolution.

All convolutions compute in ``dtype`` (bf16 on TPU) with fp32 parameters;
all batch-norms are :class:`FrozenBatchNorm` (resnet50.py:50-58).
"""

from __future__ import annotations

from typing import Any

import jax
import jax.numpy as jnp
from flax import linen as nn

from radnet_tpu.models.layers import FrozenBatchNorm

FEATURE_CHANNELS = 1024
POOL_SIZE = 14  # resnet50.py:249


class Conv1x1(nn.Module):
    """1x1 convolution computed as a 2D matmul.

    XLA's TPU conv lowering keeps the NHWC activation in its spatial
    (sublane=H-row, lane=channel) tiling, which pads 38-row feature maps
    to 48 sublanes in bf16 (26% dead lanes) and schedules the pointwise
    conv as a windowed op.  Reshaping to ``(B*H*W, C)`` and using a plain
    ``dot`` lets XLA pick a dense 2D layout: the 6-block stage-4 chain
    measures 2.01 ms vs 3.43 ms as convs (scripts/probe_stage4.py, batch
    8 @38^2 on v5e).  The param is stored in ``nn.Conv``'s ``(1, 1, Cin,
    Cout)`` layout so checkpoints, weight ports (models/weights.py) and
    the TP sharding rules (parallel/mesh.py) are unchanged.

    Stride-1 only: the strided variant (slice ``x[:, ::2, ::2]`` + dot)
    crash-faulted the tunneled v5e worker at batch 8 (repeatable kernel
    fault, 2026-08-20); strided 1x1 convs stay on ``nn.Conv``."""

    features: int
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param(
            "kernel",
            nn.initializers.lecun_normal(),
            (1, 1, x.shape[-1], self.features),
            jnp.float32,
        )
        bias = self.param(
            "bias", nn.initializers.zeros_init(), (self.features,), jnp.float32
        )
        b, h, w, c = x.shape
        y = jnp.dot(
            x.reshape(-1, c).astype(self.dtype),
            kernel.reshape(c, self.features).astype(self.dtype),
        )
        return y.reshape(b, h, w, self.features) + bias.astype(self.dtype)


class Bottleneck(nn.Module):
    """Bottleneck residual block (identity_block / conv_block,
    resnet50.py:41-117)."""

    filters: tuple[int, int, int]
    stride: int = 1
    project: bool = False  # conv_block (projection shortcut) vs identity
    dtype: Any = jnp.float32
    quantize: bool = False  # int8 conv path (models/quant.py); params identical

    def _conv(self, features, ksize, strides=(1, 1), padding="VALID", name=None):
        if self.quantize:
            from radnet_tpu.models.quant import QuantConv

            return QuantConv(
                features=features, kernel_size=ksize, strides=strides,
                padding=padding, dtype=self.dtype, name=name,
            )
        if ksize == (1, 1) and strides == (1, 1):
            return Conv1x1(features=features, dtype=self.dtype, name=name)
        return nn.Conv(
            features, ksize, strides=strides, padding=padding, name=name,
            dtype=self.dtype, param_dtype=jnp.float32,
        )

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f1, f2, f3 = self.filters
        s = (self.stride, self.stride)

        y = self._conv(f1, (1, 1), strides=s, name="conv2a")(x)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2a")(y)
        y = nn.relu(y)
        y = self._conv(f2, (3, 3), padding="SAME", name="conv2b")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2b")(y)
        y = nn.relu(y)
        y = self._conv(f3, (1, 1), name="conv2c")(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2c")(y)

        if self.project:
            sc = self._conv(f3, (1, 1), strides=s, name="conv_sc")(x)
            sc = FrozenBatchNorm(dtype=self.dtype, name="bn_sc")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class StemConv(nn.Module):
    """The 7x7/2 stem conv, computed via space-to-depth (resnet50.py:182).

    A 7x7 stride-2 conv over a 3-channel image keeps the MXU's contraction
    dimension at 7x7x3 over a tiny channel axis, and XLA stores the
    3-channel activation in a batch-in-lanes layout - measured 3.8 ms of
    the 8.2 ms trunk forward at <2% MFU (scripts/ablate_cascade.py, batch
    8 @608^2 on v5e).  The classic TPU fix (MLPerf ResNet) is an exact
    algebraic rewrite: 2x2 space-to-depth the zero-padded image
    ``(B, H+6, W+6, 3) -> (B, (H+6)/2, (W+6)/2, 12)`` and apply a 4x4
    STRIDE-1 conv whose kernel is the 7x7 kernel zero-padded to 8x8 and
    re-laid-out as ``(4, 4, 12, 64)``:

        out[i,j] = sum_{dy,dx} xpad[2i+dy, 2j+dx] @ W[dy,dx]
                 = sum_{a,b,p,q} s2d(xpad)[i+a, j+b, (p,q,:)] @ Wpad[2a+p, 2b+q]

    HOW the s2d tensor is built matters as much as the conv form: the
    naive 6D reshape-transpose runs at the pathological layout and is a
    net LOSS (4.46 ms vs 3.22 plain, /tmp probe 2026-08-17).  The
    layout-friendly construction used here is
      * width s2d as a FREE row-major reshape ``(B,H,W,3)->(B,H,W/2,6)``,
      * height s2d as an even/odd row slice + channel concat,
    giving channel order ``(row-parity p, col-parity q, c) = p*6+q*3+c``;
    the kernel is re-laid-out to match.  Measured 1.74 ms vs 3.22 ms for
    the plain conv (batch 8 @608^2, carry-threaded A/B in one process).

    Identical arithmetic terms (the added kernel row/col is zero), so
    outputs match the plain conv to float-accumulation order.  The PARAM
    is stored in the reference's (7, 7, 3, 64) layout - weight ports
    (models/weights.py) and the param tree are unchanged; the re-layout
    happens on 9.4k weights inside jit.  Falls back to the plain conv for
    odd padded extents (s2d needs H+6, W+6 even).
    """

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, xpad: jnp.ndarray, *, prebuilt_s2d: bool = False) -> jnp.ndarray:
        kernel = self.param(
            "kernel", nn.initializers.lecun_normal(), (7, 7, 3, 64), jnp.float32
        )
        bias = self.param("bias", nn.initializers.zeros_init(), (64,), jnp.float32)
        if prebuilt_s2d:
            # xpad is already the s2d tensor (B, (S+6)/2, (S+6)/2, 12)
            # in (p, q, c) channel order (built on the HOST from the
            # uint8 canvas - data/pipeline.py::s2d_canvas_np - so the
            # device program never touches a channel-minor-3 tensor).
            kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))
            kp = (
                kp.reshape(4, 2, 4, 2, 3, 64)
                .transpose(0, 2, 1, 3, 4, 5)
                .reshape(4, 4, 12, 64)
            )
            y = jax.lax.conv_general_dilated(
                xpad.astype(self.dtype),
                kp.astype(self.dtype),
                (1, 1), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        b, h, w, c = xpad.shape
        if h % 2 or w % 2:  # odd canvas: plain strided conv
            y = jax.lax.conv_general_dilated(
                xpad.astype(self.dtype),
                kernel.astype(self.dtype),
                (2, 2), "VALID",
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
            return y + bias.astype(self.dtype)
        kp = jnp.pad(kernel, ((0, 1), (0, 1), (0, 0), (0, 0)))  # (8, 8, 3, 64)
        # [2a+p, 2b+q, c, o] -> [a, b, (p*2c + q*c + c), o]
        kp = (
            kp.reshape(4, 2, 4, 2, c, 64)
            .transpose(0, 2, 1, 3, 4, 5)
            .reshape(4, 4, 4 * c, 64)
        )
        x = xpad.astype(self.dtype)
        xw = x.reshape(b, h, w // 2, 2 * c)  # free reshape: W s2d
        x2 = jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)  # H s2d
        y = jax.lax.conv_general_dilated(
            x2,
            kp.astype(self.dtype),
            (1, 1), "VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + bias.astype(self.dtype)


class ResNet50Trunk(nn.Module):
    """Stages 1-4; input NHWC image, output stride-16 1024-ch feature map.

    ``up_to``: truncation point for stage-level profiling
    (scripts/ablate_trunk.py) - one of "stem", "s2", "s3"; default runs
    all four stages.  Production code never sets it."""

    dtype: Any = jnp.float32
    up_to: str | None = None

    @nn.compact
    def __call__(self, x: jnp.ndarray, *, prebuilt_s2d: bool = False) -> jnp.ndarray:
        x = x.astype(self.dtype)
        if prebuilt_s2d:
            # x is the centered host-built s2d tensor (B, H2, W2, 12) -
            # the pad + device s2d are already folded in.
            x = StemConv(dtype=self.dtype, name="conv1")(x, prebuilt_s2d=True)
        else:
            x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # ZeroPadding2D((3,3))
            x = StemConv(dtype=self.dtype, name="conv1")(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn_conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")
        if self.up_to == "stem":
            return x

        # stage 2 (resnet50.py:190-192)
        x = Bottleneck((64, 64, 256), stride=1, project=True, dtype=self.dtype, name="s2a")(x)
        x = Bottleneck((64, 64, 256), dtype=self.dtype, name="s2b")(x)
        x = Bottleneck((64, 64, 256), dtype=self.dtype, name="s2c")(x)
        if self.up_to == "s2":
            return x
        # stage 3 (resnet50.py:194-197)
        x = Bottleneck((128, 128, 512), stride=2, project=True, dtype=self.dtype, name="s3a")(x)
        x = Bottleneck((128, 128, 512), dtype=self.dtype, name="s3b")(x)
        x = Bottleneck((128, 128, 512), dtype=self.dtype, name="s3c")(x)
        x = Bottleneck((128, 128, 512), dtype=self.dtype, name="s3d")(x)
        if self.up_to == "s3":
            return x
        # stage 4 (resnet50.py:199-204)
        x = Bottleneck((256, 256, 1024), stride=2, project=True, dtype=self.dtype, name="s4a")(x)
        for blk in "bcdef":
            x = Bottleneck((256, 256, 1024), dtype=self.dtype, name=f"s4{blk}")(x)
        return x


class ResNet50RoIHead(nn.Module):
    """Stage-5 head over pooled RoIs: ``(N, 14, 14, 1024)`` ->
    (class probs ``(N, n_classes)``, box deltas ``(N, 4*(n_classes-1))``).

    ``pre_strided``: the s5a entry convs are both 1x1 STRIDE-2, so they
    only ever read the even positions of the 14x14 crop.  When the RoI
    pool samples exactly those positions directly (7x7 pool with
    ``center_stride=2`` - see ops/roi_align.py), the head input is
    ``(N, 7, 7, 1024)`` and s5a runs at stride 1: bit-identical outputs
    (pinned by tests/test_roi_align.py) with a 4x smaller pooled tensor.
    Parameters are unaffected (1x1 kernels have no stride-dependent
    shape), so weight ports work for either mode."""

    n_classes: int
    dtype: Any = jnp.float32
    pre_strided: bool = False
    quantize: bool = False  # int8 stage-5 convs at inference (models/quant.py)

    @nn.compact
    def __call__(self, rois: jnp.ndarray, *, deterministic: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
        # No dropout in the ResNet head (resnet50.py:231-280); deterministic
        # instead gates the int8 path so TRAINING always runs float (the
        # quantizer's round() has zero gradient).
        quant = self.quantize and deterministic
        x = rois.astype(self.dtype)
        # stage 5 (resnet50.py:257-259): conv block stride 2 -> 7x7
        s5a_stride = 1 if self.pre_strided else 2
        x = Bottleneck((512, 512, 2048), stride=s5a_stride, project=True, dtype=self.dtype, quantize=quant, name="s5a")(x)
        x = Bottleneck((512, 512, 2048), dtype=self.dtype, quantize=quant, name="s5b")(x)
        x = Bottleneck((512, 512, 2048), dtype=self.dtype, quantize=quant, name="s5c")(x)
        x = nn.avg_pool(x, (7, 7), strides=(7, 7))  # TD AveragePooling2D((7,7))
        x = x.reshape(x.shape[0], -1)  # (N, 2048)

        # Output heads (resnet50.py:263-279); zero-init like the reference.
        cls = nn.Dense(
            self.n_classes,
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="dense_class",
        )(x.astype(jnp.float32))
        cls = nn.softmax(cls, axis=-1)
        regr = nn.Dense(
            4 * (self.n_classes - 1),
            kernel_init=nn.initializers.zeros,
            dtype=jnp.float32,
            param_dtype=jnp.float32,
            name="dense_regress",
        )(x.astype(jnp.float32))
        return cls, regr
