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

import jax.numpy as jnp
from flax import linen as nn

from radnet_tpu.models.layers import FrozenBatchNorm

FEATURE_CHANNELS = 1024
POOL_SIZE = 14  # resnet50.py:249


class Bottleneck(nn.Module):
    """Bottleneck residual block (identity_block / conv_block,
    resnet50.py:41-117)."""

    filters: tuple[int, int, int]
    stride: int = 1
    project: bool = False  # conv_block (projection shortcut) vs identity
    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        f1, f2, f3 = self.filters
        s = (self.stride, self.stride)
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)

        y = nn.Conv(f1, (1, 1), strides=s, padding="VALID", name="conv2a", **kw)(x)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2a")(y)
        y = nn.relu(y)
        y = nn.Conv(f2, (3, 3), padding="SAME", name="conv2b", **kw)(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2b")(y)
        y = nn.relu(y)
        y = nn.Conv(f3, (1, 1), padding="VALID", name="conv2c", **kw)(y)
        y = FrozenBatchNorm(dtype=self.dtype, name="bn2c")(y)

        if self.project:
            sc = nn.Conv(f3, (1, 1), strides=s, padding="VALID", name="conv_sc", **kw)(x)
            sc = FrozenBatchNorm(dtype=self.dtype, name="bn_sc")(sc)
        else:
            sc = x
        return nn.relu(y + sc)


class ResNet50Trunk(nn.Module):
    """Stages 1-4; input NHWC image, output stride-16 1024-ch feature map."""

    dtype: Any = jnp.float32

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kw = dict(dtype=self.dtype, param_dtype=jnp.float32)
        x = x.astype(self.dtype)
        x = jnp.pad(x, ((0, 0), (3, 3), (3, 3), (0, 0)))  # ZeroPadding2D((3,3))
        x = nn.Conv(64, (7, 7), strides=(2, 2), padding="VALID", name="conv1", **kw)(x)
        x = FrozenBatchNorm(dtype=self.dtype, name="bn_conv1")(x)
        x = nn.relu(x)
        x = nn.max_pool(x, (3, 3), strides=(2, 2), padding="VALID")

        # stage 2 (resnet50.py:190-192)
        x = Bottleneck((64, 64, 256), stride=1, project=True, dtype=self.dtype, name="s2a")(x)
        x = Bottleneck((64, 64, 256), dtype=self.dtype, name="s2b")(x)
        x = Bottleneck((64, 64, 256), dtype=self.dtype, name="s2c")(x)
        # stage 3 (resnet50.py:194-197)
        x = Bottleneck((128, 128, 512), stride=2, project=True, dtype=self.dtype, name="s3a")(x)
        x = Bottleneck((128, 128, 512), dtype=self.dtype, name="s3b")(x)
        x = Bottleneck((128, 128, 512), dtype=self.dtype, name="s3c")(x)
        x = Bottleneck((128, 128, 512), dtype=self.dtype, name="s3d")(x)
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

    @nn.compact
    def __call__(self, rois: jnp.ndarray, *, deterministic: bool = True) -> tuple[jnp.ndarray, jnp.ndarray]:
        del deterministic  # no dropout in the ResNet head (resnet50.py:231-280)
        x = rois.astype(self.dtype)
        # stage 5 (resnet50.py:257-259): conv block stride 2 -> 7x7
        s5a_stride = 1 if self.pre_strided else 2
        x = Bottleneck((512, 512, 2048), stride=s5a_stride, project=True, dtype=self.dtype, name="s5a")(x)
        x = Bottleneck((512, 512, 2048), dtype=self.dtype, name="s5b")(x)
        x = Bottleneck((512, 512, 2048), dtype=self.dtype, name="s5c")(x)
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
