"""The full two-stage detector as a single Flax module.

The reference builds *three* overlapping Keras models sharing layers
(``model_rpn`` / ``model_classifier`` / ``model_all``,
/root/reference/train.py:209-211) and runs the backbone up to three times
per training step.  Here one module owns all parameters and exposes the
three computations as methods, so a fused, jitted train step runs the trunk
exactly once:

* :meth:`features`  - shared trunk (resnet50.nn_base / vgg16.nn_base)
* :meth:`rpn`       - RPN heads on a feature map (rpn_layer, rpn.py:12-66)
* :meth:`roi_heads` - RoI pooling + stage-5/dense head + output heads
  (classifier_layer, resnet50.py:231-280 / vgg16.py:67-123)

``__call__`` wires them end to end for a given set of RoIs, which is the
jittable "forward step" exported by ``__graft_entry__.entry()``.
"""

from __future__ import annotations

from typing import Any

import jax.numpy as jnp
from flax import linen as nn

from radnet_tpu.config import Config
from radnet_tpu.models import resnet, vgg
from radnet_tpu.models.rpn import RPNHead
from radnet_tpu.ops.roi_align import batched_roi_pool


class FasterRCNN(nn.Module):
    network: str  # 'vgg16' | 'resnet50'
    n_classes: int
    num_anchors: int
    dtype: Any = jnp.bfloat16
    vgg_fc_dim: int = 4096
    # "int8": RoI head convs/dense run quantized in deterministic
    # (inference) mode only - config.infer_quantize (models/quant.py).
    head_quant: str | None = None

    def setup(self):
        quant = self.head_quant == "int8"
        if self.network == "vgg16":
            self.trunk = vgg.VGG16Trunk(dtype=self.dtype, name="trunk")
            self.head = vgg.VGG16RoIHead(
                n_classes=self.n_classes,
                dtype=self.dtype,
                fc_dim=self.vgg_fc_dim,
                quantize=quant,
                name="head",
            )
            self._pool_size = vgg.POOL_SIZE
            self._pool_center_stride = 1
        elif self.network == "resnet50":
            self.trunk = resnet.ResNet50Trunk(dtype=self.dtype, name="trunk")
            # Pool directly at 7x7 on the even sample centers of the
            # reference's 14x14 grid (resnet50.py:249) - bit-identical to
            # 14x14 pooling followed by s5a's stride-2 1x1 convs, at a
            # quarter of the pooled-tensor memory traffic.
            self.head = resnet.ResNet50RoIHead(
                n_classes=self.n_classes,
                dtype=self.dtype,
                pre_strided=True,
                quantize=quant,
                name="head",
            )
            self._pool_size = resnet.POOL_SIZE // 2
            self._pool_center_stride = 2
        else:
            raise ValueError(f"unknown network {self.network!r}")
        # bf16 for the 3x3/512 conv (the FLOPs); the 1x1 output heads stay
        # f32 inside RPNHead for stable sigmoid/regression outputs.
        self.rpn_head = RPNHead(
            num_anchors=self.num_anchors, dtype=self.dtype, name="rpn"
        )

    @property
    def pool_size(self) -> int:
        return self._pool_size

    def features(self, images: jnp.ndarray, *, prebuilt_s2d: bool = False) -> jnp.ndarray:
        """(B, H, W, 3) preprocessed images -> (B, H/16, W/16, C) features.

        ``prebuilt_s2d``: resnet50-only fast path - ``images`` is the
        centered host-built stem s2d tensor (B, (S+6)/2, (S+6)/2, 12)
        (data/pipeline.py::s2d_canvas_np), skipping the device-side
        pad + space-to-depth layout stage."""
        if prebuilt_s2d:
            return self.trunk(images, prebuilt_s2d=True)
        return self.trunk(images)

    def rpn(self, fmap: jnp.ndarray) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Feature map -> (objectness (B,h,w,A), box deltas (B,h,w,4A))."""
        return self.rpn_head(fmap)

    def roi_heads(
        self,
        fmap: jnp.ndarray,
        rois_xywh: jnp.ndarray,
        *,
        deterministic: bool = True,
    ) -> tuple[jnp.ndarray, jnp.ndarray]:
        """Pool + classify RoIs.

        Args:
          fmap: (B, h, w, C) feature maps.
          rois_xywh: (B, R, 4) RoIs in feature-map coordinates.
        Returns:
          (class probs (B, R, n_classes), box deltas (B, R, 4*(n_classes-1)))
        """
        b, r = rois_xywh.shape[:2]
        pooled = batched_roi_pool(
            fmap,
            rois_xywh,
            pool_size=self._pool_size,
            center_stride=self._pool_center_stride,
        )
        pooled = pooled.reshape((b * r,) + pooled.shape[2:])
        cls, regr = self.head(pooled, deterministic=deterministic)
        return cls.reshape(b, r, -1), regr.reshape(b, r, -1)

    def __call__(
        self,
        images: jnp.ndarray,
        rois_xywh: jnp.ndarray,
        *,
        deterministic: bool = True,
    ):
        """End-to-end forward: images + RoIs -> RPN outputs + detections."""
        fmap = self.features(images)
        rpn_cls, rpn_regr = self.rpn(fmap)
        det_cls, det_regr = self.roi_heads(
            fmap, rois_xywh, deterministic=deterministic
        )
        return (rpn_cls, rpn_regr), (det_cls, det_regr)


def build_model(config: Config) -> FasterRCNN:
    return FasterRCNN(
        network=config.network,
        n_classes=config.n_classes,
        num_anchors=config.n_anchors,
        dtype=jnp.dtype(config.compute_dtype),
        vgg_fc_dim=config.vgg_fc_dim,
        head_quant=getattr(config, "infer_quantize", None),
    )
