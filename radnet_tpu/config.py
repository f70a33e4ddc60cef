"""Configuration for the RADNET-TPU detection pipeline.

Carries every knob of the reference ``Config``
(/root/reference/faster_rcnn/config.py:5-133) plus the TPU-specific shape /
batching / sharding parameters the fixed-shape XLA design needs.

Unlike the reference (which pickles the live class instance and trusts the
pickle at load time, /root/reference/train.py:180-181,
/root/reference/faster_rcnn/RADNet.py:724), the canonical persistence format
here is JSON: ``Config.save`` / ``Config.load`` round-trip a plain dict, so
checkpoints remain loadable across refactors.
"""

from __future__ import annotations

import dataclasses
import json
import os
from typing import Any


@dataclasses.dataclass
class Config:
    # ------------------------------------------------------------------ #
    # Model / backbone (reference config.py:12-17)
    # ------------------------------------------------------------------ #
    verbose: bool = True
    network: str = "resnet50"  # 'vgg16' or 'resnet50'
    base_net_trainable: bool = False
    base_net_cont_trainable: bool = True
    base_net_weights: str | None = "imagenet"  # 'imagenet' or None

    # ------------------------------------------------------------------ #
    # Augmentation switches (reference config.py:20-27)
    # ------------------------------------------------------------------ #
    use_horizontal_flips: bool = True
    use_vertical_flips: bool = True
    use_90_rotations: bool = True
    use_rotations: bool = True
    use_shear: bool = True
    use_brightness: bool = True
    use_noise: bool = True
    # Run the photometric ops (brightness + noise/contrast) batched on
    # device inside the fused train step instead of per-sample on the host
    # (profiled at ~70% of host sample time; they are elementwise - VPU
    # work).  Geometric ops stay on the host where the dynamic canvas and
    # bbox bookkeeping live.  See ops/augment_device.py for the (small,
    # documented) pre- vs post-resize semantic difference.
    augment_photometric_on_device: bool = True
    # Resize the cropped tile to the canvas working size BEFORE the host
    # geometric augmentation instead of after (the reference augments at
    # full tile resolution, utils.py:394-416): warpAffine / flips / strap
    # then touch ~(img_size)^2 pixels instead of ~(tile_size)^2 - ~11x
    # fewer at the reference 600/2000 geometry - for a statistically
    # equivalent augmentation distribution (rotation/shear angles are
    # scale-free; one extra bicubic resample).  Turn off to reproduce the
    # reference's augment-then-resize order exactly.
    augment_at_canvas_scale: bool = True
    # Byte budget (MB) for the prescaled-tile LRU cache: the crop+resize
    # of a tile window is deterministic per (panel, type, window, size), so
    # epochs after the first skip straight to augmentation (the crop copy
    # + bicubic prescale are ~half the per-sample host cost).  0 disables.
    prescaled_tile_cache_mb: int = 256

    # ------------------------------------------------------------------ #
    # Image types (reference config.py:28-33)
    # ------------------------------------------------------------------ #
    use_img_type: bool = False
    img_types: list[str] = dataclasses.field(
        default_factory=lambda: ["enhanced_topo_grey", "topo_grey"]
    )

    # ------------------------------------------------------------------ #
    # Tiling (reference config.py:36-41)
    # ------------------------------------------------------------------ #
    tile_size: int = 2000
    tile_overlap: int = 400  # step size between tile origins
    tile_bbox_clip_threshold: float = 0.75
    max_n_tiles_train: int = 1
    max_n_tiles_val: int = 1
    include_full_img: bool = False

    # ------------------------------------------------------------------ #
    # Anchors (reference config.py:47-56)
    # ------------------------------------------------------------------ #
    anchor_box_scales: list[int] = dataclasses.field(
        default_factory=lambda: [64, 128, 256, 512]
    )
    anchor_box_ratios: list[list[float]] = dataclasses.field(
        default_factory=lambda: [[1.0, 1.0], [1.0, 2.0], [2.0, 1.0]]
    )

    # ------------------------------------------------------------------ #
    # Input geometry (reference config.py:70-81)
    # ------------------------------------------------------------------ #
    img_size: int = 600  # target size of the longest image side (see note)
    n_rois: int = 20  # RoIs per detector step during training
    rpn_stride: int = 16

    # ------------------------------------------------------------------ #
    # Class balancing / regression scaling (reference config.py:84-96)
    # ------------------------------------------------------------------ #
    balanced_classes: bool = True
    std_scaling: float = 4.0
    classifier_regr_std: list[float] = dataclasses.field(
        default_factory=lambda: [8.0, 8.0, 4.0, 4.0]
    )
    rpn_min_overlap: float = 0.3
    rpn_max_overlap: float = 0.7
    classifier_min_overlap: float = 0.1
    classifier_max_overlap: float = 0.5

    # ------------------------------------------------------------------ #
    # Classes (reference config.py:100-108); 'bg' must map to the last id.
    # ------------------------------------------------------------------ #
    class_mapping: dict[str, int] = dataclasses.field(
        default_factory=lambda: {
            "boat": 0,
            "human": 1,
            "other": 2,
            "animal": 3,
            "circle": 4,
            "wheel": 5,
            "bg": 6,
        }
    )

    # ------------------------------------------------------------------ #
    # TPU-native additions: fixed shapes for XLA.
    #
    # The reference resizes the *shortest* image side to ``img_size`` and
    # feeds variable-shaped batches of 1 (utils.py:65-75).  Variable shapes
    # force recompilation per shape on TPU, so we instead resize the
    # *longest* side to ``img_size`` (identical for the square tiles that
    # dominate training/inference) and zero-pad to a fixed square canvas;
    # every op downstream carries a validity mask for the padded region.
    # ------------------------------------------------------------------ #
    canvas_size: int = 608  # 608 -> 38x38 feature map for both backbones
    batch_size: int = 8  # tiles per train step (reference: 1 image/step)
    # Optimizer steps fused into one dispatched program (lax.scan over
    # stacked batches, engine/steps.py::make_train_bundle).  Amortizes the
    # fixed per-dispatch host->device latency (~11 ms/step on the tunneled
    # backend: 36.7 -> 25.4 ms/step measured) across real updates; the
    # training trajectory is bit-identical to unbundled steps (same RNG
    # split sequence, same batch order).  1 disables bundling.
    train_bundle_steps: int = 4
    # Training schedule.  "joint" (default): the Faster R-CNN paper's
    # approximate joint training - one fused step, one Adam state,
    # proposals from the pre-update RPN (engine/steps.py:13-21).
    # "alternating": the reference's exact dynamics (train.py:288-402) -
    # RPN update first, proposals from the JUST-updated RPN, then a
    # detector update with a SECOND Adam state.  Still one fused dispatch
    # here, but two trunk forward/backward passes per step; use it for
    # controlled comparisons against reference training runs.
    train_schedule: str = "joint"  # 'joint' | 'alternating'
    max_gt_boxes: int = 64  # GT boxes per tile, padded
    rpn_max_regions: int = 256  # pos+neg anchor budget (utils.py:785)
    # True replicates the reference's 1:1 negative rebalance
    # (utils.py:802-813); False (default) uses the classic fill-to-budget
    # negatives, which avoids an RPN objectness-collapse spiral when
    # positives are scarce - see ops/targets.py.
    rpn_reference_neg_budget: bool = False
    # IoU floor for the best-anchor-per-GT fallback (reference: 0.0, i.e.
    # any nonzero overlap forces a positive - utils.py:741-766).
    rpn_fallback_min_iou: float = 0.0
    pre_nms_top_n: int = 2048  # proposals entering NMS, score top-k
    post_nms_top_n: int = 300  # proposals out of NMS (rpn.py:68 max_boxes)
    rpn_nms_thresh: float = 0.7  # proposal NMS IoU (RADNet.py:556-561)
    detection_nms_thresh: float = 0.2  # per-class per-tile NMS (RADNet.py:574)
    cross_type_nms_thresh: float = 0.4  # cross-image-type merge (RADNet.py:698)
    bbox_threshold: float = 0.7  # detector score cut (RADNet.py:36)
    max_detections_per_tile: int = 64  # per-class post-NMS budget per tile
    # Serving-latency knob: run the RoI head on only the top-K surviving
    # proposals per tile (score order; ~87% of cascade FLOPs live in the
    # head).  Bit-identical to the full cascade when a tile has <= K
    # surviving proposals.  None = reference parity (all post_nms_top_n).
    max_head_rois: int | None = None
    # Tiles per compiled inference call.  12 is the measured panel-
    # throughput optimum on v5e (sweep_tile_batch.py, 4000^2 36-tile
    # panels: device ms/tile falls monotonically to batch 36, but panel
    # throughput peaks where per-batch device time still overlaps the
    # next batch's host prep - 12 won both round-4 sweeps).
    infer_tile_batch: int = 12
    # Dispatch a panel's remainder tiles through a half-size compiled
    # program when they fit (e.g. 36 tiles = 4x8 + 1x4): the tail batch
    # otherwise pads with dead tiles, ~10% of panel device time at the
    # bench geometry.  Costs one extra cached compile per program family.
    infer_tail_subbatch: bool = True
    # Slice+resize tiles on device from a panel shipped to HBM once
    # (False: host-side cv2 tiling with async per-batch shipping).
    infer_device_tiling: bool = True
    # With device tiling: downscale the panel ONCE on the host by the
    # uniform per-tile factor img_size/tile_size and ship the small panel
    # (9% of the bytes at the reference 600/2000 geometry); the device
    # slices ready-sized windows.  False keeps the full-resolution panel +
    # MXU-bicubic resize on device (better when host CPU, not the
    # host->device link, is the bottleneck).  Ignored when img_size >=
    # tile_size (prescale would upscale).
    infer_panel_prescale: bool = True
    # Non-square inference windows (the include_full_img pseudo-tile,
    # sub-tile panels) use the reference's SHORTEST-side-to-img_size
    # resize (get_new_img_size, utils.py:65-75) onto a rectangular canvas
    # bucket of up to infer_canvas_max_mult x canvas_size on the long
    # side (one cached compile per bucket).  Aspect ratios beyond the cap
    # reduce the scale to fit the largest bucket.  False: legacy
    # longest-side-to-img_size square-canvas behavior (lower resolution
    # for non-square windows).  Square windows - every window of the
    # uniform tiling - are identical under both rules.
    infer_shortest_side: bool = True
    infer_canvas_max_mult: int = 4
    # resnet50 square-canvas host tile path: ship SPACE-TO-DEPTH'd uint8
    # canvases ((S+6)/2, (S+6)/2, 12) built on the host, so the device
    # program skips its worst layout stage (the pad + s2d build on the
    # channel-minor (S, S, 3) canvas - 1.5 ms per 8-tile batch,
    # BASELINE.md r4).  Bit-identical detections (tests/test_host_s2d.py)
    # and identical bytes on the wire.  vgg16 and the rectangular /
    # prescaled-device paths are unaffected.
    infer_host_s2d: bool = True
    compute_dtype: str = "bfloat16"  # backbone compute dtype on TPU
    # Serving-throughput knob with no reference counterpart: run the RoI
    # head's convs/dense layers in dynamic int8 (per-out-channel weight
    # scales, per-RoI activation scales, int32 accumulation) at inference
    # ONLY - the MXU's int8 peak is 2x bf16 and the head is ~87% of
    # cascade FLOPs.  Training and checkpoints are unaffected (the quant
    # path is a compute substitution over the same params; see
    # models/quant.py).  None = full-precision reference parity; "int8"
    # enables it.  Measure the mAP delta on your eval set before shipping.
    infer_quantize: str | None = None
    vgg_fc_dim: int = 4096  # VGG16 head width (vgg16.py:97-99); reduced in tests

    # Output model path prefix (reference config.py:133).
    model_path: str = ""
    weights_path: str = ""

    def __post_init__(self) -> None:
        if not self.model_path:
            self.model_path = "faster_rcnn_" + self.network

    # ------------------------------------------------------------------ #
    # Derived quantities
    # ------------------------------------------------------------------ #
    @property
    def n_anchors(self) -> int:
        return len(self.anchor_box_scales) * len(self.anchor_box_ratios)

    @property
    def n_classes(self) -> int:
        """Number of classes including background."""
        return len(self.class_mapping)

    @property
    def bg_class_id(self) -> int:
        return self.class_mapping["bg"]

    @property
    def inv_class_mapping(self) -> dict[int, str]:
        return {v: k for k, v in self.class_mapping.items()}

    @property
    def feat_size(self) -> int:
        """Feature-map side length for the fixed square canvas.

        Both backbones are stride-16 at ``canvas_size=608``:
        VGG16: 608 // 16 = 38 (vgg16.py:18-23); ResNet50's padded strided
        stack gives the same 38 (resnet50.py:19-35).
        """
        return backbone_feat_size(self.network, self.canvas_size)

    # ------------------------------------------------------------------ #
    # Persistence
    # ------------------------------------------------------------------ #
    def to_dict(self) -> dict[str, Any]:
        return dataclasses.asdict(self)

    def save(self, path: str) -> None:
        os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
        with open(path, "w") as f:
            json.dump(self.to_dict(), f, indent=4)

    @classmethod
    def from_dict(cls, d: dict[str, Any]) -> "Config":
        fields = {f.name for f in dataclasses.fields(cls)}
        return cls(**{k: v for k, v in d.items() if k in fields})

    @classmethod
    def load(cls, path: str) -> "Config":
        with open(path) as f:
            return cls.from_dict(json.load(f))


def vgg_feat_dim(length: int) -> int:
    """VGG16 stride-16 output length (vgg16.py:18-23)."""
    return length // 16

def resnet_feat_dim(length: int) -> int:
    """ResNet50 output length: zero-pad +6 then 4 strided convs
    (resnet50.py:19-35)."""
    length += 6
    for filter_size in (7, 3, 1, 1):
        length = (length - filter_size + 2) // 2
    return length


def backbone_feat_size(network: str, length: int) -> int:
    if network == "vgg16":
        return vgg_feat_dim(length)
    if network == "resnet50":
        return resnet_feat_dim(length)
    raise ValueError(f"unknown network {network!r}")
