"""Flax model zoo: backbones, RPN head, detector heads."""

from radnet_tpu.models.detector import FasterRCNN, build_model

__all__ = ["FasterRCNN", "build_model"]
