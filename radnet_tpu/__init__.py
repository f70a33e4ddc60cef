"""RADNET-TPU: a TPU-native (JAX/XLA/Pallas) rock-art object-detection framework.

A ground-up re-design of the capabilities of
``Swedish-Rock-Art-Research-Archives/rock-art-radnet`` (a Keras-2/TF-1 Faster
R-CNN pipeline for detecting figures in giga-pixel scanned rock-art panels)
as an idiomatic TPU program:

* all detection math (anchor generation, target assignment, box decode, NMS,
  RoI pooling) runs on device with fixed shapes and validity masks;
* training is a single fused, jitted step (the reference runs the backbone
  3x per step across 4 host<->device hops, /root/reference/train.py:288-402);
* inference batches all tiles of a panel through one compiled program
  (the reference loops tile-by-tile with ~16 device round-trips per tile,
  /root/reference/faster_rcnn/RADNet.py:543-604);
* scaling is expressed with ``jax.sharding`` over a device mesh (data
  parallelism over the tile axis + optional tensor parallelism in the heads).
"""

__version__ = "0.1.0"

from radnet_tpu.config import Config

__all__ = ["Config", "__version__"]
