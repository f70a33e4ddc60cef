"""Data engine: CSV annotations, panel tiling, augmentation, batching."""
