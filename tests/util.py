"""Shared test helpers: tiny configs and synthetic batches."""

import numpy as np

from radnet_tpu.config import Config


def tiny_config(network: str = "vgg16") -> Config:
    """A miniature config so CPU tests compile quickly: 64px canvas -> 4x4
    feature map for both backbones."""
    return Config(
        network=network,
        canvas_size=64,
        img_size=60,
        batch_size=2,
        max_gt_boxes=8,
        n_rois=4,
        pre_nms_top_n=64,
        post_nms_top_n=16,
        max_detections_per_tile=8,
        infer_tile_batch=2,
        anchor_box_scales=[16, 32],
        anchor_box_ratios=[[1.0, 1.0], [1.0, 2.0], [2.0, 1.0]],
        compute_dtype="float32",
        vgg_fc_dim=256,
        tile_size=64,
        tile_overlap=32,
        class_mapping={"boat": 0, "human": 1, "bg": 2},
    )


def decisive_detector_params(params, seed: int = 0, rpn_scale: float = 0.3,
                             cls_scale: float = 0.2):
    """Seeded larger-magnitude score weights for cross-program equivalence
    tests.

    At the reference's init scales (RPN cls kernel uniform in +-0.05 over a
    zero-init detector head) objectness logits sit within float noise of
    each other and class probs are exactly uniform, so NMS orderings - and
    with them detection sets and sampled-RoI trajectories - can
    legitimately flip between two numerically-different-but-correct
    compilations of the same math (scan body vs standalone step, device vs
    host resampler).  Tests asserting cross-program equivalence need
    decisive scores, not tie-broken ones; training-semantics tests keep
    the true reference init."""
    import jax

    p = jax.device_get(params)  # deep numpy copy of the tree
    rng = np.random.default_rng(seed)

    def set_(keys, scale):
        node = p
        for k in keys[:-1]:
            node = node[k]
        a = node[keys[-1]]
        node[keys[-1]] = rng.normal(0.0, scale, a.shape).astype(a.dtype)

    set_(("rpn", "rpn_out_class", "kernel"), rpn_scale)
    set_(("head", "dense_class", "kernel"), cls_scale)
    return p


def synthetic_batch(config: Config, batch: int = 2, seed: int = 0):
    """A random but valid training batch with one GT box per sample."""
    rng = np.random.default_rng(seed)
    s = config.canvas_size
    g = config.max_gt_boxes
    images = rng.normal(0, 1, (batch, s, s, 3)).astype(np.float32)
    gt_boxes = np.zeros((batch, g, 4), np.float32)
    gt_classes = np.zeros((batch, g), np.int32)
    gt_mask = np.zeros((batch, g), bool)
    for b in range(batch):
        x1, y1 = rng.uniform(2, 20, 2)
        w, h = rng.uniform(15, 30, 2)
        gt_boxes[b, 0] = (x1, y1, x1 + w, y1 + h)
        gt_classes[b, 0] = rng.integers(0, config.n_classes - 1)
        gt_mask[b, 0] = True
    return {
        "image": images,
        "gt_boxes": gt_boxes,
        "gt_classes": gt_classes,
        "gt_mask": gt_mask,
        "valid_wh": np.full((batch, 2), float(config.img_size), np.float32),
        "sample_valid": np.ones((batch,), bool),
    }
