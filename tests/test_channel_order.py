"""Anchor channel-order consistency between target assignment and decode.

The RPN head emits A objectness channels and 4A regression channels; the
target generator writes labels at ``a = ratio_idx + n_ratios * size_idx``
(utils.py:725,737) and the proposal decoder reads anchors in the loop order
``size-major, ratio-minor`` (rpn.py:108-152).  These must be the SAME
ordering or training silently optimizes the wrong channels - this test
drives a one-hot activation through both sides.
"""

import numpy as np
import jax
import jax.numpy as jnp

from radnet_tpu.ops.anchors import feature_anchors_xywh, image_anchors_xyxy
from radnet_tpu.ops.proposals import decode_proposals
from radnet_tpu.ops.targets import rpn_targets

SCALES = (64.0, 128.0)
RATIOS = ((1.0, 1.0), (1.0, 2.0), (2.0, 1.0))
STRIDE = 16
F = 24  # 384px image: scale-128 non-square anchors fit inside


def test_target_channel_matches_decode_anchor():
    n_ratios = len(RATIOS)
    img_anchors = np.asarray(image_anchors_xyxy(F, F, SCALES, RATIOS, STRIDE))
    feat_anchors = np.asarray(feature_anchors_xywh(F, F, SCALES, RATIOS, STRIDE))

    for size_idx, ratio_idx, cell in [(0, 0, (6, 6)), (1, 2, (12, 12)), (0, 1, (7, 9))]:
        a = size_idx * n_ratios + ratio_idx
        jy, ix = cell

        # GT placed exactly on the image anchor for channel a at this cell.
        gt = img_anchors[jy, ix, a]
        gt_boxes = np.zeros((4, 4), np.float32)
        gt_boxes[0] = gt
        gt_mask = np.zeros(4, bool)
        gt_mask[0] = True

        out = rpn_targets(
            jnp.asarray(gt_boxes),
            jnp.asarray(gt_mask),
            jnp.float32(F * STRIDE),
            jnp.float32(F * STRIDE),
            jax.random.PRNGKey(0),
            feat_h=F,
            feat_w=F,
            scales=SCALES,
            ratios=RATIOS,
            stride=STRIDE,
        )
        overlap = np.asarray(out.y_rpn_cls)[..., len(SCALES) * n_ratios :]
        # the positive label must land on exactly channel a at (jy, ix)
        assert overlap[jy, ix, a] == 1.0, (size_idx, ratio_idx)

        # Drive objectness 1.0 on that channel only; decode (no regression)
        # must return the corresponding feature anchor box.
        rpn_cls = np.zeros((F, F, len(SCALES) * n_ratios), np.float32)
        rpn_cls[jy, ix, a] = 1.0
        rpn_regr = np.zeros((F, F, 4 * len(SCALES) * n_ratios), np.float32)
        props = decode_proposals(
            jnp.asarray(rpn_cls),
            jnp.asarray(rpn_regr),
            jnp.int32(F),
            jnp.int32(F),
            scales=SCALES,
            ratios=RATIOS,
            stride=STRIDE,
            pre_nms_top_n=64,
            post_nms_top_n=4,
            nms_thresh=0.7,
            use_regr=False,
        )
        top = np.asarray(props.boxes)[0]
        ax, ay, aw, ah = feat_anchors[jy, ix, a]
        want = np.array(
            [
                max(0.0, ax),
                max(0.0, ay),
                min(F - 1.0, ax + max(aw, 1.0)),
                min(F - 1.0, ay + max(ah, 1.0)),
            ]
        )
        np.testing.assert_allclose(top, np.floor(want), atol=1e-5)
