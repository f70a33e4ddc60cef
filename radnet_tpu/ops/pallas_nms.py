"""Fused NMS dominance matrix as a Pallas TPU kernel.

:func:`radnet_tpu.ops.nms.nms_fixed_point` needs the boolean relation

    dominates[i, j] = (iou(box_i, box_j) > thresh) and
                      (score_j, j) > (score_i, i)        (lexicographic)

XLA materializes the f32 IoU matrix plus several (N, N, 2) elementwise
temporaries on the way there (~4 ms for the 8x2048^2 proposal stage).  This
kernel computes the int8 relation directly in VMEM - the only HBM traffic
is the boxes/scores in (tiny) and the packed (N, N) int8 out.

Numerics match ``geometry.iou_matrix`` exactly: same ``inter / (union +
1e-6) > thresh`` float comparison (division kept - no rearrangement that
could flip knife-edge ties), degenerate boxes get IoU 0.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

EPS = 1e-6
_BN = 128  # row-block size; intermediates are (BN, N) f32 in VMEM


def _dominates_kernel(thresh, rows_ref, cols_ref, srow_ref, scol_ref, out_ref):
    """One (BN, N) block of the dominance matrix for one tile.

    rows_ref: (1, BN, 4) row boxes; cols_ref: (1, 4, N) column boxes
    (same boxes, two layouts so both broadcast shapes slice cleanly);
    srow_ref: (1, BN, 1); scol_ref: (1, 1, N); out_ref: (1, BN, N) int8.
    """
    r = pl.program_id(1)
    bn = rows_ref.shape[1]
    n = cols_ref.shape[2]

    rows = rows_ref[0]  # (BN, 4)
    x1r, y1r, x2r, y2r = (rows[:, i : i + 1] for i in range(4))  # (BN, 1)
    cols = cols_ref[0]  # (4, N)
    x1c, y1c, x2c, y2c = (cols[i : i + 1, :] for i in range(4))  # (1, N)

    iw = jnp.maximum(jnp.minimum(x2r, x2c) - jnp.maximum(x1r, x1c), 0.0)
    ih = jnp.maximum(jnp.minimum(y2r, y2c) - jnp.maximum(y1r, y1c), 0.0)
    inter = iw * ih
    area_r = (x2r - x1r) * (y2r - y1r)
    area_c = (x2c - x1c) * (y2c - y1c)
    iou = inter / (area_r + area_c - inter + EPS)
    valid_r = (x2r > x1r) & (y2r > y1r)
    valid_c = (x2c > x1c) & (y2c > y1c)
    overlap = (iou > thresh) & valid_r & valid_c

    sr = srow_ref[0]  # (BN, 1)
    sc = scol_ref[0]  # (1, N)
    idx_r = r * bn + jax.lax.broadcasted_iota(jnp.int32, (bn, 1), 0)
    idx_c = jax.lax.broadcasted_iota(jnp.int32, (1, n), 1)
    higher = (sc > sr) | ((sc == sr) & (idx_c > idx_r))

    out_ref[0] = (overlap & higher).astype(jnp.int8)


@functools.partial(jax.jit, static_argnames=("iou_thresh",))
def dominates_matrix(boxes: jnp.ndarray, scores: jnp.ndarray, iou_thresh: float):
    """Batched dominance relation: ``(B, N, 4)`` boxes + ``(B, N)`` scores
    (invalid candidates pre-masked to -inf) -> ``(B, N, N)`` bool.

    Requires ``N % _BN == 0`` (callers fall back to the XLA expression
    otherwise - see ops/nms.py).
    """
    b, n, _ = boxes.shape
    assert n % _BN == 0, n
    boxes = boxes.astype(jnp.float32)
    scores = scores.astype(jnp.float32)
    boxes_t = jnp.swapaxes(boxes, 1, 2)  # (B, 4, N)
    s_row = scores[:, :, None]  # (B, N, 1)
    s_col = scores[:, None, :]  # (B, 1, N)

    out = pl.pallas_call(
        functools.partial(_dominates_kernel, float(iou_thresh)),
        grid=(b, n // _BN),
        in_specs=[
            pl.BlockSpec((1, _BN, 4), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 4, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _BN, 1), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 1, n), lambda i, j: (i, 0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (1, _BN, n), lambda i, j: (i, j, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((b, n, n), jnp.int8),
    )(boxes, boxes_t, s_row, s_col)
    return out != 0
