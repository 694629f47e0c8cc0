"""Box IoU in both of the reference's conventions.

The reference uses two IoU variants (utils/det_util.py): bbox_iou with the
legacy +1-pixel convention (:214-244, used for eval TP matching) and
bbox_iou2 without it (:247-277, used for NMS-style geometry). Both are
provided, jit-friendly, for matrices and aligned pairs.
"""

from __future__ import annotations

import jax.numpy as jnp


def _inter(b1, b2, plus1: float):
    ix0 = jnp.maximum(b1[..., 0], b2[..., 0])
    iy0 = jnp.maximum(b1[..., 1], b2[..., 1])
    ix1 = jnp.minimum(b1[..., 2], b2[..., 2])
    iy1 = jnp.minimum(b1[..., 3], b2[..., 3])
    return jnp.clip(ix1 - ix0 + plus1, 0, None) * jnp.clip(iy1 - iy0 + plus1, 0, None)


def _area(b, plus1: float):
    return (b[..., 2] - b[..., 0] + plus1) * (b[..., 3] - b[..., 1] + plus1)


def box_iou_matrix(a, b, plus1: bool = False):
    """IoU matrix [A, B] between two box sets [A,4] and [B,4]."""
    p = 1.0 if plus1 else 0.0
    a_ = a[:, None, :]
    b_ = b[None, :, :]
    inter = _inter(a_, b_, p)
    union = _area(a_, p) + _area(b_, p) - inter
    return inter / (union + 1e-16)


def box_iou_pairwise(a, b, plus1: bool = False):
    """Elementwise IoU between aligned box arrays [..., 4]."""
    p = 1.0 if plus1 else 0.0
    inter = _inter(a, b, p)
    union = _area(a, p) + _area(b, p) - inter
    return inter / (union + 1e-16)


def box_iou_plus1(a, b):
    """The eval-protocol variant (det_util.bbox_iou:214-244)."""
    return box_iou_matrix(a, b, plus1=True)


def xywh_to_xyxy(x):
    return jnp.stack(
        [
            x[..., 0] - x[..., 2] / 2,
            x[..., 1] - x[..., 3] / 2,
            x[..., 0] + x[..., 2] / 2,
            x[..., 1] + x[..., 3] / 2,
        ],
        axis=-1,
    )


def inflate_boxes(boxes, factor: float = 1.05):
    """Scale boxes about their centres (predict's x1.05 inflation,
    architecture3cc_rpn_gp_iter2.py:339-351)."""
    c = (boxes[..., 0:2] + boxes[..., 2:4]) / 2
    wh = (boxes[..., 2:4] - boxes[..., 0:2]) * factor
    return jnp.concatenate([c - wh / 2, c + wh / 2], axis=-1)
