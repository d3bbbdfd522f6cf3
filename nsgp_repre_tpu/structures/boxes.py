"""Box operations as pure jnp functions (all fuse under jit).

Behavior parity targets in the reference repo:
- IoU/IoF: mmdet/structures/bbox/bbox_overlaps.py:13 (torch broadcast impl)
- delta coder: mmdet/models/task_modules/coders/delta_xywh_bbox_coder.py:15

Boxes are (..., 4) float arrays in corner ``(x1, y1, x2, y2)`` format.
Invalid/padded boxes should be all-zeros; callers carry validity masks.
"""
from __future__ import annotations

import math

import jax.numpy as jnp


def bbox_area(boxes: jnp.ndarray) -> jnp.ndarray:
    """Area of corner-format boxes, shape (..., 4) -> (...,)."""
    return (boxes[..., 2] - boxes[..., 0]) * (boxes[..., 3] - boxes[..., 1])


def bbox_overlaps(
    boxes1: jnp.ndarray,
    boxes2: jnp.ndarray,
    mode: str = "iou",
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Pairwise IoU / IoF between two box sets.

    Args:
        boxes1: (..., M, 4), boxes2: (..., N, 4).
        mode: 'iou' (intersection over union) or 'iof'
            (intersection over the area of boxes1).

    Returns:
        (..., M, N) overlap matrix. Zero-area (padded) boxes give 0.
    """
    assert mode in ("iou", "iof")
    a1 = bbox_area(boxes1)  # (..., M)
    a2 = bbox_area(boxes2)  # (..., N)
    lt = jnp.maximum(boxes1[..., :, None, :2], boxes2[..., None, :, :2])
    rb = jnp.minimum(boxes1[..., :, None, 2:], boxes2[..., None, :, 2:])
    wh = jnp.clip(rb - lt, 0.0)
    inter = wh[..., 0] * wh[..., 1]  # (..., M, N)
    if mode == "iou":
        union = a1[..., :, None] + a2[..., None, :] - inter
    else:
        union = jnp.broadcast_to(a1[..., :, None], inter.shape)
    union = jnp.maximum(union, eps)
    return inter / union


def bbox_clip(boxes: jnp.ndarray, img_shape) -> jnp.ndarray:
    """Clip boxes to ``img_shape = (h, w)`` (arrays or scalars)."""
    h, w = img_shape[0], img_shape[1]
    x1 = jnp.clip(boxes[..., 0], 0, w)
    y1 = jnp.clip(boxes[..., 1], 0, h)
    x2 = jnp.clip(boxes[..., 2], 0, w)
    y2 = jnp.clip(boxes[..., 3], 0, h)
    return jnp.stack([x1, y1, x2, y2], axis=-1)


def bbox_flip(boxes: jnp.ndarray, img_shape, direction: str = "horizontal") -> jnp.ndarray:
    """Flip boxes inside an image of ``img_shape = (h, w)``."""
    h, w = img_shape[0], img_shape[1]
    if direction == "horizontal":
        x1 = w - boxes[..., 2]
        x2 = w - boxes[..., 0]
        return jnp.stack([x1, boxes[..., 1], x2, boxes[..., 3]], axis=-1)
    elif direction == "vertical":
        y1 = h - boxes[..., 3]
        y2 = h - boxes[..., 1]
        return jnp.stack([boxes[..., 0], y1, boxes[..., 2], y2], axis=-1)
    raise ValueError(direction)


def bbox2delta(
    proposals: jnp.ndarray,
    gts: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    eps: float = 1e-6,
) -> jnp.ndarray:
    """Encode gt boxes as (dx, dy, dw, dh) deltas w.r.t. proposals.

    Matches delta_xywh_bbox_coder.py:109-160 semantics.
    """
    px = (proposals[..., 0] + proposals[..., 2]) * 0.5
    py = (proposals[..., 1] + proposals[..., 3]) * 0.5
    pw = proposals[..., 2] - proposals[..., 0]
    ph = proposals[..., 3] - proposals[..., 1]

    gx = (gts[..., 0] + gts[..., 2]) * 0.5
    gy = (gts[..., 1] + gts[..., 3]) * 0.5
    gw = gts[..., 2] - gts[..., 0]
    gh = gts[..., 3] - gts[..., 1]

    pw = jnp.maximum(pw, eps)
    ph = jnp.maximum(ph, eps)
    dx = (gx - px) / pw
    dy = (gy - py) / ph
    dw = jnp.log(jnp.maximum(gw, eps) / pw)
    dh = jnp.log(jnp.maximum(gh, eps) / ph)
    deltas = jnp.stack([dx, dy, dw, dh], axis=-1)

    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    return (deltas - means) / stds


def delta2bbox(
    rois: jnp.ndarray,
    deltas: jnp.ndarray,
    means=(0.0, 0.0, 0.0, 0.0),
    stds=(1.0, 1.0, 1.0, 1.0),
    max_shape=None,
    wh_ratio_clip: float = 16.0 / 1000.0,
) -> jnp.ndarray:
    """Decode deltas w.r.t. rois back into corner boxes.

    Matches delta_xywh_bbox_coder.py:219-299 semantics, including the
    ``wh_ratio_clip`` clamp on dw/dh and optional clip to ``max_shape``.

    Args:
        rois: (..., 4), deltas: (..., K*4) — K classes share the same roi.
    Returns:
        (..., K*4) decoded boxes.
    """
    means = jnp.asarray(means, dtype=deltas.dtype)
    stds = jnp.asarray(stds, dtype=deltas.dtype)
    num_classes = deltas.shape[-1] // 4
    d = deltas.reshape(deltas.shape[:-1] + (num_classes, 4))
    d = d * stds + means

    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[..., 0], d[..., 1]
    dw = jnp.clip(d[..., 2], -max_ratio, max_ratio)
    dh = jnp.clip(d[..., 3], -max_ratio, max_ratio)

    px = ((rois[..., 0] + rois[..., 2]) * 0.5)[..., None]
    py = ((rois[..., 1] + rois[..., 3]) * 0.5)[..., None]
    pw = (rois[..., 2] - rois[..., 0])[..., None]
    ph = (rois[..., 3] - rois[..., 1])[..., None]

    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * jnp.exp(dw)
    gh = ph * jnp.exp(dh)

    x1 = gx - gw * 0.5
    y1 = gy - gh * 0.5
    x2 = gx + gw * 0.5
    y2 = gy + gh * 0.5
    boxes = jnp.stack([x1, y1, x2, y2], axis=-1)
    if max_shape is not None:
        boxes = bbox_clip(boxes, max_shape)
    return boxes.reshape(deltas.shape)
