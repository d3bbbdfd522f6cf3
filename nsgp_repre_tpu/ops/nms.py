"""Fixed-size greedy NMS for XLA.

Replaces the mmcv native NMS kernels (§2.9 of SURVEY; used by
mmdet/models/dense_heads/rpn_head.py:238-306 proposal post-processing and
mmdet/models/layers/bbox_nms.py:12 ``multiclass_nms``).

Design: exact greedy suppression as a ``lax.fori_loop`` over the output
slots — each step is an argmax + one row of IoUs, O(N) work, fully
vectorizable and `vmap`-able over the batch so the sequential depth is
amortized across images. No dynamic shapes: output is always
``max_out`` indices plus a validity mask.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps

NEG_INF = -1.0e10


def nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
):
    """Greedy NMS with static output size.

    Args:
        boxes: (N, 4) corner boxes.
        scores: (N,) scores.
        valid: (N,) bool mask of candidate boxes.
        iou_threshold: suppression threshold (strictly greater suppresses,
            matching torchvision/mmcv semantics: keep if IoU <= thr).
        max_out: static number of output slots.

    Returns:
        keep_idx: (max_out,) int32 indices into the input (0 for unused slots).
        keep_valid: (max_out,) bool mask of real selections.
    """
    n = boxes.shape[0]
    live_scores0 = jnp.where(valid, scores, NEG_INF)

    def body(i, carry):
        live_scores, keep_idx, keep_valid = carry
        j = jnp.argmax(live_scores)
        ok = live_scores[j] > NEG_INF / 2
        keep_idx = keep_idx.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        keep_valid = keep_valid.at[i].set(ok)
        chosen = boxes[j]
        ious = bbox_overlaps(chosen[None, :], boxes)[0]  # (N,)
        suppress = (ious > iou_threshold) | (jnp.arange(n) == j)
        live_scores = jnp.where(ok & suppress, NEG_INF, live_scores)
        return live_scores, keep_idx, keep_valid

    keep_idx = jnp.zeros((max_out,), dtype=jnp.int32)
    keep_valid = jnp.zeros((max_out,), dtype=bool)
    _, keep_idx, keep_valid = jax.lax.fori_loop(
        0, max_out, body, (live_scores0, keep_idx, keep_valid)
    )
    return keep_idx, keep_valid


def batched_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
):
    """Class/level-aware NMS via the coordinate-offset trick.

    Matches mmcv ``batched_nms`` (used by bbox_nms.py:12): boxes from
    different ``idxs`` groups never suppress each other because each group
    is translated to a disjoint region of the plane.
    """
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return nms(shifted, scores, valid, iou_threshold, max_out)
