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


def _pairwise_iou(a: jnp.ndarray, b: jnp.ndarray) -> jnp.ndarray:
    """(T, 4) x (N, 4) → (T, N) IoU, f32, no HBM-side gathers."""
    x1 = jnp.maximum(a[:, None, 0], b[None, :, 0])
    y1 = jnp.maximum(a[:, None, 1], b[None, :, 1])
    x2 = jnp.minimum(a[:, None, 2], b[None, :, 2])
    y2 = jnp.minimum(a[:, None, 3], b[None, :, 3])
    inter = jnp.maximum(x2 - x1, 0.0) * jnp.maximum(y2 - y1, 0.0)
    area_a = (a[:, 2] - a[:, 0]) * (a[:, 3] - a[:, 1])
    area_b = (b[:, 2] - b[:, 0]) * (b[:, 3] - b[:, 1])
    union = jnp.maximum(area_a[:, None] + area_b[None, :] - inter, 1e-6)
    return inter / union


def nms_matrix(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    tile: int = 512,
):
    """Exact greedy NMS without the per-pick sequential loop.

    Greedy NMS is the unique fixed point of
    ``keep[j] = valid[j] & !any_{i<j}(keep[i] & iou(i,j) > thr)`` over
    score-desc order (the suppression relation is strictly triangular,
    so the recursion is well-founded). This evaluates it by block
    Gauss-Seidel: process score-sorted candidates in tiles of ``tile``;
    positions before the current tile are final, so one (T, N) IoU
    block suppresses the tile by all earlier keeps, and a small Jacobi
    fixed point (while_loop, converges in ≤ chain-depth iterations)
    resolves suppression within the tile. Sequential depth collapses
    from ``max_out`` picks to ``N/tile`` tile steps × a few fixed-point
    iterations; every IoU block is built on the fly from the (N, 4)
    boxes, so nothing N×N ever hits HBM.

    Same contract as ``nms``: (keep_idx (max_out,) int32 in
    descending-score pick order, keep_valid (max_out,) bool). Bit-equal
    keep sets incl. score-tie handling (stable sort = lowest original
    index first, matching argmax tie-breaking).
    """
    n = boxes.shape[0]
    ms = jnp.where(valid, scores, NEG_INF).astype(jnp.float32)
    order = jnp.argsort(-ms, stable=True)
    sb = boxes.astype(jnp.float32)[order]
    vs = jnp.take(ms, order) > NEG_INF / 2

    T = min(tile, n)
    n_pad = (n + T - 1) // T * T
    if n_pad != n:
        sb = jnp.pad(sb, ((0, n_pad - n), (0, 0)))
        vs = jnp.pad(vs, (0, n_pad - n))
    n_tiles = n_pad // T
    pos = jnp.arange(n_pad)
    tri = pos[:T, None] < pos[None, :T]  # i suppresses j within tile iff i<j

    def outer(t, keep):
        start = t * T
        tb = jax.lax.dynamic_slice(sb, (start, 0), (T, 4))
        # single consumer per IoU block so XLA fuses the pairwise math
        # straight into the reduction (nothing (T, N) hits HBM)
        earlier_kept = keep & (pos < start)
        sup0 = jnp.any(
            (_pairwise_iou(tb, sb) > iou_threshold) & earlier_kept[None, :],
            axis=1,
        )
        k0 = jax.lax.dynamic_slice(vs, (start,), (T,)) & ~sup0
        supm = (tri & (_pairwise_iou(tb, tb) > iou_threshold)).astype(
            jnp.float32
        )

        def cond(c):
            i, k, prev = c
            return (i < T) & jnp.any(k != prev)

        def body(c):
            i, k, _ = c
            s = (k.astype(jnp.float32) @ supm) > 0.5
            return i + 1, k0 & ~s, k

        _, k, _ = jax.lax.while_loop(cond, body, (0, k0, ~k0))
        return jax.lax.dynamic_update_slice(keep, k, (start,))

    keep = jax.lax.fori_loop(0, n_tiles, outer, jnp.zeros((n_pad,), bool))

    # first max_out kept positions in sorted (= pick) order; when there
    # are fewer candidates than output slots, the extra slots are invalid
    sel = jnp.argsort(~keep, stable=True)
    if sel.shape[0] < max_out:
        sel = jnp.pad(sel, (0, max_out - sel.shape[0]))
    sel = sel[:max_out]
    keep_valid = jnp.take(keep, sel) & (jnp.arange(max_out) < n_pad)
    keep_idx = jnp.where(keep_valid, jnp.take(order, sel % n), 0)
    return keep_idx.astype(jnp.int32), keep_valid


def batched_nms_matrix(boxes, scores, idxs, valid, iou_threshold, max_out,
                       tile: int = 512):
    """Class/level-aware ``nms_matrix`` via the coordinate-offset trick,
    vmapped over the leading batch dim (same contract as
    ``nms_pallas.batched_nms_pallas``)."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[..., None]
    return jax.vmap(
        lambda b, s, v: nms_matrix(b, s, v, iou_threshold, max_out, tile=tile)
    )(shifted, scores, valid)


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


def soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.3,
    max_out: int = 100,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
):
    """Soft-NMS with static output size (mmcv ``soft_nms`` semantics,
    the ``nms=dict(type='soft_nms')`` test_cfg knob named in the reference
    configs — mmdet/models/layers/bbox_nms.py routes to mmcv.ops.soft_nms).

    Greedy: pick the current max, emit it with its (already decayed)
    score, then DECAY overlapping candidates instead of removing them:
    ``linear``: w = 1 - iou for iou > iou_threshold; ``gaussian``:
    w = exp(-iou^2 / sigma). Candidates whose decayed score falls below
    ``min_score`` are dropped.

    Returns:
        keep_idx: (max_out,) int32 indices into the input.
        keep_valid: (max_out,) bool.
        keep_scores: (max_out,) decayed scores of the kept boxes.
    """
    n = boxes.shape[0]
    live0 = jnp.where(valid & (scores > min_score), scores, NEG_INF)

    def body(i, carry):
        live, keep_idx, keep_valid, keep_scores = carry
        j = jnp.argmax(live)
        s_j = live[j]
        ok = s_j > NEG_INF / 2
        keep_idx = keep_idx.at[i].set(jnp.where(ok, j, 0).astype(jnp.int32))
        keep_valid = keep_valid.at[i].set(ok)
        keep_scores = keep_scores.at[i].set(jnp.where(ok, s_j, 0.0))
        ious = bbox_overlaps(boxes[j][None, :], boxes)[0]  # (N,)
        if method == "gaussian":
            w = jnp.exp(-(ious * ious) / sigma)
        else:  # linear
            w = jnp.where(ious > iou_threshold, 1.0 - ious, 1.0)
        decayed = live * w
        decayed = jnp.where(decayed > min_score, decayed, NEG_INF)
        live = jnp.where(ok, decayed, live).at[j].set(NEG_INF)
        return live, keep_idx, keep_valid, keep_scores

    keep_idx = jnp.zeros((max_out,), jnp.int32)
    keep_valid = jnp.zeros((max_out,), bool)
    keep_scores = jnp.zeros((max_out,), scores.dtype)
    _, keep_idx, keep_valid, keep_scores = jax.lax.fori_loop(
        0, max_out, body, (live0, keep_idx, keep_valid, keep_scores)
    )
    return keep_idx, keep_valid, keep_scores


def batched_soft_nms(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    idxs: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float = 0.3,
    max_out: int = 100,
    sigma: float = 0.5,
    min_score: float = 1e-3,
    method: str = "linear",
):
    """Class-aware soft-NMS via the same coordinate-offset trick."""
    max_coord = jnp.max(jnp.where(valid[:, None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[:, None]
    return soft_nms(
        shifted, scores, valid, iou_threshold, max_out,
        sigma=sigma, min_score=min_score, method=method,
    )
