"""MaxIoU assignment as a static-shape pure function.

Parity target: mmdet/models/task_modules/assigners/max_iou_assigner.py:85
(`assign_wrt_overlaps`):
  1. every prior starts unassigned;
  2. priors with max-IoU < neg_thr → negative (0);
  3. priors with max-IoU >= pos_thr → that gt;
  4. match_low_quality: each gt claims ALL priors tying its best IoU if
     that IoU >= min_pos_iou (gt_max_assign_all=True semantics; later
     gts override earlier ones, reproduced via max-index selection).

Padded (invalid) gts are excluded by forcing their overlaps to -1.
"""
from __future__ import annotations

import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps

NEG = -1  # negative (background) prior
IGNORE = -2  # unassigned / ignored prior


def max_iou_assign(
    priors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float,
    match_low_quality: bool,
    prior_valid: jnp.ndarray = None,
    gt_max_assign_all: bool = True,
):
    """Assign each prior a gt index, NEG or IGNORE.

    Args:
        priors: (N, 4); gt_boxes: (G, 4); gt_valid: (G,) bool.
        prior_valid: optional (N,) bool — invalid priors end up IGNORE.

    Returns:
        assigned: (N,) int32 — gt index in [0, G), NEG, or IGNORE.
        max_overlaps: (N,) float — max IoU with any valid gt.
    """
    overlaps = bbox_overlaps(gt_boxes, priors)  # (G, N)
    overlaps = jnp.where(gt_valid[:, None], overlaps, -1.0)

    max_overlaps = overlaps.max(axis=0)  # (N,)
    argmax_gt = overlaps.argmax(axis=0).astype(jnp.int32)

    assigned = jnp.full(priors.shape[0], IGNORE, dtype=jnp.int32)
    assigned = jnp.where(
        (max_overlaps >= 0) & (max_overlaps < neg_iou_thr), NEG, assigned
    )
    assigned = jnp.where(max_overlaps >= pos_iou_thr, argmax_gt, assigned)

    if match_low_quality:
        gt_max = overlaps.max(axis=1)  # (G,)
        claim = (
            (overlaps == gt_max[:, None])
            & (gt_max[:, None] >= min_pos_iou)
            & gt_valid[:, None]
        )  # (G, N)
        if not gt_max_assign_all:
            # SSD (ssd300.py gt_max_assign_all=False): each gt claims
            # only its single argmax prior, not every tying prior
            argmax_prior = overlaps.argmax(axis=1)  # (G,)
            only = jnp.zeros_like(claim).at[
                jnp.arange(claim.shape[0]), argmax_prior
            ].set(True)
            claim = claim & only
        # later gts override earlier ones → pick the max gt index claiming
        gt_ids = jnp.arange(gt_boxes.shape[0], dtype=jnp.int32)
        claimed_by = jnp.max(
            jnp.where(claim, gt_ids[:, None], -1), axis=0
        )  # (N,)
        assigned = jnp.where(claimed_by >= 0, claimed_by, assigned)

    if prior_valid is not None:
        assigned = jnp.where(prior_valid, assigned, IGNORE)
    return assigned, max_overlaps
