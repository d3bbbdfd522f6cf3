"""Teacher pseudo-label merging (in-graph, static shapes).

Parity target: faster_rcnn_roi_replay.py:65-109 — the previous-task
teacher predicts (rescale=False); each pseudo box is
- skipped when its max IoU with the real gt exceeds 0.7;
- appended to the RPN gt set when score > rpn_thresh (0.5);
- appended to the RoI gt set when score > roi_thresh (0.7).

The torch version mutates InstanceData lists per image; here the merge is
one vmapped concat of padded arrays with validity masks.
"""
from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from ..structures.boxes import bbox_overlaps
from ..structures.sample import InstanceArray


def merge_pseudo_labels(
    gt: InstanceArray,
    teacher_dets: InstanceArray,
    rpn_thresh: float = 0.5,
    roi_thresh: float = 0.7,
    iou_skip: float = 0.7,
) -> Tuple[InstanceArray, InstanceArray]:
    """Returns (rpn_gt, roi_gt), capacity = gt.capacity + dets.capacity."""

    def one(gt_boxes, gt_labels, gt_valid, d_boxes, d_labels, d_valid, d_scores):
        iou = bbox_overlaps(d_boxes, gt_boxes)  # (D, G)
        iou = jnp.where(gt_valid[None, :], iou, 0.0)
        max_iou = iou.max(axis=1)
        base = d_valid & (max_iou <= iou_skip)
        rpn_keep = base & (d_scores > rpn_thresh)
        roi_keep = base & (d_scores > roi_thresh)

        def cat(keep):
            return InstanceArray(
                boxes=jnp.concatenate([gt_boxes, jnp.where(keep[:, None], d_boxes, 0.0)]),
                labels=jnp.concatenate([gt_labels, jnp.where(keep, d_labels, -1)]),
                valid=jnp.concatenate([gt_valid, keep]),
            )

        return cat(rpn_keep), cat(roi_keep)

    return jax.vmap(one)(
        gt.boxes, gt.labels, gt.valid,
        teacher_dets.boxes, teacher_dets.labels, teacher_dets.valid,
        teacher_dets.scores,
    )
