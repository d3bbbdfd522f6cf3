"""RPN-only and Fast R-CNN detector variants.

Parity targets:
- RPN: mmdet/models/detectors/rpn.py — backbone + neck + RPNHead only;
  ``loss`` is the RPN loss (sampler num=256, add_gt_as_proposals=False,
  cl_faster_rcnn_cfgs/_base_/models/rpn_r50_fpn.py:42-56), ``predict``
  returns the class-agnostic proposals (labels all 0).
- FastRCNN: mmdet/models/detectors/fast_rcnn.py — two-stage detector
  without the RPN; proposals are provided externally
  (cl_faster_rcnn_cfgs/_base_/models/fast-rcnn_r50_fpn.py).

Both reuse the FasterRCNN machinery (flax module inheritance): anchors,
RPN loss/proposals, RoI sampling/align/head, NMS.
"""
from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp

from ..structures.sample import DetBatch, InstanceArray
from .detector import DetectorConfig, FasterRCNN


class RPN(FasterRCNN):
    """Standalone region proposal network (rpn_r50_fpn.py)."""

    def __call__(self, images: jnp.ndarray):
        feats = self.extract_feat(images)
        return self.rpn_head(feats)

    def loss(self, batch: DetBatch, rng: jax.Array, *unused_args, **unused_kw):
        feats = self.extract_feat(batch.images)
        losses, _ = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, rng
        )
        return losses

    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        feats = self.extract_feat(batch.images)
        _, proposals = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, jax.random.PRNGKey(0), with_loss=False
        )
        boxes = proposals.boxes
        if rescale:
            scale = jnp.concatenate(
                [batch.scale_factor, batch.scale_factor], axis=-1
            )
            boxes = boxes / scale[:, None, :]
        return InstanceArray(
            boxes=boxes,
            labels=jnp.zeros(boxes.shape[:2], jnp.int32),
            valid=proposals.valid,
            scores=proposals.scores,
        )


class FastRCNN(FasterRCNN):
    """Two-stage detector fed with external proposals
    (fast_rcnn.py; predict path = StandardRoIHead.predict with given
    rois)."""

    def loss(
        self,
        batch: DetBatch,
        rng: jax.Array,
        proposals: InstanceArray,
        roi_gt: Optional[InstanceArray] = None,
        replay_feats: Optional[jnp.ndarray] = None,
        replay_labels: Optional[jnp.ndarray] = None,
    ):
        feats = self.extract_feat(batch.images)
        roi_gt = roi_gt if roi_gt is not None else batch.gt
        return self.roi_loss(
            feats, proposals, roi_gt, rng,
            replay_feats=replay_feats, replay_labels=replay_labels,
        )

    def predict(
        self, batch: DetBatch, proposals: InstanceArray, rescale: bool = True
    ) -> InstanceArray:
        feats = self.extract_feat(batch.images)
        return self._predict_from_proposals(feats, proposals, batch, rescale)
