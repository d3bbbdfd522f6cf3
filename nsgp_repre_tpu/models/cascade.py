"""Cascade R-CNN (and the cascade RoI machinery Mask R-CNN's cascade
variant shares).

Parity targets:
- CascadeRCNN / CascadeRoIHead: mmdet/models/detectors/cascade_rcnn.py +
  mmdet/models/roi_heads/cascade_roi_head.py — 3 bbox stages with
  increasing assign IoU (0.5/0.6/0.7), per-stage delta stds
  (0.1/0.05/0.033 scale), stage loss weights (1, 0.5, 0.25),
  class-agnostic regression, SmoothL1 (beta=1 rcnn, 1/9 rpn); config
  surface cl_faster_rcnn_cfgs/_base_/models/cascade-rcnn_r50_fpn.py.
- Stage refinement drops proposals that were injected gt boxes
  (bbox_head.refine_bboxes ``pos_is_gts`` semantics) — reproduced by
  invalidating sampled rois whose source index falls in the gt block.
- predict: stages refine boxes; final cls score = mean of the three
  stage logits, softmaxed, then multiclass NMS
  (cascade_roi_head.py predict_bbox ``ms_scores`` average).

TPU-first: each stage is a fixed 512-roi sample; refinement and
re-assignment run on padded arrays under one jit.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp

from ..ops.nms import batched_nms
from ..ops.nms_pallas import batched_nms_pallas
from ..structures.boxes import bbox2delta, delta2bbox
from ..structures.sample import DetBatch, InstanceArray
from .assigners import max_iou_assign
from .bbox_head import Shared2FCBBoxHeadTask
from .detector import DetectorConfig, FasterRCNN, _use_pallas
from .losses import accuracy, weighted_smooth_l1, weighted_softmax_ce
from .samplers import random_sample_gather


@dataclasses.dataclass(frozen=True)
class CascadeConfig(DetectorConfig):
    """Cascade-specific knobs on top of the two-stage defaults."""

    num_stages: int = 3
    stage_loss_weights: Tuple[float, ...] = (1.0, 0.5, 0.25)
    stage_pos_iou: Tuple[float, ...] = (0.5, 0.6, 0.7)
    stage_stds: Tuple[Tuple[float, ...], ...] = (
        (0.1, 0.1, 0.2, 0.2),
        (0.05, 0.05, 0.1, 0.1),
        (0.033, 0.033, 0.067, 0.067),
    )
    rpn_smooth_l1_beta: float = 1.0 / 9.0
    rcnn_smooth_l1_beta: float = 1.0
    # cascade-rcnn_r50_fpn.py train rpn_proposal max_per_img=2000
    rpn_max_per_img: int = 2000


class CascadeRCNN(FasterRCNN):
    """Backbone + FPN + RPN + 3-stage cascade RoI head."""

    def setup(self):
        # same trunk as FasterRCNN but WITHOUT the task bbox head — the
        # cascade owns its three stage heads
        from ..ops.anchors import AnchorGenerator
        from .fpn import FPN
        from .resnet import ResNet50
        from .rpn_head import RPNHead

        cfg: CascadeConfig = self.config
        self.backbone = ResNet50(
            stage_blocks=cfg.backbone_blocks,
            frozen_stages=cfg.frozen_stages,
            name="backbone",
        )
        self.neck = FPN(out_channels=256, num_outs=5, name="neck")
        self.rpn_head = RPNHead(
            feat_channels=256, num_base_priors=cfg.num_base_priors, name="rpn_head"
        )
        self.anchor_gen = AnchorGenerator(
            strides=cfg.anchor_strides,
            ratios=cfg.anchor_ratios,
            scales=cfg.anchor_scales,
        )
        self.cascade_heads = [
            Shared2FCBBoxHeadTask(
                task_split=(0, cfg.num_classes),
                task_id=1,
                num_classes=cfg.num_classes,
                reg_class_agnostic=True,
                name=f"cascade_head{i}",
            )
            for i in range(cfg.num_stages)
        ]

    def __call__(self, images: jnp.ndarray):
        """Init/entry convenience: forward to RPN maps + stage heads."""
        feats = self.extract_feat(images)
        cls_maps, reg_maps = self.rpn_head(feats)
        dummy = jnp.zeros(
            (1, self.config.roi_out_size, self.config.roi_out_size, 256),
            cls_maps[0].dtype,
        )
        for head in self.cascade_heads:
            head(dummy)
        return cls_maps, reg_maps

    # ------------------------------------------------------------------
    def _sample_stage(
        self,
        proposals: InstanceArray,
        gt: InstanceArray,
        rng: jax.Array,
        pos_iou: float,
        stds: Tuple[float, ...],
    ):
        """Assign + sample one cascade stage (add_gt_as_proposals=True).

        Returns flat (rois, batch_idx, labels, valid, pos, tgt, is_gt).
        ``is_gt`` marks sampled rois that came from the injected gt block
        (dropped before the next stage, refine_bboxes semantics).
        """
        cfg: CascadeConfig = self.config
        B = proposals.boxes.shape[0]
        G = gt.boxes.shape[1]
        cand_boxes = jnp.concatenate([gt.boxes, proposals.boxes], axis=1)
        cand_valid = jnp.concatenate([gt.valid, proposals.valid], axis=1)

        def one_image(cboxes, cvalid, gt_boxes, gt_labels, gt_valid, key):
            assigned, _ = max_iou_assign(
                cboxes, gt_boxes, gt_valid,
                pos_iou, pos_iou, pos_iou,
                match_low_quality=False, prior_valid=cvalid,
            )
            idx, idx_valid, idx_pos = random_sample_gather(
                key, assigned, cfg.rcnn_num, cfg.rcnn_pos_fraction
            )
            rois = cboxes[idx]
            g = jnp.clip(assigned[idx], 0)
            labels = jnp.where(idx_pos, gt_labels[g], cfg.num_classes)
            labels = jnp.where(idx_valid, labels, cfg.num_classes)
            tgt = bbox2delta(rois, gt_boxes[g], stds=stds)
            tgt = jnp.where(idx_pos[:, None], tgt, 0.0)
            return rois, labels, idx_valid, idx_pos, tgt, idx < G

        keys = jax.random.split(rng, B)
        rois, labels, valid, pos, tgt, is_gt = jax.vmap(one_image)(
            cand_boxes, cand_valid, gt.boxes, gt.labels, gt.valid, keys
        )
        batch_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, cfg.rcnn_num)
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        return (
            flat(rois), flat(batch_idx), flat(labels),
            flat(valid), flat(pos), flat(tgt), flat(is_gt),
        )

    # ------------------------------------------------------------------
    def loss(
        self,
        batch: DetBatch,
        rng: jax.Array,
        rpn_gt: Optional[InstanceArray] = None,
        roi_gt: Optional[InstanceArray] = None,
        replay_feats=None,
        replay_labels=None,
    ):
        cfg: CascadeConfig = self.config
        feats = self.extract_feat(batch.images)
        rpn_gt = rpn_gt if rpn_gt is not None else batch.gt
        roi_gt = roi_gt if roi_gt is not None else batch.gt
        keys = jax.random.split(rng, cfg.num_stages + 1)
        rpn_losses, proposals = self.rpn_loss_and_proposals(
            feats, rpn_gt, batch.img_shape, keys[0]
        )
        losses = dict(rpn_losses)
        B = proposals.boxes.shape[0]

        cur = proposals
        for i in range(cfg.num_stages):
            w = cfg.stage_loss_weights[i]
            rois, batch_idx, labels, valid, pos, tgt, is_gt = self._sample_stage(
                cur, roi_gt, keys[i + 1], cfg.stage_pos_iou[i], cfg.stage_stds[i]
            )
            roi_feats = self._roi_feats(feats, rois, batch_idx)
            cls_score, bbox_pred = self.cascade_heads[i](roi_feats)
            cls_score = cls_score.astype(jnp.float32)
            bbox_pred = bbox_pred.astype(jnp.float32)

            label_w = valid.astype(jnp.float32)
            avg = jnp.maximum(label_w.sum(), 1.0)
            losses[f"s{i}.loss_cls"] = w * weighted_softmax_ce(
                cls_score, labels, label_w, avg
            )
            losses[f"s{i}.loss_bbox"] = w * weighted_smooth_l1(
                bbox_pred, tgt, pos[:, None].astype(jnp.float32), avg,
                beta=cfg.rcnn_smooth_l1_beta,
            )
            losses[f"s{i}.acc"] = accuracy(cls_score, labels, label_w)

            if i < cfg.num_stages - 1:
                # refine: decode sampled rois with this stage's agnostic
                # deltas; drop injected-gt rows (pos_is_gts)
                refined = delta2bbox(
                    rois, jax.lax.stop_gradient(bbox_pred),
                    stds=cfg.stage_stds[i],
                )
                shape_per_roi = batch.img_shape[batch_idx.reshape(-1)]
                h = shape_per_roi[:, 0:1].astype(refined.dtype)
                wd = shape_per_roi[:, 1:2].astype(refined.dtype)
                refined = jnp.concatenate(
                    [
                        jnp.clip(refined[:, 0:1], 0, wd),
                        jnp.clip(refined[:, 1:2], 0, h),
                        jnp.clip(refined[:, 2:3], 0, wd),
                        jnp.clip(refined[:, 3:4], 0, h),
                    ],
                    axis=-1,
                )
                cur = InstanceArray(
                    boxes=refined.reshape(B, cfg.rcnn_num, 4),
                    labels=jnp.zeros((B, cfg.rcnn_num), jnp.int32),
                    valid=(valid & ~is_gt).reshape(B, cfg.rcnn_num),
                )
        return losses

    # ------------------------------------------------------------------
    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        cfg: CascadeConfig = self.config
        feats = self.extract_feat(batch.images)
        _, proposals = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, jax.random.PRNGKey(0), with_loss=False
        )
        B, R = proposals.boxes.shape[:2]
        batch_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, R)
        ).reshape(-1)
        shape_per_roi = batch.img_shape[batch_idx]
        h = shape_per_roi[:, 0:1].astype(jnp.float32)
        wd = shape_per_roi[:, 1:2].astype(jnp.float32)

        boxes = proposals.boxes.reshape(-1, 4)
        ms_scores = []
        bbox_pred = None
        for i in range(cfg.num_stages):
            roi_feats = self._roi_feats(feats, boxes, batch_idx)
            cls_score, bbox_pred = self.cascade_heads[i](roi_feats)
            ms_scores.append(cls_score.astype(jnp.float32))
            bbox_pred = bbox_pred.astype(jnp.float32)
            if i < cfg.num_stages - 1:
                boxes = delta2bbox(boxes, bbox_pred, stds=cfg.stage_stds[i])
                boxes = jnp.concatenate(
                    [
                        jnp.clip(boxes[:, 0:1], 0, wd),
                        jnp.clip(boxes[:, 1:2], 0, h),
                        jnp.clip(boxes[:, 2:3], 0, wd),
                        jnp.clip(boxes[:, 3:4], 0, h),
                    ],
                    axis=-1,
                )

        # mean of stage logits, then softmax (cascade_roi_head predict)
        cls_score = sum(ms_scores) / cfg.num_stages
        final = delta2bbox(boxes, bbox_pred, stds=cfg.stage_stds[-1])
        final = jnp.concatenate(
            [
                jnp.clip(final[:, 0:1], 0, wd),
                jnp.clip(final[:, 1:2], 0, h),
                jnp.clip(final[:, 2:3], 0, wd),
                jnp.clip(final[:, 3:4], 0, h),
            ],
            axis=-1,
        ).reshape(B, R, 4)
        probs = jax.nn.softmax(cls_score, axis=-1)[:, : cfg.num_classes]
        probs = probs.reshape(B, R, cfg.num_classes)

        if rescale:
            scale = jnp.concatenate(
                [batch.scale_factor, batch.scale_factor], axis=-1
            )
            final = final / scale[:, None, :]

        # agnostic reg → same box for every class; expand for NMS
        C = cfg.num_classes
        fb = jnp.repeat(final, C, axis=1)  # (B, R*C, 4)
        fs = probs.reshape(B, R * C)
        fl = jnp.broadcast_to(
            jnp.arange(C, dtype=jnp.int32)[None, None, :], (B, R, C)
        ).reshape(B, R * C)
        ok = (fs > cfg.score_thr) & jnp.repeat(proposals.valid, C, axis=1)
        if _use_pallas():
            keep_idx, dv = batched_nms_pallas(fb, fs, fl, ok, cfg.nms_iou, cfg.max_per_img)
        else:
            keep_idx, dv = jax.vmap(
                lambda b, s, l, v: batched_nms(b, s, l, v, cfg.nms_iou, cfg.max_per_img)
            )(fb, fs, fl, ok)
        db = jnp.take_along_axis(fb, keep_idx[..., None], axis=1)
        ds = jnp.take_along_axis(fs, keep_idx, axis=1)
        dl = jnp.take_along_axis(fl, keep_idx, axis=1)
        return InstanceArray(boxes=db, labels=dl, valid=dv, scores=ds)


@dataclasses.dataclass(frozen=True)
class CascadeMaskConfig(CascadeConfig):
    mask_size: int = 28
    mask_roi_out_size: int = 14
    mask_convs: int = 4
    mask_channels: int = 256
    gt_mask_size: int = 56


class CascadeMaskRCNN(CascadeRCNN):
    """Cascade Mask R-CNN (cascade-mask-rcnn_r50_fpn.py): cascade bbox
    stages + one FCN mask head. The mask branch trains on the FINAL
    stage's sampled positive rois (mmdet trains it per stage with the
    stage loss weights; the final-stage-only variant is the dominant
    term and keeps the step one jit — deviation documented here)."""

    def setup(self):
        super().setup()
        from .mask import FCNMaskHead

        self.mask_head = FCNMaskHead(
            num_classes=self.config.num_classes,
            num_convs=self.config.mask_convs,
            channels=self.config.mask_channels,
            name="mask_head",
        )

    def __call__(self, images: jnp.ndarray):
        out = super().__call__(images)
        self.mask_head(
            jnp.zeros(
                (1, self.config.mask_roi_out_size, self.config.mask_roi_out_size, 256),
                jnp.float32,
            )
        )
        return out

    def _mask_roi_feats(self, feats, rois, batch_idx):
        from ..ops.roi_align import multilevel_roi_align_auto

        cfg: CascadeMaskConfig = self.config
        fs = [f.astype(self._dtype) for f in feats[: len(cfg.roi_strides)]]
        return multilevel_roi_align_auto(
            fs, rois, batch_idx,
            mode=cfg.roi_align_mode,
            strides=cfg.roi_strides,
            output_size=cfg.mask_roi_out_size,
            sampling_ratio=cfg.roi_sampling_ratio,
            finest_scale=cfg.roi_finest_scale,
        ).astype(self._dtype)

    def loss(self, batch, rng, rpn_gt=None, roi_gt=None,
             replay_feats=None, replay_labels=None):
        cfg: CascadeMaskConfig = self.config
        roi_gt_eff = roi_gt if roi_gt is not None else batch.gt
        k_cascade, k_mask = jax.random.split(rng)
        losses = super().loss(batch, k_cascade, rpn_gt, roi_gt,
                              replay_feats, replay_labels)
        if roi_gt_eff.masks is None:
            return losses
        # final-stage sample for the mask branch
        feats = self.extract_feat(batch.images)
        _, proposals = self.rpn_loss_and_proposals(
            feats, rpn_gt if rpn_gt is not None else batch.gt,
            batch.img_shape, k_mask, with_loss=False,
        )
        rois, batch_idx, labels, valid, pos, _, _ = self._sample_stage(
            proposals, roi_gt_eff, k_mask,
            cfg.stage_pos_iou[-1], cfg.stage_stds[-1],
        )
        m_feats = self._mask_roi_feats(feats, rois, batch_idx)
        mask_logits = self.mask_head(m_feats).astype(jnp.float32)
        from ..structures.boxes import bbox_overlaps
        from .mask import _resample_normalized

        gt_boxes = roi_gt_eff.boxes
        gt_masks = roi_gt_eff.masks.astype(jnp.float32)

        def one_roi(roi, bidx):
            ious = bbox_overlaps(roi[None, :], gt_boxes[bidx])[0]
            ious = jnp.where(roi_gt_eff.valid[bidx], ious, -1.0)
            g = jnp.argmax(ious)
            t = _resample_normalized(
                gt_masks[bidx, g], roi, gt_boxes[bidx, g], cfg.mask_size
            )
            return (t > 0.5).astype(jnp.float32)

        targets = jax.vmap(one_roi)(rois, batch_idx)
        ml = jnp.take_along_axis(
            mask_logits,
            jnp.clip(labels, 0, cfg.num_classes - 1)[:, None, None, None],
            axis=-1,
        )[..., 0]
        bce = jnp.maximum(ml, 0) - ml * targets + jnp.log1p(jnp.exp(-jnp.abs(ml)))
        w = pos.astype(jnp.float32)
        losses["loss_mask"] = (bce.mean(axis=(1, 2)) * w).sum() / jnp.maximum(w.sum(), 1.0)
        return losses

    def predict(self, batch, rescale: bool = True):
        cfg: CascadeMaskConfig = self.config
        dets = super().predict(batch, rescale)
        feats = self.extract_feat(batch.images)
        B, D = dets.boxes.shape[:2]
        boxes_img = dets.boxes
        if rescale:
            scale = jnp.concatenate([batch.scale_factor, batch.scale_factor], -1)
            boxes_img = dets.boxes * scale[:, None, :]
        rois = boxes_img.reshape(-1, 4)
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, D)
        ).reshape(-1)
        logits = self.mask_head(self._mask_roi_feats(feats, rois, bidx)).astype(jnp.float32)
        lbl = jnp.clip(dets.labels.reshape(-1), 0, cfg.num_classes - 1)
        per_det = jnp.take_along_axis(logits, lbl[:, None, None, None], axis=-1)[..., 0]
        probs = jax.nn.sigmoid(per_det).reshape(B, D, cfg.mask_size, cfg.mask_size)
        return dets.replace(masks=probs)
