"""Caffe-style single-level Faster R-CNN variants: C4 and DC5.

Parity targets (reference config surface):
- faster-rcnn_r50-caffe-c4.py — ResNet-50 through stage 3 (C4, stride
  16, 1024 ch), RPN with scales [2,4,8,16,32] on stride 16, RoIAlign
  14x14, res5 (``ResLayer`` shared head, stride 2, caffe) then global
  average pool into a no-shared-FC bbox head (``BBoxHead
  with_avg_pool=True``).
- faster-rcnn_r50-caffe-dc5.py — ResNet-50 with dilated stage 5
  (strides (1,2,2,1), dilations (1,1,1,2)): C5 at stride 16, 2048 ch;
  standard Shared2FC RoI head on the single level.
- rpn_r50-caffe-c4.py / mask-rcnn_r50-caffe-c4.py reuse the same trunk.

Both reuse the generic FasterRCNN RPN/RoI machinery — a single-level
"pyramid" is just ``anchor_strides=(16,)`` + ``roi_strides=(16,)``
(the level router degenerates to level 0).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..structures.sample import DetBatch, InstanceArray

from .bbox_head import Shared2FCBBoxHeadTask
from .detector import DetectorConfig, FasterRCNN
from .layers import CovDense
from .mask import FCNMaskHead
from .resnet import ResLayer, ResNet50
from .rpn_head import RPNHead


def c4_config(num_classes: int = 80, **overrides) -> DetectorConfig:
    """DetectorConfig preset for the C4/DC5 single-level trunk
    (faster-rcnn_r50-caffe-c4.py train/test cfg)."""
    kw = dict(
        num_classes=num_classes,
        task_split=(0, num_classes),
        anchor_strides=(16,),
        anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
        roi_strides=(16,),
        rpn_nms_pre=6000,
        rpn_max_per_img=1000,
        rcnn_num=512,
    )
    kw.update(overrides)
    return DetectorConfig(**kw)


class C4BBoxHead(nn.Module):
    """res5 shared head + global average pool + plain fc_cls/fc_reg
    (BBoxHead with_avg_pool=True, bbox_head.py:23).

    ``res5``/``heads`` are exposed separately so MaskRCNNC4 can reuse the
    shared res5 RoI features for its mask branch (the reference's
    ``mask_roi_extractor=None`` sharing, mask-rcnn_r50-caffe-c4.py)."""

    num_classes: int
    reg_class_agnostic: bool = False

    def setup(self):
        self.shared_head = ResLayer(stage=3, num_blocks=3, stride=2,
                                    style="caffe")
        self.fc_cls = CovDense(self.num_classes + 1,
                               kernel_init=nn.initializers.normal(0.01))
        reg_out = 4 if self.reg_class_agnostic else 4 * self.num_classes
        self.fc_reg = CovDense(reg_out,
                               kernel_init=nn.initializers.normal(0.001))

    def res5(self, roi_feats: jnp.ndarray) -> jnp.ndarray:
        """(R, 14, 14, 1024) → (R, 7, 7, 2048) shared res5 features."""
        return self.shared_head(roi_feats)

    def heads(self, y5: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        y = jnp.mean(y5, axis=(1, 2))  # global average pool → (R, 2048)
        return self.fc_cls(y), self.fc_reg(y)

    def __call__(self, roi_feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(R, 14, 14, 1024) → (cls (R, C+1), reg (R, 4C))."""
        return self.heads(self.res5(roi_feats))

    def mid_features(self, x: jnp.ndarray) -> jnp.ndarray:
        if x.ndim > 2:
            x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return x


class FasterRCNNC4(FasterRCNN):
    """Faster R-CNN R-50-caffe-C4 (faster-rcnn_r50-caffe-c4.py)."""

    def setup(self):
        cfg = self.config
        self.backbone = ResNet50(
            stage_blocks=cfg.backbone_blocks[:3],
            strides=(1, 2, 2),
            out_indices=(2,),
            style="caffe",
            frozen_stages=cfg.frozen_stages,
            name="backbone",
        )
        self.rpn_head = RPNHead(
            feat_channels=1024, num_base_priors=cfg.num_base_priors, name="rpn_head"
        )
        self.bbox_head = C4BBoxHead(num_classes=cfg.num_classes, name="bbox_head")
        from ..ops.anchors import AnchorGenerator

        self.anchor_gen = AnchorGenerator(
            strides=cfg.anchor_strides,
            ratios=cfg.anchor_ratios,
            scales=cfg.anchor_scales,
        )

    def extract_feat(self, images: jnp.ndarray, inference: bool = False):
        # ``inference`` accepted for base-class predict-path parity; the
        # C4 backbone has no fused inference rewrite.
        return self.backbone(images.astype(self._dtype))

    def __call__(self, images: jnp.ndarray):
        feats = self.extract_feat(images)
        cls_maps, reg_maps = self.rpn_head(feats)
        dummy = jnp.zeros((1, 14, 14, 1024), cls_maps[0].dtype)
        self.bbox_head(dummy)
        return cls_maps, reg_maps

    def _roi_feats(self, feats, rois, batch_idx):
        # always the XLA gather path: with a single stride-16 level there
        # is no coarser level to bump to, so the Pallas window kernel's
        # fit guarantee does not hold for near-canvas-sized rois
        from ..ops.roi_align import multilevel_roi_align

        cfg = self.config
        fs = [feats[0].astype(self._dtype)]
        return multilevel_roi_align(
            fs, rois, batch_idx,
            strides=cfg.roi_strides,
            output_size=14,
            sampling_ratio=cfg.roi_sampling_ratio,
            finest_scale=cfg.roi_finest_scale,
        ).astype(self._dtype)


class FasterRCNNDC5(FasterRCNN):
    """Faster R-CNN R-50-caffe-DC5 (faster-rcnn_r50-caffe-dc5.py)."""

    def setup(self):
        cfg = self.config
        self.backbone = ResNet50(
            stage_blocks=cfg.backbone_blocks,
            strides=(1, 2, 2, 1),
            dilations=(1, 1, 1, 2),
            out_indices=(3,),
            style="caffe",
            frozen_stages=cfg.frozen_stages,
            name="backbone",
        )
        self.rpn_head = RPNHead(
            feat_channels=2048, num_base_priors=cfg.num_base_priors, name="rpn_head"
        )
        self.bbox_head = Shared2FCBBoxHeadTask(
            task_split=cfg.task_split,
            task_id=cfg.task_id,
            num_classes=cfg.num_classes,
            name="bbox_head",
        )
        from ..ops.anchors import AnchorGenerator

        self.anchor_gen = AnchorGenerator(
            strides=cfg.anchor_strides,
            ratios=cfg.anchor_ratios,
            scales=cfg.anchor_scales,
        )

    def extract_feat(self, images: jnp.ndarray, inference: bool = False):
        # ``inference`` accepted for base-class predict-path parity; the
        # C4 backbone has no fused inference rewrite.
        return self.backbone(images.astype(self._dtype))

    def __call__(self, images: jnp.ndarray):
        feats = self.extract_feat(images)
        cls_maps, reg_maps = self.rpn_head(feats)
        dummy = jnp.zeros(
            (1, self.config.roi_out_size, self.config.roi_out_size, 2048),
            cls_maps[0].dtype,
        )
        self.bbox_head(dummy)
        return cls_maps, reg_maps


class MaskRCNNC4(FasterRCNNC4):
    """Mask R-CNN R-50-caffe-C4 (mask-rcnn_r50-caffe-c4.py): the mask
    branch shares the res5 features — ``mask_roi_extractor=None`` in the
    reference config means the FCNMaskHead(num_convs=0) runs on the res5
    output of the SAME 14x14 RoI features (7x7x2048), whose 2x deconv
    yields 14x14 class logits; ``train_cfg.rcnn.mask_size=14``."""

    def setup(self):
        super().setup()
        self.mask_head = FCNMaskHead(
            num_classes=self.config.num_classes, num_convs=0,
            channels=256, name="mask_head",
        )

    def __call__(self, images: jnp.ndarray):
        out = super().__call__(images)
        self.mask_head(jnp.zeros((1, 7, 7, 2048), jnp.float32))
        return out

    @property
    def _mask_size(self) -> int:
        # train_cfg.rcnn.mask_size=14 (mask-rcnn_r50-caffe-c4.py); read
        # from the config when a MaskRCNNConfig is supplied.
        return int(getattr(self.config, "mask_size", 14))

    def loss(
        self,
        batch: DetBatch,
        rng: jax.Array,
        rpn_gt: Optional[InstanceArray] = None,
        roi_gt: Optional[InstanceArray] = None,
        replay_feats=None,
        replay_labels=None,
    ):
        """MaskRCNN.loss with the C4 shared-head feature path: res5 runs
        once, feeding both the bbox head (avg-pool + fcs) and the mask
        head (mask_rcnn.py via StandardRoIHead._mask_forward shared_head
        path)."""
        cfg = self.config
        feats = self.extract_feat(batch.images)
        rpn_gt = rpn_gt if rpn_gt is not None else batch.gt
        roi_gt = roi_gt if roi_gt is not None else batch.gt
        k1, k2 = jax.random.split(rng)
        rpn_losses, proposals = self.rpn_loss_and_proposals(
            feats, rpn_gt, batch.img_shape, k1
        )
        rois, batch_idx, labels, valid, pos, tgt = self._sample_rois(
            proposals, roi_gt, k2
        )
        roi_feats = self._roi_feats(feats, rois, batch_idx)
        y5 = self.bbox_head.res5(roi_feats)  # (N, 7, 7, 2048) shared
        cls_score, bbox_pred = self.bbox_head.heads(y5)
        cls_score = cls_score.astype(jnp.float32)
        bbox_pred = bbox_pred.astype(jnp.float32)

        from .losses import accuracy, weighted_l1, weighted_softmax_ce

        label_w = valid.astype(jnp.float32)
        avg = jnp.maximum(label_w.sum(), 1.0)
        n = bbox_pred.shape[0]
        pred4 = bbox_pred.reshape(n, cfg.num_classes, 4)
        sel = jnp.take_along_axis(
            pred4,
            jnp.clip(labels, 0, cfg.num_classes - 1)[:, None, None].repeat(4, -1),
            axis=1,
        )[:, 0]
        losses = dict(rpn_losses)
        losses["loss_cls"] = weighted_softmax_ce(cls_score, labels, label_w, avg)
        losses["loss_bbox"] = weighted_l1(sel, tgt, pos[:, None].astype(jnp.float32), avg)
        losses["acc"] = accuracy(cls_score, labels, label_w)

        if roi_gt.masks is not None:
            mask_size = self._mask_size
            mask_logits = self.mask_head(y5).astype(jnp.float32)  # (N,14,14,C)
            gt_boxes_flat = roi_gt.boxes
            gt_masks_flat = roi_gt.masks.astype(jnp.float32)

            from ..structures.boxes import bbox_overlaps
            from .mask import _resample_normalized

            def one_roi(roi, bidx):
                ious = bbox_overlaps(roi[None, :], gt_boxes_flat[bidx])[0]
                ious = jnp.where(roi_gt.valid[bidx], ious, -1.0)
                g = jnp.argmax(ious)
                t = _resample_normalized(
                    gt_masks_flat[bidx, g], roi, gt_boxes_flat[bidx, g], mask_size
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
            num_pos = jnp.maximum(w.sum(), 1.0)
            losses["loss_mask"] = (bce.mean(axis=(1, 2)) * w).sum() / num_pos
        if replay_feats is not None:
            losses["replay_loss_cls"] = self.replay_loss(replay_feats, replay_labels)
        return losses

    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        """Detect, then run the mask branch on the detected boxes through
        the same RoIAlign-14 + res5 path (StandardRoIHead.predict_mask)."""
        cfg = self.config
        feats = self.extract_feat(batch.images)
        _, proposals = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, jax.random.PRNGKey(0), with_loss=False
        )
        dets = self._predict_from_proposals(feats, proposals, batch, rescale)
        B, D = dets.boxes.shape[:2]
        boxes_img = dets.boxes
        if rescale:
            scale = jnp.concatenate([batch.scale_factor, batch.scale_factor], -1)
            boxes_img = dets.boxes * scale[:, None, :]
        rois = boxes_img.reshape(-1, 4)
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, D)
        ).reshape(-1)
        m_feats = self._roi_feats(feats, rois, bidx)
        y5 = self.bbox_head.res5(m_feats)
        logits = self.mask_head(y5).astype(jnp.float32)  # (B*D,14,14,C)
        lbl = jnp.clip(dets.labels.reshape(-1), 0, cfg.num_classes - 1)
        per_det = jnp.take_along_axis(
            logits, lbl[:, None, None, None], axis=-1
        )[..., 0]
        mask_size = self._mask_size
        probs = jax.nn.sigmoid(per_det).reshape(B, D, mask_size, mask_size)
        return dets.replace(masks=probs)
