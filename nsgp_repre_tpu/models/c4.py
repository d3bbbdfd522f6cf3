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
from typing import Tuple

import jax.numpy as jnp
from flax import linen as nn

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
    (BBoxHead with_avg_pool=True, bbox_head.py:23)."""

    num_classes: int
    reg_class_agnostic: bool = False

    @nn.compact
    def __call__(self, roi_feats: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(R, 14, 14, 1024) → (cls (R, C+1), reg (R, 4C))."""
        y = ResLayer(stage=3, num_blocks=3, stride=2, style="caffe",
                     name="shared_head")(roi_feats)
        y = jnp.mean(y, axis=(1, 2))  # global average pool → (R, 2048)
        cls = CovDense(self.num_classes + 1,
                       kernel_init=nn.initializers.normal(0.01),
                       name="fc_cls")(y)
        reg_out = 4 if self.reg_class_agnostic else 4 * self.num_classes
        reg = CovDense(reg_out,
                       kernel_init=nn.initializers.normal(0.001),
                       name="fc_reg")(y)
        return cls, reg

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

    def extract_feat(self, images: jnp.ndarray):
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

    def extract_feat(self, images: jnp.ndarray):
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
    branch shares the res5 features — mask head runs on the res5 output
    of the SAME 14x14 RoI features (no separate extractor)."""

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
