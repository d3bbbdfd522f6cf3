"""Single-stage detectors: RetinaNet (and the shared dense-head predict
machinery).

Parity targets:
- SingleStageDetector: mmdet/models/detectors/single_stage.py (loss/predict)
- RetinaHead: mmdet/models/dense_heads/retina_head.py (4 stacked 3x3
  convs per tower, cls prior bias), anchor settings from
  cl_faster_rcnn_cfgs/_base_/models/retinanet_r50_fpn.py:29-49
  (octave_base_scale=4, scales_per_octave=3, strides 8..128)
- FocalLoss: mmdet/models/losses/focal_loss.py (sigmoid, gamma=2,
  alpha=0.25), assigner 0.5/0.4/0 with PseudoSampler
  (retinanet_r50_fpn.py:51-62)
- predict: AnchorHead.predict_by_feat → filter_scores_and_topk per level
  (nms_pre=1000), decode, class-aware NMS 0.5, top 100
  (retinanet_r50_fpn.py:63-68)

TPU-first: anchors are static constants; per-level top-k uses
``fast_top_k``; NMS is the shared Pallas/XLA fixed-size kernel. All
shapes static.
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.anchors import AnchorGenerator
from ..ops.nms import batched_nms
from ..ops.nms_pallas import batched_nms_pallas
from ..ops.topk import fast_top_k
from ..structures.boxes import bbox2delta, delta2bbox
from ..structures.sample import DetBatch, InstanceArray
from .assigners import NEG, max_iou_assign
from .detector import _use_pallas
from .fpn import FPN
from .layers import CovConv
from .losses import weighted_l1, weighted_sigmoid_focal
from .resnet import ResNet50


@dataclasses.dataclass(frozen=True)
class RetinaNetConfig:
    """Static hyperparameters (retinanet_r50_fpn.py)."""

    num_classes: int = 20
    # anchors (octave scales: 4 * 2^(k/3))
    anchor_strides: Tuple[int, ...] = (8, 16, 32, 64, 128)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    octave_base_scale: float = 4.0
    scales_per_octave: int = 3
    # head
    feat_channels: int = 256
    stacked_convs: int = 4
    # assign (train_cfg)
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.4
    min_pos_iou: float = 0.0
    # focal loss
    focal_gamma: float = 2.0
    focal_alpha: float = 0.25
    # test cfg
    nms_pre: int = 1000
    score_thr: float = 0.05
    nms_iou: float = 0.5
    max_per_img: int = 100
    # backbone
    backbone_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    frozen_stages: int = 1
    compute_dtype: str = "float32"
    use_approx_topk: bool = True
    pad_size_divisor: int = 32

    @property
    def anchor_scales(self) -> Tuple[float, ...]:
        return tuple(
            self.octave_base_scale * 2.0 ** (k / self.scales_per_octave)
            for k in range(self.scales_per_octave)
        )

    @property
    def num_base_priors(self) -> int:
        return len(self.anchor_ratios) * self.scales_per_octave


class RetinaHead(nn.Module):
    """Cls/reg conv towers shared across pyramid levels
    (retina_head.py:16-84)."""

    num_classes: int
    feat_channels: int = 256
    stacked_convs: int = 4
    num_base_priors: int = 9

    @nn.compact
    def __call__(self, feats):
        init = nn.initializers.normal(0.01)
        cls_tower = [
            CovConv(self.feat_channels, (3, 3), (1, 1), (1, 1),
                    kernel_init=init, name=f"cls_conv{i}")
            for i in range(self.stacked_convs)
        ]
        reg_tower = [
            CovConv(self.feat_channels, (3, 3), (1, 1), (1, 1),
                    kernel_init=init, name=f"reg_conv{i}")
            for i in range(self.stacked_convs)
        ]
        # prior-probability bias so initial focal loss is stable
        # (retina_head.py init_cfg: bias_prob=0.01)
        prior_bias = float(-np.log((1 - 0.01) / 0.01))
        retina_cls = CovConv(
            self.num_base_priors * self.num_classes, (3, 3), (1, 1), (1, 1),
            kernel_init=init,
            bias_init=nn.initializers.constant(prior_bias),
            name="retina_cls",
        )
        retina_reg = CovConv(
            self.num_base_priors * 4, (3, 3), (1, 1), (1, 1),
            kernel_init=init, name="retina_reg",
        )
        cls_out, reg_out = [], []
        for f in feats:
            c = r = f
            for conv in cls_tower:
                c = nn.relu(conv(c))
            for conv in reg_tower:
                r = nn.relu(conv(r))
            cls_out.append(retina_cls(c))
            reg_out.append(retina_reg(r))
        return cls_out, reg_out


class RetinaNet(nn.Module):
    """Backbone + FPN(start_level=1, extra convs on input) + RetinaHead."""

    config: RetinaNetConfig

    def setup(self):
        cfg = self.config
        self.backbone = ResNet50(
            stage_blocks=cfg.backbone_blocks,
            frozen_stages=cfg.frozen_stages,
            name="backbone",
        )
        self.neck = FPN(
            out_channels=256, num_outs=5, start_level=1,
            add_extra_convs="on_input", name="neck",
        )
        self.bbox_head = RetinaHead(
            num_classes=cfg.num_classes,
            feat_channels=cfg.feat_channels,
            stacked_convs=cfg.stacked_convs,
            num_base_priors=cfg.num_base_priors,
            name="bbox_head",
        )
        self.anchor_gen = AnchorGenerator(
            strides=cfg.anchor_strides,
            ratios=cfg.anchor_ratios,
            scales=cfg.anchor_scales,
        )

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32

    def extract_feat(self, images: jnp.ndarray, inference: bool = False):
        # ``inference`` accepted for API parity with FasterRCNN; no
        # fused inference rewrite on single-stage paths.
        return self.neck(self.backbone(images.astype(self._dtype)))

    def __call__(self, images: jnp.ndarray):
        feats = self.extract_feat(images)
        return self.bbox_head(feats)

    # ------------------------------------------------------------------
    def _anchors(self, feats):
        sizes = [(f.shape[1], f.shape[2]) for f in feats]
        per_level = self.anchor_gen.grid_anchors(sizes)
        return jnp.asarray(np.concatenate(per_level, axis=0)), sizes

    def _anchor_valid(self, sizes, img_shape) -> jnp.ndarray:
        """Pad-shape anchor validity (same semantics as
        FasterRCNN._anchor_valid; allowed_border=-1)."""
        div = float(self.config.pad_size_divisor)
        pad_h = jnp.ceil(img_shape[0] / div) * div
        pad_w = jnp.ceil(img_shape[1] / div) * div
        flags = []
        for (fh, fw), stride in zip(sizes, self.config.anchor_strides):
            gy = jnp.arange(fh)[:, None]
            gx = jnp.arange(fw)[None, :]
            f = (gy < jnp.ceil(pad_h / stride)) & (gx < jnp.ceil(pad_w / stride))
            flags.append(jnp.repeat(f.reshape(-1), self.config.num_base_priors))
        return jnp.concatenate(flags)

    # ------------------------------------------------------------------
    def loss(self, batch: DetBatch, rng: Optional[jax.Array] = None):
        """Focal cls + L1 reg over all non-ignored anchors
        (anchor_head.py:309 get_targets with PseudoSampler)."""
        cfg = self.config
        feats = self.extract_feat(batch.images)
        cls_maps, reg_maps = self.bbox_head(feats)
        anchors, sizes = self._anchors(feats)
        B = cls_maps[0].shape[0]
        C = cfg.num_classes

        cls_flat = jnp.concatenate(
            [m.reshape(B, -1, C) for m in cls_maps], axis=1
        ).astype(jnp.float32)  # (B, N, C)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)  # (B, N, 4)

        def one_image(gt_boxes, gt_labels, gt_valid, shape):
            valid = self._anchor_valid(sizes, shape)
            assigned, _ = max_iou_assign(
                anchors, gt_boxes, gt_valid,
                cfg.pos_iou_thr, cfg.neg_iou_thr, cfg.min_pos_iou,
                match_low_quality=True, prior_valid=valid,
            )
            pos = assigned >= 0
            neg = assigned == NEG
            g = jnp.clip(assigned, 0)
            labels = jnp.where(pos, gt_labels[g], C)
            onehot = jax.nn.one_hot(g, gt_boxes.shape[0], dtype=jnp.float32)
            matched = onehot @ gt_boxes
            tgt = bbox2delta(anchors, matched)
            return pos, neg, labels, tgt

        pos, neg, labels, tgt = jax.vmap(one_image)(
            batch.gt.boxes, batch.gt.labels, batch.gt.valid, batch.img_shape
        )
        label_w = (pos | neg).astype(jnp.float32)
        num_pos = jnp.maximum(pos.sum().astype(jnp.float32), 1.0)
        loss_cls = weighted_sigmoid_focal(
            cls_flat, labels, label_w, num_pos, C,
            gamma=cfg.focal_gamma, alpha=cfg.focal_alpha,
        )
        loss_bbox = weighted_l1(
            reg_flat, tgt, pos[..., None].astype(jnp.float32), num_pos
        )
        return {"loss_cls": loss_cls, "loss_bbox": loss_bbox}

    # ------------------------------------------------------------------
    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        """Per-level top-k → decode → class-aware NMS
        (base_dense_head.py predict_by_feat → _bbox_post_process)."""
        cfg = self.config
        feats = self.extract_feat(batch.images)
        cls_maps, reg_maps = self.bbox_head(feats)
        anchors, sizes = self._anchors(feats)
        B = cls_maps[0].shape[0]
        C = cfg.num_classes
        level_sizes = [s[0] * s[1] * cfg.num_base_priors for s in sizes]

        cls_flat = jnp.concatenate(
            [m.reshape(B, -1, C) for m in cls_maps], axis=1
        ).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)

        def one_image(scores_i, deltas_i, shape, scale):
            boxes_l, scores_l, labels_l = [], [], []
            off = 0
            for n_l in level_sizes:
                s = jax.nn.sigmoid(scores_i[off : off + n_l]).reshape(-1)  # (n_l*C,)
                k = min(cfg.nms_pre, n_l * C)
                top_s, top_i = fast_top_k(s, k, approx=cfg.use_approx_topk)
                a_idx = top_i // C
                lbl = (top_i % C).astype(jnp.int32)
                a = anchors[off : off + n_l]  # this level's anchors
                boxes = delta2bbox(
                    a[a_idx], deltas_i[off : off + n_l][a_idx], max_shape=shape
                )
                boxes_l.append(boxes)
                scores_l.append(top_s)
                labels_l.append(lbl)
                off += n_l
            boxes = jnp.concatenate(boxes_l)
            scores = jnp.concatenate(scores_l)
            labels = jnp.concatenate(labels_l)
            if rescale:
                boxes = boxes / jnp.concatenate([scale, scale])[None, :]
            ok = scores > cfg.score_thr
            return boxes, scores, labels, ok

        fb, fs, fl, ok = jax.vmap(one_image)(
            cls_flat, reg_flat, batch.img_shape, batch.scale_factor
        )
        if _use_pallas():
            keep_idx, dv = batched_nms_pallas(
                fb, fs, fl, ok, cfg.nms_iou, cfg.max_per_img
            )
        else:
            keep_idx, dv = jax.vmap(
                lambda b, s, l, v: batched_nms(b, s, l, v, cfg.nms_iou, cfg.max_per_img)
            )(fb, fs, fl, ok)
        db = jnp.take_along_axis(fb, keep_idx[..., None], axis=1)
        ds = jnp.take_along_axis(fs, keep_idx, axis=1)
        dl = jnp.take_along_axis(fl, keep_idx, axis=1)
        return InstanceArray(boxes=db, labels=dl, valid=dv, scores=ds)
