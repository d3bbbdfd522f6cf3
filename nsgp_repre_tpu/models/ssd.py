"""SSD300: VGG-16 backbone + SSD extra-layer neck + multibox head.

Parity targets (reference config cl_faster_rcnn_cfgs/_base_/models/ssd300.py):
- SSDVGG (mmdet/models/backbones/ssd_vgg.py): VGG-16 convs with
  ceil-mode pooling, pool5 3x3 stride 1, fc6 = 3x3 conv dilation 6 →
  1024, fc7 = 1x1 conv → 1024; outputs conv4_3 (512) and fc7 (1024).
- SSDNeck (mmdet/models/necks/ssd_neck.py): L2Norm(scale=20) on
  conv4_3; extra layers 1024→(512,256,256,256) with strides (2,2,1,1),
  paddings (1,1,0,0) — each extra = 1x1 bottleneck then 3x3.
- SSDAnchorGenerator: input 300, basesize_ratio_range (0.15, 0.9) →
  min_sizes [21,45,99,153,207,261], max_sizes [45,99,153,207,261,315];
  per level: ratio-1 anchors at size min and sqrt(min*max) plus
  (r, 1/r) pairs at size min; centers at stride/2.
- SSDHead (mmdet/models/dense_heads/ssd_head.py): per-level 3x3 convs
  to cls (A*(C+1), softmax) and reg (A*4); MultiBox loss = softmax CE
  with 3:1 hard-negative mining (per image, negatives ranked by loss)
  + SmoothL1(beta=1); assigner 0.5/0.5/0 with gt_max_assign_all=False.

TPU-first: anchors static; hard-negative selection is a static-shape
rank-vs-threshold comparison (sort once, compare rank to 3*num_pos).
"""
from __future__ import annotations

import dataclasses
from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.nms import batched_nms
from ..ops.nms_pallas import batched_nms_pallas
from ..structures.boxes import bbox2delta, delta2bbox
from ..structures.sample import DetBatch, InstanceArray
from .assigners import NEG, max_iou_assign
from .detector import _use_pallas
from .layers import CovConv
from .losses import weighted_smooth_l1


def ssd_anchor_sizes(
    input_size: int = 300,
    num_levels: int = 6,
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9),
) -> Tuple[List[float], List[float]]:
    """min/max anchor sizes per level (mmdet SSDAnchorGenerator)."""
    min_ratio = int(basesize_ratio_range[0] * 100)
    max_ratio = int(basesize_ratio_range[1] * 100)
    step = int(np.floor(max_ratio - min_ratio) / (num_levels - 2))
    min_sizes, max_sizes = [], []
    for ratio in range(min_ratio, max_ratio + 1, step):
        min_sizes.append(int(input_size * ratio / 100))
        max_sizes.append(int(input_size * (ratio + step) / 100))
    # the first (extra) level, for input 300 & range starting at 0.15:
    # 0.07 (mmdet ssd convention: ratio/2 for 300-input when min=0.15)
    min_sizes.insert(0, int(input_size * 7 / 100))
    max_sizes.insert(0, int(input_size * 15 / 100))
    return min_sizes[:num_levels], max_sizes[:num_levels]


def ssd_base_anchors(
    min_size: float, max_size: float, ratios: Sequence[float], stride: int
) -> np.ndarray:
    """Per-location anchors, centered at stride/2 (corner format)."""
    cx = cy = stride / 2.0
    ws, hs = [], []
    # ratio-1 at min and geometric-mean size
    for s in (min_size, float(np.sqrt(min_size * max_size))):
        ws.append(s)
        hs.append(s)
    for r in ratios:
        sr = float(np.sqrt(r))
        ws.extend([min_size * sr, min_size / sr])
        hs.extend([min_size / sr, min_size * sr])
    ws = np.asarray(ws, np.float32)
    hs = np.asarray(hs, np.float32)
    return np.stack(
        [cx - 0.5 * ws, cy - 0.5 * hs, cx + 0.5 * ws, cy + 0.5 * hs], axis=-1
    )


@dataclasses.dataclass(frozen=True)
class SSDConfig:
    num_classes: int = 20
    input_size: int = 300
    strides: Tuple[int, ...] = (8, 16, 32, 64, 100, 300)
    level_ratios: Tuple[Tuple[float, ...], ...] = (
        (2.0,), (2.0, 3.0), (2.0, 3.0), (2.0, 3.0), (2.0,), (2.0,)
    )
    basesize_ratio_range: Tuple[float, float] = (0.15, 0.9)
    neck_out_channels: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    l2_norm_scale: float = 20.0
    # train
    pos_iou_thr: float = 0.5
    neg_iou_thr: float = 0.5
    min_pos_iou: float = 0.0
    neg_pos_ratio: int = 3
    smoothl1_beta: float = 1.0
    target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # test
    nms_pre: int = 1000
    score_thr: float = 0.02
    nms_iou: float = 0.45
    max_per_img: int = 200
    compute_dtype: str = "float32"
    use_approx_topk: bool = True


class SSDVGG(nn.Module):
    """VGG-16 through fc7-as-conv (ssd_vgg.py)."""

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        cfg = [
            (2, 64), (2, 128), (3, 256), (3, 512), (3, 512)
        ]  # (convs, channels) per VGG block
        outs = {}
        li = 0
        for b, (n, ch) in enumerate(cfg):
            for i in range(n):
                x = nn.relu(
                    CovConv(ch, (3, 3), (1, 1), (1, 1), name=f"conv{li}")(x)
                )
                li += 1
            if b == 3:
                outs["conv4_3"] = x  # before pool4
            if b < 4:
                # ceil-mode 2x2 max pool: pad to even first
                h, w = x.shape[1], x.shape[2]
                x = jnp.pad(
                    x, ((0, 0), (0, h % 2), (0, w % 2), (0, 0)),
                    constant_values=-jnp.inf,
                )
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
        # pool5: 3x3 stride 1 pad 1
        x = nn.max_pool(x, (3, 3), strides=(1, 1), padding=[(1, 1), (1, 1)])
        # fc6: dilated 3x3, fc7: 1x1
        x = nn.relu(
            CovConv(1024, (3, 3), (1, 1), (6, 6), dilation=(6, 6), name="fc6")(x)
        )
        x = nn.relu(CovConv(1024, (1, 1), (1, 1), (0, 0), name="fc7")(x))
        return outs["conv4_3"], x


class SSDNeck(nn.Module):
    """L2Norm on conv4_3 + extra feature levels (ssd_neck.py)."""

    out_channels: Tuple[int, ...] = (512, 1024, 512, 256, 256, 256)
    level_strides: Tuple[int, ...] = (2, 2, 1, 1)
    level_paddings: Tuple[int, ...] = (1, 1, 0, 0)
    l2_norm_scale: float = 20.0

    @nn.compact
    def __call__(self, feats) -> Tuple[jnp.ndarray, ...]:
        conv4_3, fc7 = feats
        gamma = self.param(
            "l2_norm",
            nn.initializers.constant(self.l2_norm_scale),
            (conv4_3.shape[-1],),
            jnp.float32,
        )
        norm = jnp.sqrt(
            jnp.sum(jnp.square(conv4_3.astype(jnp.float32)), -1, keepdims=True)
        ) + 1e-10
        outs = [(conv4_3 / norm * gamma).astype(conv4_3.dtype), fc7]
        x = fc7
        for i, (oc, s, p) in enumerate(
            zip(self.out_channels[2:], self.level_strides, self.level_paddings)
        ):
            x = nn.relu(CovConv(oc // 2, (1, 1), (1, 1), (0, 0), name=f"extra{i}_1")(x))
            x = nn.relu(CovConv(oc, (3, 3), (s, s), (p, p), name=f"extra{i}_2")(x))
            outs.append(x)
        return tuple(outs)


class SSDHead(nn.Module):
    """Per-level 3x3 cls/reg convs (ssd_head.py)."""

    num_classes: int
    anchors_per_level: Tuple[int, ...]

    @nn.compact
    def __call__(self, feats):
        cls_out, reg_out = [], []
        for i, (f, a) in enumerate(zip(feats, self.anchors_per_level)):
            cls_out.append(
                CovConv(a * (self.num_classes + 1), (3, 3), (1, 1), (1, 1),
                        name=f"cls_conv{i}")(f)
            )
            reg_out.append(
                CovConv(a * 4, (3, 3), (1, 1), (1, 1), name=f"reg_conv{i}")(f)
            )
        return cls_out, reg_out


class SSD(nn.Module):
    """SSD300 detector (ssd300.py)."""

    config: SSDConfig

    def setup(self):
        cfg = self.config
        self.backbone = SSDVGG(name="backbone")
        self.neck = SSDNeck(
            out_channels=cfg.neck_out_channels,
            l2_norm_scale=cfg.l2_norm_scale,
            name="neck",
        )
        apl = tuple(2 + 2 * len(r) for r in cfg.level_ratios)
        self.bbox_head = SSDHead(
            num_classes=cfg.num_classes, anchors_per_level=apl, name="bbox_head"
        )

    @property
    def _dtype(self):
        return jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32

    def extract_feat(self, images: jnp.ndarray, inference: bool = False):
        # ``inference`` accepted for API parity with FasterRCNN; no
        # fused inference rewrite on the SSD path.
        return self.neck(self.backbone(images.astype(self._dtype)))

    def __call__(self, images: jnp.ndarray):
        return self.bbox_head(self.extract_feat(images))

    # ------------------------------------------------------------------
    def _anchors(self, feats) -> jnp.ndarray:
        cfg = self.config
        min_s, max_s = ssd_anchor_sizes(
            cfg.input_size, len(cfg.strides), cfg.basesize_ratio_range
        )
        all_anchors = []
        level_sizes = []
        for f, stride, mn, mx, ratios in zip(
            feats, cfg.strides, min_s, max_s, cfg.level_ratios
        ):
            base = ssd_base_anchors(mn, mx, ratios, stride)
            fh, fw = f.shape[1], f.shape[2]
            sx = np.arange(fw, dtype=np.float32) * stride
            sy = np.arange(fh, dtype=np.float32) * stride
            shift_x, shift_y = np.meshgrid(sx, sy)
            shifts = np.stack(
                [shift_x, shift_y, shift_x, shift_y], -1
            ).reshape(-1, 1, 4)
            all_anchors.append((shifts + base[None]).reshape(-1, 4))
            level_sizes.append(fh * fw * base.shape[0])
        return (
            jnp.asarray(np.concatenate(all_anchors, 0).astype(np.float32)),
            level_sizes,
        )

    # ------------------------------------------------------------------
    def loss(self, batch: DetBatch, rng=None):
        cfg = self.config
        feats = self.extract_feat(batch.images)
        cls_maps, reg_maps = self.bbox_head(feats)
        anchors, _ = self._anchors(feats)
        B = cls_maps[0].shape[0]
        C1 = cfg.num_classes + 1

        cls_flat = jnp.concatenate(
            [m.reshape(B, -1, C1) for m in cls_maps], axis=1
        ).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)

        def one_image(scores, deltas, gt_boxes, gt_labels, gt_valid):
            assigned, _ = max_iou_assign(
                anchors, gt_boxes, gt_valid,
                cfg.pos_iou_thr, cfg.neg_iou_thr, cfg.min_pos_iou,
                match_low_quality=True, gt_max_assign_all=False,
            )
            pos = assigned >= 0
            neg = assigned == NEG
            g = jnp.clip(assigned, 0)
            labels = jnp.where(pos, gt_labels[g], cfg.num_classes)
            onehot = jax.nn.one_hot(g, gt_boxes.shape[0], dtype=jnp.float32)
            matched = onehot @ gt_boxes
            tgt = bbox2delta(anchors, matched, stds=cfg.target_stds)

            # per-anchor CE (background = class num_classes)
            logp = jax.nn.log_softmax(scores, -1)
            ce = -jnp.take_along_axis(logp, labels[:, None], axis=-1)[:, 0]
            num_pos = pos.sum()
            num_neg = jnp.minimum(cfg.neg_pos_ratio * num_pos, neg.sum())
            # hard negative mining: rank negatives by CE descending
            neg_ce = jnp.where(neg, ce, -1.0)
            order = jnp.argsort(-neg_ce)
            rank = jnp.zeros_like(order).at[order].set(jnp.arange(order.shape[0]))
            hard_neg = neg & (rank < num_neg)
            w = (pos | hard_neg).astype(jnp.float32)
            # per-image UNNORMALIZED sums; the reference normalizes every
            # image's loss by the BATCH-total positive count
            # (ssd_head.py loss_by_feat: avg_factor=num_total_pos), so
            # normalization happens once outside the vmap.
            loss_cls = (ce * w).sum()
            loss_bbox = weighted_smooth_l1(
                deltas, tgt, pos[:, None].astype(jnp.float32),
                1.0, beta=cfg.smoothl1_beta,
            )
            return loss_cls, loss_bbox, num_pos

        lc, lb, np_i = jax.vmap(one_image)(
            cls_flat, reg_flat, batch.gt.boxes, batch.gt.labels, batch.gt.valid
        )
        total_pos = jnp.maximum(np_i.sum(), 1).astype(jnp.float32)
        return {"loss_cls": lc.sum() / total_pos, "loss_bbox": lb.sum() / total_pos}

    # ------------------------------------------------------------------
    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        cfg = self.config
        feats = self.extract_feat(batch.images)
        cls_maps, reg_maps = self.bbox_head(feats)
        anchors, level_sizes = self._anchors(feats)
        B = cls_maps[0].shape[0]
        C = cfg.num_classes
        C1 = C + 1

        cls_flat = jnp.concatenate(
            [m.reshape(B, -1, C1) for m in cls_maps], axis=1
        ).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)

        from ..ops.topk import fast_top_k

        def one_image(scores, deltas, shape, scale):
            # nms_pre top-k PER LEVEL (base_dense_head.predict_by_feat →
            # filter_scores_and_topk per level), so coarse-level
            # detections are not crowded out by fine-level candidates
            probs = jax.nn.softmax(scores, -1)[:, :C]  # drop background
            boxes_l, scores_l, labels_l = [], [], []
            off = 0
            for n_l in level_sizes:
                flat = probs[off : off + n_l].reshape(-1)  # (n_l*C,)
                k = min(cfg.nms_pre, n_l * C)
                top_s, top_i = fast_top_k(flat, k, approx=cfg.use_approx_topk)
                a_idx = top_i // C
                lbl = (top_i % C).astype(jnp.int32)
                a = anchors[off : off + n_l]
                boxes = delta2bbox(
                    a[a_idx], deltas[off : off + n_l][a_idx],
                    stds=cfg.target_stds, max_shape=shape,
                )
                boxes_l.append(boxes)
                scores_l.append(top_s)
                labels_l.append(lbl)
                off += n_l
            boxes = jnp.concatenate(boxes_l)
            top_s = jnp.concatenate(scores_l)
            lbl = jnp.concatenate(labels_l)
            if rescale:
                boxes = boxes / jnp.concatenate([scale, scale])[None, :]
            ok = top_s > cfg.score_thr
            return boxes, top_s, lbl, ok

        fb, fs, fl, ok = jax.vmap(one_image)(
            cls_flat, reg_flat, batch.img_shape, batch.scale_factor
        )
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
