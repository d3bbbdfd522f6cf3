"""Mask R-CNN: FCN mask head on top of the two-stage detector.

Parity targets:
- MaskRCNN: mmdet/models/detectors/mask_rcnn.py (TwoStage + mask branch),
  config surface cl_faster_rcnn_cfgs/_base_/models/mask-rcnn_r50_fpn.py —
  mask_roi_extractor RoIAlign 14x14, FCNMaskHead(num_convs=4,
  in/conv channels 256, class-specific 28x28 logits), mask_size=28,
  loss_mask CE(use_mask=True) on positive rois.
- FCNMaskHead: mmdet/models/roi_heads/mask_heads/fcn_mask_head.py —
  4x conv3x3+ReLU, deconv 2x2 stride-2 + ReLU, 1x1 to num_classes.
- Mask targets: mmdet mask_target.py crops each positive roi from the
  instance bitmap and resizes to 28x28. TPU-static reformulation: gt
  masks are stored as fixed-size box-normalized crops (each gt's mask
  resampled over its own gt box, host-side); the in-graph target for a
  sampled roi is a bilinear resample of the matched gt's crop over the
  roi window mapped into that normalized frame (the TF-OD-API
  formulation). Equivalent up to one extra bilinear resampling.
- predict: mask head on the final detection boxes; returns per-det 28x28
  probabilities ("rescale" = paste happens host-side,
  structures/mask_paste.py).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from ..structures.sample import DetBatch, InstanceArray
from .detector import DetectorConfig, FasterRCNN
from .layers import CovConv


@dataclasses.dataclass(frozen=True)
class MaskRCNNConfig(DetectorConfig):
    mask_size: int = 28
    mask_roi_out_size: int = 14
    mask_convs: int = 4
    mask_channels: int = 256
    # host-side box-normalized gt-mask crop resolution
    gt_mask_size: int = 56


class FCNMaskHead(nn.Module):
    """fcn_mask_head.py: convs → deconv 2x → 1x1 per-class logits."""

    num_classes: int
    num_convs: int = 4
    channels: int = 256

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(R, 14, 14, C) → (R, 28, 28, num_classes) logits."""
        init = nn.initializers.variance_scaling(2.0, "fan_out", "normal")
        for i in range(self.num_convs):
            x = nn.relu(
                CovConv(self.channels, (3, 3), (1, 1), (1, 1),
                        kernel_init=init, name=f"mask_conv{i}")(x)
            )
        x = nn.ConvTranspose(
            self.channels, (2, 2), strides=(2, 2),
            kernel_init=init, name="upsample",
        )(x)
        x = nn.relu(x)
        return CovConv(
            self.num_classes, (1, 1), (1, 1), (0, 0),
            kernel_init=init, name="conv_logits",
        )(x)


def _resample_normalized(crop: jnp.ndarray, roi: jnp.ndarray,
                         gt_box: jnp.ndarray, out_size: int) -> jnp.ndarray:
    """Bilinear-resample a box-normalized gt-mask crop over a roi window.

    ``crop`` is (S, S) covering ``gt_box``; returns (out, out) target over
    ``roi`` in image coords (zeros outside the gt box).
    """
    S = crop.shape[0]
    gx1, gy1, gx2, gy2 = gt_box[0], gt_box[1], gt_box[2], gt_box[3]
    gw = jnp.maximum(gx2 - gx1, 1e-4)
    gh = jnp.maximum(gy2 - gy1, 1e-4)
    rx1, ry1, rx2, ry2 = roi[0], roi[1], roi[2], roi[3]
    # sample centers of the out_size grid over the roi, in image coords
    ys = ry1 + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size * (ry2 - ry1)
    xs = rx1 + (jnp.arange(out_size, dtype=jnp.float32) + 0.5) / out_size * (rx2 - rx1)
    # map into crop pixel coords
    cy = (ys - gy1) / gh * S - 0.5
    cx = (xs - gx1) / gw * S - 0.5
    y0 = jnp.floor(cy)
    x0 = jnp.floor(cx)
    ly = cy - y0
    lx = cx - x0

    def take(iy, ix):
        iyc = jnp.clip(iy.astype(jnp.int32), 0, S - 1)
        ixc = jnp.clip(ix.astype(jnp.int32), 0, S - 1)
        v = crop[iyc[:, None], ixc[None, :]]
        inside = ((iy >= 0) & (iy <= S - 1))[:, None] & ((ix >= 0) & (ix <= S - 1))[None, :]
        return jnp.where(inside, v, 0.0)

    v00 = take(y0, x0)
    v01 = take(y0, x0 + 1)
    v10 = take(y0 + 1, x0)
    v11 = take(y0 + 1, x0 + 1)
    w00 = ((1 - ly)[:, None]) * ((1 - lx)[None, :])
    w01 = ((1 - ly)[:, None]) * (lx[None, :])
    w10 = (ly[:, None]) * ((1 - lx)[None, :])
    w11 = (ly[:, None]) * (lx[None, :])
    return v00 * w00 + v01 * w01 + v10 * w10 + v11 * w11


class MaskRCNN(FasterRCNN):
    """FasterRCNN + mask branch (mask-rcnn_r50_fpn.py)."""

    def setup(self):
        super().setup()
        self.mask_head = FCNMaskHead(
            num_classes=self.config.num_classes,
            num_convs=self.config.mask_convs,
            channels=self.config.mask_channels,
            name="mask_head",
        )

    def __call__(self, images: jnp.ndarray):
        out = super().__call__(images)
        dummy = jnp.zeros(
            (1, self.config.mask_roi_out_size, self.config.mask_roi_out_size, 256),
            jnp.float32,
        )
        self.mask_head(dummy)
        return out

    def _mask_roi_feats(self, feats, rois, batch_idx):
        from ..ops.roi_align import multilevel_roi_align_auto

        cfg: MaskRCNNConfig = self.config
        fs = [f.astype(self._dtype) for f in feats[: len(cfg.roi_strides)]]
        return multilevel_roi_align_auto(
            fs, rois, batch_idx,
            mode=cfg.roi_align_mode,
            strides=cfg.roi_strides,
            output_size=cfg.mask_roi_out_size,
            sampling_ratio=cfg.roi_sampling_ratio,
            finest_scale=cfg.roi_finest_scale,
        ).astype(self._dtype)

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
        cfg: MaskRCNNConfig = self.config
        feats = self.extract_feat(batch.images)
        rpn_gt = rpn_gt if rpn_gt is not None else batch.gt
        roi_gt = roi_gt if roi_gt is not None else batch.gt
        k1, k2 = jax.random.split(rng)
        rpn_losses, proposals = self.rpn_loss_and_proposals(
            feats, rpn_gt, batch.img_shape, k1
        )
        # bbox branch (reuse the sampled rois for the mask branch)
        rois, batch_idx, labels, valid, pos, tgt = self._sample_rois(
            proposals, roi_gt, k2
        )
        roi_feats = self._roi_feats(feats, rois, batch_idx)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
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

        # ---- mask branch on positive rois ----
        if roi_gt.masks is not None:
            B = proposals.boxes.shape[0]
            R = cfg.rcnn_num
            m_feats = self._mask_roi_feats(feats, rois, batch_idx)
            mask_logits = self.mask_head(m_feats).astype(jnp.float32)  # (N,28,28,C)

            # matched gt per sampled roi: recompute assignment cheaply via
            # labels? We need the gt INDEX — recover by re-assigning: the
            # sampler stored it implicitly; reconstruct by max-IoU with
            # the matched target box. Instead, thread it: tgt was built
            # from gt_boxes[g]; recompute g by decoding is lossy — so we
            # recompute the matched gt crop by IoU argmax against roi_gt.
            gt_boxes_flat = roi_gt.boxes  # (B, G, 4)
            gt_masks_flat = roi_gt.masks.astype(jnp.float32)  # (B, G, S, S)
            G = gt_boxes_flat.shape[1]

            from ..structures.boxes import bbox_overlaps

            def one_roi(roi, bidx, label, p):
                ious = bbox_overlaps(roi[None, :], gt_boxes_flat[bidx])[0]  # (G,)
                ious = jnp.where(roi_gt.valid[bidx], ious, -1.0)
                g = jnp.argmax(ious)
                crop = gt_masks_flat[bidx, g]
                t = _resample_normalized(
                    crop, roi, gt_boxes_flat[bidx, g], cfg.mask_size
                )
                return (t > 0.5).astype(jnp.float32)

            targets = jax.vmap(one_roi)(rois, batch_idx, labels, pos)  # (N,28,28)
            # class-specific slice (CrossEntropyLoss use_mask=True)
            ml = jnp.take_along_axis(
                mask_logits,
                jnp.clip(labels, 0, cfg.num_classes - 1)[:, None, None, None],
                axis=-1,
            )[..., 0]  # (N, 28, 28)
            bce = jnp.maximum(ml, 0) - ml * targets + jnp.log1p(jnp.exp(-jnp.abs(ml)))
            w = pos.astype(jnp.float32)
            num_pos = jnp.maximum(w.sum(), 1.0)
            losses["loss_mask"] = (bce.mean(axis=(1, 2)) * w).sum() / num_pos
        if replay_feats is not None:
            losses["replay_loss_cls"] = self.replay_loss(replay_feats, replay_labels)
        return losses

    # ------------------------------------------------------------------
    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        cfg: MaskRCNNConfig = self.config
        feats = self.extract_feat(batch.images)
        _, proposals = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, jax.random.PRNGKey(0), with_loss=False
        )
        dets = self._predict_from_proposals(feats, proposals, batch, rescale)
        # mask head on the detected boxes (in input-image coords)
        B, D = dets.boxes.shape[:2]
        boxes_img = dets.boxes
        if rescale:
            scale = jnp.concatenate([batch.scale_factor, batch.scale_factor], -1)
            boxes_img = dets.boxes * scale[:, None, :]
        rois = boxes_img.reshape(-1, 4)
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, D)
        ).reshape(-1)
        m_feats = self._mask_roi_feats(feats, rois, bidx)
        logits = self.mask_head(m_feats).astype(jnp.float32)  # (B*D,28,28,C)
        lbl = jnp.clip(dets.labels.reshape(-1), 0, cfg.num_classes - 1)
        per_det = jnp.take_along_axis(
            logits, lbl[:, None, None, None], axis=-1
        )[..., 0]
        probs = jax.nn.sigmoid(per_det).reshape(B, D, cfg.mask_size, cfg.mask_size)
        return dets.replace(masks=probs)
