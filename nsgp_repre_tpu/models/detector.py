"""Task-aware Faster R-CNN detector (TPU-native, static shapes).

Parity targets:
- TwoStageDetector: mmdet/models/detectors/two_stage.py (extract_feat
  :100, loss :146, predict :196)
- FasterRCNNRoIReplay: mmdet/models/detectors/faster_rcnn_roi_replay.py
  (teacher pseudo-labeling :65-109, forward modes :189-236, predict
  :239-286)
- StandardRoIHead loss: mmdet/models/roi_heads/standard_roi_head.py:95
- AnchorHead target/loss: mmdet/models/dense_heads/anchor_head.py:201,468
- RPN proposals: mmdet/models/dense_heads/rpn_head.py:136-306
- BBoxHead targets/loss/predict: bbox_heads/bbox_head.py:155,335,427
- multiclass_nms: mmdet/models/layers/bbox_nms.py:12

Everything here runs under one jit: the whole train step (teacher
forward, RPN/RoI losses, prototype replay) is a single traced program.
Dynamic shapes from the reference become fixed capacities + masks:
proposals (1000/img), RCNN samples (512/img), detections (100/img),
gt instances (config.gt_capacity/img).
"""
from __future__ import annotations

import dataclasses
from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from flax import linen as nn

from ..ops.anchors import AnchorGenerator
from ..ops.nms import batched_nms, nms
from ..ops.nms_pallas import batched_nms_pallas
from ..ops.topk import fast_top_k


def _use_pallas() -> bool:
    """Pallas kernels run on real TPU backends; CPU tests use XLA NMS."""
    return jax.default_backend() not in ("cpu",)
from ..ops.roi_align import multilevel_roi_align_auto
from ..structures.boxes import bbox2delta, bbox_clip, bbox_overlaps, delta2bbox
from ..structures.sample import DetBatch, InstanceArray
from .assigners import max_iou_assign
from .bbox_head import Shared2FCBBoxHeadTask
from .fpn import FPN
from .losses import accuracy, weighted_l1, weighted_sigmoid_bce, weighted_softmax_ce
from .resnet import ResNet50
from .rpn_head import RPNHead
from .samplers import random_sample_gather, random_sample_masks


@dataclasses.dataclass(frozen=True)
class DetectorConfig:
    """Static hyperparameters (faster-rcnn_r50_fpn.py train/test cfg)."""

    num_classes: int = 20
    task_split: Tuple[int, ...] = (0, 20)
    task_id: int = 1
    # anchors
    anchor_strides: Tuple[int, ...] = (4, 8, 16, 32, 64)
    anchor_ratios: Tuple[float, ...] = (0.5, 1.0, 2.0)
    anchor_scales: Tuple[float, ...] = (8.0,)
    # rpn assign/sample (train_cfg.rpn)
    rpn_pos_iou_thr: float = 0.7
    rpn_neg_iou_thr: float = 0.3
    rpn_min_pos_iou: float = 0.3
    rpn_num: int = 256
    rpn_pos_fraction: float = 0.5
    # rpn proposals (train_cfg.rpn_proposal; reference predict() also
    # uses the train cfg — faster_rcnn_roi_replay.py:272)
    rpn_nms_pre: int = 2000
    rpn_max_per_img: int = 1000
    rpn_nms_iou: float = 0.7
    # rcnn assign/sample (train_cfg.rcnn)
    rcnn_pos_iou_thr: float = 0.5
    rcnn_neg_iou_thr: float = 0.5
    rcnn_min_pos_iou: float = 0.5
    rcnn_num: int = 512
    rcnn_pos_fraction: float = 0.25
    # rcnn test (test_cfg.rcnn)
    score_thr: float = 0.05
    nms_iou: float = 0.5
    max_per_img: int = 100
    # nms=dict(type='soft_nms', ...) knob (bbox_nms.py → mmcv soft_nms):
    # 'nms' = hard greedy (default), 'soft_nms' = score-decay variant
    nms_type: str = "nms"
    soft_nms_sigma: float = 0.5
    soft_nms_min_score: float = 1e-3
    soft_nms_method: str = "linear"
    # coders
    rcnn_target_stds: Tuple[float, ...] = (0.1, 0.1, 0.2, 0.2)
    # roi extraction
    roi_out_size: int = 7
    roi_strides: Tuple[int, ...] = (4, 8, 16, 32)
    roi_finest_scale: float = 56.0
    roi_sampling_ratio: int = 2
    # backbone depth knob — (3,4,6,3) = ResNet-50; tests shrink it the way
    # the reference shrinks R50→R18 (tests/test_detectors/test_two_stage.py:26)
    backbone_blocks: Tuple[int, ...] = (3, 4, 6, 3)
    frozen_stages: int = 1
    # exact space-to-depth evaluation of the 7x7/2 stem (resnet.py)
    stem_s2d: bool = False
    # replay (RePRE) — prototypes are injected as arrays at train time
    # teacher pseudo-label thresholds (rr_thresh; nsrunner:356)
    rpn_thresh: float = 0.5
    roi_thresh: float = 0.7
    pseudo_iou_skip: float = 0.7
    compute_dtype: str = "float32"
    # TPU-fast approximate top-k for proposal pre-NMS selection and
    # random-sampling priorities (ops/topk.py); disable for exact parity
    use_approx_topk: bool = True
    # proposal-NMS implementation: 'matrix' = tiled Gauss-Seidel exact
    # greedy (ops/nms.py::nms_matrix — N/tile sequential steps),
    # 'pallas' = per-pick VMEM loop (max_per_img sequential steps),
    # 'auto' = matrix on TPU (same keep sets; far fewer sequential steps
    # when max_per_img is large)
    rpn_nms_impl: str = "auto"
    # sparse RPN loss path: the RPN losses only read the ~rpn_num sampled
    # anchors per image, so the loss-path logits are re-evaluated at the
    # sampled positions via 3x3 patch gather + matmul
    # (rpn_head.at_positions) and the dense full-pyramid head runs
    # forward-only (proposals + covariance taps). Same math/gradients as
    # backpropagating the dense convs, at ~zero backward cost. Disable
    # for the all-dense reference-shaped graph.
    rpn_sparse_loss: bool = True
    # fused Pallas RPN head (ops/rpn_head_pallas.py) on forward-only
    # dense-head paths (predict; sparse-loss train). Kills the XLA
    # layout-transpose fusions around the per-level head convs at
    # batch 1 (~5.5 ms of a 17.5 ms predict on the P2 map alone).
    rpn_fused_head: bool = True
    # the batch-1-oriented inference rewrites (fused FPN output convs,
    # s2d stem, fused RPN head on predict) apply only when the predict
    # batch is at most this size: measured at batch 16 they COST
    # ~15 ms/batch (133 vs 152 img/s serving) — the layout transposes
    # they remove amortize across the batch while the fused kernels'
    # fixed overheads don't (tools/analysis_tools/profile_b16_fused.py).
    # The train-path fused RPN head (sparse loss) is not affected.
    infer_fused_max_batch: int = 1
    # teacher fast path: the frozen teacher's RoIAlign uses a 1x1 sample
    # grid per bin instead of 2x2 (4x less gather traffic — the gather is
    # HBM-bound and dominates teacher predict). The reference runs
    # sampling_ratio=0 (adaptive ceil(bin)) so BOTH 1 and 2 are fixed-grid
    # approximations of it; pseudo-labels are score-thresholded at
    # 0.5/0.7, far from the margin this perturbs. Disable for exact
    # teacher/student numerics parity.
    teacher_fast: bool = True
    # RoIAlign implementation: 'window' = Pallas windowed-DMA +
    # separable-matmul kernel (ops/roi_align_pallas.py; 5x faster
    # forward on TPU, but rois whose sample span exceeds the DMA window
    # route one level coarser); 'gather' = packed XLA gather
    # (ops/roi_align.py, reference-exact routing — use for mAP-parity
    # validation). CPU backends always use 'gather'.
    roi_align_mode: str = "window"
    # RePRE replay variant: 'prototype' (Multi/StandardPrototypeReplayHead
    # CE) or 'raw' (StandardRoIReplayHead teacher-MSE on stored features)
    replay_mode: str = "prototype"
    # per-image pad divisor for anchor valid-flags (mmdet Pad transform,
    # pad_size_divisor=32 in the detector data_preprocessor config)
    pad_size_divisor: int = 32

    @property
    def num_base_priors(self) -> int:
        return len(self.anchor_ratios) * len(self.anchor_scales)


class FasterRCNN(nn.Module):
    """Backbone + FPN + RPN + task-split RoI head as one flax module."""

    config: DetectorConfig

    def setup(self):
        cfg = self.config
        self.backbone = ResNet50(
            stage_blocks=cfg.backbone_blocks,
            frozen_stages=cfg.frozen_stages,
            stem_s2d=cfg.stem_s2d,
            name="backbone",
        )
        self.neck = FPN(out_channels=256, num_outs=5, name="neck")
        self.rpn_head = RPNHead(
            feat_channels=256, num_base_priors=cfg.num_base_priors, name="rpn_head"
        )
        self.bbox_head = Shared2FCBBoxHeadTask(
            task_split=cfg.task_split,
            task_id=cfg.task_id,
            num_classes=cfg.num_classes,
            name="bbox_head",
        )
        self.anchor_gen = AnchorGenerator(
            strides=cfg.anchor_strides,
            ratios=cfg.anchor_ratios,
            scales=cfg.anchor_scales,
        )

    # ------------------------------------------------------------------
    # feature extraction
    # ------------------------------------------------------------------
    @property
    def _dtype(self):
        return jnp.bfloat16 if self.config.compute_dtype == "bfloat16" else jnp.float32

    def extract_feat(
        self, images: jnp.ndarray, inference: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        """images (B,H,W,3) → 5 FPN levels in compute dtype
        (two_stage.py:100). Heads cast their outputs to f32; keeping the
        pyramid in bf16 halves RPN-conv FLOPs and RoIAlign gather bytes.

        ``inference=True`` (no-grad paths: predict, teacher,
        get_bbox_stuff) lets the FPN output convs use the forward-only
        fused Pallas conv — the dominant batch-1 layout-transpose fix.
        """
        fused = (
            inference
            and self.config.rpn_fused_head
            and _use_pallas()
            and images.shape[0] <= self.config.infer_fused_max_batch
        )
        feats = self.backbone(images.astype(self._dtype), inference=fused)
        return self.neck(feats, fused=fused)

    def __call__(self, images: jnp.ndarray):
        """Init/entry convenience: full forward to RPN maps."""
        feats = self.extract_feat(images)
        cls_maps, reg_maps = self.rpn_head(feats)
        # touch the bbox head so all params initialize
        dummy = jnp.zeros(
            (1, self.config.roi_out_size, self.config.roi_out_size, 256),
            cls_maps[0].dtype,
        )
        self.bbox_head(dummy)
        return cls_maps, reg_maps

    # ------------------------------------------------------------------
    # anchors
    # ------------------------------------------------------------------
    def _anchors(self, feats) -> Tuple[jnp.ndarray, list]:
        sizes = [(f.shape[1], f.shape[2]) for f in feats]
        per_level = self.anchor_gen.grid_anchors(sizes)
        return jnp.asarray(np.concatenate(per_level, axis=0)), sizes

    def _anchor_valid(self, sizes, img_shape) -> jnp.ndarray:
        """Per-anchor inside-image flags from the *per-image* padded shape.

        mmdet valid_flags (anchor_head.py:164 via get_anchors) marks
        anchors whose grid cell lies inside ceil(pad_shape/stride), where
        pad_shape is the per-image resized shape padded up to the
        pad_size_divisor=32 canvas (Pad transform). With the rpn train
        cfg's allowed_border=-1 no further inside-image filtering happens
        (anchor_head.py:201), so rounding up to the divisor here
        reproduces the reference's negative-anchor distribution on padded
        canvases.
        """
        div = float(self.config.pad_size_divisor)
        pad_h = jnp.ceil(img_shape[0] / div) * div
        pad_w = jnp.ceil(img_shape[1] / div) * div
        flags = []
        for (fh, fw), stride in zip(sizes, self.config.anchor_strides):
            gy = jnp.arange(fh)[:, None]
            gx = jnp.arange(fw)[None, :]
            vh = jnp.ceil(pad_h / stride)
            vw = jnp.ceil(pad_w / stride)
            f = (gy < vh) & (gx < vw)  # (fh, fw)
            f = jnp.repeat(f.reshape(-1), self.config.num_base_priors)
            flags.append(f)
        return jnp.concatenate(flags)

    # ------------------------------------------------------------------
    # RPN: loss + proposals (loss_and_predict, base_dense_head.py:132)
    # ------------------------------------------------------------------
    def rpn_loss_and_proposals(
        self,
        feats,
        gt: InstanceArray,
        img_shape: jnp.ndarray,
        rng: jax.Array,
        with_loss: bool = True,
    ):
        cfg = self.config
        # sparse loss mode: the dense head runs forward-only (proposals
        # are stop_gradient'd data + the covariance taps fire here);
        # loss-path logits are re-evaluated sparsely below
        sparse = with_loss and cfg.rpn_sparse_loss
        head_in = (
            tuple(jax.lax.stop_gradient(f) for f in feats) if sparse else feats
        )
        # the fused Pallas head is forward-only; use it exactly where the
        # dense head runs under stop_gradient
        fused = (
            cfg.rpn_fused_head
            and _use_pallas()
            and (
                sparse
                or (
                    not with_loss
                    and feats[0].shape[0] <= cfg.infer_fused_max_batch
                )
            )
        )
        cls_maps, reg_maps = self.rpn_head(head_in, fused=fused)
        anchors, sizes = self._anchors(feats)
        B = cls_maps[0].shape[0]
        A = cfg.num_base_priors

        # flatten per level: (B, H, W, A) → (B, N_l); keep level splits
        cls_flat = jnp.concatenate(
            [m.reshape(B, -1) for m in cls_maps], axis=1
        ).astype(jnp.float32)  # (B, N)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)  # (B, N, 4)
        level_sizes = [s[0] * s[1] * A for s in sizes]

        losses = {}
        if with_loss:
            keys = jax.random.split(rng, B)
            if _use_pallas():
                # fused Pallas assign+targets: never materializes the
                # (G, N) IoU / one-hot intermediates in HBM
                from ..ops.assign_pallas import rpn_assign_targets_pallas

                valid = jax.vmap(lambda s: self._anchor_valid(sizes, s))(
                    img_shape
                )
                assigned, _, tgt = rpn_assign_targets_pallas(
                    anchors, gt.boxes, gt.valid, valid,
                    cfg.rpn_pos_iou_thr, cfg.rpn_neg_iou_thr,
                    cfg.rpn_min_pos_iou,
                )
                assigned = jax.lax.stop_gradient(assigned)
                tgt = jax.lax.stop_gradient(tgt)
                pos, neg = jax.vmap(
                    lambda a, k: random_sample_masks(
                        k, a, cfg.rpn_num, cfg.rpn_pos_fraction
                    )
                )(assigned, keys)
            else:
                def one_image(gt_boxes, gt_valid, shape, key):
                    valid = self._anchor_valid(sizes, shape)
                    assigned, _ = max_iou_assign(
                        anchors, gt_boxes, gt_valid,
                        cfg.rpn_pos_iou_thr, cfg.rpn_neg_iou_thr,
                        cfg.rpn_min_pos_iou,
                        match_low_quality=True, prior_valid=valid,
                    )
                    pos, neg = random_sample_masks(
                        key, assigned, cfg.rpn_num, cfg.rpn_pos_fraction
                    )
                    g = jnp.clip(assigned, 0)
                    # per-anchor matched-gt boxes via one-hot matmul: a
                    # 155k-row gather is ~40 ms/batch on TPU; the
                    # (N, G) @ (G, 4) matmul is sub-ms on the MXU
                    onehot = jax.nn.one_hot(
                        g, gt_boxes.shape[0], dtype=jnp.float32
                    )
                    matched = onehot @ gt_boxes
                    tgt = bbox2delta(anchors, matched)
                    return pos, neg, tgt

                pos, neg, tgt = jax.vmap(one_image)(
                    gt.boxes, gt.valid, img_shape, keys
                )
            label_w = (pos | neg).astype(jnp.float32)
            avg = jnp.maximum(label_w.sum(), 1.0)
            if sparse:
                cls_s, reg_s, pos_s, w_s, tgt_s = self._rpn_sparse_logits(
                    feats, pos, neg, tgt, level_sizes
                )
                losses["loss_rpn_cls"] = weighted_sigmoid_bce(
                    cls_s, pos_s, w_s, avg
                )
                losses["loss_rpn_bbox"] = weighted_l1(
                    reg_s, tgt_s, pos_s[..., None], avg
                )
            else:
                losses["loss_rpn_cls"] = weighted_sigmoid_bce(
                    cls_flat, pos.astype(jnp.float32), label_w, avg
                )
                losses["loss_rpn_bbox"] = weighted_l1(
                    reg_flat, tgt, pos[..., None].astype(jnp.float32), avg
                )

        # ---- proposals (rpn_head.py:136-306) ----
        return self._rpn_proposals_from_maps(
            cls_flat, reg_flat, level_sizes, anchors, img_shape, losses, B
        )

    def _rpn_sparse_logits(self, feats, pos, neg, tgt, level_sizes):
        """Loss-path RPN logits at the sampled anchors only.

        The sampled set (pos|neg, ≤ rpn_num per image) is data — it
        depends on anchors/gt, never on predictions — so the loss can
        gather the 3x3 input windows at those positions and evaluate the
        head as matmuls (rpn_head.at_positions). Gradients are exactly
        the dense path's: the dense conv backward is zero at every
        unsampled position.

        Returns (cls (B,S), reg (B,S,4), pos (B,S), weight (B,S),
        tgt (B,S,4)) f32, S = rpn_num.
        """
        cfg = self.config
        A = cfg.num_base_priors
        B = pos.shape[0]
        # tiny single-level trunks (C4 test shapes) can have fewer
        # anchors than the sample budget
        S = min(cfg.rpn_num, pos.shape[1])
        sel = pos | neg
        # indices of the sampled anchors (ties → lowest index; slots
        # beyond the sampled count get weight 0)
        selv, idx = jax.lax.top_k(sel.astype(jnp.float32), S)  # (B, S)
        w_s = selv  # top-k values of a 0/1 mask ARE the sampled weights
        pos_s = jnp.take_along_axis(pos, idx, axis=1).astype(jnp.float32)
        tgt_s = jnp.take_along_axis(tgt, idx[..., None], axis=1)

        # flat anchor index → (level, y, x, a); level layout is
        # (y, x, a) with a fastest and offsets are multiples of A
        offsets = [0]
        for n_l in level_sizes:
            offsets.append(offsets[-1] + n_l)
        a_idx = idx % A

        C = feats[0].shape[-1]
        dt = feats[0].dtype
        d3 = jnp.arange(-1, 2)
        patches = jnp.zeros((B, S, 9, C), dt)
        for l, f in enumerate(feats):
            fh, fw = f.shape[1], f.shape[2]
            in_l = (idx >= offsets[l]) & (idx < offsets[l + 1])
            hw = (idx - offsets[l]) // A
            y = hw // fw
            x = hw % fw
            yy = y[..., None, None] + d3[:, None]  # (B, S, 3, 1)
            xx = x[..., None, None] + d3[None, :]  # (B, S, 1, 3)
            ok = (
                (yy >= 0) & (yy < fh) & (xx >= 0) & (xx < fw)
                & in_l[..., None, None]
            )  # (B, S, 3, 3)
            p = jnp.clip(yy, 0, fh - 1) * fw + jnp.clip(xx, 0, fw - 1)
            g = jnp.take_along_axis(
                f.reshape(B, fh * fw, C),
                p.reshape(B, S * 9, 1),
                axis=1,
            ).reshape(B, S, 9, C)
            patches = patches + g * ok.reshape(B, S, 9, 1).astype(dt)

        cls_m, reg_m = self.rpn_head.at_positions(
            patches.reshape(B * S, 3, 3, C)
        )
        onehot = jax.nn.one_hot(a_idx, A, dtype=jnp.float32)  # (B, S, A)
        cls_s = (cls_m.astype(jnp.float32).reshape(B, S, A) * onehot).sum(-1)
        reg_s = (
            reg_m.astype(jnp.float32).reshape(B, S, A, 4)
            * onehot[..., None]
        ).sum(2)
        return cls_s, reg_s, pos_s, w_s, tgt_s

    def _rpn_proposals_from_maps(
        self, cls_flat, reg_flat, level_sizes, anchors, img_shape, losses, B
    ):
        cfg = self.config

        def candidates_one(cls_i, reg_i, shape):
            boxes_l, scores_l, lvl_l = [], [], []
            off = 0
            for li, n_l in enumerate(level_sizes):
                s = jax.nn.sigmoid(cls_i[off : off + n_l])
                d = reg_i[off : off + n_l]
                a = anchors[off : off + n_l]
                k = min(cfg.rpn_nms_pre, n_l)
                top_s, top_i = fast_top_k(s, k, approx=cfg.use_approx_topk)
                boxes = delta2bbox(a[top_i], d[top_i], max_shape=shape)
                boxes_l.append(boxes)
                scores_l.append(top_s)
                lvl_l.append(jnp.full((k,), li, dtype=jnp.int32))
                off += n_l
            boxes = jnp.concatenate(boxes_l)
            scores = jnp.concatenate(scores_l)
            lvls = jnp.concatenate(lvl_l)
            wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            return boxes, scores, lvls, wh_ok

        # proposals are constants downstream (torch RoIAlign/NMS carry no
        # gradient to roi coordinates; mmdet treats them as data)
        boxes, scores, lvls, wh_ok = jax.lax.stop_gradient(
            jax.vmap(candidates_one)(cls_flat, reg_flat, img_shape)
        )
        impl = cfg.rpn_nms_impl
        assert impl in ("auto", "matrix", "pallas", "xla"), (
            f"unknown rpn_nms_impl {impl!r}"
        )
        if impl == "auto":
            # Measured (v5e, 2026-08-18): at batch 16 train the Pallas
            # VMEM kernel beats matrix NMS by ~6 img/s (99.5 vs 93.3);
            # at batch 1 they are within noise (55.1 vs 55.8 fps). The
            # batched kernel is the default wherever Pallas runs.
            impl = "pallas" if _use_pallas() else "xla"
        if impl == "matrix":
            from ..ops.nms import batched_nms_matrix

            keep_idx, p_valid = batched_nms_matrix(
                boxes, scores, lvls, wh_ok, cfg.rpn_nms_iou, cfg.rpn_max_per_img
            )
        elif impl == "pallas" and _use_pallas():
            keep_idx, p_valid = batched_nms_pallas(
                boxes, scores, lvls, wh_ok, cfg.rpn_nms_iou, cfg.rpn_max_per_img
            )
        else:
            keep_idx, p_valid = jax.vmap(
                lambda b, s, l, v: batched_nms(
                    b, s, l, v, cfg.rpn_nms_iou, cfg.rpn_max_per_img
                )
            )(boxes, scores, lvls, wh_ok)
        p_boxes = jnp.take_along_axis(boxes, keep_idx[..., None], axis=1)
        p_scores = jnp.take_along_axis(scores, keep_idx, axis=1)
        proposals = InstanceArray(
            boxes=p_boxes,
            labels=jnp.zeros(p_boxes.shape[:2], jnp.int32),
            valid=p_valid,
            scores=p_scores,
        )
        return losses, proposals

    # ------------------------------------------------------------------
    # RoI head: sample → RoIAlign → head (standard_roi_head.py:95)
    # ------------------------------------------------------------------
    def _sample_rois(self, proposals: InstanceArray, gt: InstanceArray, rng: jax.Array):
        """Assign + random-sample 512 rois/img; returns flat roi set."""
        cfg = self.config
        B = proposals.boxes.shape[0]

        # add_gt_as_proposals=True (train_cfg.rcnn.sampler)
        cand_boxes = jnp.concatenate([gt.boxes, proposals.boxes], axis=1)
        cand_valid = jnp.concatenate([gt.valid, proposals.valid], axis=1)

        def one_image(cboxes, cvalid, gt_boxes, gt_labels, gt_valid, key):
            assigned, _ = max_iou_assign(
                cboxes, gt_boxes, gt_valid,
                cfg.rcnn_pos_iou_thr, cfg.rcnn_neg_iou_thr, cfg.rcnn_min_pos_iou,
                match_low_quality=False, prior_valid=cvalid,
            )
            idx, idx_valid, idx_pos = random_sample_gather(
                key, assigned, cfg.rcnn_num, cfg.rcnn_pos_fraction
            )
            rois = cboxes[idx]
            g = jnp.clip(assigned[idx], 0)
            labels = jnp.where(idx_pos, gt_labels[g], cfg.num_classes)
            labels = jnp.where(idx_valid, labels, cfg.num_classes)
            tgt = bbox2delta(rois, gt_boxes[g], stds=cfg.rcnn_target_stds)
            tgt = jnp.where(idx_pos[:, None], tgt, 0.0)
            return rois, labels, idx_valid, idx_pos, tgt

        keys = jax.random.split(rng, B)
        rois, labels, valid, pos, tgt = jax.vmap(one_image)(
            cand_boxes, cand_valid, gt.boxes, gt.labels, gt.valid, keys
        )
        batch_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, cfg.rcnn_num)
        )
        flat = lambda x: x.reshape((-1,) + x.shape[2:])
        return (
            flat(rois), flat(batch_idx), flat(labels),
            flat(valid), flat(pos), flat(tgt),
        )

    def _roi_feats(self, feats, rois, batch_idx):
        """RoIAlign in the compute dtype (the gather is HBM-traffic
        bound; bf16 halves its bytes). Accumulation is f32 inside.

        roi_align_mode='window' routes through the Pallas windowed-DMA
        kernel (ops/roi_align_pallas.py) on TPU backends; 'gather' (or
        any CPU backend) uses the packed XLA gather with reference-exact
        level routing.
        """
        cfg = self.config
        fs = [f.astype(self._dtype) for f in feats[: len(cfg.roi_strides)]]
        out = multilevel_roi_align_auto(
            fs, rois, batch_idx,
            mode=cfg.roi_align_mode,
            strides=cfg.roi_strides,
            output_size=cfg.roi_out_size,
            sampling_ratio=cfg.roi_sampling_ratio,
            finest_scale=cfg.roi_finest_scale,
        )
        return out.astype(self._dtype)

    def roi_loss(self, feats, proposals, gt, rng,
                 replay_feats: Optional[jnp.ndarray] = None,
                 replay_labels: Optional[jnp.ndarray] = None):
        cfg = self.config
        rois, batch_idx, labels, valid, pos, tgt = self._sample_rois(proposals, gt, rng)
        roi_feats = self._roi_feats(feats, rois, batch_idx)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        cls_score = cls_score.astype(jnp.float32)
        bbox_pred = bbox_pred.astype(jnp.float32)

        label_w = valid.astype(jnp.float32)
        avg = jnp.maximum(label_w.sum(), 1.0)
        loss_cls = weighted_softmax_ce(cls_score, labels, label_w, avg)
        # class-specific regression slice (bbox_head.py:575-ish semantics)
        n = bbox_pred.shape[0]
        pred4 = bbox_pred.reshape(n, cfg.num_classes, 4)
        sel = jnp.take_along_axis(
            pred4, jnp.clip(labels, 0, cfg.num_classes - 1)[:, None, None].repeat(4, -1), axis=1
        )[:, 0]
        loss_bbox = weighted_l1(sel, tgt, pos[:, None].astype(jnp.float32), avg)
        losses = {
            "loss_cls": loss_cls,
            "loss_bbox": loss_bbox,
            "acc": accuracy(cls_score, labels, label_w),
        }
        if replay_feats is not None:
            losses["replay_loss_cls"] = self.replay_loss(replay_feats, replay_labels)
        return losses

    def bbox_forward(self, roi_feats: jnp.ndarray):
        """bbox-head forward on stored flattened RoI features (R, 12544)
        — used by the raw-feature replay head for teacher logits."""
        cls, reg = self.bbox_head(roi_feats.astype(self._dtype))
        return cls.astype(jnp.float32), reg.astype(jnp.float32)

    def raw_replay_loss(self, replay_feats: jnp.ndarray, teacher_cls: jnp.ndarray):
        """StandardRoIReplayHead raw-feature replay: MSE distillation of
        the student's cls logits against the frozen teacher's on stored
        RoI features (standard_roi_replay_head.py:73-104,
        ``F.mse_loss(cls_score, teacher_cls_score)``).

        The reference computes the MSE over the FULL logit vector where
        future-task entries are filled with -inf in both heads — in IEEE
        math that is nan/inf (-inf minus -inf); torch only avoids it when
        no head is masked. We restrict the MSE to the mutually-active
        columns — the teacher's task range plus background — which is the
        numerically meaningful content of that loss (the teacher has
        task_id-1, nsrunner_roi_replay.py:532).
        """
        cls, _ = self.bbox_forward(replay_feats)
        pre = self.config.task_split[max(self.config.task_id - 1, 1)]
        s = jnp.concatenate([cls[:, :pre], cls[:, -1:]], axis=-1)
        t = jnp.concatenate([teacher_cls[:, :pre], teacher_cls[:, -1:]], axis=-1)
        return jnp.mean(jnp.square(s - t))

    def replay_loss(self, replay_feats: jnp.ndarray, replay_labels: jnp.ndarray):
        """RePRE prototype replay CE.

        Parity: standard_roi_replay_head.py:468-501 — prototypes pass
        through the classifier; logits restricted to
        ``[: task_split[task_id]] ++ [background]``; loss is
        ``F.cross_entropy(softmax(logits), labels)`` — the reference's
        softmax-before-CE double normalization is reproduced on purpose
        (it changes gradients; SURVEY §7 hard part (3)).
        """
        cfg = self.config
        cls_score, _ = self.bbox_head(replay_feats.astype(self._dtype))
        cls_score = cls_score.astype(jnp.float32)
        pre_idx = cfg.task_split[cfg.task_id]
        sliced = jnp.concatenate(
            [cls_score[:, :pre_idx], cls_score[:, -1:]], axis=-1
        )
        probs = jax.nn.softmax(sliced, axis=-1)
        logp = jax.nn.log_softmax(probs, axis=-1)
        ll = jnp.take_along_axis(logp, replay_labels[:, None].astype(jnp.int32), axis=-1)
        return -ll.mean()

    # ------------------------------------------------------------------
    # full loss (faster_rcnn_roi_replay.py:44 without teacher;
    # the teacher merge happens OUTSIDE in engine/pseudo_label.py)
    # ------------------------------------------------------------------
    def loss(
        self,
        batch: DetBatch,
        rng: jax.Array,
        rpn_gt: Optional[InstanceArray] = None,
        roi_gt: Optional[InstanceArray] = None,
        replay_feats: Optional[jnp.ndarray] = None,
        replay_labels: Optional[jnp.ndarray] = None,
    ):
        feats = self.extract_feat(batch.images)
        rpn_gt = rpn_gt if rpn_gt is not None else batch.gt
        roi_gt = roi_gt if roi_gt is not None else batch.gt
        k1, k2 = jax.random.split(rng)
        rpn_losses, proposals = self.rpn_loss_and_proposals(
            feats, rpn_gt, batch.img_shape, k1
        )
        roi_losses = self.roi_loss(
            feats, proposals, roi_gt, k2,
            replay_feats=replay_feats, replay_labels=replay_labels,
        )
        return {**rpn_losses, **roi_losses}

    # ------------------------------------------------------------------
    # predict (faster_rcnn_roi_replay.py:239 + bbox_head.py:427)
    # ------------------------------------------------------------------
    def predict(self, batch: DetBatch, rescale: bool = True) -> InstanceArray:
        feats = self.extract_feat(batch.images, inference=True)
        _, proposals = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, jax.random.PRNGKey(0), with_loss=False
        )
        return self._predict_from_proposals(feats, proposals, batch, rescale)

    def _predict_from_proposals(
        self, feats, proposals: InstanceArray, batch: DetBatch, rescale: bool = True
    ) -> InstanceArray:
        """RoI-stage predict on given proposals (StandardRoIHead.predict,
        standard_roi_head.py:294 + bbox_head.py:427)."""
        cfg = self.config
        B, R = proposals.boxes.shape[:2]
        rois = proposals.boxes.reshape(-1, 4)
        batch_idx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, R)
        ).reshape(-1)
        roi_feats = self._roi_feats(feats, rois, batch_idx)
        cls_score, bbox_pred = self.bbox_head(roi_feats)
        cls_score = cls_score.astype(jnp.float32).reshape(B, R, -1)
        bbox_pred = bbox_pred.astype(jnp.float32).reshape(B, R, -1)

        def one_image(p_boxes, p_valid, scores, deltas, shape, scale):
            boxes = delta2bbox(
                p_boxes[:, None, :].repeat(cfg.num_classes, 1).reshape(R, -1),
                deltas.reshape(R, -1),
                stds=cfg.rcnn_target_stds,
                max_shape=shape,
            ).reshape(R, cfg.num_classes, 4)
            if rescale:
                boxes = boxes / jnp.concatenate([scale, scale])[None, None, :]
            probs = jax.nn.softmax(scores, axis=-1)[:, : cfg.num_classes]
            flat_boxes = boxes.reshape(-1, 4)
            flat_scores = probs.reshape(-1)
            flat_labels = jnp.broadcast_to(
                jnp.arange(cfg.num_classes, dtype=jnp.int32)[None, :],
                (R, cfg.num_classes),
            ).reshape(-1)
            ok = (flat_scores > cfg.score_thr) & p_valid.repeat(cfg.num_classes)
            return flat_boxes, flat_scores, flat_labels, ok

        fb, fs, fl, ok = jax.vmap(one_image)(
            proposals.boxes, proposals.valid, cls_score, bbox_pred,
            batch.img_shape, batch.scale_factor,
        )
        # multiclass NMS (bbox_nms.py:12) over all class-boxes per image
        if cfg.nms_type == "soft_nms":
            from ..ops.nms import batched_soft_nms

            keep_idx, dv, dscores = jax.vmap(
                lambda b, s, l, v: batched_soft_nms(
                    b, s, l, v, cfg.nms_iou, cfg.max_per_img,
                    sigma=cfg.soft_nms_sigma,
                    min_score=cfg.soft_nms_min_score,
                    method=cfg.soft_nms_method,
                )
            )(fb, fs, fl, ok)
            db = jnp.take_along_axis(fb, keep_idx[..., None], axis=1)
            dl = jnp.take_along_axis(fl, keep_idx, axis=1)
            return InstanceArray(boxes=db, labels=dl, valid=dv, scores=dscores)
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

    # ------------------------------------------------------------------
    # RePRE RoI-feature extraction (get_bbox_stuff,
    # faster_rcnn_roi_replay.py:146 + standard_roi_replay_head.py:106)
    # ------------------------------------------------------------------
    def get_bbox_stuff(self, batch: DetBatch, rng: jax.Array, target_count: int = 5):
        """Extract exactly ``target_count`` foreground RoI features/batch.

        Reproduces the 5-RoI cap with random mask adjustment
        (standard_roi_replay_head.py:168-196): start from foreground
        sampled rois; randomly add background rois if short, randomly
        drop foreground if over.
        """
        cfg = self.config
        feats = self.extract_feat(batch.images, inference=True)
        k1, k2, k3 = jax.random.split(rng, 3)
        _, proposals = self.rpn_loss_and_proposals(
            feats, batch.gt, batch.img_shape, k1, with_loss=False
        )
        rois, batch_idx, labels, valid, pos, tgt = self._sample_rois(
            proposals, batch.gt, k2
        )
        roi_feats = self._roi_feats(feats, rois, batch_idx)
        # stored RoI features are f32 (rois_etc artifact protocol)
        mid = self.bbox_head.mid_features(roi_feats).astype(jnp.float32)

        fg = pos & valid  # labels != bg
        n_fg = fg.sum()
        u = jax.random.uniform(k3, fg.shape)
        # want exactly target_count True: rank fg candidates first, then
        # non-fg as filler (random order within each group)
        key = jnp.where(fg, 2.0 + u, jnp.where(valid, u, -1.0))
        _, order = jax.lax.top_k(key, target_count)
        sel_valid = jnp.ones((target_count,), dtype=bool)
        return (
            mid[order],
            labels[order],
            jnp.ones((target_count,), jnp.float32),  # cls weights
            tgt[order],
            jnp.where(pos[order, None], 1.0, 0.0).repeat(4, -1),  # bbox weights
            rois[order],
            sel_valid,
        )
