"""Self-contained torch TRAINING loop for the reference's task-1
protocol — the multi-epoch trajectory anchor (VERDICT r3 missing #3).

tests/torch_loss_replica.py is a per-step oracle: it computes mmdet's
exact losses on *injected* sampling decisions. This module closes the
loop into a full reference-faithful training run with its OWN decisions:

  RPN forward → train-cfg proposals (nms_pre=2000/lvl, max 1000, iou .7
  — rpn_head.py:238-306 with cl_faster_rcnn_cfgs train_cfg.rpn_proposal)
  → RandomSampler (random_sampler.py:14: ≤num·pos_fraction positives,
  fill with negatives) for RPN (256/0.5) and RCNN (512/0.25,
  add_gt_as_proposals=True) → replica_losses → SGD(momentum .9, wd 1e-4,
  grad-clip 35) with LinearLR warmup + MultiStepLR decay.

Driven by tools/misc/run_anchor_mini_voc.py: both this loop and the JAX
runner train from the SAME converted initial weights on the SAME
DetLoader batch plan (same seed → same image order / flips / padding),
then final VOC mAP is compared. Sampler draws are the only uncontrolled
noise between the stacks.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn.functional as F

from torch_loss_replica import (
    np_bbox2delta,
    np_max_iou_assign,
    replica_losses,
    torch_multilevel_roi_align,
)
from torch_replica import np_batched_nms, np_delta2bbox

from nsgp_repre_tpu.ops.anchors import AnchorGenerator

PIXEL_MEAN = np.array((123.675, 116.28, 103.53), np.float32)
PIXEL_STD = np.array((58.395, 57.12, 57.375), np.float32)


def normalize_images(images_u8):
    """uint8 RGB (B,H,W,3) → normalized float32 (engine/train.py:48)."""
    return (np.asarray(images_u8, np.float32) - PIXEL_MEAN) / PIXEL_STD


def np_anchor_valid(sizes, img_shape, strides, num_base, div=32):
    """models/detector.py:242 _anchor_valid in numpy — anchors whose grid
    cell lies inside ceil(pad_shape/stride) of the per-image padded
    shape (allowed_border=-1: no further filtering)."""
    pad_h = math.ceil(float(img_shape[0]) / div) * div
    pad_w = math.ceil(float(img_shape[1]) / div) * div
    flags = []
    for (fh, fw), stride in zip(sizes, strides):
        vh, vw = math.ceil(pad_h / stride), math.ceil(pad_w / stride)
        f = np.zeros((fh, fw), bool)
        f[:min(vh, fh), :min(vw, fw)] = True
        flags.append(np.repeat(f.reshape(-1), num_base))
    return np.concatenate(flags)


def train_proposals(cls_maps, reg_maps, anchors_per_level, img_shapes,
                    nms_pre=2000, max_per_img=1000, nms_iou=0.7):
    """Batched train-time RPN proposals (rpn_head.py predict_by_feat with
    train_cfg.rpn_proposal). Returns (B, max_per_img, 4) zero-padded —
    mmdet treats proposals as data (no grad), so numpy is exact."""
    B = cls_maps[0].shape[0]
    out = np.zeros((B, max_per_img, 4), np.float32)
    for i in range(B):
        boxes_l, scores_l, lvl_l = [], [], []
        for li in range(len(cls_maps)):
            s = torch.sigmoid(
                cls_maps[li][i].detach().permute(1, 2, 0)
            ).reshape(-1).numpy()
            d = reg_maps[li][i].detach().permute(1, 2, 0).reshape(-1, 4).numpy()
            k = min(nms_pre, s.shape[0])
            top = np.argsort(-s, kind="stable")[:k]
            boxes_l.append(np_delta2bbox(
                anchors_per_level[li][top], d[top],
                max_shape=tuple(img_shapes[i]),
            ))
            scores_l.append(s[top])
            lvl_l.append(np.full((k,), li, np.int32))
        boxes = np.concatenate(boxes_l)
        scores = np.concatenate(scores_l)
        lvls = np.concatenate(lvl_l)
        wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
        picks = np_batched_nms(boxes, scores, lvls, wh_ok, nms_iou, max_per_img)
        out[i, : len(picks)] = boxes[picks]
    return out


def np_random_sample(assigned, num, pos_fraction, rng):
    """random_sampler.py:14 — returns (pos_mask, neg_mask) over priors."""
    pos_idx = np.where(assigned >= 0)[0]
    neg_idx = np.where(assigned == -1)[0]
    max_pos = int(num * pos_fraction)
    if len(pos_idx) > max_pos:
        pos_idx = rng.choice(pos_idx, max_pos, replace=False)
    n_neg = int(min(num - len(pos_idx), len(neg_idx)))
    if len(neg_idx) > n_neg:
        neg_idx = rng.choice(neg_idx, n_neg, replace=False)
    pos = np.zeros(assigned.shape[0], bool)
    neg = np.zeros(assigned.shape[0], bool)
    pos[pos_idx] = True
    neg[neg_idx] = True
    return pos, neg


def sample_rpn_batch(anchors, batch, rng, num=256, pos_fraction=0.5,
                     strides=(4, 8, 16, 32, 64), num_base=3, sizes=None):
    """(B, N) bool pos/neg masks with per-image valid-flag filtering."""
    B = batch.images.shape[0]
    N = anchors.shape[0]
    rpn_pos = np.zeros((B, N), bool)
    rpn_neg = np.zeros((B, N), bool)
    for i in range(B):
        valid = np_anchor_valid(sizes, batch.img_shape[i], strides, num_base)
        assigned = np_max_iou_assign(
            anchors, batch.gt.boxes[i], batch.gt.valid[i],
            0.7, 0.3, 0.3, match_low_quality=True, prior_valid=valid,
        )
        rpn_pos[i], rpn_neg[i] = np_random_sample(assigned, num, pos_fraction, rng)
    return rpn_pos, rpn_neg


def sample_roi_batch(proposals, batch, rng, num=512, pos_fraction=0.25):
    """RCNN sampling over concat(gt, proposals) (add_gt_as_proposals).
    Returns (roi_idx, roi_valid, roi_pos) each (B, num)."""
    B, G = batch.gt.boxes.shape[:2]
    S = num
    roi_idx = np.zeros((B, S), np.int64)
    roi_valid = np.zeros((B, S), bool)
    roi_pos = np.zeros((B, S), bool)
    for i in range(B):
        cand = np.concatenate([batch.gt.boxes[i], proposals[i]])
        cvalid = np.concatenate([
            np.asarray(batch.gt.valid[i], bool),
            # zero-padded proposal rows are invalid candidates
            (proposals[i][:, 2] > proposals[i][:, 0]),
        ])
        assigned = np_max_iou_assign(
            cand, batch.gt.boxes[i], batch.gt.valid[i],
            0.5, 0.5, 0.5, match_low_quality=False, prior_valid=cvalid,
        )
        pos, neg = np_random_sample(assigned, num, pos_fraction, rng)
        sel = np.concatenate([np.where(pos)[0], np.where(neg)[0]])
        k = min(len(sel), S)
        roi_idx[i, :k] = sel[:k]
        roi_valid[i, :k] = True
        roi_pos[i, :k] = np.concatenate([
            np.ones(pos.sum(), bool), np.zeros(neg.sum(), bool)
        ])[:k]
    return roi_idx, roi_valid, roi_pos


def make_lr(step, base_lr, steps_per_epoch, milestones, gamma=0.1,
            warmup_iters=100, warmup_start=0.001):
    """engine/train.py:60 make_lr_schedule, scalar form."""
    warm = warmup_start + (1 - warmup_start) * min(step / max(warmup_iters, 1), 1.0)
    decay = 1.0
    for m in milestones:
        if step // max(steps_per_epoch, 1) >= m:
            decay *= gamma
    return base_lr * warm * decay


def clip_grad_norm(params, max_norm):
    total = torch.sqrt(sum((p.grad.detach() ** 2).sum()
                           for p in params if p.grad is not None))
    if total > max_norm:
        scale = max_norm / (total + 1e-6)
        for p in params:
            if p.grad is not None:
                p.grad.mul_(scale)
    return float(total)


def train_task1(tm, loader, max_epochs, base_lr=0.01, milestones=(8,),
                warmup_iters=100, clip=35.0, seed=0, log=print):
    """Train the torch replica on DetLoader batches (task 1: plain
    Faster R-CNN — no teacher/NSGP/EWC/replay, matching the JAX runner's
    task-1 path). BN runs in eval mode (norm_eval; stats frozen at init
    0/1 exactly like FrozenBatchNorm from scratch)."""
    tm.eval()  # BN eval; params still get grads
    for p in tm.parameters():
        p.requires_grad_(True)
    params = [p for p in tm.parameters()]
    bufs = [torch.zeros_like(p) for p in params]  # momentum buffers
    rng = np.random.RandomState(seed + 12345)
    gen = AnchorGenerator()
    steps_per_epoch = len(loader)
    step = 0
    momentum, wd = 0.9, 1e-4
    for epoch in range(max_epochs):
        loader.set_epoch(epoch)
        for batch, _meta in loader:
            images = normalize_images(batch.images)
            x = torch.from_numpy(
                np.ascontiguousarray(images.transpose(0, 3, 1, 2))
            )
            feats = tm.extract_feat(x)
            sizes = [(f.shape[2], f.shape[3]) for f in feats]
            anchors_per_level = gen.grid_anchors(sizes)
            anchors = np.concatenate(anchors_per_level)
            cls_maps, reg_maps = tm.rpn_forward(feats)
            proposals = train_proposals(
                cls_maps, reg_maps, anchors_per_level, batch.img_shape,
            )
            rpn_pos, rpn_neg = sample_rpn_batch(
                anchors, batch, rng, sizes=sizes,
            )
            roi_idx, roi_valid, roi_pos = sample_roi_batch(
                proposals, batch, rng,
            )
            losses = replica_losses(
                tm, images,
                np.asarray(batch.gt.boxes), np.asarray(batch.gt.labels),
                np.asarray(batch.gt.valid),
                rpn_pos, rpn_neg, proposals,
                roi_idx, roi_valid, roi_pos,
                num_classes=tm.num_classes,
                precomputed=(feats, cls_maps, reg_maps),
            )
            total = sum(losses.values())
            for p in params:
                p.grad = None
            total.backward()
            gnorm = clip_grad_norm(params, clip)
            lr = make_lr(step, base_lr, steps_per_epoch, milestones,
                         warmup_iters=warmup_iters)
            with torch.no_grad():
                for p, buf in zip(params, bufs):
                    if p.grad is None:
                        continue
                    g = p.grad + wd * p  # mmdet SGD: decay into grad
                    buf.mul_(momentum).add_(g)
                    p.add_(buf, alpha=-lr)
            if step % 20 == 0:
                log(f"torch e{epoch} s{step} lr {lr:.2e} "
                    f"loss {float(total):.4f} gnorm {gnorm:.1f} "
                    + " ".join(f"{k}:{float(v):.3f}" for k, v in losses.items()))
            step += 1
    return tm


def eval_voc(tm, loader, dataset, num_classes, score_thr=0.05, nms_iou=0.5,
             max_per_img=100, rpn_nms_pre=1000, rpn_max=1000):
    """Predict every val image (test-cfg params) and return
    (detections, annotations) for eval_voc_map — detections scaled back
    to original-image coordinates, annotations from the dataset records
    (difficult flags included), mirroring runner.val."""
    tm.eval()
    gen = AnchorGenerator()
    by_id = {r["img_id"]: r for r in dataset.records}
    detections, annotations = [], []
    for batch, meta in loader:
        images = normalize_images(batch.images)
        x = torch.from_numpy(
            np.ascontiguousarray(images.transpose(0, 3, 1, 2))
        )
        with torch.no_grad():
            feats = tm.extract_feat(x)
            cls_maps, reg_maps = tm.rpn_forward(feats)
        sizes = [(f.shape[2], f.shape[3]) for f in feats]
        anchors_per_level = gen.grid_anchors(sizes)
        # the last partial batch pads image rows to batch_size but meta
        # lists only the planned records — never read the pad rows
        B = min(x.shape[0], len(meta))
        for i in range(B):
            img_shape = tuple(int(v) for v in batch.img_shape[i])
            boxes_l, scores_l, lvl_l = [], [], []
            for li in range(len(feats)):
                s = torch.sigmoid(
                    cls_maps[li][i].permute(1, 2, 0)
                ).reshape(-1).numpy()
                d = reg_maps[li][i].permute(1, 2, 0).reshape(-1, 4).numpy()
                k = min(rpn_nms_pre, s.shape[0])
                top = np.argsort(-s, kind="stable")[:k]
                boxes_l.append(np_delta2bbox(
                    anchors_per_level[li][top], d[top], max_shape=img_shape
                ))
                scores_l.append(s[top])
                lvl_l.append(np.full((k,), li, np.int32))
            boxes = np.concatenate(boxes_l)
            scores = np.concatenate(scores_l)
            lvls = np.concatenate(lvl_l)
            wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            picks = np_batched_nms(boxes, scores, lvls, wh_ok, 0.7, rpn_max)
            props = boxes[picks]

            r = by_id[meta[i]]
            if len(props) == 0:  # untrained RPN can propose nothing
                detections.append({c: (np.zeros((0, 4), np.float32),
                                       np.zeros(0, np.float32))
                                   for c in range(num_classes)})
                annotations.append(dict(
                    boxes=np.asarray(r["boxes"], np.float32),
                    labels=np.asarray(r["labels"]),
                    difficult=r.get("difficult"),
                ))
                continue
            props_t = torch.from_numpy(props.astype(np.float32))
            pbidx = torch.full((props_t.shape[0],), i, dtype=torch.long)
            with torch.no_grad():
                roi_feats = torch_multilevel_roi_align(
                    feats[:4], props_t, pbidx
                )
                flat = roi_feats.reshape(roi_feats.shape[0], -1)
                cls, reg = tm.bbox_head_forward(flat)
                probs = torch.softmax(cls, -1).numpy()[:, : tm.num_classes]
            reg = reg.numpy()
            R, C = probs.shape
            dec = np_delta2bbox(
                np.repeat(props, C, axis=0), reg.reshape(R * C, 4),
                stds=(0.1, 0.1, 0.2, 0.2), max_shape=img_shape,
            )
            flat_scores = probs.reshape(-1)
            flat_labels = np.tile(np.arange(C, dtype=np.int32), R)
            ok = flat_scores > score_thr
            picks = np_batched_nms(
                dec, flat_scores, flat_labels, ok, nms_iou, max_per_img
            )
            ws, hs = np.asarray(batch.scale_factor[i], np.float32)
            det_boxes = dec[picks] / np.array([ws, hs, ws, hs], np.float32)
            det = {}
            for c in range(num_classes):
                m = flat_labels[picks] == c
                det[c] = (det_boxes[m], flat_scores[picks][m])
            detections.append(det)
            annotations.append(dict(
                boxes=np.asarray(r["boxes"], np.float32),
                labels=np.asarray(r["labels"]),
                difficult=r.get("difficult"),
            ))
    return detections, annotations
