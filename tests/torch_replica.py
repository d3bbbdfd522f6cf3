"""Independent torch/numpy replica of the reference's full predict path.

This is the golden oracle for the end-to-end box-parity test
(tests/test_full_parity.py): a from-scratch reimplementation of the
mmdet Faster-R-CNN(+task-head) inference math in torch/numpy —
  backbone → FPN (fpn.py:116-159) → RPN (rpn_head.py:95-99)
  → proposal decode + level-aware NMS (rpn_head.py:238-306)
  → multilevel RoIAlign → Shared2FC task bbox head
    (convfc_bbox_head_task.py:60-288)
  → per-class decode + multiclass NMS (bbox_head.py:427-540,
    bbox_nms.py:12).

It deliberately shares NO code with nsgp_repre_tpu's JAX path except
the numpy AnchorGenerator (itself unit-tested against mmdet's published
anchor values). Known sanctioned deviation from mmcv: RoIAlign uses a
fixed 2x2 sample grid per bin instead of sampling_ratio=0's adaptive
grid (see ops/roi_align.py docstring) — the replica mirrors that so the
comparison isolates conversion/pipeline correctness.
"""
from __future__ import annotations

import math

import numpy as np
import torch
import torch.nn as tnn
import torch.nn.functional as F

from test_torch_parity import TorchResNet50

from nsgp_repre_tpu.ops.anchors import AnchorGenerator


# ---------------------------------------------------------------------------
# numpy box math (independent of structures/boxes.py)
# ---------------------------------------------------------------------------

def np_delta2bbox(rois, deltas, means=(0, 0, 0, 0), stds=(1, 1, 1, 1),
                  max_shape=None, wh_ratio_clip=16.0 / 1000.0):
    rois = np.asarray(rois, np.float32)
    deltas = np.asarray(deltas, np.float32)
    means = np.asarray(means, np.float32)
    stds = np.asarray(stds, np.float32)
    d = deltas * stds + means
    max_ratio = abs(math.log(wh_ratio_clip))
    dx, dy = d[:, 0], d[:, 1]
    dw = np.clip(d[:, 2], -max_ratio, max_ratio)
    dh = np.clip(d[:, 3], -max_ratio, max_ratio)
    px = (rois[:, 0] + rois[:, 2]) * 0.5
    py = (rois[:, 1] + rois[:, 3]) * 0.5
    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    gx = px + pw * dx
    gy = py + ph * dy
    gw = pw * np.exp(dw)
    gh = ph * np.exp(dh)
    boxes = np.stack(
        [gx - gw * 0.5, gy - gh * 0.5, gx + gw * 0.5, gy + gh * 0.5], axis=-1
    )
    if max_shape is not None:
        h, w = float(max_shape[0]), float(max_shape[1])
        boxes[:, 0::2] = np.clip(boxes[:, 0::2], 0, w)
        boxes[:, 1::2] = np.clip(boxes[:, 1::2], 0, h)
    return boxes


def np_iou_row(box, boxes, eps=1e-6):
    lt = np.maximum(box[:2], boxes[:, :2])
    rb = np.minimum(box[2:], boxes[:, 2:])
    wh = np.clip(rb - lt, 0, None)
    inter = wh[:, 0] * wh[:, 1]
    a1 = max(box[2] - box[0], 0) * max(box[3] - box[1], 0)
    a2 = np.clip(boxes[:, 2] - boxes[:, 0], 0, None) * np.clip(
        boxes[:, 3] - boxes[:, 1], 0, None
    )
    return inter / np.maximum(a1 + a2 - inter, eps)


def np_nms(boxes, scores, valid, iou_thr, max_out):
    """Greedy NMS; returns (selected original indices) in pick order."""
    live = np.where(valid, scores.astype(np.float64), -np.inf)
    picks = []
    for _ in range(max_out):
        j = int(np.argmax(live))
        if not np.isfinite(live[j]):
            break
        picks.append(j)
        ious = np_iou_row(boxes[j], boxes)
        live[(ious > iou_thr)] = -np.inf
        live[j] = -np.inf
    return picks


def np_batched_nms(boxes, scores, idxs, valid, iou_thr, max_out):
    """mmcv batched_nms coordinate-offset trick (bbox_nms.py:12)."""
    if valid.any():
        max_coord = float(np.max(np.where(valid[:, None], boxes, 0.0))) + 1.0
    else:
        max_coord = 1.0
    shifted = boxes + (idxs.astype(np.float32) * max_coord)[:, None]
    return np_nms(shifted, scores, valid, iou_thr, max_out)


def np_roi_align_level(feat_chw, rois, scale, out_size=7, ratio=2):
    """aligned=True RoIAlign on one (C,H,W) map, fixed ratio x ratio grid."""
    C, H, W = feat_chw.shape
    R = rois.shape[0]
    out = np.zeros((R, C, out_size, out_size), np.float32)
    for r in range(R):
        x1 = rois[r, 0] * scale - 0.5
        y1 = rois[r, 1] * scale - 0.5
        bw = (rois[r, 2] - rois[r, 0]) * scale / out_size
        bh = (rois[r, 3] - rois[r, 1]) * scale / out_size
        for oy in range(out_size):
            for ox in range(out_size):
                acc = np.zeros(C, np.float32)
                for sy in range(ratio):
                    for sx in range(ratio):
                        y = y1 + (oy + (sy + 0.5) / ratio) * bh
                        x = x1 + (ox + (sx + 0.5) / ratio) * bw
                        if y < -1.0 or y > H or x < -1.0 or x > W:
                            continue
                        y_ = min(max(y, 0.0), H - 1.0)
                        x_ = min(max(x, 0.0), W - 1.0)
                        y0 = int(np.floor(y_)); x0 = int(np.floor(x_))
                        y1i = min(y0 + 1, H - 1); x1i = min(x0 + 1, W - 1)
                        ly = y_ - y0; lx = x_ - x0
                        acc += (
                            (1 - ly) * (1 - lx) * feat_chw[:, y0, x0]
                            + (1 - ly) * lx * feat_chw[:, y0, x1i]
                            + ly * (1 - lx) * feat_chw[:, y1i, x0]
                            + ly * lx * feat_chw[:, y1i, x1i]
                        )
                out[r, :, oy, ox] = acc / (ratio * ratio)
    return out


def np_multilevel_roi_align(feats_chw, rois, strides=(4, 8, 16, 32),
                            out_size=7, ratio=2, finest_scale=56.0):
    """Level routing per single_level_roi_extractor.py:44."""
    R = rois.shape[0]
    area = np.clip(rois[:, 2] - rois[:, 0], 0, None) * np.clip(
        rois[:, 3] - rois[:, 1], 0, None
    )
    lvl = np.floor(np.log2(np.sqrt(area) / finest_scale + 1e-6))
    lvl = np.clip(lvl, 0, len(strides) - 1).astype(np.int32)
    C = feats_chw[0].shape[0]
    out = np.zeros((R, C, out_size, out_size), np.float32)
    for li in range(len(strides)):
        sel = np.nonzero(lvl == li)[0]
        if sel.size:
            out[sel] = np_roi_align_level(
                feats_chw[li], rois[sel], 1.0 / strides[li], out_size, ratio
            )
    return out


# ---------------------------------------------------------------------------
# torch model with mmdet-compatible state-dict export
# ---------------------------------------------------------------------------

class TorchTaskFasterRCNN(tnn.Module):
    def __init__(self, num_classes=6, task_split=(0, 2, 4, 6), task_id=2,
                 fc_dim=1024, backbone_blocks=(3, 4, 6, 3)):
        super().__init__()
        self.num_classes = num_classes
        self.task_split = tuple(task_split)
        self.task_id = task_id
        self.backbone = TorchResNet50(stage_blocks=backbone_blocks)
        self.lateral = tnn.ModuleList(
            [tnn.Conv2d(c, 256, 1) for c in (256, 512, 1024, 2048)]
        )
        self.fpn = tnn.ModuleList(
            [tnn.Conv2d(256, 256, 3, padding=1) for _ in range(4)]
        )
        self.rpn_conv = tnn.Conv2d(256, 256, 3, padding=1)
        self.rpn_cls = tnn.Conv2d(256, 3, 1)
        self.rpn_reg = tnn.Conv2d(256, 12, 1)
        self.shared_fc1 = tnn.Linear(7 * 7 * 256, fc_dim)
        self.shared_fc2 = tnn.Linear(fc_dim, fc_dim)
        sizes = [task_split[i + 1] - task_split[i]
                 for i in range(len(task_split) - 1)]
        self.fc_cls = tnn.ModuleList(
            [tnn.Linear(fc_dim, s) for s in sizes] + [tnn.Linear(fc_dim, 1)]
        )
        self.fc_reg = tnn.ModuleList([tnn.Linear(fc_dim, 4 * s) for s in sizes])

    def mmdet_state_dict(self):
        """State dict keyed exactly like the reference checkpoint."""
        sd = {}
        for k, v in self.backbone.state_dict().items():
            sd[f"backbone.{k}"] = v.detach().numpy()
        for i in range(4):
            sd[f"neck.lateral_convs.{i}.conv.weight"] = self.lateral[i].weight.detach().numpy()
            sd[f"neck.lateral_convs.{i}.conv.bias"] = self.lateral[i].bias.detach().numpy()
            sd[f"neck.fpn_convs.{i}.conv.weight"] = self.fpn[i].weight.detach().numpy()
            sd[f"neck.fpn_convs.{i}.conv.bias"] = self.fpn[i].bias.detach().numpy()
        for nm in ("rpn_conv", "rpn_cls", "rpn_reg"):
            m = getattr(self, nm)
            sd[f"rpn_head.{nm}.weight"] = m.weight.detach().numpy()
            sd[f"rpn_head.{nm}.bias"] = m.bias.detach().numpy()
        for i, fc in enumerate((self.shared_fc1, self.shared_fc2)):
            sd[f"roi_head.bbox_head.shared_fcs.{i}.weight"] = fc.weight.detach().numpy()
            sd[f"roi_head.bbox_head.shared_fcs.{i}.bias"] = fc.bias.detach().numpy()
        for i, fc in enumerate(self.fc_cls):
            sd[f"roi_head.bbox_head.fc_cls.{i}.weight"] = fc.weight.detach().numpy()
            sd[f"roi_head.bbox_head.fc_cls.{i}.bias"] = fc.bias.detach().numpy()
        for i, fc in enumerate(self.fc_reg):
            sd[f"roi_head.bbox_head.fc_reg.{i}.weight"] = fc.weight.detach().numpy()
            sd[f"roi_head.bbox_head.fc_reg.{i}.bias"] = fc.bias.detach().numpy()
        return sd

    def extract_feat(self, x):
        c2, c3, c4, c5 = self.backbone(x)
        lat = [l(c) for l, c in zip(self.lateral, (c2, c3, c4, c5))]
        for i in (3, 2, 1):
            lat[i - 1] = lat[i - 1] + F.interpolate(
                lat[i], size=lat[i - 1].shape[-2:], mode="nearest"
            )
        outs = [f(l) for f, l in zip(self.fpn, lat)]
        outs.append(F.max_pool2d(outs[-1], 1, stride=2))
        return outs

    def rpn_forward(self, feats):
        cls, reg = [], []
        for f in feats:
            y = F.relu(self.rpn_conv(f))
            cls.append(self.rpn_cls(y))
            reg.append(self.rpn_reg(y))
        return cls, reg

    def bbox_head_forward(self, flat):
        """flat: (R, 12544) torch (C,H,W)-major RoI features."""
        x = F.relu(self.shared_fc1(flat))
        x = F.relu(self.shared_fc2(x))
        cls_parts = []
        for i, fc in enumerate(self.fc_cls):
            o = fc(x)
            if i + 1 > self.task_id and i != len(self.fc_cls) - 1:
                o = torch.full_like(o, float("-inf"))
            cls_parts.append(o)
        reg_parts = []
        for i, fc in enumerate(self.fc_reg):
            o = fc(x)
            if i + 1 > self.task_id:
                o = torch.zeros_like(o)
            reg_parts.append(o)
        return torch.cat(cls_parts, -1), torch.cat(reg_parts, -1)


def replica_predict(model, image_hw3, rpn_nms_pre=32, rpn_max_per_img=16,
                    rpn_nms_iou=0.7, score_thr=0.05, nms_iou=0.5,
                    max_per_img=8):
    """Full predict on ONE image; returns (boxes, scores, labels) arrays
    of the kept detections (reference order: greedy NMS pick order)."""
    H, W = image_hw3.shape[:2]
    img_shape = (H, W)
    x = torch.from_numpy(
        image_hw3.transpose(2, 0, 1)[None].astype(np.float32)
    )
    with torch.no_grad():
        feats = model.extract_feat(x)
        cls_maps, reg_maps = model.rpn_forward(feats)

    gen = AnchorGenerator()
    sizes = [(f.shape[2], f.shape[3]) for f in feats]
    anchors = gen.grid_anchors(sizes)

    boxes_l, scores_l, lvl_l = [], [], []
    for li in range(len(feats)):
        s = torch.sigmoid(cls_maps[li][0].permute(1, 2, 0)).reshape(-1).numpy()
        d = reg_maps[li][0].permute(1, 2, 0).reshape(-1, 4).numpy()
        k = min(rpn_nms_pre, s.shape[0])
        top = np.argsort(-s, kind="stable")[:k]
        boxes_l.append(np_delta2bbox(anchors[li][top], d[top], max_shape=img_shape))
        scores_l.append(s[top])
        lvl_l.append(np.full((k,), li, np.int32))
    boxes = np.concatenate(boxes_l)
    scores = np.concatenate(scores_l)
    lvls = np.concatenate(lvl_l)
    wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
    picks = np_batched_nms(boxes, scores, lvls, wh_ok, rpn_nms_iou, rpn_max_per_img)
    proposals = boxes[picks]

    feats_chw = [f[0].numpy() for f in feats[:4]]
    roi_feats = np_multilevel_roi_align(feats_chw, proposals)
    flat = torch.from_numpy(roi_feats.reshape(roi_feats.shape[0], -1))
    with torch.no_grad():
        cls, reg = model.bbox_head_forward(flat)
        probs = torch.softmax(cls, -1).numpy()[:, : model.num_classes]
    reg = reg.numpy()

    R, C = probs.shape
    dec = np_delta2bbox(
        np.repeat(proposals, C, axis=0),
        reg.reshape(R * C, 4),
        stds=(0.1, 0.1, 0.2, 0.2),
        max_shape=img_shape,
    )
    flat_scores = probs.reshape(-1)
    flat_labels = np.tile(np.arange(C, dtype=np.int32), R)
    ok = flat_scores > score_thr
    picks = np_batched_nms(dec, flat_scores, flat_labels, ok, nms_iou, max_per_img)
    return dec[picks], flat_scores[picks], flat_labels[picks]
