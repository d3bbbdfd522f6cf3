"""Torch replica of the reference's TRAINING path (loss forward +
backward), the golden oracle for the gradient-parity test
(tests/test_grad_parity.py).

Mirrors the mmdet train call stack independently of the JAX package:
  two_stage.py loss → anchor_head.py loss_by_feat (RPN BCE/L1 with
  avg_factor) → rpn proposals (injected, treated as data exactly as
  mmdet does) → standard_roi_head.py bbox_loss (sampled rois →
  RoIAlign → Shared2FC task head → CE/L1) → RePRE prototype replay CE
  (standard_roi_replay_head.py:468-501, softmax-before-CE) → EWC
  quadratic (nsrunner:972).

Random sampling DECISIONS (which anchors/rois were kept) are injected
from the JAX side — both frameworks then compute identical math on
identical decisions, so any disagreement in loss values or gradients is
a real defect, not sampler noise. Assignment, targets, flatten order,
and loss normalization are all recomputed HERE from scratch (numpy /
torch) and serve as the independent check.
"""
from __future__ import annotations

import numpy as np
import torch
import torch.nn.functional as F

from torch_replica import np_delta2bbox  # noqa: F401 (re-export convenience)

from nsgp_repre_tpu.ops.anchors import AnchorGenerator


# ---------------------------------------------------------------------------
# independent numpy assignment / target math
# ---------------------------------------------------------------------------

def np_iou_matrix(a: np.ndarray, b: np.ndarray, eps: float = 1e-6):
    """(G, 4) x (N, 4) → (G, N) IoU.

    Computed in float32 with the same op order as bbox_overlaps /
    mmdet's torch path so threshold and low-quality-tie comparisons
    (exact float equality against the per-gt max) land identically.
    """
    a = np.asarray(a, np.float32)
    b = np.asarray(b, np.float32)
    area_a = np.clip(a[:, 2] - a[:, 0], 0, None) * np.clip(a[:, 3] - a[:, 1], 0, None)
    area_b = np.clip(b[:, 2] - b[:, 0], 0, None) * np.clip(b[:, 3] - b[:, 1], 0, None)
    ix = np.clip(
        np.minimum(a[:, None, 2], b[None, :, 2])
        - np.maximum(a[:, None, 0], b[None, :, 0]), 0, None,
    ).astype(np.float32)
    iy = np.clip(
        np.minimum(a[:, None, 3], b[None, :, 3])
        - np.maximum(a[:, None, 1], b[None, :, 1]), 0, None,
    ).astype(np.float32)
    inter = ix * iy
    union = (area_a[:, None] + area_b[None, :] - inter).astype(np.float32)
    return inter / np.maximum(union, np.float32(eps))


def np_max_iou_assign(priors, gt_boxes, gt_valid, pos_thr, neg_thr,
                      min_pos_iou, match_low_quality, prior_valid=None):
    """max_iou_assigner.py:85 assign_wrt_overlaps, padded-static form.

    Returns (N,) int: gt index >= 0, -1 negative, -2 ignore.
    """
    overlaps = np_iou_matrix(gt_boxes, priors)
    overlaps = np.where(np.asarray(gt_valid)[:, None], overlaps, -1.0)
    max_o = overlaps.max(axis=0)
    arg = overlaps.argmax(axis=0)
    assigned = np.full(priors.shape[0], -2, np.int64)
    assigned[(max_o >= 0) & (max_o < neg_thr)] = -1
    assigned[max_o >= pos_thr] = arg[max_o >= pos_thr]
    if match_low_quality:
        # mmdet iterates gts in order, later overriding earlier; every
        # prior tying the gt's best IoU is claimed (gt_max_assign_all)
        for g in range(overlaps.shape[0]):
            if not gt_valid[g]:
                continue
            gm = overlaps[g].max()
            if gm >= min_pos_iou:
                assigned[overlaps[g] == gm] = g
    if prior_valid is not None:
        assigned[~np.asarray(prior_valid)] = -2
    return assigned


def np_bbox2delta(rois, gts, means=(0, 0, 0, 0), stds=(1, 1, 1, 1)):
    """bbox2delta (delta_xywh_bbox_coder.py encode)."""
    rois = np.asarray(rois, np.float32)
    gts = np.asarray(gts, np.float32)
    pw = rois[:, 2] - rois[:, 0]
    ph = rois[:, 3] - rois[:, 1]
    px = (rois[:, 0] + rois[:, 2]) * 0.5
    py = (rois[:, 1] + rois[:, 3]) * 0.5
    gw = gts[:, 2] - gts[:, 0]
    gh = gts[:, 3] - gts[:, 1]
    gx = (gts[:, 0] + gts[:, 2]) * 0.5
    gy = (gts[:, 1] + gts[:, 3]) * 0.5
    d = np.stack([
        (gx - px) / np.maximum(pw, 1e-6),
        (gy - py) / np.maximum(ph, 1e-6),
        np.log(np.maximum(gw, 1e-6) / np.maximum(pw, 1e-6)),
        np.log(np.maximum(gh, 1e-6) / np.maximum(ph, 1e-6)),
    ], axis=-1)
    return (d - np.asarray(means, np.float32)) / np.asarray(stds, np.float32)


# ---------------------------------------------------------------------------
# differentiable torch RoIAlign (gather semantics of ops/roi_align.py:
# aligned=True, fixed ratio x ratio grid, finest_scale level routing)
# ---------------------------------------------------------------------------

def torch_roi_align_level(feat, rois_t, bidx_t, scale, out_size=7, ratio=2):
    """feat (B, C, H, W) torch; rois_t (R, 4); bidx_t (R,) → (R, C, s, s).

    Differentiable wrt feat. Out-of-range samples (y < -1 or y > H)
    contribute zero but still count in the 1/ratio^2 average, exactly as
    np_roi_align_level / mmcv roi_align.

    Implemented on F.grid_sample (native bilinear kernel with a native
    backward): sample coords are clamped into the map exactly like
    _torch_roi_align_gather (the original advanced-indexing version,
    kept below as the equality oracle), then invalid samples are zeroed
    before the ratio x ratio average. The gather version built a
    ~(R,7,2,7,2,C)x4-corner autograd graph whose backward dominated the
    whole replica train step (16.6 of ~34 s at (320,200) batch 8);
    grid_sample computes the identical values ~10x faster.
    """
    B, C, H, W = feat.shape
    R = rois_t.shape[0]
    if R == 0:
        return feat.new_zeros((0, C, out_size, out_size))
    x1 = rois_t[:, 0] * scale - 0.5
    y1 = rois_t[:, 1] * scale - 0.5
    bw = (rois_t[:, 2] - rois_t[:, 0]) * scale / out_size
    bh = (rois_t[:, 3] - rois_t[:, 1]) * scale / out_size
    o = torch.arange(out_size, dtype=feat.dtype)
    s = (torch.arange(ratio, dtype=feat.dtype) + 0.5) / ratio
    grid1d = (o[:, None] + s[None, :]).reshape(-1)  # (out*ratio,)
    ys = y1[:, None] + grid1d[None, :] * bh[:, None]  # (R, out*ratio)
    xs = x1[:, None] + grid1d[None, :] * bw[:, None]
    in_y = (ys >= -1.0) & (ys <= float(H))
    in_x = (xs >= -1.0) & (xs <= float(W))
    yc = ys.clamp(0.0, H - 1.0)
    xc = xs.clamp(0.0, W - 1.0)
    # normalized grid coords (align_corners=False pixel centers)
    gy = (yc + 0.5) * (2.0 / H) - 1.0
    gx = (xc + 0.5) * (2.0 / W) - 1.0
    S = out_size * ratio
    pooled = feat.new_zeros((R, C, out_size, out_size))
    for b in torch.unique(bidx_t).tolist():
        sel = (bidx_t == b).nonzero(as_tuple=True)[0]
        n = sel.numel()
        # grid (1, n*S, S, 2): y varies along dim 1, x along dim 2
        g = torch.stack([
            gx[sel][:, None, :].expand(n, S, S),
            gy[sel][:, :, None].expand(n, S, S),
        ], dim=-1).reshape(1, n * S, S, 2)
        v = F.grid_sample(
            feat[int(b)][None], g, mode="bilinear",
            padding_mode="zeros", align_corners=False,
        )  # (1, C, n*S, S)
        v = v.reshape(C, n, S, S)
        ok = (in_y[sel][:, :, None] & in_x[sel][:, None, :])[None]
        v = torch.where(ok, v, v.new_zeros(()))
        v = v.reshape(C, n, out_size, ratio, out_size, ratio).mean(dim=(3, 5))
        pooled[sel] = v.permute(1, 0, 2, 3)
    return pooled


def _torch_roi_align_gather(feat, rois_t, bidx_t, scale, out_size=7, ratio=2):
    """Original advanced-indexing implementation — the equality oracle
    for torch_roi_align_level (tests/test_optim_parity.py pins them
    equal; the grad-parity suite exercises the grid_sample path)."""
    B, C, H, W = feat.shape
    R = rois_t.shape[0]
    x1 = rois_t[:, 0] * scale - 0.5
    y1 = rois_t[:, 1] * scale - 0.5
    bw = (rois_t[:, 2] - rois_t[:, 0]) * scale / out_size
    bh = (rois_t[:, 3] - rois_t[:, 1]) * scale / out_size
    o = torch.arange(out_size, dtype=feat.dtype)
    s = (torch.arange(ratio, dtype=feat.dtype) + 0.5) / ratio
    # (R, out, ratio) sample coords
    ys = y1[:, None, None] + (o[None, :, None] + s[None, None, :]) * bh[:, None, None]
    xs = x1[:, None, None] + (o[None, :, None] + s[None, None, :]) * bw[:, None, None]
    in_y = (ys >= -1.0) & (ys <= float(H))
    in_x = (xs >= -1.0) & (xs <= float(W))
    yc = ys.clamp(0.0, H - 1.0)
    xc = xs.clamp(0.0, W - 1.0)
    y0 = yc.floor().long()
    x0 = xc.floor().long()
    y1i = (y0 + 1).clamp(max=H - 1)
    x1i = (x0 + 1).clamp(max=W - 1)
    ly = (yc - y0.to(feat.dtype))
    lx = (xc - x0.to(feat.dtype))

    flat = feat.permute(0, 2, 3, 1).reshape(B * H * W, C)

    def take(yi, xi):
        # (R, oy, ry, ox, rx) linear index → gather rows of flat
        idx = (bidx_t[:, None, None, None, None] * H
               + yi[:, :, :, None, None]) * W + xi[:, None, None, :, :]
        return flat[idx.reshape(-1)].reshape(R, out_size, ratio, out_size, ratio, C)

    v00 = take(y0, x0)
    v01 = take(y0, x1i)
    v10 = take(y1i, x0)
    v11 = take(y1i, x1i)
    # broadcast weights over (R, oy, ry, ox, rx, C)
    wy0 = (1 - ly)[:, :, :, None, None, None]
    wy1 = ly[:, :, :, None, None, None]
    wx0 = (1 - lx)[:, None, None, :, :, None]
    wx1 = lx[:, None, None, :, :, None]
    val = wy0 * wx0 * v00 + wy0 * wx1 * v01 + wy1 * wx0 * v10 + wy1 * wx1 * v11
    ok = (in_y[:, :, :, None, None] & in_x[:, None, None, :, :])[..., None]
    val = torch.where(ok, val, torch.zeros((), dtype=feat.dtype))
    # average over the ratio x ratio grid → (R, oy, ox, C) → (R, C, s, s)
    pooled = val.mean(dim=(2, 4))
    return pooled.permute(0, 3, 1, 2)


def torch_multilevel_roi_align(feats, rois_t, bidx_t, strides=(4, 8, 16, 32),
                               out_size=7, ratio=2, finest_scale=56.0):
    """Level routing (single_level_roi_extractor.py:44), differentiable."""
    area = (rois_t[:, 2] - rois_t[:, 0]).clamp(min=0) * (
        rois_t[:, 3] - rois_t[:, 1]
    ).clamp(min=0)
    lvl = torch.floor(torch.log2(torch.sqrt(area) / finest_scale + 1e-6))
    lvl = lvl.clamp(0, len(strides) - 1).long()
    R = rois_t.shape[0]
    C = feats[0].shape[1]
    out = feats[0].new_zeros((R, C, out_size, out_size))
    for li in range(len(strides)):
        sel = (lvl == li).nonzero(as_tuple=True)[0]
        if sel.numel():
            out[sel] = torch_roi_align_level(
                feats[li], rois_t[sel], bidx_t[sel], 1.0 / strides[li],
                out_size, ratio,
            )
    return out


# ---------------------------------------------------------------------------
# full training-loss replica
# ---------------------------------------------------------------------------

def replica_losses(
    tm,
    images_nhwc: np.ndarray,          # (B, H, W, 3) pre-normalized float32
    gt_boxes: np.ndarray,             # (B, G, 4) padded
    gt_labels: np.ndarray,            # (B, G)
    gt_valid: np.ndarray,             # (B, G) bool
    rpn_pos: np.ndarray,              # (B, N) bool — injected decision
    rpn_neg: np.ndarray,              # (B, N) bool — injected decision
    proposals: np.ndarray,            # (B, P, 4) — injected (data, as in mmdet)
    roi_idx: np.ndarray,              # (B, S) int into concat(gt, proposals)
    roi_idx_valid: np.ndarray,        # (B, S) bool
    roi_idx_pos: np.ndarray,          # (B, S) bool
    num_classes: int,
    rcnn_target_stds=(0.1, 0.1, 0.2, 0.2),
    replay_feats: np.ndarray = None,  # (n, 12544) torch-(C,H,W)-major flat
    replay_labels: np.ndarray = None,
    ewc_terms=None,                   # list of (torch param, imp np, old np)
    ewc_weight: float = 1000.0,
    precomputed=None,                 # optional (feats, cls_maps, reg_maps)
):
    """Forward the torch model in train mode and build every loss term
    with mmdet's exact weighting; returns dict of torch scalars (call
    .backward() on their sum for gradients).

    ``precomputed`` lets a training loop that already ran the grad-graph
    forward (to build its own proposals/sampling) reuse it instead of
    paying a second forward (tests/torch_train_replica.py)."""
    B = images_nhwc.shape[0]
    if precomputed is not None:
        feats, cls_maps, reg_maps = precomputed
    else:
        x = torch.from_numpy(
            np.ascontiguousarray(images_nhwc.transpose(0, 3, 1, 2))
        )
        feats = tm.extract_feat(x)
        cls_maps, reg_maps = tm.rpn_forward(feats)

    # --- RPN flatten: (B, A, H, W) → permute → (B, H*W*A) like
    # anchor_head.py loss_by_feat's images_to_levels ordering
    cls_flat = torch.cat(
        [m.permute(0, 2, 3, 1).reshape(B, -1) for m in cls_maps], dim=1
    )
    reg_flat = torch.cat(
        [m.permute(0, 2, 3, 1).reshape(B, -1, 4) for m in reg_maps], dim=1
    )

    gen = AnchorGenerator()
    sizes = [(f.shape[2], f.shape[3]) for f in feats]
    anchors = np.concatenate(gen.grid_anchors(sizes))

    # --- RPN targets (assignment recomputed independently here)
    tgt = np.zeros((B,) + anchors.shape, np.float32)
    for i in range(B):
        assigned = np_max_iou_assign(
            anchors, gt_boxes[i], gt_valid[i], 0.7, 0.3, 0.3,
            match_low_quality=True,
        )
        pos_sel = np.asarray(rpn_pos[i])
        assert (assigned[pos_sel] >= 0).all(), "injected pos not assigned-pos"
        g = np.clip(assigned, 0, None)
        tgt[i] = np_bbox2delta(anchors, gt_boxes[i][g])

    pos_t = torch.from_numpy(np.asarray(rpn_pos, np.float32))
    w_t = torch.from_numpy(np.asarray(rpn_pos | rpn_neg, np.float32))
    avg = w_t.sum().clamp(min=1.0)
    bce = F.binary_cross_entropy_with_logits(cls_flat, pos_t, reduction="none")
    losses = {
        "loss_rpn_cls": (bce * w_t).sum() / avg,
        "loss_rpn_bbox": (
            (reg_flat - torch.from_numpy(tgt)).abs() * pos_t[..., None]
        ).sum() / avg,
    }

    # --- RoI stage on injected sampled candidates
    S = roi_idx.shape[1]
    cand = np.concatenate([gt_boxes, proposals], axis=1)  # (B, G+P, 4)
    rois = np.take_along_axis(cand, roi_idx[..., None], axis=1)  # (B, S, 4)
    labels = np.zeros((B, S), np.int64)
    rtgt = np.zeros((B, S, 4), np.float32)
    for i in range(B):
        cvalid = np.concatenate([
            gt_valid[i], np.ones(proposals.shape[1], bool)
        ])
        assigned = np_max_iou_assign(
            cand[i], gt_boxes[i], gt_valid[i], 0.5, 0.5, 0.5,
            match_low_quality=False, prior_valid=cvalid,
        )
        a_s = assigned[roi_idx[i]]
        assert (a_s[roi_idx_pos[i]] >= 0).all()
        g = np.clip(a_s, 0, None)
        lab = np.where(roi_idx_pos[i], gt_labels[i][g], num_classes)
        labels[i] = np.where(roi_idx_valid[i], lab, num_classes)
        rtgt[i] = np.where(
            roi_idx_pos[i][:, None],
            np_bbox2delta(rois[i], gt_boxes[i][g], stds=rcnn_target_stds),
            0.0,
        )

    rois_t = torch.from_numpy(rois.reshape(-1, 4).astype(np.float32))
    bidx_t = torch.from_numpy(np.repeat(np.arange(B), S))
    roi_feats = torch_multilevel_roi_align(feats[:4], rois_t, bidx_t)
    cls, reg = tm.bbox_head_forward(roi_feats.reshape(B * S, -1))

    lab_t = torch.from_numpy(labels.reshape(-1))
    val_t = torch.from_numpy(roi_idx_valid.reshape(-1).astype(np.float32))
    pos_rt = torch.from_numpy(roi_idx_pos.reshape(-1).astype(np.float32))
    avg_r = val_t.sum().clamp(min=1.0)
    logp = F.log_softmax(cls, dim=-1)
    ll = logp.gather(1, lab_t.clamp(min=0)[:, None])[:, 0]
    losses["loss_cls"] = (-ll * val_t).sum() / avg_r
    n = reg.shape[0]
    sel = reg.reshape(n, num_classes, 4).gather(
        1, lab_t.clamp(0, num_classes - 1)[:, None, None].expand(n, 1, 4)
    )[:, 0]
    losses["loss_bbox"] = (
        (sel - torch.from_numpy(rtgt.reshape(-1, 4))).abs() * pos_rt[:, None]
    ).sum() / avg_r

    # --- RePRE prototype replay CE (softmax-before-CE double
    # normalization, standard_roi_replay_head.py:468-501)
    if replay_feats is not None:
        rcls, _ = tm.bbox_head_forward(torch.from_numpy(replay_feats))
        pre = tm.task_split[tm.task_id]
        sliced = torch.cat([rcls[:, :pre], rcls[:, -1:]], dim=-1)
        probs = torch.softmax(sliced, dim=-1)
        logp2 = torch.log_softmax(probs, dim=-1)
        lab = torch.from_numpy(np.asarray(replay_labels, np.int64))
        losses["replay_loss_cls"] = -logp2.gather(1, lab[:, None]).mean()

    # --- EWC (nsrunner:972: 1000 * imp * (p - old)^2)
    if ewc_terms:
        tot = torch.zeros(())
        for p, imp, old in ewc_terms:
            tot = tot + (
                torch.from_numpy(imp) * (p - torch.from_numpy(old)) ** 2
            ).sum()
        losses["ewc_loss"] = ewc_weight * tot
    return losses


def mmdet_grad_dict(tm):
    """Gradients keyed exactly like mmdet_state_dict (zeros for buffers
    and never-touched params), ready for convert_detector_state_dict."""
    gd = {}

    def put(key, tensor):
        g = tensor.grad if isinstance(tensor, torch.nn.Parameter) else None
        gd[key] = (
            g.detach().numpy().copy() if g is not None
            else np.zeros(tuple(tensor.shape), np.float32)
        )

    bb_params = dict(tm.backbone.named_parameters())
    for k, v in tm.backbone.state_dict().items():
        if k in bb_params:
            put(f"backbone.{k}", bb_params[k])
        else:
            gd[f"backbone.{k}"] = np.zeros(tuple(v.shape), np.float32)
    for i in range(4):
        put(f"neck.lateral_convs.{i}.conv.weight", tm.lateral[i].weight)
        put(f"neck.lateral_convs.{i}.conv.bias", tm.lateral[i].bias)
        put(f"neck.fpn_convs.{i}.conv.weight", tm.fpn[i].weight)
        put(f"neck.fpn_convs.{i}.conv.bias", tm.fpn[i].bias)
    for nm in ("rpn_conv", "rpn_cls", "rpn_reg"):
        m = getattr(tm, nm)
        put(f"rpn_head.{nm}.weight", m.weight)
        put(f"rpn_head.{nm}.bias", m.bias)
    for i, fc in enumerate((tm.shared_fc1, tm.shared_fc2)):
        put(f"roi_head.bbox_head.shared_fcs.{i}.weight", fc.weight)
        put(f"roi_head.bbox_head.shared_fcs.{i}.bias", fc.bias)
    for i, fc in enumerate(tm.fc_cls):
        put(f"roi_head.bbox_head.fc_cls.{i}.weight", fc.weight)
        put(f"roi_head.bbox_head.fc_cls.{i}.bias", fc.bias)
    for i, fc in enumerate(tm.fc_reg):
        put(f"roi_head.bbox_head.fc_reg.{i}.weight", fc.weight)
        put(f"roi_head.bbox_head.fc_reg.{i}.bias", fc.bias)
    return gd
