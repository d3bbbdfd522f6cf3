"""torch → JAX weight conversion for the ResNet-50 backbone.

The reference initializes from ``torchvision://resnet50`` or a local
torch checkpoint (cl_faster_rcnn_nsgp_repre_15_5_1.py:41). This converts
a torch state dict (torchvision layout) into this package's flax param
paths (SURVEY §7 hard part (4): includes BN running stats, which stay
frozen — models/layers.py FrozenBatchNorm).

Layout mapping:
  conv1.weight (O,I,H,W)        → backbone/conv1/kernel (H,W,I,O)
  bn1.weight/bias               → backbone/bn1/scale,bias
  bn1.running_mean/var          → batch_stats backbone/bn1/mean,var
  layerS.B.convJ.weight         → backbone/layerS_B/convJ/kernel
  layerS.B.downsample.0.weight  → backbone/layerS_B/downsample_conv/kernel
  layerS.B.downsample.1.*       → backbone/layerS_B/downsample_bn/*
"""
from __future__ import annotations

from typing import Dict, Tuple

import numpy as np


def _to_numpy_state_dict(path: str) -> Dict[str, np.ndarray]:
    import torch

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "state_dict" in obj:
        obj = obj["state_dict"]
    out = {}
    for k, v in obj.items():
        if hasattr(v, "numpy"):
            out[k] = v.detach().cpu().numpy()
    return out


def convert_resnet50_state_dict(
    sd: Dict[str, np.ndarray], prefix: str = ""
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Returns ({param-path: array}, {batch-stat-path: array}) flat dicts
    keyed like utils/checkpoint.restore_into expects."""
    params: Dict[str, np.ndarray] = {}
    stats: Dict[str, np.ndarray] = {}

    def conv(src: str, dst: str):
        if prefix + src in sd:
            w = sd[prefix + src]
            params[f"backbone/{dst}/kernel"] = np.transpose(w, (2, 3, 1, 0))

    def bn(src: str, dst: str):
        if prefix + src + ".weight" in sd:
            params[f"backbone/{dst}/scale"] = sd[prefix + src + ".weight"]
            params[f"backbone/{dst}/bias"] = sd[prefix + src + ".bias"]
            stats[f"backbone/{dst}/mean"] = sd[prefix + src + ".running_mean"]
            stats[f"backbone/{dst}/var"] = sd[prefix + src + ".running_var"]

    conv("conv1.weight", "conv1")
    bn("bn1", "bn1")
    blocks = {1: 3, 2: 4, 3: 6, 4: 3}
    for s, n in blocks.items():
        for b in range(n):
            base = f"layer{s}.{b}."
            dst = f"layer{s}_{b}"
            for j in (1, 2, 3):
                conv(base + f"conv{j}.weight", f"{dst}/conv{j}")
                bn(base + f"bn{j}", f"{dst}/bn{j}")
            conv(base + "downsample.0.weight", f"{dst}/downsample_conv")
            bn(base + "downsample.1", f"{dst}/downsample_bn")
    return params, stats


def load_torch_resnet50(path: str):
    return convert_resnet50_state_dict(_to_numpy_state_dict(path))


def convert_detector_state_dict(
    sd: Dict[str, np.ndarray],
) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """Convert a full mmdet Faster-R-CNN(+task-head) state dict.

    Covers every module of the reference's exercised graph
    (two_stage.py: backbone → neck → rpn_head → roi_head.bbox_head):

      backbone.*                              → backbone/* (torchvision layout)
      neck.lateral_convs.{i}.conv.*           → neck/lateral_conv{i}/*
      neck.fpn_convs.{i}.conv.*               → neck/fpn_conv{i}/*
      rpn_head.rpn_{conv,cls,reg}.*           → rpn_head/rpn_{conv,cls,reg}/*
      roi_head.bbox_head.shared_fcs.{i}.*     → bbox_head/shared_fc{i+1}/*
      roi_head.bbox_head.fc_cls.{i}.*         → bbox_head/fc_cls{i}/*  (i < T)
      roi_head.bbox_head.fc_cls.{T}.*         → bbox_head/fc_cls_bg/*  (the
          reference appends one extra background classifier after the T
          per-task heads, convfc_bbox_head_task.py:94-107)
      roi_head.bbox_head.fc_reg.{i}.*         → bbox_head/fc_reg{i}/*

    Torch conv weights (O,I,H,W) become (H,W,I,O) kernels; torch linear
    weights (out,in) become (in,out) kernels. The bbox head flattens RoI
    features in torch (C,H,W) channel-major order on both sides
    (models/bbox_head.py::mid_features), so shared_fcs.0 needs no input
    permutation.

    Returns ({param-path: array}, {batch-stat-path: array}) flat dicts for
    ``utils.checkpoint.restore_into``.
    """
    params, stats = convert_resnet50_state_dict(sd, prefix="backbone.")

    def conv(src: str, dst: str):
        if src + ".weight" in sd:
            params[dst + "/kernel"] = np.transpose(sd[src + ".weight"], (2, 3, 1, 0))
            if src + ".bias" in sd:
                params[dst + "/bias"] = sd[src + ".bias"]

    def linear(src: str, dst: str):
        if src + ".weight" in sd:
            params[dst + "/kernel"] = np.transpose(sd[src + ".weight"], (1, 0))
            if src + ".bias" in sd:
                params[dst + "/bias"] = sd[src + ".bias"]

    for i in range(8):  # FPN has 4 in-levels; be permissive
        conv(f"neck.lateral_convs.{i}.conv", f"neck/lateral_conv{i}")
        conv(f"neck.fpn_convs.{i}.conv", f"neck/fpn_conv{i}")

    conv("rpn_head.rpn_conv", "rpn_head/rpn_conv")
    conv("rpn_head.rpn_cls", "rpn_head/rpn_cls")
    conv("rpn_head.rpn_reg", "rpn_head/rpn_reg")

    for i in range(8):
        linear(f"roi_head.bbox_head.shared_fcs.{i}", f"bbox_head/shared_fc{i + 1}")

    # count per-task cls heads present; the last fc_cls entry is background
    n_cls = 0
    while f"roi_head.bbox_head.fc_cls.{n_cls}.weight" in sd:
        n_cls += 1
    for i in range(n_cls):
        dst = "bbox_head/fc_cls_bg" if i == n_cls - 1 else f"bbox_head/fc_cls{i}"
        linear(f"roi_head.bbox_head.fc_cls.{i}", dst)
    i = 0
    while f"roi_head.bbox_head.fc_reg.{i}.weight" in sd:
        linear(f"roi_head.bbox_head.fc_reg.{i}", f"bbox_head/fc_reg{i}")
        i += 1

    # plain (non-task) mmdet Shared2FCBBoxHead: single fc_cls / fc_reg
    if n_cls == 0 and "roi_head.bbox_head.fc_cls.weight" in sd:
        w = sd["roi_head.bbox_head.fc_cls.weight"]
        b = sd.get("roi_head.bbox_head.fc_cls.bias")
        # mmdet orders [classes..., background]; split off the bg column
        params["bbox_head/fc_cls0/kernel"] = np.transpose(w[:-1], (1, 0))
        params["bbox_head/fc_cls_bg/kernel"] = np.transpose(w[-1:], (1, 0))
        if b is not None:
            params["bbox_head/fc_cls0/bias"] = b[:-1]
            params["bbox_head/fc_cls_bg/bias"] = b[-1:]
        linear("roi_head.bbox_head.fc_reg", "bbox_head/fc_reg0")

    return params, stats


def load_torch_detector(path: str):
    """Load an mmdet Faster-R-CNN torch checkpoint (e.g. a reference
    work-dir ``epoch_N.pth``) into restore_into-ready flat dicts."""
    return convert_detector_state_dict(_to_numpy_state_dict(path))
