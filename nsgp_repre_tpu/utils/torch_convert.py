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
