"""RoIPool (max pooling) — legacy C4-model op.

Parity target: mmcv RoIPool (imported by mmdet/apis/inference.py:10 for
legacy C4 configs; not on the NSGP-RePRE main path — provided for
inventory completeness). Static-shape design: each output bin max-pools
a fixed ``samples_per_bin`` grid of nearest-neighbor taps, which equals
exact RoIPool whenever the bin spans ≤ samples_per_bin pixels.
"""
from __future__ import annotations

import jax.numpy as jnp
import numpy as np


def roi_pool(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    samples_per_bin: int = 4,
) -> jnp.ndarray:
    """Max-pool RoI bins from an NHWC map.

    Args:
        features: (B, H, W, C); rois: (R, 4) image coords; batch_idx: (R,).

    Returns:
        (R, output_size, output_size, C).
    """
    B, H, W, C = features.shape
    R = rois.shape[0]
    o = output_size
    s = samples_per_bin

    x1 = jnp.floor(rois[:, 0] * spatial_scale)
    y1 = jnp.floor(rois[:, 1] * spatial_scale)
    x2 = jnp.ceil(rois[:, 2] * spatial_scale)
    y2 = jnp.ceil(rois[:, 3] * spatial_scale)
    bw = jnp.maximum(x2 - x1, 1.0) / o
    bh = jnp.maximum(y2 - y1, 1.0) / o

    # s taps per bin along each axis (nearest pixel)
    pos = (np.arange(o * s, dtype=np.float32) // s) + (
        (np.arange(o * s) % s) + 0.5
    ) / s
    ys = y1[:, None] + pos[None, :] * bh[:, None]
    xs = x1[:, None] + pos[None, :] * bw[:, None]
    iy = jnp.clip(jnp.floor(ys), 0, H - 1).astype(jnp.int32)
    ix = jnp.clip(jnp.floor(xs), 0, W - 1).astype(jnp.int32)

    flat = features.reshape(B * H * W, C)
    base = batch_idx.astype(jnp.int32)[:, None, None] * (H * W)
    lin = base + iy[:, :, None] * W + ix[:, None, :]  # (R, os, os)
    vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(R, o, s, o, s, C)
    return vals.max(axis=(2, 4))
