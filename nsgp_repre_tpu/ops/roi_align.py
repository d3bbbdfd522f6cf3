"""RoIAlign as XLA gathers over a flattened feature pyramid.

Replaces mmcv's native C++/CUDA RoIAlign (imported by
mmdet/models/roi_heads/roi_extractors/single_level_roi_extractor.py:65)
and the FPN level routing of ``SingleRoIExtractor.map_roi_levels``
(single_level_roi_extractor.py:44).

TPU-first design notes:
- All FPN levels are flattened into ONE (sum_l B*H_l*W_l, C) buffer; each
  RoI computes its level (floor(log2(sqrt(area)/56))) and gathers its
  bilinear samples directly from that buffer — one gather pass instead of
  running RoIAlign on every level and masking (4x less HBM traffic).
- ``sampling_ratio`` must be static. mmcv's sampling_ratio=0 means
  "ceil(bin_size) samples per bin" which is data-dependent; we default to
  a fixed 2x2 grid per bin (the detectron2 convention) — numerically very
  close and shape-static.
- Gradients flow through the gathers automatically (XLA scatter-add on
  the backward pass); no custom VJP needed for correctness. A fused
  Pallas kernel is the planned fast path.
"""
from __future__ import annotations

from typing import Sequence

import jax.numpy as jnp
import numpy as np


def _bilinear_weights_indices(y, x, height, width):
    """Corner indices + weights for bilinear sampling with mmcv semantics.

    ``height``/``width`` may be per-sample arrays (multi-level case).
    Samples more than one pixel outside the map contribute zero.
    """
    outside = (y < -1.0) | (y > height) | (x < -1.0) | (x > width)
    y = jnp.clip(y, 0.0, height - 1.0)
    x = jnp.clip(x, 0.0, width - 1.0)
    y0 = jnp.floor(y)
    x0 = jnp.floor(x)
    y1 = jnp.minimum(y0 + 1.0, height - 1.0)
    x1 = jnp.minimum(x0 + 1.0, width - 1.0)
    ly = y - y0
    lx = x - x0
    hy = 1.0 - ly
    hx = 1.0 - lx
    w = jnp.stack([hy * hx, hy * lx, ly * hx, ly * lx], axis=-1)
    w = jnp.where(outside[..., None], 0.0, w)
    iy = jnp.stack([y0, y0, y1, y1], axis=-1).astype(jnp.int32)
    ix = jnp.stack([x0, x1, x0, x1], axis=-1).astype(jnp.int32)
    return iy, ix, w


def _sample_grid(rois, spatial_scale, output_size, sampling_ratio, aligned):
    """Continuous sample coordinates per RoI.

    Returns (R, oh*ow*s*s) y and x coordinate arrays plus the averaging
    denominator (s*s).
    """
    oh = ow = output_size
    s = sampling_ratio
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * spatial_scale - offset
    y1 = rois[:, 1] * spatial_scale - offset
    x2 = rois[:, 2] * spatial_scale - offset
    y2 = rois[:, 3] * spatial_scale - offset
    roi_w = x2 - x1
    roi_h = y2 - y1
    if not aligned:
        roi_w = jnp.maximum(roi_w, 1.0)
        roi_h = jnp.maximum(roi_h, 1.0)
    bin_w = roi_w / ow
    bin_h = roi_h / oh

    # (oh*s,) fractional positions of sample rows within the roi
    gy = (np.arange(oh * s, dtype=np.float32).reshape(oh, s) // s).reshape(-1)
    sub_y = ((np.arange(oh * s, dtype=np.float32) % s) + 0.5) / s
    pos_y = gy + sub_y  # in units of bins
    gx = (np.arange(ow * s, dtype=np.float32).reshape(ow, s) // s).reshape(-1)
    sub_x = ((np.arange(ow * s, dtype=np.float32) % s) + 0.5) / s
    pos_x = gx + sub_x

    ys = y1[:, None] + pos_y[None, :] * bin_h[:, None]  # (R, oh*s)
    xs = x1[:, None] + pos_x[None, :] * bin_w[:, None]  # (R, ow*s)
    # full grid (R, oh*s, ow*s)
    yy = jnp.broadcast_to(ys[:, :, None], (rois.shape[0], oh * s, ow * s))
    xx = jnp.broadcast_to(xs[:, None, :], (rois.shape[0], oh * s, ow * s))
    return yy.reshape(rois.shape[0], -1), xx.reshape(rois.shape[0], -1)


def roi_align(
    features: jnp.ndarray,
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    output_size: int = 7,
    spatial_scale: float = 1.0,
    sampling_ratio: int = 2,
    aligned: bool = True,
) -> jnp.ndarray:
    """Single-level RoIAlign.

    Args:
        features: (B, H, W, C) NHWC feature map.
        rois: (R, 4) corner boxes in image coordinates.
        batch_idx: (R,) int32 image index of each roi.
        spatial_scale: feature stride reciprocal.

    Returns:
        (R, output_size, output_size, C) pooled features.
    """
    B, H, W, C = features.shape
    R = rois.shape[0]
    s = sampling_ratio
    yy, xx = _sample_grid(rois, spatial_scale, output_size, s, aligned)
    iy, ix, w = _bilinear_weights_indices(yy, xx, float(H), float(W))
    flat = features.reshape(B * H * W, C)
    base = batch_idx[:, None, None] * (H * W)
    lin = base + iy * W + ix  # (R, P, 4)
    vals = jnp.take(flat, lin.reshape(-1), axis=0).reshape(R, -1, 4, C)
    sampled = (vals * w[..., None]).sum(axis=2)  # (R, P, C)
    sampled = sampled.reshape(R, output_size, s, output_size, s, C)
    return sampled.mean(axis=(2, 4))


def multilevel_roi_align_auto(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    mode: str = "window",
    **kw,
) -> jnp.ndarray:
    """Backend dispatch: ``mode='window'`` uses the Pallas windowed-DMA
    kernel (ops/roi_align_pallas.py) on TPU backends; ``'gather'`` (or
    any CPU backend) uses the packed XLA gather below with
    reference-exact level routing."""
    import jax

    if mode == "window" and jax.default_backend() != "cpu":
        from .roi_align_pallas import WIN, multilevel_roi_align_window

        # The window kernel's fit guarantee (route_levels bump) only
        # holds when the coarsest level map itself fits inside the
        # (WIN, WIN) window — a canvas-sized roi cannot bump further.
        # For canvases beyond WIN * strides[-1] (~1536 px at stride 32)
        # fall back to the gather path instead of silently zero-weighting
        # samples outside the window.
        h_last, w_last = features[-1].shape[1:3]
        if h_last <= WIN and w_last <= WIN:
            return multilevel_roi_align_window(features, rois, batch_idx, **kw)
    kw.pop("blocked_images", None)  # window-path-only hint
    return multilevel_roi_align(features, rois, batch_idx, **kw)


def multilevel_roi_align(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    strides: Sequence[int] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    aligned: bool = True,
    lvl_override: jnp.ndarray = None,
) -> jnp.ndarray:
    """FPN RoIAlign with per-RoI level routing in ONE gather pass.

    Level rule (single_level_roi_extractor.py:44):
        lvl = clamp(floor(log2(sqrt(area) / finest_scale + 1e-6)), 0, L-1)

    Args:
        features: list of (B, H_l, W_l, C) NHWC maps, one per stride.
        rois: (R, 4) boxes in image coordinates.
        batch_idx: (R,) int32.
        lvl_override: optional (R,) int32 per-roi level replacing the
            standard routing (used by the Pallas window path's backward
            to reproduce its window-fit level bump exactly).

    Returns:
        (R, output_size, output_size, C) pooled features.
    """
    L = len(features)
    B, _, _, C = features[0].shape
    R = rois.shape[0]
    ss = sampling_ratio

    # ---- per-roi level assignment ----
    if lvl_override is not None:
        lvl = lvl_override.astype(jnp.int32)
    else:
        area = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
        scale = jnp.sqrt(jnp.maximum(area, 0.0))
        lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
        lvl = jnp.clip(lvl, 0, L - 1).astype(jnp.int32)

    # ---- flatten the pyramid into one buffer with level offsets ----
    sizes = [f.shape[1] * f.shape[2] for f in features]  # H_l * W_l
    offsets = np.concatenate([[0], np.cumsum([B * s for s in sizes])])[:-1]
    flat = jnp.concatenate([f.reshape(B * sz, C) for f, sz in zip(features, sizes)], axis=0)

    h_tab = np.asarray([f.shape[1] for f in features], dtype=np.float32)
    w_tab = np.asarray([f.shape[2] for f in features], dtype=np.float32)
    scale_tab = np.asarray([1.0 / s for s in strides], dtype=np.float32)
    off_tab = np.asarray(offsets, dtype=np.int32)
    sz_tab = np.asarray(sizes, dtype=np.int32)

    roi_scale = jnp.take(jnp.asarray(scale_tab), lvl)  # (R,)
    roi_h = jnp.take(jnp.asarray(h_tab), lvl)
    roi_w = jnp.take(jnp.asarray(w_tab), lvl)
    roi_off = jnp.take(jnp.asarray(off_tab), lvl)
    roi_sz = jnp.take(jnp.asarray(sz_tab), lvl)

    # ---- sample grid in level coordinates (per-roi scale) ----
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] * roi_scale - offset
    y1 = rois[:, 1] * roi_scale - offset
    roi_bw = (rois[:, 2] - rois[:, 0]) * roi_scale / output_size
    roi_bh = (rois[:, 3] - rois[:, 1]) * roi_scale / output_size

    n = output_size * ss
    gpos = (np.arange(n, dtype=np.float32) // ss) + ((np.arange(n) % ss) + 0.5) / ss
    ys = y1[:, None] + gpos[None, :] * roi_bh[:, None]  # (R, n)
    xs = x1[:, None] + gpos[None, :] * roi_bw[:, None]
    yy = jnp.broadcast_to(ys[:, :, None], (R, n, n)).reshape(R, -1)
    xx = jnp.broadcast_to(xs[:, None, :], (R, n, n)).reshape(R, -1)

    iy, ix, w = _bilinear_weights_indices(
        yy, xx, roi_h[:, None], roi_w[:, None]
    )
    base = roi_off[:, None, None] + (
        batch_idx.astype(jnp.int32)[:, None, None] * roi_sz[:, None, None]
    )
    lin = base + (iy * roi_w[:, None, None].astype(jnp.int32) + ix)  # (R,P,4)

    # ------------------------------------------------------------------
    # Packed one-gather-per-sample scheme. TPU row-gathers are
    # iteration-bound (~20 ns/row regardless of row bytes), so we pack
    # ALL FOUR bilinear corners of a sample into ONE gathered row:
    #   1. y-shift packing: v[i] = [flat[i], flat[i + W_l]] (2C) — a row
    #      holds both y-corners of a pixel column. The +W shift is built
    #      per level so rows never mix levels.
    #   2. x-parity packing: u_even[k] = [v[2k], v[2k+1]],
    #      u_odd[k] = [v[2k+1], v[2k+2]] (4C) — whichever buffer has
    #      (x0, x0+1) in one row, selected by the parity of the pixel id.
    # Clamped corners (x0 = W-1, y0 = H-1) read a garbage neighbor, but
    # their bilinear weight is exactly 0 (see _bilinear_weights_indices).
    # Net effect: 4x fewer gather (and backward scatter) iterations.
    # ------------------------------------------------------------------
    p0 = lin[:, :, 0]  # y0*W + x0 pixel id (per level/image base included)
    # v: (N, 2C) — second half is the next row (y+1) WITHIN each level
    shifted = []
    for f, sz in zip(features, sizes):
        w_l = f.shape[2]
        fl = f.reshape(B * sz, C)
        sh = jnp.concatenate([fl[w_l:], jnp.zeros((w_l, C), fl.dtype)], axis=0)
        shifted.append(sh)
    v = jnp.concatenate(
        [flat, jnp.concatenate(shifted, axis=0)], axis=-1
    )  # (N, 2C)
    n_rows = v.shape[0]
    pad = (-n_rows) % 2
    if pad:
        v = jnp.concatenate([v, jnp.zeros((pad, 2 * C), v.dtype)], axis=0)
    half = v.shape[0] // 2
    u_even = v.reshape(half, 4 * C)
    v_shift = jnp.concatenate([v[1:], jnp.zeros((1, 2 * C), v.dtype)], axis=0)
    u_odd = v_shift.reshape(half, 4 * C)
    u = jnp.concatenate([u_even, u_odd], axis=0)  # (2*half, 4C)

    parity = p0 & 1
    idx = (p0 >> 1) + parity * half  # (R, P)
    rows = jnp.take(u, idx.reshape(-1), axis=0).reshape(R, -1, 4, C)
    # gathered corner order: [y0x0, y1x0, y0x1, y1x1]; weights are
    # [y0x0, y0x1, y1x0, y1x1] → permute
    w_perm = jnp.stack([w[..., 0], w[..., 2], w[..., 1], w[..., 3]], axis=-1)
    sampled = (rows * w_perm[..., None]).sum(axis=2)  # (R, P, C)
    sampled = sampled.reshape(R, output_size, ss, output_size, ss, C)
    return sampled.mean(axis=(2, 4))
