"""Pallas TPU RoIAlign: windowed DMA + separable-matmul bilinear.

The XLA path (ops/roi_align.py) gathers one packed row per bilinear
sample — measured ~51 GB/s effective (gather is iteration/BW-bound), and
it dominates both the teacher predict (124.7 of 189 ms at batch 16,
tools/analysis_tools/profile_teacher.py) and the student RoI stage.

This kernel instead DMAs, per RoI, one (WIN, WIN, C) feature window from
its routed FPN level (HBM → VMEM at near-full bandwidth, double
buffered) and evaluates the bilinear pooling as two small MXU matmuls —
bilinear interpolation is separable:

    out[by, bx, c] = sum_y Wy[by, y] * sum_x Wx[bx, x] * F[y, x, c]

where ``Wy``/``Wx`` are per-RoI (7, WIN) matrices that fold together the
bilinear corner weights, the mmcv outside-the-map zeroing, and the
sample-grid averaging (mean over the ss x ss samples of each bin). They
are precomputed outside the kernel with plain jnp (vectorized, cheap).

Window-fit guarantee: a RoI routed to level l spans at most
``0.93 * side / stride_l + 3`` window pixels per axis. RoIs whose span
exceeds WIN are bumped to a coarser level until they fit (only boxes
with aspect ratio beyond ~3 at an unlucky routing boundary bump; at
level 3 any canvas up to 1536 px fits WIN=48 outright). The bump is the
one numerics deviation vs ops/roi_align.py — use ``roi_align_mode =
'gather'`` (DetectorConfig) for bit-exact parity with the reference
routing.

Gradients: the op is linear in ``features`` with roi-derived constant
weights, so the backward pass is the linear transpose of the XLA
reference implementation (a scatter-add) — no Pallas backward needed.
"""
from __future__ import annotations

import functools
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

WIN = 48  # window side (multiple of 16 for bf16 sublane tiling)
X_ALIGN = 8  # DMA x-origin alignment (HBM (8,128) tile, sublane dim = W)
# graduated window classes: mmdet routing keeps a roi's span on its
# level under ~28 pixels (floor(log2(scale/56)) doubles at 112),
# typically 13-18 for anchor-shaped boxes; with the bilinear +1, -1
# origin margin and the X_ALIGN x-slack most sampled rois fit (24, 32)
# and nearly all the rest (32, 40). Each roi is classified by its exact
# sample extent and DMAs only its class's window — the (48, 48) worst
# case (border-clamped rois, level-3 giants, sub-WIN maps whose origins
# pin to 0) moves 6x the bytes of the smallest class. Both kernels are
# window-DMA-bound, so bytes/roi ≈ time/roi.
# NOTE: measured on v5e — THREE classes ((24,32),(32,40),(48,48)) made
# the train step ~13% SLOWER than two: the per-roi (level x class)
# @pl.when fan-out on the scalar core outweighs the DMA bytes saved by
# the middle class. Keep two.
WIN_CLASSES = ((24, 32), (WIN, WIN))
SWY, SWX = WIN_CLASSES[0]  # kept for tests/docs


def _window_class(ey, ex):
    """Smallest WIN_CLASSES index whose window covers (ey, ex)."""
    k = jnp.full(ey.shape, len(WIN_CLASSES) - 1, jnp.int32)
    for i in range(len(WIN_CLASSES) - 2, -1, -1):
        wy_n, wx_n = WIN_CLASSES[i]
        k = jnp.where((ey <= wy_n) & (ex <= wx_n), i, k)
    return k


# Levels whose maps have at most this many positions are pooled with
# dense batched matmuls over the WHOLE map instead of per-roi window
# DMA when ``blocked_images=True``. The idea: coarse-level maps are
# comparable to or smaller than the (48, 48) window, so per-roi window
# DMA moves the whole map anyway; a full-map sandwich
# (sum_y wy[by,y] * sum_x wx[bx,x] * F[y,x,c], batched over images) is
# two MXU matmuls whose cost scales with map size, not roi count.
# MEASURED NEGATIVE on v5e (kept default-OFF, see detector._roi_feats):
# the y-contraction materializes a (B, G*out, W*C) f32/bf16 intermediate
# — 1.9 GB at train shapes (B=16, G=512, level-2 (38,64)x256), 3.7 GB at
# predict (G=1000) — whose HBM write+read dwarfs the DMA bytes saved:
# task-1 train 117.3 -> 91.1 img/s, batch-16 predict 139 -> 102 img/s,
# batch-1 predict 85.3 -> 78.7 fps. A VMEM-resident two-matmul kernel
# (map block stays in VMEM, intermediate never leaves) would avoid the
# round-trip; the windowed-DMA kernel is already within a few ms of
# roofline at real roi counts, so the rewrite isn't worth the risk.
# The path stays for its interpret-mode parity test (exact vs gather).
DENSE_MAX_HW = 4400


def _dense_weights(rois, lvl, l, hw, stride, out_size, ss, aligned):
    """Full-map separable weights for level ``l``, zeroed for rois
    routed elsewhere: (R, out, H), (R, out, W)."""
    H, W = hw
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] / stride - offset
    y1 = rois[:, 1] / stride - offset
    span_x = (rois[:, 2] - rois[:, 0]) / stride
    span_y = (rois[:, 3] - rois[:, 1]) / stride
    zeros = jnp.zeros((rois.shape[0],), jnp.int32)
    hl = jnp.full((rois.shape[0],), float(H))
    wl = jnp.full((rois.shape[0],), float(W))
    wy = _axis_weights(y1, span_y, zeros, out_size, ss, hl, width=H)
    wx = _axis_weights(x1, span_x, zeros, out_size, ss, wl, width=W)
    m = (lvl == l).astype(wy.dtype)[:, None, None]
    return wy * m, wx * m


def _dense_level_pool(f, wy, wx, G, out_size):
    """out[b,g,by,bx,c] = sum_{y,x} wy[bg,by,y] wx[bg,bx,x] f[b,y,x,c]."""
    B, H, W, C = f.shape
    dt = f.dtype
    t1 = jax.lax.dot_general(
        wy.reshape(B, G * out_size, H).astype(dt),
        f.reshape(B, H, W * C),
        (((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (B, G*out, W*C)
    out = jnp.einsum(
        "bgyxc,bgkx->bgykc",
        t1.reshape(B, G, out_size, W, C),
        wx.reshape(B, G, out_size, W).astype(dt),
        preferred_element_type=jnp.float32,
    )
    return out.reshape(B * G, out_size, out_size, C)


def _dense_level_pool_bwd(g, wy, wx, B, hw, out_size):
    """Transpose of ``_dense_level_pool`` w.r.t. the feature map."""
    H, W = hw
    G = g.shape[0] // B
    C = g.shape[-1]
    dt = g.dtype
    gm = g.reshape(B, G, out_size, out_size, C)
    t = jnp.einsum(
        "bgkx,bgykc->bgyxc",
        wx.reshape(B, G, out_size, W).astype(dt),
        gm,
        preferred_element_type=jnp.float32,
    ).astype(dt)  # (B, G, out, W, C)
    df = jnp.einsum(
        "bgyh,bgyxc->bhxc",
        wy.reshape(B, G, out_size, H).astype(dt),
        t,
        preferred_element_type=jnp.float32,
    )
    return df  # (B, H, W, C) f32


# ----------------------------------------------------------------------
# host/XLA-side precompute
# ----------------------------------------------------------------------
def _axis_weights(lo, span, origin, out_size, ss, limit, width=None):
    """Per-axis separable weight matrix rows.

    Args:
        lo: (R,) roi start in level coords (x1 or y1).
        span: (R,) roi extent in level coords.
        origin: (R,) int window origin.
        out_size: bins per axis (7); ss: samples per bin per axis.
        limit: (R,) valid extent of the level map along this axis.
        width: weight-matrix columns (default WIN; the dense full-map
            path passes the map extent with origin 0).

    Returns:
        (R, out_size, width) float32 — averaged bilinear weights.
    """
    if width is None:
        width = WIN
    R = lo.shape[0]
    n = out_size * ss
    # sample positions within the roi, in bin units (ops/roi_align.py)
    g = (np.arange(n, dtype=np.float32) // ss) + ((np.arange(n) % ss) + 0.5) / ss
    bin_sz = span / out_size  # (R,)
    pos = lo[:, None] + g[None, :] * bin_sz[:, None]  # (R, n)

    lim = limit[:, None].astype(jnp.float32)
    outside = (pos < -1.0) | (pos > lim)
    p = jnp.clip(pos, 0.0, lim - 1.0)
    p0 = jnp.floor(p)
    p1 = jnp.minimum(p0 + 1.0, lim - 1.0)
    lw = p - p0
    w0 = jnp.where(outside, 0.0, 1.0 - lw) / ss
    w1 = jnp.where(outside, 0.0, lw) / ss
    i0 = p0.astype(jnp.int32) - origin[:, None]  # window-relative
    i1 = p1.astype(jnp.int32) - origin[:, None]

    cols = jnp.arange(width, dtype=jnp.int32)
    m = (
        w0[..., None] * (i0[..., None] == cols)
        + w1[..., None] * (i1[..., None] == cols)
    )  # (R, n, width)
    return m.reshape(R, out_size, ss, width).sum(axis=2)


def route_levels(
    rois: jnp.ndarray,
    level_hw: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    out_size: int,
    ss: int,
    finest_scale: float,
) -> jnp.ndarray:
    """Per-RoI FPN level with the window-fit bump.

    Standard mmdet routing (floor(log2(sqrt(area)/finest_scale))), then
    bump to a coarser level until the sample span fits the window:
    samples cover (out - 1/ss)/out of the roi extent per axis, plus the
    bilinear +1 neighbor, the -1 origin margin, and the x-origin
    alignment slack (HBM tiling: DMA slice starts in the W dim must be
    X_ALIGN-aligned). A level whose map already fits inside the window
    always works (indices are clamped into the map, mmcv
    outside-zeroing applies).

    Exposed so the backward pass (and parity tests) can reproduce the
    kernel's routing exactly via ops.roi_align.multilevel_roi_align's
    ``lvl_override``.
    """
    L = len(strides)
    area = (rois[:, 2] - rois[:, 0]) * (rois[:, 3] - rois[:, 1])
    scale = jnp.sqrt(jnp.maximum(area, 0.0))
    lvl = jnp.floor(jnp.log2(scale / finest_scale + 1e-6))
    lvl = jnp.clip(lvl, 0, L - 1).astype(jnp.int32)

    w_img = rois[:, 2] - rois[:, 0]
    h_img = rois[:, 3] - rois[:, 1]
    frac = (out_size - 1.0 / ss) / out_size
    for l in range(L):
        s = float(strides[l])
        h_l, w_l = level_hw[l]
        fits = (
            (h_img / s * frac + 3.0 <= WIN)
            & (w_img / s * frac + 3.0 + X_ALIGN <= WIN)
        ) | ((h_l <= WIN) & (w_l <= WIN))
        lvl = jnp.where((lvl == l) & ~fits, l + 1, lvl)
    return jnp.clip(lvl, 0, L - 1)


def _route_and_weights(
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    level_hw: Sequence[Tuple[int, int]],
    strides: Sequence[int],
    out_size: int,
    ss: int,
    finest_scale: float,
    aligned: bool = True,
):
    """Level routing (+ window-fit bump), window origins, weight mats."""
    lvl = route_levels(rois, level_hw, strides, out_size, ss, finest_scale)

    stride_tab = jnp.asarray([float(s) for s in strides])
    h_tab = jnp.asarray([float(h) for h, _ in level_hw])
    w_tab = jnp.asarray([float(w) for _, w in level_hw])
    w_img = rois[:, 2] - rois[:, 0]
    h_img = rois[:, 3] - rois[:, 1]

    stride = stride_tab[lvl]
    offset = 0.5 if aligned else 0.0
    x1 = rois[:, 0] / stride - offset
    y1 = rois[:, 1] / stride - offset
    span_x = w_img / stride
    span_y = h_img / stride

    h_lim = h_tab[lvl]
    w_lim = w_tab[lvl]
    # window origin: cover [floor(first sample) - 1, ...]; clamp into the
    # PADDED map (per-axis >= WIN; width rounded up to X_ALIGN, matching
    # _pad_level)
    pad_h_tab = jnp.asarray([float(max(WIN, h)) for h, _ in level_hw])
    pad_w_tab = jnp.asarray(
        [float(max(WIN, -(-w // X_ALIGN) * X_ALIGN)) for _, w in level_hw]
    )
    ss_off = 0.5 / ss
    oy = jnp.floor(y1 + ss_off * span_y / out_size) - 1
    ox = jnp.floor(x1 + ss_off * span_x / out_size) - 1
    oy = jnp.clip(oy, 0, pad_h_tab[lvl] - WIN).astype(jnp.int32)
    # x origin must be X_ALIGN-aligned for the HBM-tiled DMA slice; the
    # padded widths are multiples of X_ALIGN so the clip preserves it
    ox = jnp.clip(ox, 0, pad_w_tab[lvl] - WIN).astype(jnp.int32)
    ox = (ox // X_ALIGN) * X_ALIGN

    wy = _axis_weights(y1, span_y, oy, out_size, ss, h_lim)
    wx = _axis_weights(x1, span_x, ox, out_size, ss, w_lim)

    def extent(lo, span, origin, limit):
        """Rows touched by any sample: last bilinear tap - origin + 1."""
        n = out_size * ss
        g_last = (n - 1) // ss + (((n - 1) % ss) + 0.5) / ss
        pos_max = lo + g_last * (span / out_size)
        lim = limit.astype(jnp.float32)
        p = jnp.clip(pos_max, 0.0, lim - 1.0)
        p1 = jnp.minimum(jnp.floor(p) + 1.0, lim - 1.0)
        return p1.astype(jnp.int32) - origin + 1

    ey = extent(y1, span_y, oy, h_lim)
    ex = extent(x1, span_x, ox, w_lim)
    return lvl, oy, ox, wy, wx, ey, ex


# ----------------------------------------------------------------------
# kernel
# ----------------------------------------------------------------------
def _roi_kernel(
    lvl_ref, b_ref, oy_ref, ox_ref, wcls_ref,  # scalar prefetch (R,)
    wy_ref, wx_ref, *rest, T: int, L: int, C: int, out_size: int
):
    level_refs = rest[:L]
    out_ref = rest[L]
    win = rest[L + 1]
    sems = rest[L + 2]
    prog = pl.program_id(0)

    def window_copy(r, l, slot, wy_n, wx_n):
        ox = pl.multiple_of(ox_ref[r], X_ALIGN)
        return pltpu.make_async_copy(
            level_refs[l].at[
                b_ref[r], pl.ds(oy_ref[r], wy_n), pl.ds(ox, wx_n), :
            ],
            win.at[slot, pl.ds(0, wy_n), pl.ds(0, wx_n)],
            sems.at[slot],
        )

    def dma_op(i, slot, op):
        r = prog * T + i
        for l in range(L):
            for k, (wy_n, wx_n) in enumerate(WIN_CLASSES):
                @pl.when((lvl_ref[r] == l) & (wcls_ref[r] == k))
                def _(wy_n=wy_n, wx_n=wx_n):
                    getattr(window_copy(r, l, slot, wy_n, wx_n), op)()

    dma_op(0, 0, "start")
    for i in range(T):
        slot = i % 2
        if i + 1 < T:
            dma_op(i + 1, (i + 1) % 2, "start")
        dma_op(i, slot, "wait")
        r = prog * T + i

        def pool(wy_n, wx_n):
            f = win[slot, :wy_n, :wx_n].reshape(wy_n, wx_n * C)
            t1 = jnp.dot(
                wy_ref[i, :, :wy_n], f, preferred_element_type=jnp.float32
            )  # (out, wx_n*C)
            t1 = t1.reshape(out_size, wx_n, C).astype(wy_ref.dtype)
            for sy in range(out_size):
                out_ref[i, sy] = jnp.dot(
                    wx_ref[i, :, :wx_n], t1[sy],
                    preferred_element_type=jnp.float32,
                ).astype(out_ref.dtype)

        for k, (wy_n, wx_n) in enumerate(WIN_CLASSES):
            @pl.when(wcls_ref[r] == k)
            def _(wy_n=wy_n, wx_n=wx_n):
                pool(wy_n, wx_n)

        # dense-level rois (wcls == -1) are pooled outside the kernel;
        # zero their rows so the caller can add the dense contribution
        @pl.when(wcls_ref[r] < 0)
        def _():
            out_ref[i] = jnp.zeros_like(out_ref[i])


def _pad_level(f: jnp.ndarray) -> jnp.ndarray:
    """Pad a level map so both spatial dims are >= WIN and the width is a
    multiple of X_ALIGN (so clipped window origins stay aligned and edge
    windows keep full coverage)."""
    _, h, w, _ = f.shape
    ph = max(WIN - h, 0)
    w_target = max(WIN, -(-w // X_ALIGN) * X_ALIGN)
    pw = w_target - w
    if ph or pw:
        f = jnp.pad(f, ((0, 0), (0, ph), (0, pw), (0, 0)))
    return f


def _dense_levels(level_hw, batch_size, R, blocked_images):
    """Static list of levels pooled densely (full-map matmuls)."""
    if not blocked_images or batch_size < 1 or R % batch_size != 0:
        return []
    return [
        l for l, (h, w) in enumerate(level_hw) if h * w <= DENSE_MAX_HW
    ]


@functools.partial(
    jax.jit,
    static_argnames=("strides", "output_size", "sampling_ratio",
                     "finest_scale", "aligned", "blocked_images",
                     "interpret"),
)
def multilevel_roi_align_pallas(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    strides: Tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    aligned: bool = True,
    blocked_images: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """FPN RoIAlign, Pallas fast path (forward).

    Same contract as ops.roi_align.multilevel_roi_align. Numerics match
    except extreme-aspect RoIs whose sample span exceeds the window — they
    are routed one level coarser (see module docstring).

    ``blocked_images=True`` asserts rois are image-major blocked
    (batch_idx = repeat(arange(B), R/B) — all detector paths) and
    enables the dense full-map pooling for sub-DENSE_MAX_HW levels.
    """
    L = len(features)
    B, _, _, C = features[0].shape
    R = rois.shape[0]
    T = 8  # rois per grid program
    assert R % T == 0, f"roi count {R} must be a multiple of {T}"
    dtype = features[0].dtype

    level_hw = [(f.shape[1], f.shape[2]) for f in features]
    lvl, oy, ox, wy, wx, ey, ex = _route_and_weights(
        rois, batch_idx, level_hw, strides, output_size, sampling_ratio,
        finest_scale, aligned,
    )
    wcls = _window_class(ey, ex)
    dense = _dense_levels(level_hw, B, R, blocked_images)
    for l in dense:
        wcls = jnp.where(lvl == l, -1, wcls)
    padded = [_pad_level(f) for f in features[:L]]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=5,
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec(
                (T, output_size, WIN), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (T, output_size, WIN), lambda g, *_: (g, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(L)],
        out_specs=pl.BlockSpec(
            (T, output_size, output_size, C),
            lambda g, *_: (g, 0, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        scratch_shapes=[
            pltpu.VMEM((2, WIN, WIN, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _roi_kernel, T=T, L=L, C=C, out_size=output_size
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((R, output_size, output_size, C), dtype),
        interpret=interpret,
    )(
        lvl, batch_idx.astype(jnp.int32), oy, ox, wcls,
        wy.astype(dtype), wx.astype(dtype), *padded,
    )
    G = R // B if B else 0
    for l in dense:
        dwy, dwx = _dense_weights(
            rois, lvl, l, level_hw[l], float(strides[l]), output_size,
            sampling_ratio, aligned,
        )
        out = out + _dense_level_pool(
            features[l], dwy, dwx, G, output_size
        ).astype(dtype)
    return out


def multilevel_roi_align_window(
    features: Sequence[jnp.ndarray],
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    strides: Tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    aligned: bool = True,
    blocked_images: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Differentiable FPN RoIAlign via the windowed-DMA Pallas kernel.

    Forward: ``multilevel_roi_align_pallas`` (handles roi-count padding
    to the kernel's per-program tile). Backward: the op is linear in
    ``features`` with roi-derived constant weights, so the gradient is
    an exact linear transpose — on TPU backends it runs as a second
    Pallas kernel (``multilevel_roi_align_bwd_pallas``, sequential
    read-modify-write window accumulation); CPU/interpret fall back to
    the VJP of the XLA gather implementation run with this kernel's
    (window-fit-bumped) level routing. RoI/batch-index gradients are
    zero (the reference CUDA RoIAlign likewise returns no box gradient,
    and proposals are stop-gradient'd in the detector).
    """
    R = rois.shape[0]
    pad = (-R) % 8  # kernel tiles 8 rois per grid program
    if pad:
        rois = jnp.concatenate([rois, jnp.zeros((pad, 4), rois.dtype)])
        batch_idx = jnp.concatenate(
            [batch_idx, jnp.zeros((pad,), batch_idx.dtype)]
        )
        blocked_images = False  # padding breaks the image-major blocks
    shapes = tuple((tuple(f.shape), str(f.dtype)) for f in features)
    out = _window_op(
        list(features), rois, batch_idx, strides, output_size,
        sampling_ratio, finest_scale, aligned, blocked_images,
        interpret, shapes,
    )
    return out[:R] if pad else out


@functools.partial(
    jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10)
)
def _window_op(features, rois, batch_idx, strides, output_size,
               sampling_ratio, finest_scale, aligned, blocked_images,
               interpret, shapes):
    return multilevel_roi_align_pallas(
        features, rois, batch_idx,
        strides=strides, output_size=output_size,
        sampling_ratio=sampling_ratio, finest_scale=finest_scale,
        aligned=aligned, blocked_images=blocked_images,
        interpret=interpret,
    )


def _window_fwd(features, rois, batch_idx, strides, output_size,
                sampling_ratio, finest_scale, aligned, blocked_images,
                interpret, shapes):
    out = _window_op(
        features, rois, batch_idx, strides, output_size,
        sampling_ratio, finest_scale, aligned, blocked_images,
        interpret, shapes,
    )
    return out, (rois, batch_idx)


def _window_bwd(strides, output_size, sampling_ratio, finest_scale,
                aligned, blocked_images, interpret, shapes, res, g):
    from .roi_align import multilevel_roi_align

    rois, batch_idx = res
    level_hw = tuple((s[1], s[2]) for s, _ in shapes)
    if not interpret and jax.default_backend() != "cpu":
        # Pallas read-modify-write window accumulation: 2.5x the XLA
        # scatter transpose (46.6 vs 118.3 ms at R=8192, C=256, bf16)
        d_feats = multilevel_roi_align_bwd_pallas(
            g, rois, batch_idx, level_hw, shapes[0][0][0],
            strides=strides, output_size=output_size,
            sampling_ratio=sampling_ratio, finest_scale=finest_scale,
            aligned=aligned, blocked_images=blocked_images,
        )
        d_feats = [df.astype(d) for df, (_, d) in zip(d_feats, shapes)]
        return (
            d_feats,
            jnp.zeros_like(rois),
            np.zeros(batch_idx.shape, jax.dtypes.float0),
        )
    lvl = route_levels(
        rois, level_hw, strides, output_size, sampling_ratio, finest_scale
    )
    zeros = [jnp.zeros(s, d) for s, d in shapes]

    def ref(fs):
        return multilevel_roi_align(
            fs, rois, batch_idx,
            strides=strides, output_size=output_size,
            sampling_ratio=sampling_ratio, finest_scale=finest_scale,
            aligned=aligned, lvl_override=lvl,
        )

    # linear in features → the VJP is primal-independent; evaluate at 0
    _, vjp = jax.vjp(ref, zeros)
    d_feats = vjp(g.astype(jnp.float32))[0]
    d_feats = [df.astype(d) for df, (_, d) in zip(d_feats, shapes)]
    return (
        d_feats,
        jnp.zeros_like(rois),
        np.zeros(batch_idx.shape, jax.dtypes.float0),
    )


_window_op.defvjp(_window_fwd, _window_bwd)


# ----------------------------------------------------------------------
# Pallas backward: windowed read-modify-write accumulation
# ----------------------------------------------------------------------
def _roi_bwd_kernel(
    lvl_ref, b_ref, oy_ref, ox_ref, safe_ref, wcls_ref,  # scalar (R,)
    wy_ref, wx_ref, g_ref, *rest, T: int, L: int, C: int, out_size: int
):
    """Per-roi: window dF += Wy^T @ g @ Wx, via HBM read-modify-write.

    TPU Pallas grid programs run SEQUENTIALLY on the core and writes are
    serialized (one in flight, waited before the next roi's write), so
    overlapping windows from different rois cannot race — accumulation
    order is deterministic (roi order), unlike the nondeterministic
    atomics of a CUDA scatter-add.

    Overlap structure: G_i depends only on (wy, wx, g) — never on the
    window — so it is computed while roi i's read is still in flight;
    and roi i+1's read (into the other VMEM slot) is started concurrently
    with roi i's write whenever the two windows are provably disjoint
    (``safe_ref``, precomputed host-side), falling back to
    read-after-write for overlapping neighbors.
    """
    grad_refs = rest[L:2 * L]  # aliased outputs (padded level grads)
    win = rest[2 * L]  # (2, WIN, WIN, C) slots
    sems = rest[2 * L + 1]
    prog = pl.program_id(0)

    def window_copy(r, l, slot, direction, wy_n, wx_n):
        ox = pl.multiple_of(ox_ref[r], X_ALIGN)
        hbm = grad_refs[l].at[
            b_ref[r], pl.ds(oy_ref[r], wy_n), pl.ds(ox, wx_n), :
        ]
        vm = win.at[slot, pl.ds(0, wy_n), pl.ds(0, wx_n)]
        if direction == "in":
            return pltpu.make_async_copy(hbm, vm, sems.at[0])
        return pltpu.make_async_copy(vm, hbm, sems.at[1])

    def dma_each(r, slot, direction, op):
        for l in range(L):
            for k, (wy_n, wx_n) in enumerate(WIN_CLASSES):
                @pl.when((lvl_ref[r] == l) & (wcls_ref[r] == k))
                def _(wy_n=wy_n, wx_n=wx_n):
                    getattr(
                        window_copy(r, l, slot, direction, wy_n, wx_n), op
                    )()

    def start_in(r, slot):
        dma_each(r, slot, "in", "start")

    def accumulate(i, s, wy_n, wx_n):
        g = g_ref[i].astype(jnp.float32)  # (out, out, C)
        wx = wx_ref[i, :, :wx_n].astype(jnp.float32)  # (out, wx_n)
        wy = wy_ref[i, :, :wy_n].astype(jnp.float32)
        # t2[by, x, c] = sum_bx wx[bx, x] * g[by, bx, c]
        t2 = jnp.stack(
            [
                jnp.dot(wx.T, g[by], preferred_element_type=jnp.float32)
                for by in range(out_size)
            ]
        )  # (out, wx_n, C)
        # G[y, x, c] = sum_by wy[by, y] * t2[by, x, c]
        G = jnp.dot(
            wy.T, t2.reshape(out_size, wx_n * C),
            preferred_element_type=jnp.float32,
        ).reshape(wy_n, wx_n, C)
        win[s, :wy_n, :wx_n] = (
            win[s, :wy_n, :wx_n].astype(jnp.float32) + G
        ).astype(win.dtype)

    start_in(prog * T, 0)
    for i in range(T):
        s = i % 2
        r = prog * T + i

        dma_each(r, s, "in", "wait")

        for k, (wy_n, wx_n) in enumerate(WIN_CLASSES):
            @pl.when(wcls_ref[r] == k)
            def _(wy_n=wy_n, wx_n=wx_n):
                accumulate(i, s, wy_n, wx_n)

        if i > 0:
            # out(r-1) is still in flight iff roi r's read was a safe
            # prefetch (the unsafe branch below already drained it)
            @pl.when(safe_ref[r] != 0)
            def _():
                dma_each(r - 1, 1 - s, "out", "wait")
        dma_each(r, s, "out", "start")
        if i + 1 < T:
            @pl.when(safe_ref[r + 1] != 0)
            def _():
                start_in(r + 1, 1 - s)  # concurrent with the write
            @pl.when(safe_ref[r + 1] == 0)
            def _():
                dma_each(r, s, "out", "wait")
                start_in(r + 1, 1 - s)  # read-after-write (overlap)
        else:
            dma_each(r, s, "out", "wait")  # drain before program end


@functools.partial(
    jax.jit,
    static_argnames=("level_hw", "batch_size", "blocked_images",
                     "strides", "output_size",
                     "sampling_ratio", "finest_scale", "aligned", "interpret"),
)
def multilevel_roi_align_bwd_pallas(
    g: jnp.ndarray,
    rois: jnp.ndarray,
    batch_idx: jnp.ndarray,
    level_hw: Tuple[Tuple[int, int], ...],
    batch_size: int,
    strides: Tuple[int, ...] = (4, 8, 16, 32),
    output_size: int = 7,
    sampling_ratio: int = 2,
    finest_scale: float = 56.0,
    aligned: bool = True,
    blocked_images: bool = False,
    interpret: bool = False,
):
    """Gradient w.r.t. the feature pyramid for the window forward.

    Returns a list of (B, H_l, W_l, C) grads matching ``level_hw``.
    """
    L = len(strides)
    C = g.shape[-1]
    R = rois.shape[0]
    T = 8
    assert R % T == 0, f"roi count {R} must be a multiple of {T}"
    # grads accumulate in f32 regardless of the compute dtype: up to
    # thousands of overlapping windows add into one cell, and bf16
    # re-rounding after every roi would swallow small contributions
    # (the reference CUDA backward atomicAdds into f32 grads under AMP
    # too). Callers cast the result back to the feature dtype.
    dtype = jnp.float32
    g = g.astype(jnp.float32)
    rois_orig, g_orig = rois, g

    lvl, oy, ox, wy, wx, ey, ex = _route_and_weights(
        rois, batch_idx, level_hw, strides, output_size, sampling_ratio,
        finest_scale, aligned,
    )
    bidx32 = batch_idx.astype(jnp.int32)
    dense = _dense_levels(level_hw, batch_size, R, blocked_images)
    lvl_orig = lvl

    # interleave rois across batch images (static permutation): callers
    # pass image-blocked rois, so consecutive rois share an image and
    # their windows overlap constantly, serializing the read-modify-write
    # chain. Round-robin over images makes consecutive rois come from
    # DIFFERENT images — provably disjoint windows — so the hazard-gated
    # prefetch almost never stalls. Feature-grad accumulation is a sum;
    # order only permutes f32 rounding.
    if batch_size > 1 and R % batch_size == 0:
        Gp = R // batch_size
        perm = jnp.asarray(
            np.arange(R).reshape(batch_size, Gp).T.reshape(-1)
        )
        take = lambda a: jnp.take(a, perm, axis=0)
        lvl, oy, ox, ey, ex = map(take, (lvl, oy, ox, ey, ex))
        wy, wx, g = map(take, (wy, wx, g))
        bidx32 = take(bidx32)

    # prefetch-safety flags: roi r's window read may overlap roi r-1's
    # in-flight window write only on the same level map of the same
    # image with intersecting window rectangles (per-roi class sizes).
    wcls = _window_class(ey, ex)
    for l in dense:
        wcls = jnp.where(lvl == l, -1, wcls)  # handled by dense matmuls
    cls_y = jnp.asarray([a for a, _ in WIN_CLASSES], jnp.int32)
    cls_x = jnp.asarray([b for _, b in WIN_CLASSES], jnp.int32)
    skip = wcls < 0
    wy_n = jnp.where(skip, 0, cls_y[jnp.clip(wcls, 0)])
    wx_n = jnp.where(skip, 0, cls_x[jnp.clip(wcls, 0)])
    inter_y = (oy[1:] < oy[:-1] + wy_n[:-1]) & (oy[:-1] < oy[1:] + wy_n[1:])
    inter_x = (ox[1:] < ox[:-1] + wx_n[:-1]) & (ox[:-1] < ox[1:] + wx_n[1:])
    overlap = (
        (lvl[1:] == lvl[:-1])
        & (bidx32[1:] == bidx32[:-1])
        & inter_y
        & inter_x
    )
    safe = jnp.concatenate(
        [jnp.zeros((1,), jnp.int32), (~overlap).astype(jnp.int32)]
    )
    pad_hw = [
        (max(WIN, h), max(WIN, -(-w // X_ALIGN) * X_ALIGN))
        for h, w in level_hw
    ]
    zeros = [
        jnp.zeros((batch_size, ph, pw, C), dtype) for ph, pw in pad_hw
    ]

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(R // T,),
        in_specs=[
            pl.BlockSpec(
                (T, output_size, WIN), lambda gg, *_: (gg, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (T, output_size, WIN), lambda gg, *_: (gg, 0, 0),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (T, output_size, output_size, C),
                lambda gg, *_: (gg, 0, 0, 0),
                memory_space=pltpu.VMEM,
            ),
        ]
        + [pl.BlockSpec(memory_space=pl.ANY) for _ in range(L)],
        out_specs=[pl.BlockSpec(memory_space=pl.ANY) for _ in range(L)],
        scratch_shapes=[
            pltpu.VMEM((2, WIN, WIN, C), dtype),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    kernel = functools.partial(
        _roi_bwd_kernel, T=T, L=L, C=C, out_size=output_size
    )
    # inputs (after the 6 scalar-prefetch operands): wy, wx, g, then the
    # L pre-zeroed grad buffers — each aliased to its output so the
    # kernel accumulates in place
    aliases = {6 + 3 + l: l for l in range(L)}
    out = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct((batch_size, ph, pw, C), dtype)
            for ph, pw in pad_hw
        ],
        input_output_aliases=aliases,
        interpret=interpret,
    )(
        lvl, bidx32, oy, ox, safe, wcls,
        wy.astype(dtype), wx.astype(dtype), g, *zeros,
    )
    out = [o[:, : hw[0], : hw[1], :] for o, hw in zip(out, level_hw)]
    for l in dense:
        dwy, dwx = _dense_weights(
            rois_orig, lvl_orig, l, level_hw[l], float(strides[l]),
            output_size, sampling_ratio, aligned,
        )
        out[l] = out[l] + _dense_level_pool_bwd(
            g_orig, dwy, dwx, batch_size, level_hw[l], output_size
        )
    return out
