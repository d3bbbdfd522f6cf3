"""Fused Pallas anchor assignment + regression targets for the RPN.

The XLA path (models/assigners.py::max_iou_assign + the one-hot
matched-gt matmul + bbox2delta in the detector) materializes several
(G, N) / (N, G) intermediates per image — at N≈156k anchors, G=32 and
batch 16 that is gigabytes of HBM traffic for what is arithmetically a
~2 GFLOP problem. This kernel tiles the anchors, keeps the (G, tile)
IoU block in VMEM only, and emits exactly the three arrays the RPN loss
consumes: ``assigned`` gt index per anchor, ``max_overlaps``, and the
(dx, dy, dw, dh) regression target vs the matched gt.

Semantics are bit-compatible with `max_iou_assign(match_low_quality=
True, gt_max_assign_all=True)` (mmdet max_iou_assigner.py:85) and
`bbox2delta` with default means/stds:
  - step 2/3 thresholds, first-gt tie-break on the per-anchor argmax
    (overlaps.argmax axis=0 takes the FIRST maximum),
  - low-quality match: every anchor tying a gt's best IoU (>=
    min_pos_iou) is claimed, later gts override earlier ones,
  - invalid (padded) gts forced to IoU -1; invalid anchors → IGNORE.

Two grid phases per image: phase 0 accumulates each gt's global max
IoU into a VMEM scratch that persists across grid steps (TPU grid
programs run sequentially); phase 1 recomputes the IoU tile (bit
identical — cheaper than storing it) and applies the assignment rules.

Anchor tiles are laid out (8, T/8) so blocks satisfy the TPU (8, 128)
tiling; the IoU block is (Gp, 8, T/8).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1
IGNORE = -2
_BIG = 1 << 30
_EPS = 1e-6


def _assign_kernel(
    ax1_ref, ay1_ref, ax2_ref, ay2_ref,
    gx1_ref, gy1_ref, gx2_ref, gy2_ref, gvalid_ref, pvalid_ref,
    assigned_ref, maxov_ref, dx_ref, dy_ref, dw_ref, dh_ref,
    gmax,
    *, pos_iou_thr: float, neg_iou_thr: float, min_pos_iou: float,
    Gp: int, S: int, L: int,
):
    p = pl.program_id(1)
    t = pl.program_id(2)
    ax1, ay1 = ax1_ref[0], ay1_ref[0]  # (S, L)
    ax2, ay2 = ax2_ref[0], ay2_ref[0]
    g3 = lambda ref: ref[0].reshape(Gp, 1, 1)
    gx1, gy1, gx2, gy2 = g3(gx1_ref), g3(gy1_ref), g3(gx2_ref), g3(gy2_ref)
    gvalid = g3(gvalid_ref)

    # (Gp, S, L) IoU — boxes.py::bbox_overlaps semantics
    iw = jnp.clip(jnp.minimum(gx2, ax2) - jnp.maximum(gx1, ax1), 0.0)
    ih = jnp.clip(jnp.minimum(gy2, ay2) - jnp.maximum(gy1, ay1), 0.0)
    inter = iw * ih
    area_a = (ax2 - ax1) * (ay2 - ay1)  # (S, L)
    area_g = (gx2 - gx1) * (gy2 - gy1)  # (Gp, 1, 1)
    union = jnp.maximum(area_g + area_a - inter, _EPS)
    iou = jnp.where(gvalid > 0, inter / union, -1.0)

    @pl.when((p == 0) & (t == 0))
    def _():
        gmax[:] = jnp.full((Gp, 1), -1.0, jnp.float32)

    @pl.when(p == 0)
    def _():
        # two rank-preserving reductions (rank-1 vectors trip Mosaic
        # layout inference)
        tile_max = jnp.max(jnp.max(iou, axis=2), axis=1, keepdims=True)
        gmax[:] = jnp.maximum(gmax[:], tile_max)
        # outputs are rewritten in phase 1; keep the buffers defined
        zeros = jnp.zeros((S, L), jnp.float32)
        assigned_ref[0, 0] = jnp.zeros((S, L), jnp.int32)
        maxov_ref[0, 0] = zeros
        dx_ref[0, 0] = zeros
        dy_ref[0, 0] = zeros
        dw_ref[0, 0] = zeros
        dh_ref[0, 0] = zeros

    @pl.when(p == 1)
    def _():
        pmax = jnp.max(iou, axis=0)  # (S, L)
        g_iota = jax.lax.broadcasted_iota(jnp.int32, (Gp, S, L), 0)
        # FIRST gt among ties (overlaps.argmax(axis=0) semantics)
        amax_gt = jnp.min(
            jnp.where(iou == pmax[None], g_iota, _BIG), axis=0
        )
        assigned = jnp.full((S, L), IGNORE, jnp.int32)
        assigned = jnp.where(
            (pmax >= 0.0) & (pmax < neg_iou_thr), NEG, assigned
        )
        assigned = jnp.where(pmax >= pos_iou_thr, amax_gt, assigned)
        # low-quality match: LAST claiming gt wins (max gt index)
        gm = gmax[:].reshape(Gp, 1, 1)
        claim = (iou == gm) & (gm >= min_pos_iou) & (gvalid > 0)
        claimed = jnp.max(jnp.where(claim, g_iota, -1), axis=0)
        assigned = jnp.where(claimed >= 0, claimed, assigned)
        assigned = jnp.where(pvalid_ref[0, 0] > 0, assigned, IGNORE)
        assigned_ref[0, 0] = assigned
        maxov_ref[0, 0] = pmax

        # matched gt box via one-hot row selection, then bbox2delta
        onehot = g_iota == jnp.clip(assigned, 0)[None]
        mx1 = jnp.sum(jnp.where(onehot, gx1, 0.0), axis=0)
        my1 = jnp.sum(jnp.where(onehot, gy1, 0.0), axis=0)
        mx2 = jnp.sum(jnp.where(onehot, gx2, 0.0), axis=0)
        my2 = jnp.sum(jnp.where(onehot, gy2, 0.0), axis=0)
        pw = jnp.maximum(ax2 - ax1, _EPS)
        ph = jnp.maximum(ay2 - ay1, _EPS)
        px = (ax1 + ax2) * 0.5
        py = (ay1 + ay2) * 0.5
        dx_ref[0, 0] = ((mx1 + mx2) * 0.5 - px) / pw
        dy_ref[0, 0] = ((my1 + my2) * 0.5 - py) / ph
        dw_ref[0, 0] = jnp.log(jnp.maximum(mx2 - mx1, _EPS) / pw)
        dh_ref[0, 0] = jnp.log(jnp.maximum(my2 - my1, _EPS) / ph)


@functools.partial(
    jax.jit,
    static_argnames=("pos_iou_thr", "neg_iou_thr", "min_pos_iou", "interpret"),
)
def rpn_assign_targets_pallas(
    anchors: jnp.ndarray,
    gt_boxes: jnp.ndarray,
    gt_valid: jnp.ndarray,
    prior_valid: jnp.ndarray,
    pos_iou_thr: float,
    neg_iou_thr: float,
    min_pos_iou: float,
    interpret: bool = False,
):
    """Batched anchor assignment + regression targets.

    Args:
        anchors: (N, 4) f32, shared across the batch.
        gt_boxes: (B, G, 4) f32; gt_valid: (B, G) bool.
        prior_valid: (B, N) bool.

    Returns:
        assigned (B, N) int32, max_overlaps (B, N) f32, tgt (B, N, 4) f32.
    """
    B, G = gt_valid.shape
    N = anchors.shape[0]
    Gp = max(8, -(-G // 8) * 8)
    # tile so the ~6 live (Gp, S, L) f32 intermediates stay under the
    # 16 MB scoped-VMEM limit (task>=2 appends teacher pseudo-label
    # slots to the gt capacity, so Gp can reach ~136)
    S = 8
    budget = 14 << 20
    L = min(2048, max(128, (budget // (Gp * S * 4 * 6)) // 128 * 128))
    T = S * L  # anchors per tile
    Np = -(-N // T) * T
    n_tiles = Np // T

    a = jnp.pad(anchors.astype(jnp.float32), ((0, Np - N), (0, 0)))
    ax = [a[:, i].reshape(n_tiles, S, L) for i in range(4)]
    gb = jnp.pad(
        gt_boxes.astype(jnp.float32), ((0, 0), (0, Gp - G), (0, 0))
    )
    gx = [gb[:, :, i][..., None] for i in range(4)]  # (B, Gp, 1)
    gv = jnp.pad(
        gt_valid.astype(jnp.float32), ((0, 0), (0, Gp - G))
    )[..., None]
    pv = jnp.pad(
        prior_valid.astype(jnp.float32), ((0, 0), (0, Np - N))
    ).reshape(B, n_tiles, S, L)

    anchor_spec = pl.BlockSpec(
        (1, S, L), lambda b, p, t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    gt_spec = pl.BlockSpec(
        (1, Gp, 1), lambda b, p, t: (b, 0, 0), memory_space=pltpu.VMEM
    )
    pv_spec = pl.BlockSpec(
        (1, 1, S, L), lambda b, p, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    out_spec = pl.BlockSpec(
        (1, 1, S, L), lambda b, p, t: (b, t, 0, 0), memory_space=pltpu.VMEM
    )
    kernel = functools.partial(
        _assign_kernel,
        pos_iou_thr=pos_iou_thr, neg_iou_thr=neg_iou_thr,
        min_pos_iou=min_pos_iou, Gp=Gp, S=S, L=L,
    )
    out_f32 = jax.ShapeDtypeStruct((B, n_tiles, S, L), jnp.float32)
    assigned, maxov, dx, dy, dw, dh = pl.pallas_call(
        kernel,
        grid=(B, 2, n_tiles),
        in_specs=[anchor_spec] * 4 + [gt_spec] * 5 + [pv_spec],
        out_specs=[out_spec] * 6,
        out_shape=[
            jax.ShapeDtypeStruct((B, n_tiles, S, L), jnp.int32),
            out_f32, out_f32, out_f32, out_f32, out_f32,
        ],
        scratch_shapes=[pltpu.VMEM((Gp, 1), jnp.float32)],
        interpret=interpret,
    )(*ax, *gx, gv, pv)

    assigned = assigned.reshape(B, Np)[:, :N]
    maxov = maxov.reshape(B, Np)[:, :N]
    tgt = jnp.stack(
        [x.reshape(B, Np)[:, :N] for x in (dx, dy, dw, dh)], axis=-1
    )
    return assigned, maxov, tgt
