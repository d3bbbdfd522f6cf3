"""Pallas TPU greedy NMS — the whole suppression loop in VMEM.

The XLA version (ops/nms.py) runs ``max_out`` sequential steps, each an
argmax + IoU row over HBM-resident arrays. Proposal sets are small
(~8-10k boxes ≈ 170 KB), so this kernel pins boxes/scores in VMEM for
the entire loop: per-step cost becomes VPU reductions with no HBM
round-trips. Grid = one program per image (the batch dimension).

Mosaic lowering constraints shape the kernel:
- no dynamic scalar indexing → the selected box is extracted with
  masked reductions (one-hot sum), not ``x[j]``;
- no dynamic scalar stores → the kernel emits a (1, N) selection mask;
  the caller recovers the score-ordered keep list with one cheap top_k
  (greedy NMS selects in descending-score order by construction).

Semantics match ops.nms.nms (keep if IoU <= threshold; ties broken by
lowest index) assuming strictly distinct scores for the output ordering.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG_INF = -1.0e10
BIG_IDX = 1 << 30


def _nms_kernel(x1_ref, y1_ref, x2_ref, y2_ref, scores_ref, sel_ref, live_ref,
                *, iou_threshold: float, max_out: int):
    """One grid program runs greedy NMS for G images SIMULTANEOUSLY.

    All refs are (1, G, N) blocks. Each suppression step does its
    argmax/IoU/suppress as row-wise (axis=-1, lane) reductions over the
    (G, N) tile, so one trip through the ``max_out`` loop serves all G
    images — G× less loop overhead than a program-per-image grid, and
    full sublane utilization instead of 1/8 (a (1, N) row occupies one
    sublane of every (8, 128) vreg). Measured 4.6× at B=16, N=5000.
    """
    g, n = scores_ref.shape[1], scores_ref.shape[2]
    live_ref[:] = scores_ref[0]  # (G, N), pre-masked by caller
    sel_ref[0] = jnp.zeros_like(sel_ref[0])

    x1 = x1_ref[0]
    y1 = y1_ref[0]
    x2 = x2_ref[0]
    y2 = y2_ref[0]
    area = (x2 - x1) * (y2 - y1)
    idx_row = jax.lax.broadcasted_iota(jnp.int32, (g, n), 1)

    def body(i, _):
        live = live_ref[:]
        m = jnp.max(live, axis=-1, keepdims=True)  # (G, 1)
        ok = m > NEG_INF / 2
        # lowest index among maxima (greedy argmax semantics), per image
        j = jnp.min(
            jnp.where(live == m, idx_row, BIG_IDX), axis=-1, keepdims=True
        )
        sel = idx_row == j  # (G, N) one-hot rows

        bx1 = jnp.sum(jnp.where(sel, x1, 0.0), axis=-1, keepdims=True)
        by1 = jnp.sum(jnp.where(sel, y1, 0.0), axis=-1, keepdims=True)
        bx2 = jnp.sum(jnp.where(sel, x2, 0.0), axis=-1, keepdims=True)
        by2 = jnp.sum(jnp.where(sel, y2, 0.0), axis=-1, keepdims=True)
        barea = (bx2 - bx1) * (by2 - by1)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = jnp.maximum(area + barea - inter, 1e-6)
        iou = inter / union

        suppress = (iou > iou_threshold) | sel
        live_ref[:] = jnp.where(ok & suppress, NEG_INF, live)
        sel_ref[0] = jnp.where(ok & sel, 1.0, sel_ref[0])
        return 0

    jax.lax.fori_loop(0, max_out, body, 0)


def _round_up(x: int, m: int) -> int:
    return (x + m - 1) // m * m


@functools.partial(jax.jit, static_argnames=("iou_threshold", "max_out", "interpret"))
def nms_pallas(
    boxes: jnp.ndarray,
    scores: jnp.ndarray,
    valid: jnp.ndarray,
    iou_threshold: float,
    max_out: int,
    interpret: bool = False,
):
    """Batched greedy NMS.

    Args:
        boxes: (B, N, 4); scores: (B, N); valid: (B, N) bool.

    Returns:
        keep_idx (B, max_out) int32, keep_valid (B, max_out) bool —
        selections in descending score order (= greedy pick order).
    """
    B, N = scores.shape
    Np = _round_up(N, 128)
    pad = Np - N
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    masked_scores = jnp.where(valid, scores, NEG_INF).astype(jnp.float32)

    # images per program: as many as fit a ~14 MB VMEM budget counting
    # the 7 named (G, Np) f32 buffers PLUS ~6 loop-body temporaries
    # (iou/inter/iw/ih/suppress), and a divisor of B — headroom below
    # the 16 MB scoped-VMEM limit matters for multiclass NMS where
    # Np = max_per_img * num_classes can reach ~70k
    budget = (14 << 20) // (13 * 4 * Np)
    G = max(1, min(B, budget))
    while B % G:
        G -= 1

    kernel = functools.partial(
        _nms_kernel, iou_threshold=iou_threshold, max_out=max_out
    )
    coord_spec = pl.BlockSpec(
        (1, G, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    bx = boxes.astype(jnp.float32)
    coords = [bx[:, :, i].reshape(B // G, G, Np) for i in range(4)]
    selected = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[coord_spec] * 5,
        out_specs=pl.BlockSpec(
            (1, G, Np), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((B // G, G, Np), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G, Np), jnp.float32)],
        interpret=interpret,
    )(*coords, masked_scores.reshape(B // G, G, Np))
    selected = selected.reshape(B, Np)

    # recover the keep list in selection (descending-score) order
    keep_scores = jnp.where(selected > 0.5, masked_scores, NEG_INF)
    vals, keep_idx = jax.lax.top_k(keep_scores, max_out)
    keep_valid = vals > NEG_INF / 2
    return keep_idx.astype(jnp.int32), keep_valid


def batched_nms_pallas(boxes, scores, idxs, valid, iou_threshold, max_out,
                       interpret: bool = False):
    """Class/level-aware variant via the coordinate-offset trick
    (mirrors ops.nms.batched_nms), batched over the leading dim."""
    max_coord = jnp.max(jnp.where(valid[..., None], boxes, 0.0)) + 1.0
    offsets = idxs.astype(boxes.dtype) * max_coord
    shifted = boxes + offsets[..., None]
    return nms_pallas(shifted, scores, valid, iou_threshold, max_out, interpret)
