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
                *, iou_threshold: float, max_out: int, K: int):
    """One grid program runs greedy NMS for G images SIMULTANEOUSLY.

    All refs are (1, G*K, N/K) blocks: each image's N candidates are
    folded into K sub-rows so small batches still fill the (8, 128)
    sublane tiles — a (1, N) row would occupy one sublane of every
    vreg (1/8 utilization), the dominant cost of batch-1 inference NMS.
    Each suppression step does its argmax/IoU/suppress as per-image
    reductions over the (G, K, N/K) view, so one trip through the
    ``max_out`` loop serves all G images.
    """
    gk, nk = scores_ref.shape[1], scores_ref.shape[2]
    g = gk // K
    live_ref[:] = scores_ref[0]  # (G*K, N/K), pre-masked by caller
    sel_ref[0] = jnp.zeros_like(sel_ref[0])

    if K == 1:
        # rank-2 fast path (large batches): single lane reductions
        shape = (gk, nk)
        view = lambda x: x
        unview = lambda x: x
        idx_row = jax.lax.broadcasted_iota(jnp.int32, shape, 1)

        def per_image(x, op):
            return op(x, axis=-1, keepdims=True)  # (G, 1)
    else:
        # K sub-rows per image fill the sublane tiles at small batches
        shape = (g, K, nk)
        view = lambda x: x.reshape(g, K, nk)
        unview = lambda x: x.reshape(gk, nk)
        # global candidate index within each image: subrow * (N/K) + lane
        idx_row = (
            jax.lax.broadcasted_iota(jnp.int32, shape, 1) * nk
            + jax.lax.broadcasted_iota(jnp.int32, shape, 2)
        )

        def per_image(x, op):
            r = op(x, axis=2, keepdims=True)
            return op(r, axis=1, keepdims=True)  # (G, 1, 1)

    x1 = view(x1_ref[0])
    y1 = view(y1_ref[0])
    x2 = view(x2_ref[0])
    y2 = view(y2_ref[0])
    area = (x2 - x1) * (y2 - y1)

    def body(i, _):
        live = view(live_ref[:])
        m = per_image(live, jnp.max)
        ok = m > NEG_INF / 2
        # lowest index among maxima (greedy argmax semantics), per image
        j = per_image(jnp.where(live == m, idx_row, BIG_IDX), jnp.min)
        sel = idx_row == j  # one-hot per image

        bx1 = per_image(jnp.where(sel, x1, 0.0), jnp.sum)
        by1 = per_image(jnp.where(sel, y1, 0.0), jnp.sum)
        bx2 = per_image(jnp.where(sel, x2, 0.0), jnp.sum)
        by2 = per_image(jnp.where(sel, y2, 0.0), jnp.sum)
        barea = (bx2 - bx1) * (by2 - by1)

        iw = jnp.maximum(jnp.minimum(x2, bx2) - jnp.maximum(x1, bx1), 0.0)
        ih = jnp.maximum(jnp.minimum(y2, by2) - jnp.maximum(y1, by1), 0.0)
        inter = iw * ih
        union = jnp.maximum(area + barea - inter, 1e-6)
        iou = inter / union

        suppress = (iou > iou_threshold) | sel
        live_ref[:] = unview(jnp.where(ok & suppress, NEG_INF, live))
        sel_ref[0] = jnp.where(
            unview(ok & sel), 1.0, sel_ref[0]
        )
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
    # images per program: as many as fit a ~14 MB VMEM budget counting
    # the 7 named (G, N) f32 buffers PLUS ~6 loop-body temporaries
    # (iou/inter/iw/ih/suppress), and a divisor of B — headroom below
    # the 16 MB scoped-VMEM limit matters for multiclass NMS where
    # N = max_per_img * num_classes can reach ~70k
    budget = (14 << 20) // (13 * 4 * _round_up(N, 128))
    G = max(1, min(B, budget))
    while B % G:
        G -= 1
    # sub-rows per image: fill at least 8 sublanes even at small G/B
    # (a (1, N) row uses 1/8 of every (8, 128) vreg)
    K = max(1, 8 // G)

    Np = _round_up(N, 128 * K)
    pad = Np - N
    if pad:
        boxes = jnp.pad(boxes, ((0, 0), (0, pad), (0, 0)))
        scores = jnp.pad(scores, ((0, 0), (0, pad)))
        valid = jnp.pad(valid, ((0, 0), (0, pad)))
    masked_scores = jnp.where(valid, scores, NEG_INF).astype(jnp.float32)

    kernel = functools.partial(
        _nms_kernel, iou_threshold=iou_threshold, max_out=max_out, K=K
    )
    coord_spec = pl.BlockSpec(
        (1, G * K, Np // K), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
    )
    bx = boxes.astype(jnp.float32)
    coords = [
        bx[:, :, i].reshape(B // G, G * K, Np // K) for i in range(4)
    ]
    selected = pl.pallas_call(
        kernel,
        grid=(B // G,),
        in_specs=[coord_spec] * 5,
        out_specs=pl.BlockSpec(
            (1, G * K, Np // K), lambda b: (b, 0, 0),
            memory_space=pltpu.VMEM,
        ),
        out_shape=jax.ShapeDtypeStruct((B // G, G * K, Np // K), jnp.float32),
        scratch_shapes=[pltpu.VMEM((G * K, Np // K), jnp.float32)],
        interpret=interpret,
    )(*coords, masked_scores.reshape(B // G, G * K, Np // K))
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
