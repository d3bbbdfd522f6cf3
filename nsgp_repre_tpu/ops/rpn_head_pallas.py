"""Fused Pallas RPN head: 3x3 conv + ReLU + packed 1x1 cls/reg heads.

Why this kernel exists (batch-1 predict trace, v5e, 2026-08-18): XLA
lowers the dense RPN head (mmdet rpn_head.py:52-99 semantics) into
per-level convolutions whose layout preferences conflict with the
RoIAlign custom call and the level-slice DMAs reading the same FPN
maps. At batch 1 that costs ~2.8 ms of pure layout-transpose fusions
on the P2 map plus a 3x3 conv running at ~19% MXU and two 1x1 heads
lowered as slow reduce-fusions (~0.29 ms each) — ~5.5 ms of the
17.5 ms predict budget on P2 alone.

This kernel evaluates all three layers in one pass per level:

- grid = (B, H/TH) full-width row bands; the (TH+2, W+2, C) input
  window is DMA'd from HBM with a one-row halo (column halo zeroed in
  VMEM — the conv's zero padding);
- the 3x3 conv is 9 shifted (TH*W, C) @ (C, F) MXU matmuls
  accumulated in f32 (XLA's own conv accumulation dtype);
- the two 1x1 heads are ONE packed (TH*W, F) @ (F, P) matmul whose
  first A columns are the cls logits and next 4A the reg deltas
  (P = 128-lane padding).

Being a custom call, it also pins its input to the default layout, so
the FPN output is materialized once in the layout the RoIAlign kernel
already wants — the transpose fusions disappear.

Forward-only by design: the detector uses it when the dense head runs
under stop_gradient (predict, and the rpn_sparse_loss train path where
gradients flow through RPNHead.at_positions instead); the covariance
pass (mutable 'cov') keeps the CovConv path so the taps fire.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


_VMEM_BUDGET = 11 << 20  # leave headroom under the 16 MB scoped limit


def _pick_band(h: int, w: int = 0, c: int = 0, f: int = 0, p: int = 0,
               itemsize: int = 2) -> int:
    """Rows per grid band: a divisor of h keeping bands ~8-16 rows,
    shrunk until the band's scoped-VMEM footprint fits.

    Mosaic stack-allocates the window scratch, the f32 matmul
    accumulators and the (double-buffered) out block per band; at the
    COCO canvas (208x336 P2 map, batch 16) the old fixed TH=16 demanded
    18.4 MB against the 16 MB scoped limit and failed to compile. The
    estimate below reproduces that observed footprint to ~5%."""

    def fits(th: int) -> bool:
        if not w:
            return True
        win = (th + 2) * w * c * itemsize
        acc = th * w * f * (4 + itemsize)  # f32 acc + cast copy
        outb = th * w * p * (4 + 2 * itemsize)  # f32 out + 2x buffered block
        const = 9 * c * f * itemsize + c * p * itemsize
        return win + acc + outb + const <= _VMEM_BUDGET

    for th in (16, 13, 12, 10, 8, 25, 5, 7, 11, 4, 3, 2, 1):
        if th <= h and h % th == 0 and fits(th):
            return th
    return 1


def _conv_body(f_ref, w1_ref, b1_ref, win, sems, *, TH, H, W, b, r0,
               relu: bool):
    """Shared 3x3 conv+bias(+ReLU) band evaluation → (TH*W, F) value."""

    # DMA destinations may only be offset in untiled dims: win is
    # (TH+2, W, C) with rows in dim 0 (untiled); the column halo (the
    # conv's zero padding) is realized at compute time via shifted
    # value-level concats instead of padded scratch columns.
    body = pltpu.make_async_copy(
        f_ref.at[b, pl.ds(r0, TH)],
        win.at[pl.ds(1, TH)],
        sems.at[0],
    )
    body.start()

    @pl.when(r0 > 0)
    def _():
        top = pltpu.make_async_copy(
            f_ref.at[b, pl.ds(r0 - 1, 1)],
            win.at[pl.ds(0, 1)],
            sems.at[1],
        )
        top.start()
        top.wait()

    @pl.when(r0 == 0)
    def _():
        win[0:1] = jnp.zeros((1, W, win.shape[2]), win.dtype)

    @pl.when(r0 + TH < H)
    def _():
        bot = pltpu.make_async_copy(
            f_ref.at[b, pl.ds(r0 + TH, 1)],
            win.at[pl.ds(TH + 1, 1)],
            sems.at[2],
        )
        bot.start()
        bot.wait()

    @pl.when(r0 + TH >= H)
    def _():
        win[TH + 1 : TH + 2] = jnp.zeros((1, W, win.shape[2]), win.dtype)

    body.wait()

    C = win.shape[2]
    F = w1_ref.shape[3]
    x = win[:]  # (TH+2, W, C)
    zcol = jnp.zeros((TH, 1, C), win.dtype)
    acc = jnp.zeros((TH * W, F), jnp.float32)
    for ky in range(3):
        rows = x[ky : ky + TH]
        for kx in range(3):
            if kx == 0:
                tap = jnp.concatenate([zcol, rows[:, : W - 1]], axis=1)
            elif kx == 1:
                tap = rows
            else:
                tap = jnp.concatenate([rows[:, 1:], zcol], axis=1)
            acc = acc + jax.lax.dot(
                tap.reshape(TH * W, C), w1_ref[ky, kx],
                preferred_element_type=jnp.float32,
            )
    dt = win.dtype
    h = acc.astype(dt) + b1_ref[0].astype(dt)
    if relu:
        h = jnp.maximum(h, 0)
    return h


def _rpn_head_kernel(f_ref, w1_ref, b1_ref, wcr_ref, bcr_ref, out_ref,
                     win, sems, *, TH: int, H: int, W: int):
    b = pl.program_id(0)
    t = pl.program_id(1)
    h = _conv_body(f_ref, w1_ref, b1_ref, win, sems,
                   TH=TH, H=H, W=W, b=b, r0=t * TH, relu=True)
    dt = win.dtype
    out = jax.lax.dot(h, wcr_ref[:], preferred_element_type=jnp.float32)
    out = out.astype(dt) + bcr_ref[0].astype(dt)
    out_ref[0] = out.reshape(TH, W, out.shape[-1])


def _conv3x3_kernel(f_ref, w1_ref, b1_ref, out_ref, win, sems,
                    *, TH: int, H: int, W: int, relu: bool):
    b = pl.program_id(0)
    t = pl.program_id(1)
    h = _conv_body(f_ref, w1_ref, b1_ref, win, sems,
                   TH=TH, H=H, W=W, b=b, r0=t * TH, relu=relu)
    out_ref[0] = h.reshape(TH, W, h.shape[-1])


@functools.partial(jax.jit, static_argnames=("interpret",))
def rpn_head_fused(
    f: jnp.ndarray,
    w1: jnp.ndarray,
    b1: jnp.ndarray,
    wcr: jnp.ndarray,
    bcr: jnp.ndarray,
    interpret: bool = False,
) -> jnp.ndarray:
    """One-level fused RPN head.

    Args:
        f: (B, H, W, C) feature map (compute dtype).
        w1: (3, 3, C, F) shared-conv kernel.
        b1: (F,) shared-conv bias.
        wcr: (F, P) packed cls∥reg 1x1 kernels, zero-padded to P lanes.
        bcr: (P,) packed bias.

    Returns:
        (B, H, W, P); columns [:A] are cls logits, [A:5A] reg deltas.
    """
    B, H, W, C = f.shape
    F = w1.shape[3]
    P = wcr.shape[1]
    dt = f.dtype
    # the windowed row DMA needs the sublane (W) dim 8-aligned; pad the
    # small coarse levels (P2/P3 widths are already multiples of 8).
    # Padded columns are zeros = the conv's own zero padding, so the
    # valid columns are exact and the pad columns are sliced off below.
    Wp = -(-W // 8) * 8
    if Wp != W:
        f = jnp.pad(f, ((0, 0), (0, 0), (0, Wp - W), (0, 0)))
    out = _call(f, w1, b1, wcr, bcr, interpret)
    return out[:, :, :W] if Wp != W else out


def _call(f, w1, b1, wcr, bcr, interpret):
    B, H, W, C = f.shape
    F = w1.shape[3]
    P = wcr.shape[1]
    TH = _pick_band(H, W, C, F, P, jnp.dtype(f.dtype).itemsize)
    dt = f.dtype

    kernel = functools.partial(_rpn_head_kernel, TH=TH, H=H, W=W)
    return pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, C, F), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, F), lambda b, t: (0, 0)),
            pl.BlockSpec((C, P), lambda b, t: (0, 0)),
            pl.BlockSpec((1, P), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, W, P), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, W, P), dt),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, W, C), dt),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(
        f,
        w1.astype(dt),
        b1.reshape(1, F).astype(jnp.float32),
        wcr.astype(dt),
        bcr.reshape(1, P).astype(jnp.float32),
    )


@functools.partial(jax.jit, static_argnames=("relu", "interpret"))
def conv3x3_fused(
    f: jnp.ndarray,
    w: jnp.ndarray,
    b: jnp.ndarray,
    relu: bool = False,
    interpret: bool = False,
) -> jnp.ndarray:
    """Forward-only fused 3x3/s1/p1 conv (+bias, optional ReLU).

    Same banded windowed-DMA evaluation as the RPN head kernel, without
    the packed 1x1 stage — used by CovConv's inference fast path (the
    FPN output convs at batch 1 otherwise trigger XLA layout-transpose
    fusions costing more than the convs themselves).
    """
    B, H, W, C = f.shape
    F = w.shape[3]
    dt = f.dtype
    Wp = -(-W // 8) * 8
    fp = jnp.pad(f, ((0, 0), (0, 0), (0, Wp - W), (0, 0))) if Wp != W else f
    TH = _pick_band(H, Wp, C, F, 0, jnp.dtype(f.dtype).itemsize)
    kernel = functools.partial(_conv3x3_kernel, TH=TH, H=H, W=Wp, relu=relu)
    out = pl.pallas_call(
        kernel,
        grid=(B, H // TH),
        in_specs=[
            pl.BlockSpec(memory_space=pl.ANY),
            pl.BlockSpec((3, 3, C, F), lambda b, t: (0, 0, 0, 0)),
            pl.BlockSpec((1, F), lambda b, t: (0, 0)),
        ],
        out_specs=pl.BlockSpec((1, TH, Wp, F), lambda b, t: (b, t, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, H, Wp, F), dt),
        scratch_shapes=[
            pltpu.VMEM((TH + 2, Wp, C), dt),
            pltpu.SemaphoreType.DMA((3,)),
        ],
        interpret=interpret,
    )(fp, w.astype(dt), b.reshape(1, F).astype(jnp.float32))
    return out[:, :, :W] if Wp != W else out
