"""Pallas TPU row-gather kernel (embedding-lookup pattern) — EXPERIMENT.

Measured on v5e (802k rows x 4 KB): jnp.take 31.5 ms (~105 GB/s),
this kernel 52.5 ms — the scalar-core DMA issue rate (~65 ns/descriptor)
binds before bandwidth does, so per-row DMAs cannot beat XLA's gather
loop. Kept as documentation of the negative result; the production
RoIAlign path (ops/roi_align.py) instead packs all four bilinear corners
into one 4-KB row so XLA's gather runs at its large-row bandwidth.

Mosaic constraint encoded here: HBM memrefs are tiled (8, 128), so a
gathered "row" must be a whole tile — the table is viewed as
(N, 8, C/8); C must be a multiple of 1024 (f32).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

BLOCK = 512  # rows per grid step
WINDOW = 16  # DMAs in flight


def _gather_kernel(idx_ref, table_ref, out_ref, sems):
    def start(i):
        row = idx_ref[0, 0, i]
        return pltpu.make_async_copy(
            table_ref.at[row], out_ref.at[i], sems.at[i % WINDOW]
        )

    for i in range(WINDOW):
        start(i).start()

    def body(i, _):
        start(i).wait()

        @pl.when(i + WINDOW < BLOCK)
        def _():
            start(i + WINDOW).start()

        return 0

    jax.lax.fori_loop(0, BLOCK, body, 0)


@functools.partial(jax.jit, static_argnames=("interpret",))
def gather_rows(table: jnp.ndarray, idx: jnp.ndarray, interpret: bool = False):
    """rows = table[idx] — (M,) int32 indices into an (N, C) f32 table.

    Requires C % 1024 == 0 (tile-aligned rows). Returns (M, C).
    """
    M = idx.shape[0]
    N, C = table.shape
    assert C % 1024 == 0, f"gather_rows needs C % 1024 == 0, got {C}"
    sub = C // 128
    table3 = table.reshape(N, sub, 128)

    pad = (-M) % BLOCK
    idx_p = jnp.pad(jnp.clip(idx, 0, N - 1), (0, pad))
    blocks = idx_p.shape[0] // BLOCK
    # (blocks, 1, BLOCK): block dims (1, BLOCK) == array's trailing dims,
    # satisfying the Mosaic block-shape rule for SMEM blocks
    idx2 = idx_p.reshape(blocks, 1, BLOCK)

    out = pl.pallas_call(
        _gather_kernel,
        grid=(blocks,),
        in_specs=[
            pl.BlockSpec((1, 1, BLOCK), lambda b: (b, 0, 0), memory_space=pltpu.SMEM),
            pl.BlockSpec(memory_space=pltpu.ANY),
        ],
        out_specs=pl.BlockSpec(
            (BLOCK, sub, 128), lambda b: (b, 0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((idx_p.shape[0], sub, 128), table.dtype),
        scratch_shapes=[pltpu.SemaphoreType.DMA((WINDOW,))],
        interpret=interpret,
    )(idx2.astype(jnp.int32), table3)
    return out.reshape(-1, C)[:M]
