"""Building-block layers with NSGP covariance taps.

The reference captures per-layer *input* covariances with torch forward
hooks (nsrunner_roi_replay.py:876-916 ``compute_cov``). Hooks don't exist
in a traced JAX program, so the layers themselves own the tap: when the
``'cov'`` variable collection is mutable (i.e. the caller runs
``apply(..., mutable=['cov'])``), each layer sows its input covariance,
accumulated with a sum reduce. A normal ``apply`` pays zero cost.

Reference quirks reproduced on purpose (they define the artifact the
method trains against):
- batch-mean-before-outer-product: hooks average the input over the
  batch dim before computing X^T X (nsrunner:901 for Linear, :908 for
  Conv — the unfold runs on the batch-mean map).
- Conv covariance dim C = kh*kw*in_channels via im2col patches
  (nsrunner:908-913); the patch feature ordering here is
  channel-major (in, kh, kw) to match our kernel flattening in the
  optimizer (see engine/optim.py).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple, Union

import jax
import jax.numpy as jnp
from flax import linen as nn


def _sum_reduce(a, b):
    return a + b


def _zero_init():
    return 0.0


def conv_input_patches(
    x: jnp.ndarray,
    kernel_size: Tuple[int, int],
    strides: Tuple[int, int],
    padding: Tuple[int, int],
) -> jnp.ndarray:
    """im2col over an NHWC map → (positions, in_ch*kh*kw), channel-major.

    Equivalent to torch ``F.unfold`` feature ordering (c, kh, kw), which is
    what the reference covariance uses (nsrunner:908).
    """
    n, h, w, c = x.shape
    # conv_general_dilated_patches on NHWC input returns NHWC output whose
    # channel dim is c * kh * kw ordered channel-major (c outermost).
    patches = jax.lax.conv_general_dilated_patches(
        x,
        filter_shape=kernel_size,
        window_strides=strides,
        padding=[(padding[0], padding[0]), (padding[1], padding[1])],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )
    return patches.reshape(-1, patches.shape[-1])


class CovConv(nn.Module):
    """2D conv (explicit torch-style padding) with an input-covariance tap."""

    features: int
    kernel_size: Tuple[int, int] = (3, 3)
    strides: Tuple[int, int] = (1, 1)
    padding: Tuple[int, int] = (0, 0)
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.variance_scaling(
        2.0, "fan_out", "normal"
    )
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()
    dtype: Optional[jnp.dtype] = None
    dilation: Tuple[int, int] = (1, 1)
    # evaluate via space-to-depth (stride-2 convs only; exact — see
    # _conv_s2d). The covariance tap below is untouched: it unfolds the
    # ORIGINAL input with the original kernel geometry either way.
    s2d: bool = False

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        fused: bool = False,
        s2d: Optional[bool] = None,
    ) -> jnp.ndarray:
        """``s2d=None`` uses the module default; inference paths
        override it per call (the s2d stem rewrite is exact, and at
        batch 1 it is ~1 ms faster while costing ~1 img/s at batch-16
        train, so the detector enables it for inference only)."""
        use_s2d = self.s2d if s2d is None else s2d
        if self.is_mutable_collection("cov") and not self.is_initializing():
            xm = jnp.mean(x.astype(jnp.float32), axis=0, keepdims=True)
            p = conv_input_patches(xm, self.kernel_size, self.strides, self.padding)
            cov = p.T @ p
            self.sow("cov", "cov", cov, reduce_fn=_sum_reduce, init_fn=_zero_init)
        in_ch = x.shape[-1]
        kernel = self.param(
            "kernel",
            self.kernel_init,
            (*self.kernel_size, in_ch, self.features),
            jnp.float32,
        )
        dtype = self.dtype or x.dtype
        if (
            fused
            and not self.is_initializing()
            and self.kernel_size == (3, 3)
            and self.strides == (1, 1)
            and self.padding == (1, 1)
            and self.dilation == (1, 1)
            and not use_s2d
            # the kernel's windowed row DMA slices the source lane dim,
            # which Mosaic requires 128-aligned (stage-1 64ch falls back)
            and in_ch % 128 == 0
        ):
            # forward-only Pallas conv — callers request it only on
            # no-grad (inference) paths; stop_gradient makes that a hard
            # guarantee (the kernel has no VJP)
            from ..ops.rpn_head_pallas import conv3x3_fused

            if self.use_bias:
                bias = self.param(
                    "bias", self.bias_init, (self.features,), jnp.float32
                )
            else:
                bias = jnp.zeros((self.features,), jnp.float32)
            return conv3x3_fused(
                *jax.lax.stop_gradient(
                    (x.astype(dtype), kernel, bias)
                )
            )
        if use_s2d:
            assert self.dilation == (1, 1), "s2d does not support dilation"
            y = _conv_s2d(
                x.astype(dtype), kernel.astype(dtype),
                self.kernel_size, self.strides, self.padding,
            )
        else:
            y = jax.lax.conv_general_dilated(
                x.astype(dtype),
                kernel.astype(dtype),
                window_strides=self.strides,
                padding=[(self.padding[0], self.padding[0]), (self.padding[1], self.padding[1])],
                rhs_dilation=self.dilation,
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
            )
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(dtype)
        return y


def _conv_s2d(x, kernel, kernel_size, strides, padding):
    """Stride-2 conv via space-to-depth (the MLPerf ResNet stem trick).

    A (kh, kw)/2 conv on few input channels wastes the MXU (the 3-channel
    stem pads its contraction lanes ~everywhere). Rewriting
    ``2i + t = 2(i + p) + a`` (t = tap offset, a ∈ {0,1}) turns it into a
    stride-1 ceil(.)x conv over the 2x2 space-to-depth input with a
    re-scattered kernel — bit-identical outputs, 4x fewer spatial
    positions, 4x more input channels. Only wired for stride (2, 2) and
    even input sizes (the 32-divisible canvas guarantees this).
    """
    kh, kw, cin, f = kernel.shape
    ph, pw = padding
    B, H, W, C = x.shape
    assert strides == (2, 2) and H % 2 == 0 and W % 2 == 0, (
        "s2d conv requires stride (2,2) and even input sizes"
    )
    # merge adjacent column pairs into lanes first (a free row-major
    # reshape), then split row parity — same (a, b, c) channel order as
    # reshape+transpose of (2, 2, C) blocks, but XLA lowers it without
    # the minor-dim transpose copy that dominated the batch-1 stem
    # (1.7 ms of reshape/copy on the 800x1344 canvas)
    xw = x.reshape(B, H, W // 2, 2 * C)
    x2 = jnp.concatenate([xw[:, 0::2], xw[:, 1::2]], axis=-1)

    # k2[p - p_lo, q - q_lo, (a, b, c), f] = kernel[2p + a + ph, 2q + b + pw]
    # taps: t = 2p + a - ph for output 2i → valid p range from t ∈ [0, kh)
    def ranges(k, p):
        lo = -(p // 2) - (p % 2)  # floor((-p)/2) with a ∈ {0,1} slack
        hi = (k - 1 - p) // 2
        return lo, hi

    p_lo, p_hi = ranges(kh, ph)
    q_lo, q_hi = ranges(kw, pw)
    nh, nw = p_hi - p_lo + 1, q_hi - q_lo + 1
    k2 = jnp.zeros((nh, nw, 2, 2, cin, f), kernel.dtype)
    for p in range(p_lo, p_hi + 1):
        for a in range(2):
            u = 2 * p + a + ph
            if not 0 <= u < kh:
                continue
            for q in range(q_lo, q_hi + 1):
                for b in range(2):
                    v = 2 * q + b + pw
                    if not 0 <= v < kw:
                        continue
                    k2 = k2.at[p - p_lo, q - q_lo, a, b].set(kernel[u, v])
    k2 = k2.reshape(nh, nw, 4 * cin, f)
    return jax.lax.conv_general_dilated(
        x2, k2,
        window_strides=(1, 1),
        padding=[(-p_lo, p_hi), (-q_lo, q_hi)],
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
    )


class CovDense(nn.Module):
    """Dense layer with the reference's rank-1 batch-mean covariance tap.

    The reference Linear hook computes cov of the *batch-mean* vector
    (nsrunner:901) — a rank-1 (C, C) outer product per batch.
    """

    features: int
    use_bias: bool = True
    kernel_init: nn.initializers.Initializer = nn.initializers.xavier_uniform()
    bias_init: nn.initializers.Initializer = nn.initializers.zeros_init()

    @nn.compact
    def __call__(
        self,
        x: jnp.ndarray,
        row_chw: Optional[Tuple[int, int, int]] = None,
    ) -> jnp.ndarray:
        """``row_chw=(C, H, W)`` evaluates with the kernel's input rows
        re-ordered from the stored torch (C, H, W) flat layout to an
        NHWC (H, W, C) flat layout: the (rows, out) kernel is viewed as
        (C, H, W, out) and transposed to (H, W, C, out). This lets hot
        callers feed ``x.reshape(R, -1)`` of an NHWC feature directly —
        permuting the 12.8 MB weight instead of transposing the ~400 MB
        activation (and its gradient) every step — while checkpoints and
        stored-feature artifacts keep the torch row order.
        """
        if self.is_mutable_collection("cov") and not self.is_initializing():
            assert row_chw is None, (
                "covariance tap expects the torch-order input path"
            )
            xm = jnp.mean(x.astype(jnp.float32), axis=0, keepdims=True)
            cov = xm.T @ xm
            self.sow("cov", "cov", cov, reduce_fn=_sum_reduce, init_fn=_zero_init)
        kernel = self.param(
            "kernel", self.kernel_init, (x.shape[-1], self.features), jnp.float32
        )
        if row_chw is not None:
            c, h, w = row_chw
            kernel = (
                kernel.reshape(c, h, w, self.features)
                .transpose(1, 2, 0, 3)
                .reshape(c * h * w, self.features)
            )
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,), jnp.float32)
            y = y + bias.astype(x.dtype)
        return y


class FrozenBatchNorm(nn.Module):
    """BatchNorm in permanent eval mode (mmdet ``norm_eval=True``).

    Running mean/var live in the ``batch_stats`` collection and are never
    updated (the reference never trains BN statistics on this path —
    resnet.py ``norm_eval`` keeps them at the pretrained values). The
    affine scale/bias ARE trainable parameters — they're exactly the
    parameters EWC regularizes (nsrunner:1014 ``must_names=['bn']``).
    """

    epsilon: float = 1e-5

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        c = x.shape[-1]
        scale = self.param("scale", nn.initializers.ones_init(), (c,), jnp.float32)
        bias = self.param("bias", nn.initializers.zeros_init(), (c,), jnp.float32)
        mean = self.variable(
            "batch_stats", "mean", lambda: jnp.zeros((c,), jnp.float32)
        )
        var = self.variable(
            "batch_stats", "var", lambda: jnp.ones((c,), jnp.float32)
        )
        inv = jax.lax.rsqrt(var.value + self.epsilon) * scale
        y = x * inv.astype(x.dtype) + (bias - mean.value * inv).astype(x.dtype)
        return y
