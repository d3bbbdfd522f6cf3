"""RPN head network (the conv part only; losses/proposals are pure fns).

Parity target: mmdet/models/dense_heads/rpn_head.py:52-99 — one shared
3x3 conv + ReLU, then 1x1 cls (A sigmoid logits) and 1x1 reg (A*4).
Init: Normal(std=0.01) like mmdet RPNHead.

``at_positions`` evaluates the same three layers at gathered 3x3 input
patches instead of full maps — the sparse loss path
(detector.rpn_loss_and_proposals): RPN losses touch only the ~256
sampled anchors per image, so backpropagating through the dense
full-pyramid convs computes a ~36 ms/step gradient that is zero almost
everywhere. The patch evaluation is mathematically the dense conv
restricted to the sampled output positions (zero padding == gathering
zeros outside the map), so weights/feature gradients are identical.
It reads the conv kernels directly rather than calling CovConv, so the
covariance taps fire exactly once per step (on the dense call that
still produces proposals).
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CovConv


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_base_priors: int = 3

    def setup(self):
        init = nn.initializers.normal(0.01)
        self.conv = CovConv(
            self.feat_channels, (3, 3), (1, 1), (1, 1),
            kernel_init=init, name="rpn_conv",
        )
        self.cls_conv = CovConv(
            self.num_base_priors, (1, 1), (1, 1), (0, 0),
            kernel_init=init, name="rpn_cls",
        )
        self.reg_conv = CovConv(
            self.num_base_priors * 4, (1, 1), (1, 1), (0, 0),
            kernel_init=init, name="rpn_reg",
        )

    def __call__(
        self, feats: Sequence[jnp.ndarray], fused: bool = False
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Per-level (cls_logits (B,H,W,A), deltas (B,H,W,A*4)).

        ``fused=True`` routes through the forward-only Pallas kernel
        (ops/rpn_head_pallas.py) — callers pass it only on paths where
        the dense head runs under stop_gradient (predict; the
        rpn_sparse_loss train path). The covariance pass keeps the
        CovConv path so the 'cov' taps fire.
        """
        if (
            fused
            and not self.is_mutable_collection("cov")
            and not self.is_initializing()
        ):
            return self._fused(feats)
        cls_out, reg_out = [], []
        for f in feats:
            y = nn.relu(self.conv(f))
            cls_out.append(self.cls_conv(y))
            reg_out.append(self.reg_conv(y))
        return cls_out, reg_out

    def _fused(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        from ..ops.rpn_head_pallas import rpn_head_fused

        A = self.num_base_priors
        F = self.feat_channels
        pv = self.conv.variables["params"]
        cv = self.cls_conv.variables["params"]
        rv = self.reg_conv.variables["params"]
        wc = cv["kernel"].reshape(F, A)
        wr = rv["kernel"].reshape(F, 4 * A)
        P = 128
        wcr = jnp.concatenate(
            [wc, wr, jnp.zeros((F, P - 5 * A), wc.dtype)], axis=1
        )
        bcr = jnp.concatenate(
            [cv["bias"], rv["bias"], jnp.zeros((P - 5 * A,), jnp.float32)]
        )
        args = jax.lax.stop_gradient((pv["kernel"], pv["bias"], wcr, bcr))
        cls_out, reg_out = [], []
        for f in feats:
            out = rpn_head_fused(jax.lax.stop_gradient(f), *args)
            cls_out.append(out[..., :A])
            reg_out.append(out[..., A : 5 * A])
        return cls_out, reg_out

    def at_positions(
        self, patches: jnp.ndarray
    ) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """Head outputs at gathered patches.

        Args:
            patches: (M, 3, 3, C) input windows centered on the sampled
                output positions (out-of-map taps zeroed by the caller —
                matching the dense conv's zero padding).

        Returns:
            cls_logits (M, A), reg_deltas (M, A*4) — bit-for-math equal
            to the dense maps at those positions (same compute dtype:
            kernels cast to the patch dtype exactly as CovConv does).
        """
        dt = patches.dtype
        M = patches.shape[0]
        pv = self.conv.variables["params"]
        k = pv["kernel"].astype(dt)  # (3, 3, C, F)
        h = patches.reshape(M, -1) @ k.reshape(-1, k.shape[-1])
        h = nn.relu(h + pv["bias"].astype(dt))
        cv = self.cls_conv.variables["params"]
        cls = h @ cv["kernel"].reshape(h.shape[-1], -1).astype(dt)
        cls = cls + cv["bias"].astype(dt)
        rv = self.reg_conv.variables["params"]
        reg = h @ rv["kernel"].reshape(h.shape[-1], -1).astype(dt)
        reg = reg + rv["bias"].astype(dt)
        return cls, reg
