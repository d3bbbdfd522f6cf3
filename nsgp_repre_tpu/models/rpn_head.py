"""RPN head network (the conv part only; losses/proposals are pure fns).

Parity target: mmdet/models/dense_heads/rpn_head.py:52-99 — one shared
3x3 conv + ReLU, then 1x1 cls (A sigmoid logits) and 1x1 reg (A*4).
Init: Normal(std=0.01) like mmdet RPNHead.
"""
from __future__ import annotations

from typing import List, Sequence, Tuple

import jax.numpy as jnp
from flax import linen as nn

from .layers import CovConv


class RPNHead(nn.Module):
    feat_channels: int = 256
    num_base_priors: int = 3

    @nn.compact
    def __call__(
        self, feats: Sequence[jnp.ndarray]
    ) -> Tuple[List[jnp.ndarray], List[jnp.ndarray]]:
        """Per-level (cls_logits (B,H,W,A), deltas (B,H,W,A*4))."""
        init = nn.initializers.normal(0.01)
        conv = CovConv(
            self.feat_channels, (3, 3), (1, 1), (1, 1),
            kernel_init=init, name="rpn_conv",
        )
        cls_conv = CovConv(
            self.num_base_priors, (1, 1), (1, 1), (0, 0),
            kernel_init=init, name="rpn_cls",
        )
        reg_conv = CovConv(
            self.num_base_priors * 4, (1, 1), (1, 1), (0, 0),
            kernel_init=init, name="rpn_reg",
        )
        cls_out, reg_out = [], []
        for f in feats:
            y = nn.relu(conv(f))
            cls_out.append(cls_conv(y))
            reg_out.append(reg_conv(y))
        return cls_out, reg_out
