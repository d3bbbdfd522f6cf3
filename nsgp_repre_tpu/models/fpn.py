"""Feature Pyramid Network.

Parity target: mmdet/models/necks/fpn.py:15 with
``in_channels=[256,512,1024,2048], out_channels=256, num_outs=5`` —
lateral 1x1 convs, nearest-neighbor top-down pathway, 3x3 output convs,
and an extra stride-2 max-pool level (mmdet default
``add_extra_convs=False`` → P6 = maxpool(P5)).
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CovConv


def _upsample_nearest_2x(x: jnp.ndarray, target_hw: Tuple[int, int]) -> jnp.ndarray:
    """Nearest upsample to the lateral's (h, w) (torch F.interpolate nearest)."""
    n, h, w, c = x.shape
    th, tw = target_hw
    y = jnp.repeat(jnp.repeat(x, 2, axis=1), 2, axis=2)
    return y[:, :th, :tw, :]


class FPN(nn.Module):
    out_channels: int = 256
    num_outs: int = 5

    @nn.compact
    def __call__(self, inputs: Sequence[jnp.ndarray]) -> Tuple[jnp.ndarray, ...]:
        num_ins = len(inputs)
        xavier = nn.initializers.xavier_uniform()
        laterals = [
            CovConv(
                self.out_channels, (1, 1), (1, 1), (0, 0),
                kernel_init=xavier, name=f"lateral_conv{i}",
            )(inputs[i])
            for i in range(num_ins)
        ]
        for i in range(num_ins - 1, 0, -1):
            laterals[i - 1] = laterals[i - 1] + _upsample_nearest_2x(
                laterals[i], laterals[i - 1].shape[1:3]
            )
        outs = [
            CovConv(
                self.out_channels, (3, 3), (1, 1), (1, 1),
                kernel_init=xavier, name=f"fpn_conv{i}",
            )(laterals[i])
            for i in range(num_ins)
        ]
        if self.num_outs > num_ins:
            # mmdet FPN extra level: max_pool(kernel=1, stride=2)
            extra = nn.max_pool(outs[-1], (1, 1), strides=(2, 2))
            outs.append(extra)
        return tuple(outs)
