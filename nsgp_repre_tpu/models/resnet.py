"""ResNet-50 backbone, torch-style ('pytorch' block layout), NHWC.

Parity target: mmdet/models/backbones/resnet.py:306 with the NSGP-RePRE
config (cl_faster_rcnn_cfgs/_base_/models/faster-rcnn_r50_fpn.py):
``depth=50, num_stages=4, out_indices=(0,1,2,3), frozen_stages=1,
norm_eval=True, style='pytorch'``.

- 'pytorch' style puts the stride-2 in each stage's first 3x3 conv.
- ``norm_eval``: all BNs run with frozen statistics (FrozenBatchNorm).
- ``frozen_stages=1`` (stem + stage 1 not trained) is enforced by the
  optimizer's trainable mask (engine/optim.py), not by stop_gradient,
  so parameter naming and checkpoint layout stay uniform.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CovConv, FrozenBatchNorm


class Bottleneck(nn.Module):
    """1x1 → 3x3(stride) → 1x1 with identity/projection shortcut."""

    mid_channels: int
    out_channels: int
    stride: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        identity = x
        y = CovConv(self.mid_channels, (1, 1), (1, 1), (0, 0), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        y = CovConv(
            self.mid_channels, (3, 3), (self.stride, self.stride), (1, 1),
            use_bias=False, name="conv2",
        )(y)
        y = FrozenBatchNorm(name="bn2")(y)
        y = nn.relu(y)
        y = CovConv(self.out_channels, (1, 1), (1, 1), (0, 0), use_bias=False, name="conv3")(y)
        y = FrozenBatchNorm(name="bn3")(y)
        if x.shape[-1] != self.out_channels or self.stride != 1:
            identity = CovConv(
                self.out_channels, (1, 1), (self.stride, self.stride), (0, 0),
                use_bias=False, name="downsample_conv",
            )(x)
            identity = FrozenBatchNorm(name="downsample_bn")(identity)
        return nn.relu(y + identity)


class ResNet50(nn.Module):
    """Returns the four stage outputs (C2..C5), strides 4/8/16/32.

    ``frozen_stages=1`` (config default) freezes the stem + stage 1 like
    mmdet: besides the optimizer's trainable mask, a stop_gradient after
    the last frozen stage skips the whole high-resolution backward
    through stem/layer1 — exactly what torch's requires_grad=False does
    (frozen params ⇒ no grads flow below them).
    """

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    base_channels: int = 64
    frozen_stages: int = 1

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, ...]:
        y = CovConv(self.base_channels, (7, 7), (2, 2), (3, 3), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        outs = []
        for stage, num_blocks in enumerate(self.stage_blocks):
            mid = self.base_channels * (2 ** stage)
            out_ch = mid * 4
            for block in range(num_blocks):
                stride = 2 if (block == 0 and stage > 0) else 1
                y = Bottleneck(
                    mid_channels=mid,
                    out_channels=out_ch,
                    stride=stride,
                    name=f"layer{stage + 1}_{block}",
                )(y)
            if stage + 1 == self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            outs.append(y)
        return tuple(outs)
