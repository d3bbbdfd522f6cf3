"""ResNet backbone family, NHWC.

Parity target: mmdet/models/backbones/resnet.py:306. Configurations on
the reference's config surface:
- Faster/Mask/Cascade/Retina R-50-FPN (faster-rcnn_r50_fpn.py):
  ``depth=50, num_stages=4, out_indices=(0,1,2,3), frozen_stages=1,
  norm_eval=True, style='pytorch'``.
- C4 (faster-rcnn_r50-caffe-c4.py): ``num_stages=3, strides=(1,2,2),
  out_indices=(2,), style='caffe'`` — caffe style puts the stride-2 in
  each stage's first 1x1 conv.
- DC5 (faster-rcnn_r50-caffe-dc5.py): ``num_stages=4,
  strides=(1,2,2,1), dilations=(1,1,1,2), out_indices=(3,)`` — dilated
  stage 5, output stride 16.

- ``norm_eval``: all BNs run with frozen statistics (FrozenBatchNorm).
- ``frozen_stages=1`` (stem + stage 1 not trained) is enforced by the
  optimizer's trainable mask (engine/optim.py), not by stop_gradient,
  so parameter naming and checkpoint layout stay uniform.
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CovConv, FrozenBatchNorm


class Bottleneck(nn.Module):
    """1x1 → 3x3 → 1x1 with identity/projection shortcut.

    'pytorch' style strides the 3x3; 'caffe' style strides the first
    1x1 (resnet.py ``conv1_stride``/``conv2_stride`` selection).
    """

    mid_channels: int
    out_channels: int
    stride: int = 1
    dilation: int = 1
    style: str = "pytorch"

    @nn.compact
    def __call__(self, x: jnp.ndarray, fused: bool = False) -> jnp.ndarray:
        identity = x
        s1 = self.stride if self.style == "caffe" else 1
        s2 = 1 if self.style == "caffe" else self.stride
        y = CovConv(self.mid_channels, (1, 1), (s1, s1), (0, 0), use_bias=False, name="conv1")(x)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        d = self.dilation
        y = CovConv(
            self.mid_channels, (3, 3), (s2, s2), (d, d),
            dilation=(d, d), use_bias=False, name="conv2",
        )(y, fused=fused)
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


class ResLayer(nn.Module):
    """One ResNet stage as a standalone module — the C4 RoI head's
    res5 shared head (mmdet/models/roi_heads/shared_heads/res_layer.py):
    applied to (R, 14, 14, 1024) RoI features, outputs (R, 7, 7, 2048).
    """

    stage: int = 3  # 0-based: stage 3 == layer4/res5
    num_blocks: int = 3
    base_channels: int = 64
    stride: int = 2
    dilation: int = 1
    style: str = "caffe"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        mid = self.base_channels * (2 ** self.stage)
        out_ch = mid * 4
        for block in range(self.num_blocks):
            x = Bottleneck(
                mid_channels=mid,
                out_channels=out_ch,
                stride=self.stride if block == 0 else 1,
                dilation=self.dilation,
                style=self.style,
                name=f"layer{self.stage + 1}_{block}",
            )(x)
        return x


class ResNet50(nn.Module):
    """Returns the stage outputs selected by ``out_indices``.

    ``frozen_stages=1`` (config default) freezes the stem + stage 1 like
    mmdet: besides the optimizer's trainable mask, a stop_gradient after
    the last frozen stage skips the whole high-resolution backward
    through stem/layer1 — exactly what torch's requires_grad=False does
    (frozen params ⇒ no grads flow below them).
    """

    stage_blocks: Sequence[int] = (3, 4, 6, 3)
    base_channels: int = 64
    frozen_stages: int = 1
    style: str = "pytorch"
    strides: Optional[Sequence[int]] = None  # default (1, 2, 2, 2)
    dilations: Optional[Sequence[int]] = None  # default all-1
    out_indices: Optional[Sequence[int]] = None  # default: all stages
    # evaluate the 7x7/2 stem via space-to-depth (exact; MXU-friendly
    # contraction on 12 instead of 3 input channels) — layers._conv_s2d
    stem_s2d: bool = False
    # route eligible bottleneck 3x3 convs through the fused Pallas conv
    # on inference paths (measured slightly NEGATIVE at batch-1 800x1344
    # — XLA's stage-2..4 convs are already decent and the custom-call
    # boundaries around the 1x1 convs add relayouts — kept as a knob)
    fused_blocks: bool = False

    @nn.compact
    def __call__(
        self, x: jnp.ndarray, inference: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        """``inference=True`` (no-grad paths) evaluates the stem via
        the exact s2d rewrite and lets eligible 3x3 convs use the
        forward-only fused Pallas conv (models/layers.py)."""
        y = CovConv(self.base_channels, (7, 7), (2, 2), (3, 3),
                    use_bias=False, s2d=self.stem_s2d, name="conv1")(
                        x, s2d=self.stem_s2d or inference)
        y = FrozenBatchNorm(name="bn1")(y)
        y = nn.relu(y)
        # torch MaxPool2d(kernel=3, stride=2, padding=1)
        y = nn.max_pool(y, (3, 3), strides=(2, 2), padding=[(1, 1), (1, 1)])

        n = len(self.stage_blocks)
        strides = list(self.strides) if self.strides else [1] + [2] * (n - 1)
        dilations = list(self.dilations) if self.dilations else [1] * n
        out_indices = (
            tuple(self.out_indices) if self.out_indices is not None else tuple(range(n))
        )
        outs = []
        for stage, num_blocks in enumerate(self.stage_blocks):
            mid = self.base_channels * (2 ** stage)
            out_ch = mid * 4
            for block in range(num_blocks):
                y = Bottleneck(
                    mid_channels=mid,
                    out_channels=out_ch,
                    stride=strides[stage] if block == 0 else 1,
                    dilation=dilations[stage],
                    style=self.style,
                    name=f"layer{stage + 1}_{block}",
                )(y, fused=inference and self.fused_blocks)
            if stage + 1 == self.frozen_stages:
                y = jax.lax.stop_gradient(y)
            if stage in out_indices:
                outs.append(y)
        return tuple(outs)
