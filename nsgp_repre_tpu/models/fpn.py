"""Feature Pyramid Network.

Parity target: mmdet/models/necks/fpn.py:15. Two configurations are on
the reference's config surface:
- Faster/Mask/Cascade R-CNN: ``in_channels=[256,512,1024,2048],
  out_channels=256, num_outs=5`` — lateral 1x1 convs, nearest-neighbor
  top-down pathway, 3x3 output convs, and an extra stride-2 max-pool
  level (``add_extra_convs=False`` → P6 = maxpool(P5)).
- RetinaNet: ``start_level=1, add_extra_convs='on_input', num_outs=5``
  — P6/P7 are stride-2 3x3 convs on C5 / relu(P6)
  (cl_faster_rcnn_cfgs/_base_/models/retinanet_r50_fpn.py:22-28).
"""
from __future__ import annotations

from typing import Optional, Sequence, Tuple

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
    # first backbone level used (mmdet ``start_level``; RetinaNet uses 1)
    start_level: int = 0
    # None → extra levels are stride-2 maxpools of the last output;
    # 'on_input' → stride-2 3x3 convs on the last backbone map (RetinaNet);
    # 'on_output' → stride-2 3x3 convs chained on the last FPN output
    add_extra_convs: Optional[str] = None
    relu_before_extra_convs: bool = False

    @nn.compact
    def __call__(
        self, inputs: Sequence[jnp.ndarray], fused: bool = False
    ) -> Tuple[jnp.ndarray, ...]:
        """``fused=True`` routes the stride-1 3x3 output convs through
        the forward-only Pallas conv (CovConv fused path) — inference
        paths only; laterals/extra convs keep the XLA path."""
        inputs = list(inputs[self.start_level:])
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
            )(laterals[i], fused=fused)
            for i in range(num_ins)
        ]
        if self.num_outs > num_ins:
            if self.add_extra_convs is None:
                # mmdet FPN extra level: max_pool(kernel=1, stride=2)
                outs.append(nn.max_pool(outs[-1], (1, 1), strides=(2, 2)))
            else:
                extra_src = inputs[-1] if self.add_extra_convs == "on_input" else outs[-1]
                for j in range(self.num_outs - num_ins):
                    if j > 0:
                        # subsequent extras chain on the previous output
                        # (mmdet fpn.py forward; relu only when configured)
                        extra_src = outs[-1]
                        if self.relu_before_extra_convs:
                            extra_src = nn.relu(extra_src)
                    outs.append(
                        CovConv(
                            self.out_channels, (3, 3), (2, 2), (1, 1),
                            kernel_init=xavier, name=f"fpn_conv{num_ins + j}",
                        )(extra_src)
                    )
        return tuple(outs)
