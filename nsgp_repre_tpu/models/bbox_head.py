"""Task-split Shared2FC bbox head.

Parity target: mmdet/models/roi_heads/bbox_heads/convfc_bbox_head_task.py
(`ConvFCBBoxHeadTask` :15 / `Shared2FCBBoxHeadTask` :517):

- two shared FCs 7*7*256 → 1024 → 1024 (ReLU, Xavier-uniform init);
- one cls Linear per task slice plus one for background (:94-107),
  Normal(std=0.01) init; one reg Linear (4*slice) per task (:108-128),
  Normal(std=0.001) init;
- forward concatenates per-task outputs; FUTURE tasks (i+1 > task_id,
  not background) are masked to -inf logits / zero regs with no gradient
  (:263-287). We compute them (trivial FLOPs) and overwrite with
  constants — XLA dead-code-eliminates the masked branch, which is
  functionally identical to torch's detach+masked_fill;
- ``mid_features`` returns the flattened pre-FC features (12544-d) used
  by RePRE (:290-323).

Future-task parameters still exist in the tree (created every task) so
checkpoints have a task-independent layout; freezing is enforced by the
optimizer's trainable mask.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax
import jax.numpy as jnp
from flax import linen as nn

from .layers import CovDense

NEG_INF_SCORE = -1.0e10


class Shared2FCBBoxHeadTask(nn.Module):
    task_split: Sequence[int] = (0, 10, 20)
    task_id: int = 1
    num_classes: int = 20
    fc_out_channels: int = 1024
    reg_class_agnostic: bool = False

    @property
    def num_tasks(self) -> int:
        return len(self.task_split) - 1

    def setup(self):
        xavier = nn.initializers.xavier_uniform()
        self.shared_fc1 = CovDense(self.fc_out_channels, kernel_init=xavier, name="shared_fc1")
        self.shared_fc2 = CovDense(self.fc_out_channels, kernel_init=xavier, name="shared_fc2")
        cls_init = nn.initializers.normal(0.01)
        reg_init = nn.initializers.normal(0.001)
        self.fc_cls = [
            CovDense(
                self.task_split[i + 1] - self.task_split[i],
                kernel_init=cls_init,
                name=f"fc_cls{i}",
            )
            for i in range(self.num_tasks)
        ]
        self.fc_cls_bg = CovDense(1, kernel_init=cls_init, name="fc_cls_bg")
        if self.reg_class_agnostic:
            self.fc_reg = [CovDense(4, kernel_init=reg_init, name="fc_reg0")]
        else:
            self.fc_reg = [
                CovDense(
                    4 * (self.task_split[i + 1] - self.task_split[i]),
                    kernel_init=reg_init,
                    name=f"fc_reg{i}",
                )
                for i in range(self.num_tasks)
            ]

    def mid_features(self, x: jnp.ndarray) -> jnp.ndarray:
        """Flattened pre-FC RoI features, (R, 7*7*256) (:290-323).

        Input may be (R, 7, 7, C) NHWC; the flat layout is converted to
        torch's (C, H, W) channel-major order so stored RoI features and
        prototypes are bit-compatible with an (R, 12544) torch layout.
        """
        if x.ndim > 2:
            x = jnp.transpose(x, (0, 3, 1, 2)).reshape(x.shape[0], -1)
        return x

    def __call__(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        """(R, ...) features → (cls_score (R, C+1), bbox_pred (R, 4C)).

        4-D NHWC inputs skip the torch-order activation transpose: the
        flatten is the free ``reshape(R, -1)`` and FC1 evaluates with
        row-permuted weights (CovDense ``row_chw``) — same math, ~400 MB
        less transpose traffic per train step at R=8192. 2-D inputs
        (stored RoI features, prototypes — torch flat order by the
        rois_etc artifact protocol) and the covariance pass keep the
        torch-order path.
        """
        if (
            x.ndim == 4
            and not self.is_mutable_collection("cov")
            and not self.is_initializing()
        ):
            r, h, w, c = x.shape
            x = nn.relu(self.shared_fc1(x.reshape(r, -1), row_chw=(c, h, w)))
            return self._tail(x)
        x = self.mid_features(x)
        x = nn.relu(self.shared_fc1(x))
        return self._tail(x)

    def _tail(self, x: jnp.ndarray) -> Tuple[jnp.ndarray, jnp.ndarray]:
        x = nn.relu(self.shared_fc2(x))

        cls_parts = []
        for i, fc in enumerate(self.fc_cls):
            o = fc(x)
            if i + 1 > self.task_id:
                o = jnp.full_like(o, NEG_INF_SCORE)
            cls_parts.append(o)
        cls_parts.append(self.fc_cls_bg(x))
        cls_score = jnp.concatenate(cls_parts, axis=-1)

        reg_parts = []
        for i, fc in enumerate(self.fc_reg):
            o = fc(x)
            if i + 1 > self.task_id and not self.reg_class_agnostic:
                o = jnp.zeros_like(o)
            reg_parts.append(o)
        bbox_pred = jnp.concatenate(reg_parts, axis=-1)
        return cls_score, bbox_pred
