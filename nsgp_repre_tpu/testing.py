"""Synthetic-input factories for tests and benchmarks.

Parity target: mmdet/testing/_utils.py — ``demo_mm_inputs`` (:90-215)
builds random images + random GT with a fixed seed; ``get_detector_cfg``
pulls real configs and shrinks them (tests/test_detectors/
test_two_stage.py:26-28 shrinks R50→R18). Here the same roles are played
by :func:`demo_det_batch` and :func:`tiny_detector_config`.
"""
from __future__ import annotations

from typing import Sequence, Tuple

import jax.numpy as jnp
import numpy as np

from .models.detector import DetectorConfig
from .structures.sample import DetBatch, InstanceArray


def demo_det_batch(
    batch_size: int = 1,
    height: int = 64,
    width: int = 64,
    num_instances: Sequence[int] = (2,),
    num_classes: int = 4,
    gt_capacity: int = 8,
    seed: int = 0,
) -> DetBatch:
    """Random padded detection batch (demo_mm_inputs analogue)."""
    rng = np.random.RandomState(seed)
    images = rng.randint(0, 255, (batch_size, height, width, 3), np.uint8)
    boxes = np.zeros((batch_size, gt_capacity, 4), np.float32)
    labels = np.full((batch_size, gt_capacity), -1, np.int32)
    valid = np.zeros((batch_size, gt_capacity), bool)
    for b in range(batch_size):
        n = num_instances[b % len(num_instances)]
        n = min(n, gt_capacity)
        cx = rng.uniform(0.2, 0.8, n) * width
        cy = rng.uniform(0.2, 0.8, n) * height
        bw = rng.uniform(0.2, 0.5, n) * width
        bh = rng.uniform(0.2, 0.5, n) * height
        boxes[b, :n, 0] = np.clip(cx - bw / 2, 0, width)
        boxes[b, :n, 1] = np.clip(cy - bh / 2, 0, height)
        boxes[b, :n, 2] = np.clip(cx + bw / 2, 0, width)
        boxes[b, :n, 3] = np.clip(cy + bh / 2, 0, height)
        labels[b, :n] = rng.randint(0, num_classes, n)
        valid[b, :n] = True
    return DetBatch(
        images=jnp.asarray(images),
        img_shape=jnp.tile(jnp.array([height, width], jnp.int32), (batch_size, 1)),
        ori_shape=jnp.tile(jnp.array([height, width], jnp.int32), (batch_size, 1)),
        scale_factor=jnp.ones((batch_size, 2), jnp.float32),
        gt=InstanceArray(
            boxes=jnp.asarray(boxes),
            labels=jnp.asarray(labels),
            valid=jnp.asarray(valid),
        ),
    )


def tiny_detector_config(**overrides) -> DetectorConfig:
    """A shrunken detector config for fast CPU tests (R50→1-block stages,
    small NMS/sampling budgets — the reference's config-shrinking idiom)."""
    base = dict(
        num_classes=4,
        task_split=(0, 2, 4),
        task_id=1,
        backbone_blocks=(1, 1, 1, 1),
        rpn_nms_pre=64,
        rpn_max_per_img=32,
        rpn_num=16,
        rcnn_num=16,
        max_per_img=8,
    )
    base.update(overrides)
    return DetectorConfig(**base)
