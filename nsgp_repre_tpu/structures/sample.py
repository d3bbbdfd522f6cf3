"""Fixed-capacity detection sample pytrees.

The reference carries per-image annotations in dynamic ``DetDataSample`` /
``InstanceData`` objects (mmdet/structures/det_data_sample.py:7). Dynamic
shapes don't compile on TPU, so the rebuild uses padded instance arrays
with validity masks — every field has static shape and the whole batch is
one pytree that crosses the host→device boundary once.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp
import numpy as np
from flax import struct


@struct.dataclass
class InstanceArray:
    """A fixed-capacity set of box instances.

    Attributes:
        boxes: (..., K, 4) corner boxes; padded rows are zeros.
        labels: (..., K) int32 class labels; padded entries are -1.
        valid: (..., K) bool validity mask.
        scores: optional (..., K) float scores (predictions only).
    """

    boxes: jnp.ndarray
    labels: jnp.ndarray
    valid: jnp.ndarray
    scores: Optional[jnp.ndarray] = None
    # optional instance masks: for gt, (..., K, Hm, Wm) box-normalized
    # crops (each gt's mask resampled over its own box — the TPU-static
    # replacement for mmdet BitmapMasks); for predictions, (..., K, 28,
    # 28) mask-head probabilities
    masks: Optional[jnp.ndarray] = None

    @property
    def capacity(self) -> int:
        return self.boxes.shape[-2]

    def num_valid(self) -> jnp.ndarray:
        return self.valid.sum(axis=-1)


@struct.dataclass
class DetBatch:
    """One device-ready batch.

    Attributes:
        images: (B, H, W, 3) float images, NHWC (TPU-native layout),
            already normalized and padded to a static shape bucket.
        img_shape: (B, 2) int32 (h, w) of the *resized* image content
            inside the padded canvas (= mmdet ``img_shape``).
        ori_shape: (B, 2) int32 original (h, w) before resizing.
        scale_factor: (B, 2) float (w_scale, h_scale) applied by resize.
        gt: padded ground-truth instances.
    """

    images: jnp.ndarray
    img_shape: jnp.ndarray
    ori_shape: jnp.ndarray
    scale_factor: jnp.ndarray
    gt: InstanceArray

    @property
    def batch_size(self) -> int:
        return self.images.shape[0]


def pad_instances(
    boxes: np.ndarray,
    labels: np.ndarray,
    capacity: int,
    scores: Optional[np.ndarray] = None,
) -> InstanceArray:
    """Pad per-image numpy annotations to a fixed capacity (host side)."""
    n = min(len(boxes), capacity)
    out_boxes = np.zeros((capacity, 4), dtype=np.float32)
    out_labels = np.full((capacity,), -1, dtype=np.int32)
    out_valid = np.zeros((capacity,), dtype=bool)
    out_boxes[:n] = np.asarray(boxes, dtype=np.float32)[:n]
    out_labels[:n] = np.asarray(labels, dtype=np.int32)[:n]
    out_valid[:n] = True
    out_scores = None
    if scores is not None:
        out_scores = np.zeros((capacity,), dtype=np.float32)
        out_scores[:n] = np.asarray(scores, dtype=np.float32)[:n]
    return InstanceArray(
        boxes=jnp.asarray(out_boxes),
        labels=jnp.asarray(out_labels),
        valid=jnp.asarray(out_valid),
        scores=None if out_scores is None else jnp.asarray(out_scores),
    )
