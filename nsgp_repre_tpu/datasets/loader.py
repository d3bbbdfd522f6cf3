"""Host-side data pipeline → static-shape device batches.

Replaces the mmdet pipeline (SURVEY §2.3): LoadImageFromFile /
LoadAnnotations / Resize(keep_ratio) / RandomFlip(0.5) / Pad /
PackDetInputs plus AspectRatioBatchSampler (batch_sampler.py:12).

TPU re-design: dynamic image shapes would force XLA recompiles, so every
image lands in one of TWO static buckets — landscape (H_s, W_l) or
portrait (W_l rotated) — mirroring the aspect-ratio batching of the
reference while keeping exactly two compiled shapes (SURVEY §7 hard
part (6)). Normalization happens on device (engine/train.py).
"""
from __future__ import annotations

import math
import os
import threading
from concurrent.futures import ThreadPoolExecutor
from typing import Iterator, List, Optional, Sequence, Tuple

import numpy as np

from ..structures.sample import DetBatch, InstanceArray

try:
    import cv2

    _HAS_CV2 = True
except ImportError:  # pragma: no cover
    from PIL import Image

    _HAS_CV2 = False


def load_image(path: str) -> np.ndarray:
    """Decode to RGB uint8 HWC (bgr_to_rgb=True in the preprocessor cfg)."""
    if _HAS_CV2:
        img = cv2.imread(path, cv2.IMREAD_COLOR)
        if img is None:
            raise FileNotFoundError(path)
        return cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.asarray(Image.open(path).convert("RGB"))


def resize_keep_ratio(
    img: np.ndarray, boxes: np.ndarray, scale: Tuple[int, int]
) -> Tuple[np.ndarray, np.ndarray, Tuple[float, float]]:
    """mmdet Resize(keep_ratio=True): scale=(long, short) max bounds."""
    h, w = img.shape[:2]
    long_side, short_side = max(scale), min(scale)
    factor = min(long_side / max(h, w), short_side / min(h, w))
    new_w, new_h = int(w * factor + 0.5), int(h * factor + 0.5)
    if _HAS_CV2:
        out = cv2.resize(img, (new_w, new_h), interpolation=cv2.INTER_LINEAR)
    else:  # pragma: no cover
        out = np.asarray(Image.fromarray(img).resize((new_w, new_h)))
    w_scale, h_scale = new_w / w, new_h / h
    if len(boxes):
        boxes = boxes * np.array([w_scale, h_scale, w_scale, h_scale], np.float32)
    return out, boxes, (w_scale, h_scale)


def flip_horizontal(img: np.ndarray, boxes: np.ndarray):
    img = img[:, ::-1]
    w = img.shape[1]
    if len(boxes):
        boxes = boxes.copy()
        x1 = w - boxes[:, 2]
        x2 = w - boxes[:, 0]
        boxes[:, 0], boxes[:, 2] = x1, x2
    return img, boxes


def _round_up(x: int, m: int = 32) -> int:
    return int(math.ceil(x / m) * m)


# Shared decode pool: cv2 imread/resize release the GIL, so threads give
# near-linear speedup on the JPEG-decode-bound path (the reference uses
# torch DataLoader worker *processes*; threads suffice without pickling).
_DECODE_POOL: Optional[ThreadPoolExecutor] = None
_DECODE_POOL_LOCK = threading.Lock()


def _decode_pool() -> ThreadPoolExecutor:
    global _DECODE_POOL
    if _DECODE_POOL is None:
        with _DECODE_POOL_LOCK:  # train/val prefetch workers race here
            if _DECODE_POOL is None:
                n = max(1, int(os.environ.get("NSGP_DECODE_THREADS", "16")))
                _DECODE_POOL = ThreadPoolExecutor(max_workers=n)
    return _DECODE_POOL


class BatchMeta(list):
    """The global batch's ``img_ids`` (list subclass — drop-in for the
    old plain list) plus the per-image ``flips`` decisions, so the
    teacher pseudo-label cache can key on ``(img_id, flip)``
    (engine/runner.py teacher_label_cache)."""

    def __init__(self, ids, flips):
        super().__init__(ids)
        self.flips = list(flips)


class DetLoader:
    """Batches a dataset into fixed-shape :class:`DetBatch` pytrees.

    Args:
        scale: mmdet resize scale, e.g. (1000, 600) VOC / (1333, 800) COCO.
        aspect_buckets: split landscape/portrait into separate batches
            (AspectRatioBatchSampler semantics) with static per-bucket
            canvas shapes.
    """

    def __init__(
        self,
        dataset,
        batch_size: int,
        scale: Tuple[int, int] = (1000, 600),
        training: bool = True,
        gt_capacity: int = 100,
        flip_prob: float = 0.5,
        repeat: int = 1,
        seed: int = 0,
        drop_last: Optional[bool] = None,
        num_shards: int = 1,
        shard_id: int = 0,
        force_flip: Optional[bool] = None,
    ):
        """``num_shards``/``shard_id`` enable multi-host SPMD loading:
        ``batch_size`` stays the GLOBAL batch; every process runs the SAME
        deterministic batch plan (records, buckets, flip decisions — all
        derived from metadata and the shared seed), but only decodes and
        yields its own contiguous ``batch_size/num_shards`` slice of each
        batch. The returned ``img_ids`` stay global so evaluation and
        artifact bookkeeping see the full batch. Mirrors mmengine
        DefaultSampler rank-sharding (+ the reference's per-rank loaders,
        nsrunner_roi_replay.py:73-105) without per-rank data divergence.
        """
        assert batch_size % max(num_shards, 1) == 0, (batch_size, num_shards)
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_shards = max(num_shards, 1)
        self.shard_id = shard_id
        self.local_batch = batch_size // self.num_shards
        self.training = training
        self.gt_capacity = gt_capacity
        self.flip_prob = flip_prob if training else 0.0
        self.repeat = repeat if training else 1
        self.seed = seed
        self.epoch = 0
        self.drop_last = training if drop_last is None else drop_last
        # force_flip overrides the random flip decision for EVERY record
        # — used by the teacher pseudo-label pre-pass to enumerate both
        # augmentation variants deterministically
        self.force_flip = force_flip
        long_side, short_side = max(scale), min(scale)
        # static canvases: landscape (short, long), portrait (long, short)
        self.canvas = {
            "landscape": (_round_up(short_side), _round_up(long_side)),
            "portrait": (_round_up(long_side), _round_up(short_side)),
        }
        self.scale = scale

    def set_epoch(self, epoch: int):
        self.epoch = epoch

    def __len__(self) -> int:
        n = len(self.dataset) * self.repeat
        if self.drop_last:
            return n // self.batch_size
        return math.ceil(n / self.batch_size)

    def _bucket_of(self, rec) -> str:
        return "landscape" if rec["width"] >= rec["height"] else "portrait"

    def _make_batch(self, items: List[tuple], bucket: str) -> DetBatch:
        """items: [(rec, flip)] — this process's slice of the batch plan."""
        bh, bw = self.canvas[bucket]
        B = self.local_batch
        images = np.zeros((B, bh, bw, 3), np.uint8)
        img_shape = np.zeros((B, 2), np.int32)
        ori_shape = np.zeros((B, 2), np.int32)
        scale_factor = np.ones((B, 2), np.float32)
        boxes = np.zeros((B, self.gt_capacity, 4), np.float32)
        labels = np.full((B, self.gt_capacity), -1, np.int32)
        valid = np.zeros((B, self.gt_capacity), bool)

        def _one(i: int, rec, flip: bool):
            img = load_image(rec["img_path"])
            b = rec["boxes"].copy()
            img, b, (ws, hs) = resize_keep_ratio(img, b, self.scale)
            if flip:
                img, b = flip_horizontal(img, b)
            h, w = img.shape[:2]
            images[i, :h, :w] = img
            img_shape[i] = (h, w)
            ori_shape[i] = (rec["height"], rec["width"])
            scale_factor[i] = (ws, hs)
            n = min(len(b), self.gt_capacity)
            boxes[i, :n] = b[:n]
            labels[i, :n] = rec["labels"][:n]
            valid[i, :n] = True

        # each worker writes its own row i — no aliasing between tasks
        list(_decode_pool().map(
            lambda t: _one(*t),
            [(i, rec, flip) for i, (rec, flip) in enumerate(items)],
        ))
        # unused batch slots (last partial batch): zero images, no gt
        return DetBatch(
            images=images,
            img_shape=img_shape,
            ori_shape=ori_shape,
            scale_factor=scale_factor,
            gt=InstanceArray(boxes=boxes, labels=labels, valid=valid),
        )

    def _emit(self, items: List[tuple], bucket: str):
        """Slice this process's contiguous rows out of the global plan;
        ids stay global (the i-th row of the assembled global batch is
        the i-th planned record)."""
        ids = BatchMeta(
            [rec["img_id"] for rec, _ in items], [f for _, f in items]
        )
        lo = self.shard_id * self.local_batch
        local = items[lo : lo + self.local_batch]
        return self._make_batch(local, bucket), ids

    def __iter__(self) -> Iterator:
        rng = np.random.RandomState(self.seed + self.epoch)
        order = np.concatenate(
            [np.arange(len(self.dataset)) for _ in range(self.repeat)]
        )
        if self.training:
            rng.shuffle(order)

        # the plan (record order, buckets, flips) uses metadata only and a
        # shared seed — identical on every process; image decode happens
        # later, only for the local slice
        buckets: dict = {"landscape": [], "portrait": []}
        for idx in order:
            rec = self.dataset[int(idx)]
            # rng is consumed regardless of force_flip so the batch plan
            # (shuffle order downstream) is unchanged by the override
            r = rng.rand()
            flip = (
                self.force_flip
                if self.force_flip is not None
                else bool(self.training and r < self.flip_prob)
            )
            b = self._bucket_of(rec)
            buckets[b].append((rec, flip))
            if len(buckets[b]) == self.batch_size:
                yield self._emit(buckets[b], b)
                buckets[b] = []
        if not self.drop_last:
            for b, items in buckets.items():
                if items:
                    yield self._emit(items, b)
