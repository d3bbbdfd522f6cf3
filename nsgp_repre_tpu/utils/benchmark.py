"""Benchmark utilities.

Parity target: mmdet/utils/benchmark.py — ``InferenceBenchmark`` (fps
over N images, excluding data loading, model_zoo protocol
docs/en/model_zoo.md:13), ``DataLoaderBenchmark`` (batches/sec) and
``DatasetBenchmark`` (per-item pipeline fps, benchmark.py:406).
"""
from __future__ import annotations

import time
from typing import Optional

import numpy as np


class InferenceBenchmark:
    """Pure-inference fps for a jitted predict step."""

    def __init__(self, detector, max_iter: int = 200, num_warmup: int = 5):
        self.detector = detector
        self.max_iter = max_iter
        self.num_warmup = num_warmup

    def run(self, batch) -> dict:
        import jax

        B = batch.images.shape[0]
        for _ in range(self.num_warmup):
            out = self.detector.predict_batch(batch)
        jax.block_until_ready(out.boxes)
        t0 = time.perf_counter()
        for _ in range(self.max_iter):
            out = self.detector.predict_batch(batch)
        jax.block_until_ready(out.boxes)
        dt = time.perf_counter() - t0
        fps = B * self.max_iter / dt
        return dict(fps=round(fps, 2), times_per_img_ms=round(1000.0 / fps, 3))


class DataLoaderBenchmark:
    """Host data-pipeline throughput (batches/sec, imgs/sec)."""

    def __init__(self, loader, max_iter: Optional[int] = None):
        self.loader = loader
        self.max_iter = max_iter

    def run(self) -> dict:
        t0 = time.perf_counter()
        n_batches = 0
        n_imgs = 0
        for batch, ids in self.loader:
            n_batches += 1
            n_imgs += len(ids)
            if self.max_iter and n_batches >= self.max_iter:
                break
        dt = time.perf_counter() - t0
        return dict(
            batches_per_sec=round(n_batches / dt, 2),
            imgs_per_sec=round(n_imgs / dt, 2),
        )


class DatasetBenchmark:
    """Per-item dataset pipeline fps (decode + resize + flip + pack),
    no batching/collation — the reference's third mode
    (mmdet/utils/benchmark.py:406 DatasetBenchmark: iterates shuffled
    indices, times ``dataset[idx]``)."""

    def __init__(self, dataset, max_iter: int = 2000, num_warmup: int = 5,
                 shuffle: bool = True, seed: int = 0):
        self.dataset = dataset
        self.max_iter = max_iter
        self.num_warmup = num_warmup
        self.shuffle = shuffle
        self.seed = seed

    def run(self) -> dict:
        n = len(self.dataset)
        idx = np.arange(n)
        if self.shuffle:
            np.random.RandomState(self.seed).shuffle(idx)
        total = min(self.max_iter + self.num_warmup, n)
        for i in range(min(self.num_warmup, total)):
            self.dataset[int(idx[i])]
        t0 = time.perf_counter()
        count = 0
        for i in range(self.num_warmup, total):
            self.dataset[int(idx[i])]
            count += 1
        dt = max(time.perf_counter() - t0, 1e-9)
        return dict(
            items_per_sec=round(count / dt, 2),
            ms_per_item=round(1000.0 * dt / max(count, 1), 6),
        )
