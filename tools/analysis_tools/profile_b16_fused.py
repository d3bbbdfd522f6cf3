#!/usr/bin/env python
"""Batch-16 predict: fused inference rewrites on vs off.

The fused Pallas RPN head / forward-only FPN convs / s2d stem were
tuned at batch 1 (the latency protocol); this measures whether they
help or hurt the batch-16 serving path. Run on the TPU.
"""
from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp


def main():
    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    B, H, W = 16, 800, 1344
    for fused in (True, False):
        cfg = DetectorConfig(
            num_classes=20, compute_dtype="bfloat16", rpn_fused_head=fused
        )
        model = FasterRCNN(config=cfg)
        batch0 = _tiny_batch(B, H, W, capacity=32)
        variables = model.init(
            jax.random.PRNGKey(0), batch0.images[:1].astype(jnp.float32)
        )

        @jax.jit
        def predict(b, eps):
            bb = b.replace(images=b.images + eps)
            det = model.apply(variables, bb, method=model.predict)
            return det.boxes.sum().astype(jnp.float32)

        eps = jnp.zeros(())
        for _ in range(3):
            eps = predict(batch0, eps) * 0.0
        float(eps)
        n = 10
        t0 = time.perf_counter()
        for _ in range(n):
            eps = predict(batch0, eps) * 0.0
        float(eps)
        dt = (time.perf_counter() - t0) / n
        print(
            f"fused={fused}: {dt * 1e3:.1f} ms/batch, "
            f"{B / dt:.1f} img/s", flush=True,
        )


if __name__ == "__main__":
    main()
