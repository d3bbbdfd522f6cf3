#!/usr/bin/env python
"""Training-throughput benchmark (driver-run on real TPU hardware).

Protocol: steady-state Faster R-CNN R-50-FPN train-step images/sec on
one chip, synthetic VOC-shaped data (608x1024 canvas — the (1000,600)
keep-ratio landscape bucket), bfloat16 backbone compute. Baseline
anchor: upstream mmdet Faster R-CNN trains at 0.216 s/iter @ global
batch 16 on 8x V100 ⇒ 9.26 img/s/GPU (docs/en/model_zoo.md:330-336 in
the reference; see BASELINE.md).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 9.26  # V100 anchor (BASELINE.md)


def main():
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine import optim
    from nsgp_repre_tpu.engine.train import TrainState, make_train_step, trainable_mask
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    B, H, W = 16, 608, 1024
    cfg = DetectorConfig(
        num_classes=20,
        task_split=(0, 20),
        task_id=1,
        compute_dtype="bfloat16",
    )
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(B, H, W, capacity=32)

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, batch.images[:1].astype(jnp.float32))
    params = variables["params"]
    mask = trainable_mask(params, cfg)
    optimizer = optim.masked(
        optim.sgd_nscl(0.02, momentum=0.9, weight_decay=1e-4), mask
    )
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    train_step = make_train_step(model, optimizer)

    # warmup / compile
    key = jax.random.PRNGKey(1)
    state, _ = train_step(state, batch, key)
    jax.block_until_ready(state.params)

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        key = jax.random.fold_in(key, i)
        state, metrics = train_step(state, batch, key)
    jax.block_until_ready(state.params)
    dt = time.perf_counter() - t0

    img_per_sec = B * n_iters / dt
    print(
        json.dumps(
            {
                "metric": "faster_rcnn_r50_fpn_train_throughput",
                "value": round(img_per_sec, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(img_per_sec / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
            }
        )
    )


if __name__ == "__main__":
    # the axon compile relay occasionally drops a response mid-read;
    # retry the whole run a couple of times before giving up
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # pragma: no cover
            if attempt == 2:
                raise
            import sys

            print(
                f"# bench attempt {attempt} failed ({type(e).__name__}); retrying",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(10)
