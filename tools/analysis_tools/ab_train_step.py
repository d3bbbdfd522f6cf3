#!/usr/bin/env python
"""A/B bench of the full task-1 train step under DetectorConfig overrides.

Runs the SAME synthetic-batch protocol as bench.py's `_bench_train`
(B=16, 608x1024, bf16, 20 iters, chained-scalar sync — the axon relay
makes `block_until_ready` unreliable) once per requested config variant
and prints img/s/chip for each, so single-knob experiments (stem_s2d,
rpn_sparse_loss, roi_align_mode, ...) are one command on the chip:

  python tools/analysis_tools/ab_train_step.py \
      baseline stem_s2d=True "stem_s2d=True,rpn_fused_head=False"

Each positional arg is a comma-separated k=v list (Python literals) or
the word "baseline". Single-TPU claim: don't run during training runs.
"""
from __future__ import annotations

import ast
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(osp.abspath(__file__)), "..", ".."))

import numpy as np


def parse_variant(spec: str) -> dict:
    if spec == "baseline":
        return {}
    out = {}
    for kv in spec.split(","):
        k, v = kv.split("=", 1)
        out[k.strip()] = ast.literal_eval(v.strip())
    return out


def bench_variant(overrides: dict, B=16, H=608, W=1024, n_iters=20):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine import optim
    from nsgp_repre_tpu.engine.train import (
        TrainState, make_train_step, trainable_mask,
    )
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    cfg = DetectorConfig(
        num_classes=20, task_split=(0, 20), task_id=1,
        compute_dtype="bfloat16", **overrides,
    )
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(B, H, W, capacity=32)
    variables = model.init(
        jax.random.PRNGKey(0), batch.images[:1].astype(jnp.float32)
    )
    params = variables["params"]
    optimizer = optim.masked(
        optim.sgd_nscl(0.02, momentum=0.9, weight_decay=1e-4),
        trainable_mask(params, cfg),
    )
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    train_step = make_train_step(model, optimizer)
    key = jax.random.PRNGKey(1)
    t0 = time.perf_counter()
    state, m = train_step(state, batch, key)
    float(m["loss"])
    compile_s = time.perf_counter() - t0
    t0 = time.perf_counter()
    for i in range(n_iters):
        key = jax.random.fold_in(key, i)
        state, m = train_step(state, batch, key)
    float(m["loss"])  # host transfer = hard sync
    dt = time.perf_counter() - t0
    return B * n_iters / dt, compile_s


def main():
    specs = sys.argv[1:] or ["baseline"]
    for spec in specs:
        ov = parse_variant(spec)
        rate, compile_s = bench_variant(ov)
        print(f"{spec:50s} {rate:7.2f} img/s/chip  (compile {compile_s:.0f}s)")


if __name__ == "__main__":
    main()
