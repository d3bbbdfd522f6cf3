#!/usr/bin/env python
"""Capture an XLA device trace of the REAL train step (bench protocol:
task-1 Faster R-CNN, batch 16, 608x1024, bf16) and dump the xplane to
/tmp/jaxtrace_train for parse_xplane.py.

Usage:
  python tools/analysis_tools/trace_train.py [--task 1] [--iters 8]
  PROTOCOL_BUFFERS_PYTHON_IMPLEMENTATION=python \
      python tools/analysis_tools/parse_xplane.py /tmp/jaxtrace_train 8
"""
import argparse
import glob
import os
import shutil

import sys, os.path as osp
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--task", type=int, default=1)
    p.add_argument("--iters", type=int, default=8)
    p.add_argument("--out", default="/tmp/jaxtrace_train")
    a = p.parse_args()

    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine import optim
    from nsgp_repre_tpu.engine.train import (
        TrainState, make_train_step, trainable_mask,
    )
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    B, H, W = 16, 608, 1024
    cfg = DetectorConfig(
        num_classes=20, task_split=(0, 20), task_id=a.task,
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

    key = jax.random.PRNGKey(1)
    state, m = train_step(state, batch, key)
    float(m["loss"])

    shutil.rmtree(a.out, ignore_errors=True)
    with jax.profiler.trace(a.out):
        for i in range(a.iters):
            key = jax.random.fold_in(key, i)
            state, m = train_step(state, batch, key)
        float(m["loss"])
    print("xplanes:", glob.glob(os.path.join(a.out, "**", "*.xplane.pb"),
                                recursive=True))


if __name__ == "__main__":
    main()
