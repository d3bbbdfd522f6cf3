#!/usr/bin/env python
"""Reproducer / bisect harness for the COCO-canvas worker crash.

Round-4 observations (BENCHMARKS.md, cl_faster_rcnn_cfgs/mini_coco/*.py):
  - batch-16 train at the COCO canvas (800x1344 landscape bucket) with
    `roi_align_mode='window'` kills the TPU worker after ~19 steps
    ("TPU worker process crashed", no diagnostics);
  - batch-8, or `roi_align_mode='gather'`, or the VOC canvas (608x1024)
    run clean;
  - alternating landscape/portrait bucket programs with async dispatch
    also kills the worker at bs 16 (mitigated by runner.py dispatch
    serialization on bucket switches).

This script isolates the axes so the failure can be attributed:

  python tools/analysis_tools/repro_coco_crash.py \
      --canvas 800x1344 --batch-size 16 --mode window --steps 40
  python tools/analysis_tools/repro_coco_crash.py \
      --canvas 800x1344 --canvas2 1344x800 --batch-size 16 \
      --mode gather --steps 40 --no-serialize   # bucket-alternation axis

It prints per-step HBM watermarks (when the backend exposes
memory_stats) so an HBM-exhaustion cause shows up as a rising
bytes_in_use before the crash, while a kernel/DMA fault shows a flat
watermark. Exit code 0 = survived; a worker crash surfaces as a raised
RuntimeError / dead process (non-zero), which the caller observes.

Single-TPU claim: do not run while a training run holds the chip.
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

import numpy as np

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)


def parse_canvas(s):
    h, w = s.lower().split("x")
    return int(h), int(w)


def mem_stats(dev):
    try:
        ms = dev.memory_stats()
        return ms.get("bytes_in_use", -1), ms.get("peak_bytes_in_use", -1)
    except Exception:
        return -1, -1


def build_step(cfg_kw, B, H, W):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine import optim
    from nsgp_repre_tpu.engine.train import (
        TrainState,
        make_train_step,
        trainable_mask,
    )
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    cfg = DetectorConfig(
        num_classes=80,
        task_split=(0, 80),
        task_id=1,
        compute_dtype="bfloat16",
        **cfg_kw,
    )
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(B, H, W, capacity=64)
    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, batch.images[:1].astype(jnp.float32))
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
    return make_train_step(model, optimizer), state, batch


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--canvas", type=parse_canvas, default=(800, 1344))
    ap.add_argument("--canvas2", type=parse_canvas, default=None,
                    help="alternate with a second bucket canvas")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--mode", choices=("window", "gather"), default="window")
    ap.add_argument("--steps", type=int, default=40)
    ap.add_argument("--serialize", action="store_true",
                    help="sync on every bucket switch (runner mitigation)")
    ap.add_argument("--gt-capacity", type=int, default=64)
    args = ap.parse_args()

    import jax

    from nsgp_repre_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    dev = jax.devices()[0]
    print("device:", dev)

    cfg_kw = dict(roi_align_mode=args.mode)
    B = args.batch_size
    plans = [(args.canvas, build_step(cfg_kw, B, *args.canvas))]
    if args.canvas2:
        plans.append((args.canvas2, build_step(cfg_kw, B, *args.canvas2)))

    key = jax.random.PRNGKey(1)
    prev_loss = None
    t_start = time.time()
    for i in range(args.steps):
        canvas, (step, state, batch) = plans[i % len(plans)]
        if args.serialize and len(plans) > 1 and prev_loss is not None:
            float(prev_loss)
        key = jax.random.fold_in(key, i)
        new_state, m = step(state, batch, key)
        plans[i % len(plans)] = (canvas, (step, new_state, batch))
        prev_loss = m["loss"]
        if i % 5 == 0 or i == args.steps - 1:
            loss = float(m["loss"])  # sync: proves the step completed
            used, peak = mem_stats(dev)
            print(
                f"step {i:3d} canvas {canvas} loss {loss:.4f} "
                f"hbm_used {used/2**30:.2f}GiB peak {peak/2**30:.2f}GiB "
                f"t {time.time()-t_start:.1f}s",
                flush=True,
            )
    print("SURVIVED", args.steps, "steps")


if __name__ == "__main__":
    main()
