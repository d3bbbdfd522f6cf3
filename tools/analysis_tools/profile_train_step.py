#!/usr/bin/env python
"""Ablation profiler: time each stage of the train step on real hardware
to find the bottleneck (backbone / RPN loss / NMS proposals / RoI head /
backward). Run on the TPU: ``python tools/analysis_tools/profile_train_step.py``.
"""
from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, *args, n=10, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / n


def main():
    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine.train import normalize_images
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    B, H, W = 8, 608, 1024
    cfg = DetectorConfig(num_classes=20, compute_dtype="bfloat16")
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(B, H, W, capacity=32)
    variables = model.init(jax.random.PRNGKey(0), batch.images[:1].astype(jnp.float32))
    rng = jax.random.PRNGKey(1)

    def prep(b):
        return b.replace(images=normalize_images(b.images))

    # 1. backbone+neck forward
    @jax.jit
    def feat_fwd(v, b):
        return model.apply(v, prep(b).images, method=model.extract_feat)

    # 2. backbone+neck fwd+bwd (sum of outputs as dummy loss)
    @jax.jit
    def feat_fwdbwd(v, b):
        def loss(p):
            outs = model.apply(
                {"params": p, **{k: x for k, x in v.items() if k != "params"}},
                prep(b).images, method=model.extract_feat,
            )
            return sum(o.sum() for o in outs)
        return jax.grad(loss)(v["params"])

    # 3. rpn loss + proposals fwd
    @jax.jit
    def rpn_fwd(v, b, key):
        bb = prep(b)
        def inner(mdl):
            feats = mdl.extract_feat(bb.images)
            return mdl.rpn_loss_and_proposals(feats, bb.gt, bb.img_shape, key)
        return model.apply(v, method=inner)

    # 4. full loss fwd
    @jax.jit
    def full_fwd(v, b, key):
        return model.apply(v, prep(b), key, method=model.loss)

    # 5. full loss fwd+bwd
    @jax.jit
    def full_fwdbwd(v, b, key):
        consts = {k: x for k, x in v.items() if k != "params"}
        def loss(p):
            losses = model.apply({"params": p, **consts}, prep(b), key, method=model.loss)
            return sum(x for k, x in losses.items() if "loss" in k)
        return jax.grad(loss)(v["params"])

    # 6. predict (inference path incl. RCNN NMS)
    @jax.jit
    def predict(v, b):
        return model.apply(v, prep(b), method=model.predict)

    results = {}
    results["backbone_fpn_fwd"] = timeit(feat_fwd, variables, batch)
    results["backbone_fpn_fwdbwd"] = timeit(feat_fwdbwd, variables, batch)
    results["rpn_loss_proposals_fwd"] = timeit(rpn_fwd, variables, batch, rng)
    results["full_loss_fwd"] = timeit(full_fwd, variables, batch, rng)
    results["full_loss_fwdbwd"] = timeit(full_fwdbwd, variables, batch, rng)
    results["predict"] = timeit(predict, variables, batch)
    for k, v in results.items():
        print(f"{k:28s} {v * 1000:8.1f} ms  ({B / v:6.1f} img/s)")


if __name__ == "__main__":
    main()
