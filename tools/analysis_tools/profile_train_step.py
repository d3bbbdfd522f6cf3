#!/usr/bin/env python
"""Ablation profiler with forced serialization.

Under the axon relay, ``block_until_ready`` doesn't reliably block, so
each timed function is chained through a scalar data dependency (the
previous output perturbs the next input) — per-step time is then real
device time. Run on the TPU.
"""
from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit_chained(fn, batch, n=10, warmup=2):
    """fn(batch, eps) -> scalar; chained through eps."""
    eps = jnp.zeros(())
    for _ in range(warmup):
        eps = fn(batch, eps) * 0.0
    float(eps)  # hard sync
    t0 = time.perf_counter()
    for _ in range(n):
        eps = fn(batch, eps) * 0.0
    float(eps)  # hard sync via host transfer
    return (time.perf_counter() - t0) / n


def main():
    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine.train import normalize_images
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    B, H, W = 16, 608, 1024
    cfg = DetectorConfig(num_classes=20, compute_dtype="bfloat16")
    model = FasterRCNN(config=cfg)
    batch0 = _tiny_batch(B, H, W, capacity=32)
    variables = model.init(jax.random.PRNGKey(0), batch0.images[:1].astype(jnp.float32))
    rng = jax.random.PRNGKey(1)

    def perturbed(b, eps):
        return b.replace(images=normalize_images(b.images) + eps)

    @jax.jit
    def noop(b, eps):
        return b.images[0, 0, 0, 0].astype(jnp.float32) + eps

    @jax.jit
    def feat_fwd(b, eps):
        outs = model.apply(variables, perturbed(b, eps).images, method=model.extract_feat)
        return outs[-1].sum()

    @jax.jit
    def feat_fwdbwd(b, eps):
        def loss(p):
            outs = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                perturbed(b, eps).images, method=model.extract_feat,
            )
            return sum(o.sum() for o in outs)
        g = jax.grad(loss)(variables["params"])
        return jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), g, jnp.zeros(()))

    @jax.jit
    def rpn_fwd(b, eps):
        bb = perturbed(b, eps)
        def inner(mdl):
            feats = mdl.extract_feat(bb.images)
            losses, props = mdl.rpn_loss_and_proposals(feats, bb.gt, bb.img_shape, rng)
            return losses["loss_rpn_cls"] + props.boxes.sum()
        return model.apply(variables, method=inner)

    @jax.jit
    def rpn_fwd_nonms(b, eps):
        bb = perturbed(b, eps)
        def inner(mdl):
            feats = mdl.extract_feat(bb.images)
            losses, _ = mdl.rpn_loss_and_proposals(
                feats, bb.gt, bb.img_shape, rng, with_loss=True
            )
            return losses["loss_rpn_cls"] + losses["loss_rpn_bbox"]
        return model.apply(variables, method=inner)

    @jax.jit
    def full_fwd(b, eps):
        losses = model.apply(variables, perturbed(b, eps), rng, method=model.loss)
        return sum(v for k, v in losses.items() if "loss" in k)

    @jax.jit
    def full_fwdbwd(b, eps):
        def loss(p):
            losses = model.apply(
                {"params": p, "batch_stats": variables["batch_stats"]},
                perturbed(b, eps), rng, method=model.loss,
            )
            return sum(v for k, v in losses.items() if "loss" in k)
        g = jax.grad(loss)(variables["params"])
        return jax.tree_util.tree_reduce(lambda a, x: a + x.sum(), g, jnp.zeros(()))

    @jax.jit
    def predict(b, eps):
        dets = model.apply(variables, perturbed(b, eps), method=model.predict)
        return dets.boxes.sum()

    tests = [
        ("noop_rtt", noop),
        ("backbone_fpn_fwd", feat_fwd),
        ("backbone_fpn_fwdbwd", feat_fwdbwd),
        ("rpn_nolossnms_fwd", rpn_fwd_nonms),
        ("rpn_loss+proposals_fwd", rpn_fwd),
        ("full_loss_fwd", full_fwd),
        ("full_loss_fwdbwd", full_fwdbwd),
        ("predict", predict),
    ]
    for name, fn in tests:
        dt = timeit_chained(fn, batch0)
        print(f"{name:26s} {dt * 1000:8.1f} ms  ({B / dt:7.1f} img/s)")


if __name__ == "__main__":
    main()
