#!/usr/bin/env python
"""Teacher-predict stage profiler (task>=2 steady-state cost).

Breaks the ~186 ms teacher predict into: backbone+FPN, RPN proposals,
RoIAlign gather, bbox head, multiclass NMS. Chained-scalar timing (the
axon relay's block_until_ready is unreliable).
"""
from __future__ import annotations

import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np


def timeit(fn, batch, n=10, warmup=2):
    eps = jnp.zeros(())
    for _ in range(warmup):
        eps = fn(batch, eps) * 0.0
    float(eps)
    t0 = time.perf_counter()
    for _ in range(n):
        eps = fn(batch, eps) * 0.0
    float(eps)
    return (time.perf_counter() - t0) / n


def main():
    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine.train import normalize_images
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN
    from nsgp_repre_tpu.ops.nms_pallas import batched_nms_pallas

    B, H, W = 16, 608, 1024
    cfg = DetectorConfig(num_classes=20, compute_dtype="bfloat16")
    model = FasterRCNN(config=cfg)
    batch0 = _tiny_batch(B, H, W, capacity=32)
    variables = model.init(jax.random.PRNGKey(0), batch0.images[:1].astype(jnp.float32))

    def pert(b, eps):
        return b.replace(images=normalize_images(b.images) + eps)

    @jax.jit
    def full_predict(b, eps):
        dets = model.apply(variables, pert(b, eps), False, method=model.predict)
        return dets.scores.astype(jnp.float32).sum()

    @jax.jit
    def feat_only(b, eps):
        feats = model.apply(variables, pert(b, eps).images, method=model.extract_feat)
        return feats[-1].astype(jnp.float32).sum()

    @jax.jit
    def feat_proposals(b, eps):
        bb = pert(b, eps)

        def run(mdl):
            feats = mdl.extract_feat(bb.images)
            _, props = mdl.rpn_loss_and_proposals(
                feats, bb.gt, bb.img_shape, jax.random.PRNGKey(0), with_loss=False
            )
            return props

        props = jax.eval_shape  # placeholder to satisfy lints
        props = model.apply(variables, method=run)
        return props.scores.astype(jnp.float32).sum()

    @jax.jit
    def up_to_roifeats(b, eps):
        bb = pert(b, eps)

        def run(mdl):
            feats = mdl.extract_feat(bb.images)
            _, props = mdl.rpn_loss_and_proposals(
                feats, bb.gt, bb.img_shape, jax.random.PRNGKey(0), with_loss=False
            )
            Bn, R = props.boxes.shape[:2]
            rois = props.boxes.reshape(-1, 4)
            bidx = jnp.broadcast_to(
                jnp.arange(Bn, dtype=jnp.int32)[:, None], (Bn, R)
            ).reshape(-1)
            return mdl._roi_feats(feats, rois, bidx)

        rf = model.apply(variables, method=run)
        return rf.astype(jnp.float32).sum()

    @jax.jit
    def up_to_head(b, eps):
        bb = pert(b, eps)

        def run(mdl):
            feats = mdl.extract_feat(bb.images)
            _, props = mdl.rpn_loss_and_proposals(
                feats, bb.gt, bb.img_shape, jax.random.PRNGKey(0), with_loss=False
            )
            Bn, R = props.boxes.shape[:2]
            rois = props.boxes.reshape(-1, 4)
            bidx = jnp.broadcast_to(
                jnp.arange(Bn, dtype=jnp.int32)[:, None], (Bn, R)
            ).reshape(-1)
            rf = mdl._roi_feats(feats, rois, bidx)
            cls, reg = mdl.bbox_head(rf)
            return cls.astype(jnp.float32).sum() + reg.astype(jnp.float32).sum()

        return model.apply(variables, method=run)

    t_feat = timeit(feat_only, batch0)
    t_prop = timeit(feat_proposals, batch0)
    t_roif = timeit(up_to_roifeats, batch0)
    t_head = timeit(up_to_head, batch0)
    t_full = timeit(full_predict, batch0)
    print(f"backbone+FPN fwd      : {t_feat*1e3:8.1f} ms")
    print(f"+ RPN proposals       : {t_prop*1e3:8.1f} ms (Δ {1e3*(t_prop-t_feat):.1f})")
    print(f"+ RoIAlign 16k rois   : {t_roif*1e3:8.1f} ms (Δ {1e3*(t_roif-t_prop):.1f})")
    print(f"+ bbox head           : {t_head*1e3:8.1f} ms (Δ {1e3*(t_head-t_roif):.1f})")
    print(f"full predict (incl NMS): {t_full*1e3:8.1f} ms (Δ {1e3*(t_full-t_head):.1f})")


if __name__ == "__main__":
    main()
