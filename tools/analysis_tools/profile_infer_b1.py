#!/usr/bin/env python
"""Stage-level profile of batch-1 inference (the model-zoo latency
protocol: COCO (1333,800) bucket → 800x1344 canvas, rpn 1000 proposals,
max 100 dets/img).

Times each sub-stage as its own jit so the residual dispatch structure
of the full predict can be attributed: backbone+FPN, RPN convs,
proposal candidates (sigmoid+topk+decode), proposal NMS, RoIAlign,
bbox head, final multiclass NMS.
"""
import time

import jax
import jax.numpy as jnp

import sys, os.path as osp
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from __graft_entry__ import _tiny_batch
from nsgp_repre_tpu.engine.train import make_eval_step, normalize_images
from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN


def _sync(out):
    """Force completion via a scalar data dependency — the axon relay's
    block_until_ready returns before the device work is done (same
    workaround as bench.py)."""
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def timeit(fn, *args, n=30, warmup=2):
    for _ in range(warmup):
        out = fn(*args)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n):
        out = fn(*args)
    _sync(out)
    return (time.perf_counter() - t0) / n * 1e3, out


def main(batch_size=1):
    cfg = DetectorConfig(
        num_classes=20,
        task_split=(0, 20),
        task_id=1,
        rpn_nms_pre=1000,
        rpn_max_per_img=1000,
        max_per_img=100,
        compute_dtype="bfloat16",
    )
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(batch_size, 800, 1344, capacity=8)
    variables = model.init(
        jax.random.PRNGKey(0), batch.images[:1].astype(jnp.float32)
    )

    step = make_eval_step(model)
    full_ms, dets = timeit(step, variables, batch)
    print(f"full predict           : {full_ms:8.2f} ms  ({1e3/full_ms*batch_size:.1f} img/s)")

    imgs = normalize_images(batch.images)
    nb = batch.replace(images=imgs)

    feat_fn = jax.jit(lambda v, im: model.apply(v, im, method=model.extract_feat))
    ms, feats = timeit(feat_fn, variables, imgs)
    print(f"backbone+FPN           : {ms:8.2f} ms")

    rpn_fn = jax.jit(
        lambda v, f: model.apply(v, f, method=lambda m, ff: m.rpn_head(ff))
    )
    ms, rpn_maps = timeit(rpn_fn, variables, feats)
    print(f"RPN conv heads         : {ms:8.2f} ms")

    prop_fn = jax.jit(
        lambda v, f, b: model.apply(
            v, f, b.gt, b.img_shape, jax.random.PRNGKey(0), False,
            method=model.rpn_loss_and_proposals,
        )[1]
    )
    ms, proposals = timeit(prop_fn, variables, feats, nb)
    print(f"RPN proposals total    : {ms:8.2f} ms   (conv heads + topk/decode + NMS)")

    def roi_stage(v, f, p):
        B, R = p.boxes.shape[:2]
        rois = p.boxes.reshape(-1, 4)
        bidx = jnp.broadcast_to(
            jnp.arange(B, dtype=jnp.int32)[:, None], (B, R)
        ).reshape(-1)
        return model.apply(v, f, rois, bidx, method=model._roi_feats)

    roi_fn = jax.jit(roi_stage)
    ms, roi_feats = timeit(roi_fn, variables, feats, proposals)
    print(f"RoIAlign (R={proposals.boxes.shape[1]})    : {ms:8.2f} ms")

    head_fn = jax.jit(lambda v, rf: model.apply(v, rf, method=model.bbox_forward))
    ms, _ = timeit(head_fn, variables, roi_feats)
    print(f"bbox head (2FC)        : {ms:8.2f} ms")

    pred_fn = jax.jit(
        lambda v, f, p, b: model.apply(
            v, f, p, b, method=model._predict_from_proposals
        )
    )
    ms, _ = timeit(pred_fn, variables, feats, proposals, nb)
    print(f"RoI predict total      : {ms:8.2f} ms   (RoIAlign + head + decode + mcNMS)")


if __name__ == "__main__":
    import argparse

    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    a = p.parse_args()
    main(a.batch)
