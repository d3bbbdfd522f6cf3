#!/usr/bin/env python
"""True-device-time stage profiler for the axon relay.

Per-call timing through the axon relay is floored at the dispatch RTT
(~3 ms), so tiny stages all measure alike (see profile_infer_b1.py).
This profiler instead repeats each stage N times INSIDE one jit with a
data dependency between iterations (a scalar read of iteration i's
output perturbs iteration i+1's input by 1e-30, which defeats CSE but
cannot change bf16/f32 values), so one dispatch amortizes N real
executions:

    stage_ms = (t(N reps) - t(1 rep)) / (N - 1)

Usage:
    python tools/analysis_tools/profile_device.py [--batch 1]
        [--height 800] [--width 1344] [--reps 16]
"""
import argparse
import time

import jax
import jax.numpy as jnp

import sys, os.path as osp
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

from __graft_entry__ import _tiny_batch
from nsgp_repre_tpu.engine.train import make_eval_step, normalize_images
from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN


def _sync(out):
    leaf = jax.tree.leaves(out)[0]
    return float(jnp.sum(jnp.abs(leaf.astype(jnp.float32))))


def _perturb(tree, eps):
    """Add a traced ~0 scalar to every float leaf (defeats CSE)."""
    def one(x):
        if jnp.issubdtype(x.dtype, jnp.floating):
            return x + eps.astype(x.dtype)
        if x.dtype == jnp.uint8:  # raw images: +0/+1 (dynamic, breaks CSE)
            return x + (eps != 0).astype(x.dtype)
        return x
    return jax.tree.map(one, tree)


def chain_time(fn, arg, reps, n_timed=8, warmup=1):
    """fn: arg -> out (pytree). Repeats fn `reps` times in one jit."""

    def repeated(a):
        def body(carry, _):
            eps, a = carry
            out = fn(_perturb(a, eps))
            leaf = jax.tree.leaves(out)[0]
            new_eps = leaf.reshape(-1)[0].astype(jnp.float32) * 1e-30
            return (new_eps, a), leaf.reshape(-1)[0]
        (_, _), outs = jax.lax.scan(
            body, (jnp.float32(0.0), a), None, length=reps
        )
        return outs

    f = jax.jit(repeated)
    for _ in range(warmup):
        out = f(arg)
    _sync(out)
    t0 = time.perf_counter()
    for _ in range(n_timed):
        out = f(arg)
    _sync(out)
    return (time.perf_counter() - t0) / n_timed * 1e3  # ms per dispatch


def stage_ms(fn, arg, reps=16, **kw):
    t_n = chain_time(fn, arg, reps, **kw)
    t_1 = chain_time(fn, arg, 1, **kw)
    return (t_n - t_1) / (reps - 1), t_1


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--reps", type=int, default=16)
    a = p.parse_args()

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
    batch = _tiny_batch(a.batch, a.height, a.width, capacity=8)
    variables = model.init(
        jax.random.PRNGKey(0), batch.images[:1].astype(jnp.float32)
    )
    imgs = normalize_images(batch.images)
    nb = batch.replace(images=imgs)

    def report(name, ms, base):
        print(f"{name:28s}: {ms:8.3f} ms   (single-dispatch {base:6.2f} ms)",
              flush=True)

    # full predict
    step = make_eval_step(model)
    ms, base = stage_ms(lambda b: step(variables, b), batch, a.reps)
    report("full predict", ms, base)

    # backbone+FPN
    feat_fn = lambda im: model.apply(variables, im, method=model.extract_feat)
    ms, base = stage_ms(feat_fn, imgs, a.reps)
    report("backbone+FPN", ms, base)
    feats = jax.jit(feat_fn)(imgs)

    # RPN conv heads only
    rpn_fn = lambda f: model.apply(
        variables, f, method=lambda m, ff: m.rpn_head(ff)
    )
    ms, base = stage_ms(rpn_fn, feats, a.reps)
    report("RPN conv heads", ms, base)

    # proposals (convs + topk/decode + NMS)
    def prop_fn(f):
        return model.apply(
            variables, f, nb.gt, nb.img_shape, jax.random.PRNGKey(0), False,
            method=model.rpn_loss_and_proposals,
        )[1]
    ms, base = stage_ms(prop_fn, feats, a.reps)
    report("RPN proposals total", ms, base)
    proposals = jax.jit(prop_fn)(feats)

    # RoIAlign
    B, R = proposals.boxes.shape[:2]
    rois = proposals.boxes.reshape(-1, 4)
    bidx = jnp.broadcast_to(
        jnp.arange(B, dtype=jnp.int32)[:, None], (B, R)
    ).reshape(-1)

    def roi_fn(f):
        return model.apply(variables, f, rois, bidx, method=model._roi_feats)
    ms, base = stage_ms(roi_fn, feats, a.reps)
    report(f"RoIAlign (R={R})", ms, base)
    roi_feats = jax.jit(roi_fn)(feats)

    # bbox head
    head_fn = lambda rf: model.apply(variables, rf, method=model.bbox_forward)
    ms, base = stage_ms(head_fn, roi_feats, a.reps)
    report("bbox head (2FC)", ms, base)

    # RoI predict total (RoIAlign + head + decode + multiclass NMS)
    def pred_fn(f):
        return model.apply(
            variables, f, proposals, nb, method=model._predict_from_proposals
        )
    ms, base = stage_ms(pred_fn, feats, a.reps)
    report("RoI predict total", ms, base)


if __name__ == "__main__":
    main()
