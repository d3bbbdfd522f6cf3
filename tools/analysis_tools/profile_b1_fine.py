#!/usr/bin/env python
"""Fine-grained batch-1 predict profile (sub-stages of the two
dominant stages from profile_device.py: RPN proposals 7.2 ms and
in-graph RoIAlign 5.2 ms).

Everything is chain-timed (true device time; see profile_device.py).
Key methodological point: RoIAlign is timed with the rois passed as a
TRACED argument (perturbed every rep) — profile_device.py captured them
as a jit constant, which lets XLA constant-fold the level routing and
window offsets and understates the in-graph cost.
"""
import argparse

import jax
import jax.numpy as jnp

import sys, os.path as osp
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from __graft_entry__ import _tiny_batch
from nsgp_repre_tpu.engine.train import normalize_images
from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN
from nsgp_repre_tpu.ops.topk import fast_top_k
from nsgp_repre_tpu.ops.nms_pallas import batched_nms_pallas
from nsgp_repre_tpu.structures.boxes import delta2bbox

from profile_device import stage_ms


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
        print(f"{name:32s}: {ms:8.3f} ms   (single-dispatch {base:6.2f} ms)",
              flush=True)

    feat_fn = lambda im: model.apply(variables, im, method=model.extract_feat)
    feats = jax.jit(feat_fn)(imgs)

    rpn_fn = lambda f: model.apply(
        variables, f, method=lambda m, ff: m.rpn_head(ff)
    )
    cls_maps, reg_maps = jax.jit(rpn_fn)(feats)

    # rebuild the flattened-map view rpn_loss_and_proposals uses
    B = cls_maps[0].shape[0]
    bound = model.bind(variables)
    anchors, sizes = bound._anchors(feats)
    A = cfg.num_base_priors
    level_sizes = [s[0] * s[1] * A for s in sizes]

    def flatten(cm, rm):
        cls_flat = jnp.concatenate(
            [m.reshape(B, -1) for m in cm], axis=1
        ).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in rm], axis=1
        ).astype(jnp.float32)
        return cls_flat, reg_flat

    cls_flat, reg_flat = jax.jit(flatten)(cls_maps, reg_maps)

    # ---- sub-stage A: sigmoid + per-level top-k (no decode) ----
    def topk_only(cf):
        outs = []
        for i in range(cf.shape[0]):
            off = 0
            for n_l in level_sizes:
                s = jax.nn.sigmoid(cf[i, off:off + n_l])
                k = min(cfg.rpn_nms_pre, n_l)
                tv, ti = fast_top_k(s, k, approx=cfg.use_approx_topk)
                outs.append(tv)
                off += n_l
        return jnp.concatenate(outs)

    ms, base = stage_ms(topk_only, cls_flat, a.reps)
    report("sigmoid + per-level top-k", ms, base)

    # per-level split of the top-k cost
    for li, n_l in enumerate(level_sizes):
        off = sum(level_sizes[:li])

        def one_level(cf, off=off, n_l=n_l):
            s = jax.nn.sigmoid(cf[:, off:off + n_l])
            k = min(cfg.rpn_nms_pre, n_l)
            tv, ti = fast_top_k(s, k, approx=cfg.use_approx_topk)
            return tv

        ms, base = stage_ms(one_level, cls_flat, a.reps)
        report(f"  level {li} top-k (N={n_l})", ms, base)

    # ---- sub-stage B: full candidates (topk + gather + decode) ----
    def candidates(args):
        cf, rf = args

        def one(cls_i, reg_i, shape):
            boxes_l, scores_l, lvl_l = [], [], []
            off = 0
            for li, n_l in enumerate(level_sizes):
                s = jax.nn.sigmoid(cls_i[off:off + n_l])
                d = reg_i[off:off + n_l]
                anc = anchors[off:off + n_l]
                k = min(cfg.rpn_nms_pre, n_l)
                tv, ti = fast_top_k(s, k, approx=cfg.use_approx_topk)
                boxes = delta2bbox(anc[ti], d[ti], max_shape=shape)
                boxes_l.append(boxes)
                scores_l.append(tv)
                lvl_l.append(jnp.full((k,), li, dtype=jnp.int32))
                off += n_l
            boxes = jnp.concatenate(boxes_l)
            scores = jnp.concatenate(scores_l)
            lvls = jnp.concatenate(lvl_l)
            wh_ok = (boxes[:, 2] > boxes[:, 0]) & (boxes[:, 3] > boxes[:, 1])
            return boxes, scores, lvls, wh_ok

        return jax.vmap(one)(cf, rf, nb.img_shape)

    ms, base = stage_ms(candidates, (cls_flat, reg_flat), a.reps)
    report("candidates (topk+gather+decode)", ms, base)
    boxes, scores, lvls, wh_ok = jax.jit(candidates)((cls_flat, reg_flat))

    # ---- sub-stage C: proposal NMS on traced candidates ----
    def nms_only(args):
        b, s = args
        keep_idx, p_valid = batched_nms_pallas(
            b, s, lvls, wh_ok, cfg.rpn_nms_iou, cfg.rpn_max_per_img
        )
        pb = jnp.take_along_axis(b, keep_idx[..., None], axis=1)
        return pb, p_valid

    ms, base = stage_ms(nms_only, (boxes, scores), a.reps)
    report(f"proposal NMS ({boxes.shape[1]}->{cfg.rpn_max_per_img})", ms, base)
    p_boxes = jax.jit(nms_only)((boxes, scores))[0]

    # ---- RoIAlign: traced rois (real in-graph cost) ----
    R = p_boxes.shape[1]
    bidx = jnp.broadcast_to(
        jnp.arange(a.batch, dtype=jnp.int32)[:, None], (a.batch, R)
    ).reshape(-1)

    def roi_traced(pb):
        rois = pb.reshape(-1, 4)
        return model.apply(variables, feats, rois, bidx,
                           method=model._roi_feats)

    ms, base = stage_ms(roi_traced, p_boxes, a.reps)
    report(f"RoIAlign traced rois (R={R})", ms, base)

    # ---- RoIAlign: constant rois (what profile_device.py measured) ----
    const_rois = jax.device_get(p_boxes).reshape(-1, 4)
    const_rois = jnp.asarray(const_rois)

    def roi_const(f):
        return model.apply(variables, f, const_rois, bidx,
                           method=model._roi_feats)

    ms, base = stage_ms(roi_const, feats, a.reps)
    report(f"RoIAlign constant rois (R={R})", ms, base)


if __name__ == "__main__":
    main()
