#!/usr/bin/env python
"""Bisect the in-graph cost of the RPN proposal stage at batch 1.

profile_b1_fine.py measured its parts (flatten/topk/decode 0.34 ms +
NMS 0.39 ms) at ~0.7 ms chained, while the full
rpn_loss_and_proposals(with_loss=False) chain-times at ~5.4 ms.
This script chains progressively larger compositions to find where
the extra ~4.3 ms lives.
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

from profile_device import stage_ms


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--reps", type=int, default=16)
    p.add_argument("--stages", type=str, default="abcdef",
                   help="subset of stage letters to run")
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

    feat_fn = lambda im: model.apply(variables, im, method=model.extract_feat)
    feats = jax.jit(feat_fn)(imgs)

    def report(name, ms, base):
        print(f"{name:44s}: {ms:8.3f} ms  (1-rep dispatch {base:6.2f} ms)",
              flush=True)

    bound = model.bind(variables)
    anchors, sizes = bound._anchors(feats)
    level_sizes = [s[0] * s[1] * cfg.num_base_priors for s in sizes]

    # (a) the full proposal path, as predict uses it
    def prop_full(f):
        return model.apply(
            variables, f, nb.gt, nb.img_shape, jax.random.PRNGKey(0), False,
            method=model.rpn_loss_and_proposals,
        )[1]

    if "a" in a.stages:
        ms, base = stage_ms(prop_full, feats, a.reps)
        report("a) rpn_loss_and_proposals(with_loss=False)", ms, base)

    # (b) convs + flatten only
    def convs_flat(f):
        cls_maps, reg_maps = model.apply(
            variables, f, method=lambda m, ff: m.rpn_head(ff)
        )
        B = cls_maps[0].shape[0]
        cls_flat = jnp.concatenate(
            [m.reshape(B, -1) for m in cls_maps], axis=1
        ).astype(jnp.float32)
        reg_flat = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)
        return cls_flat, reg_flat

    if "b" in a.stages:
        ms, base = stage_ms(convs_flat, feats, a.reps)
        report("b) RPN convs + flatten/concat/f32", ms, base)

    # (c) proposals-from-maps on traced flat maps (topk+decode+NMS+gather)
    cls_flat, reg_flat = jax.jit(convs_flat)(feats)

    def from_maps(args):
        cf, rf = args
        return model.apply(
            variables, cf, rf, level_sizes, anchors, nb.img_shape, {},
            cf.shape[0], method=model._rpn_proposals_from_maps,
        )[1]

    if "c" in a.stages:
        ms, base = stage_ms(from_maps, (cls_flat, reg_flat), a.reps)
        report("c) _rpn_proposals_from_maps (flat->props)", ms, base)

    # (d) convs + from_maps composed (= (a) minus in-graph _anchors)
    def composed(f):
        cf, rf = convs_flat(f)
        return model.apply(
            variables, cf, rf, level_sizes, anchors, nb.img_shape, {},
            cf.shape[0], method=model._rpn_proposals_from_maps,
        )[1]

    if "d" in a.stages:
        ms, base = stage_ms(composed, feats, a.reps)
        report("d) convs + from_maps composed", ms, base)

    # (e) same, with an optimization barrier between the conv-produced
    # flat maps and the top-k/NMS consumers: forces XLA to materialize
    # the maps once instead of fusing/duplicating their producers into
    # every consumer
    def composed_barrier(f):
        cf, rf = convs_flat(f)
        cf, rf = jax.lax.optimization_barrier((cf, rf))
        return model.apply(
            variables, cf, rf, level_sizes, anchors, nb.img_shape, {},
            cf.shape[0], method=model._rpn_proposals_from_maps,
        )[1]

    if "e" in a.stages:
        ms, base = stage_ms(composed_barrier, feats, a.reps)
        report("e) composed + optimization_barrier", ms, base)

    # (f) barrier after the raw conv maps (before flatten/concat)
    def composed_barrier_maps(f):
        cls_maps, reg_maps = model.apply(
            variables, f, method=lambda m, ff: m.rpn_head(ff)
        )
        cls_maps = jax.lax.optimization_barrier(tuple(cls_maps))
        reg_maps = jax.lax.optimization_barrier(tuple(reg_maps))
        B = cls_maps[0].shape[0]
        cf = jnp.concatenate(
            [m.reshape(B, -1) for m in cls_maps], axis=1
        ).astype(jnp.float32)
        rf = jnp.concatenate(
            [m.reshape(B, -1, 4) for m in reg_maps], axis=1
        ).astype(jnp.float32)
        return model.apply(
            variables, cf, rf, level_sizes, anchors, nb.img_shape, {},
            B, method=model._rpn_proposals_from_maps,
        )[1]

    if "f" in a.stages:
        ms, base = stage_ms(composed_barrier_maps, feats, a.reps)
        report("f) barrier on raw conv maps", ms, base)

    from nsgp_repre_tpu.ops.topk import fast_top_k

    # (g) convs + sigmoid + per-level top-k only (no decode/NMS)
    def convs_topk(f):
        cf, _ = convs_flat(f)
        outs = []
        off = 0
        for n_l in level_sizes:
            s = jax.nn.sigmoid(cf[:, off:off + n_l])
            k = min(cfg.rpn_nms_pre, n_l)
            tv, ti = fast_top_k(s, k, approx=cfg.use_approx_topk)
            outs.append(tv)
            off += n_l
        return jnp.concatenate(outs, axis=-1)

    if "g" in a.stages:
        ms, base = stage_ms(convs_topk, feats, a.reps)
        report("g) convs + sigmoid + top-k (no NMS)", ms, base)

    # (h) convs + full candidates (topk+gather+decode), no NMS
    from nsgp_repre_tpu.structures.boxes import delta2bbox

    def convs_cand(f):
        cf, rf = convs_flat(f)

        def one(cls_i, reg_i, shape):
            boxes_l, scores_l = [], []
            off = 0
            for n_l in level_sizes:
                s = jax.nn.sigmoid(cls_i[off:off + n_l])
                k = min(cfg.rpn_nms_pre, n_l)
                tv, ti = fast_top_k(s, k, approx=cfg.use_approx_topk)
                boxes = delta2bbox(
                    anchors[off:off + n_l][ti], reg_i[off:off + n_l][ti],
                    max_shape=shape,
                )
                boxes_l.append(boxes)
                scores_l.append(tv)
                off += n_l
            return jnp.concatenate(boxes_l), jnp.concatenate(scores_l)

        return jax.vmap(one)(cf, rf, nb.img_shape)

    if "h" in a.stages:
        ms, base = stage_ms(convs_cand, feats, a.reps)
        report("h) convs + candidates (no NMS)", ms, base)


if __name__ == "__main__":
    main()
