#!/usr/bin/env python
"""Capture an XLA device trace of a predict sub-stage and print the
top HLO ops by self time (parsed from the xplane via
tensorboard_plugin_profile).

Usage: python tools/analysis_tools/trace_stage.py --stage composed
"""
import argparse
import glob
import gzip
import json
import os
import shutil

import jax
import jax.numpy as jnp

import sys, os.path as osp
sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))
sys.path.insert(0, osp.dirname(osp.abspath(__file__)))

from __graft_entry__ import _tiny_batch
from nsgp_repre_tpu.engine.train import make_eval_step, normalize_images
from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN


def main():
    p = argparse.ArgumentParser()
    p.add_argument("--stage", default="predict",
                   choices=["predict", "proposals", "from_maps"])
    p.add_argument("--batch", type=int, default=1)
    p.add_argument("--height", type=int, default=800)
    p.add_argument("--width", type=int, default=1344)
    p.add_argument("--iters", type=int, default=12)
    p.add_argument("--out", default="/tmp/jaxtrace")
    a = p.parse_args()

    cfg = DetectorConfig(
        num_classes=20,
        task_split=(0, 20),
        task_id=1,
        rpn_nms_pre=1000,
        rpn_max_per_img=1000,
        max_per_img=100,
        compute_dtype="bfloat16",
        stem_s2d=True,
    )
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(a.batch, a.height, a.width, capacity=8)
    variables = model.init(
        jax.random.PRNGKey(0), batch.images[:1].astype(jnp.float32)
    )
    imgs = normalize_images(batch.images)
    nb = batch.replace(images=imgs)

    if a.stage == "predict":
        step = make_eval_step(model)
        fn = lambda: step(variables, batch)
    else:
        feat_fn = jax.jit(
            lambda im: model.apply(variables, im, method=model.extract_feat)
        )
        feats = feat_fn(imgs)

        @jax.jit
        def prop(f):
            return model.apply(
                variables, f, nb.gt, nb.img_shape, jax.random.PRNGKey(0),
                False, method=model.rpn_loss_and_proposals,
            )[1]

        fn = lambda: prop(feats)

    out = fn()
    float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    shutil.rmtree(a.out, ignore_errors=True)
    with jax.profiler.trace(a.out):
        for _ in range(a.iters):
            out = fn()
        float(jnp.sum(jax.tree.leaves(out)[0].astype(jnp.float32)))

    xplanes = glob.glob(os.path.join(a.out, "**", "*.xplane.pb"),
                        recursive=True)
    print("xplane files:", xplanes)
    if not xplanes:
        return
    from tensorboard_plugin_profile.convert import raw_to_tool_data

    data, _ = raw_to_tool_data.xspace_to_tool_data(
        [xplanes[-1]], "trace_viewer", params={}
    )
    if isinstance(data, bytes):
        try:
            data = gzip.decompress(data)
        except OSError:
            pass
        data = data.decode()
    tv = json.loads(data)
    events = tv.get("traceEvents", [])
    # aggregate device-track complete events by name
    pid_names = {}
    for e in events:
        if e.get("ph") == "M" and e.get("name") == "process_name":
            pid_names[e["pid"]] = e["args"].get("name", "")
    agg = {}
    for e in events:
        if e.get("ph") != "X":
            continue
        pname = pid_names.get(e.get("pid"), "")
        if "TPU" not in pname and "Device" not in pname:
            continue
        key = e.get("name", "?")
        agg[key] = agg.get(key, 0.0) + e.get("dur", 0.0)
    total = sum(agg.values())
    print(f"device total {total/1e3/a.iters:.3f} ms/iter over {a.iters} iters")
    for name, dur in sorted(agg.items(), key=lambda kv: -kv[1])[:40]:
        print(f"{dur/1e3/a.iters:9.3f} ms/iter  {name[:110]}")


if __name__ == "__main__":
    main()
