#!/usr/bin/env python
"""Per-stage conv roofline audit for the train step (run on TPU).

Times cumulative model prefixes (stem+layer1, +layer2, ..., +fpn,
+rpn_head) and differences them into per-stage costs, fwd and fwd+bwd.
The backward is taken w.r.t. the PARAMETERS (value_and_grad over the
whole param tree) so weight-gradient FLOPs are included — that is what
the train step pays; grad-w.r.t.-input timing undercounts convs by the
entire dW = g * x term. ``stop_gradient`` after the last frozen stage
(frozen_stages=1) makes XLA DCE the stem/layer1 backward exactly as in
training.

Each stage row reports achieved TFLOP/s against an analytic conv FLOP
count (fwd: standard conv FLOPs; bwd: 2x fwd for trainable stages —
dX and dW are each another conv-sized contraction — 0x for frozen).
Timing is chained through scalar data dependencies (axon relay:
block_until_ready unreliable).

Reference architecture being audited:
  mmdet/models/backbones/resnet.py:306 (R50, frozen_stages=1),
  mmdet/models/necks/fpn.py, mmdet/models/dense_heads/rpn_head.py:52-99.
"""
from __future__ import annotations

import argparse
import os.path as osp
import sys
import time

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))

import jax
import jax.numpy as jnp
import numpy as np

PEAK_TFLOPS = 197.0  # v5e bf16


def timeit_chained(fn, x, n=10, warmup=2):
    eps = jnp.zeros((), jnp.float32)
    for _ in range(warmup):
        eps = fn(x, eps) * 0.0
    float(eps)
    t0 = time.perf_counter()
    for _ in range(n):
        eps = fn(x, eps) * 0.0
    float(eps)
    return (time.perf_counter() - t0) / n


def stage_flops(h, w, blocks=(3, 4, 6, 3)):
    """Analytic fwd conv FLOPs per stage at input (h, w) (one image)."""
    d = {"stem": 2 * 49 * 3 * 64 * (h // 2) * (w // 2)}
    chans = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    hh, ww = h // 4, w // 4
    for bi, (mid, out) in enumerate(chans):
        inp = 64 if bi == 0 else chans[bi - 1][1]
        if bi > 0:
            hh, ww = (hh + 1) // 2, (ww + 1) // 2
        f = 0
        for j in range(blocks[bi]):
            cin = inp if j == 0 else out
            f += 2 * hh * ww * (cin * mid + 9 * mid * mid + mid * out)
            if j == 0:
                f += 2 * hh * ww * cin * out  # downsample 1x1
        d[f"layer{bi + 1}"] = f
    ch = [256, 512, 1024, 2048]
    f = 0
    for lvl in range(4):  # lateral 1x1 + output 3x3 per level
        s = 4 * 2 ** lvl
        f += 2 * (h // s) * (w // s) * (ch[lvl] * 256 + 9 * 256 * 256)
    d["fpn"] = f
    f = 0
    for lvl in range(5):  # shared 3x3 conv + 1x1 cls(3) + 1x1 reg(12)
        s = 4 * 2 ** lvl
        f += 2 * (h // s) * (w // s) * 256 * (9 * 256 + 3 + 12)
    d["rpn_head"] = f
    return d


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--batch", type=int, default=16)
    ap.add_argument("--height", type=int, default=608)
    ap.add_argument("--width", type=int, default=1024)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()
    B, H, W = args.batch, args.height, args.width

    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    cfg = DetectorConfig(num_classes=20, compute_dtype="bfloat16")
    model = FasterRCNN(config=cfg)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), imgs[:1])
    params = variables["params"]
    consts = {k: v for k, v in variables.items() if k != "params"}

    def reduce_tree(t):
        return sum(jnp.sum(l.astype(jnp.float32)) for l in jax.tree.leaves(t))

    # cumulative prefixes; XLA DCEs everything past the used output
    prefixes = [
        ("stem+layer1", lambda m, y: m.backbone(y)[0]),
        ("layer2", lambda m, y: m.backbone(y)[1]),
        ("layer3", lambda m, y: m.backbone(y)[2]),
        ("layer4", lambda m, y: m.backbone(y)[3]),
        ("fpn", lambda m, y: m.extract_feat(y)),
        ("rpn_head", lambda m, y: m.rpn_head(m.extract_feat(y))),
    ]
    per_img = stage_flops(H, W)
    # fwd FLOPs of each prefix row's own stage (stem+layer1 merged)
    own = {
        "stem+layer1": per_img["stem"] + per_img["layer1"],
        **{k: per_img[k] for k in ("layer2", "layer3", "layer4", "fpn", "rpn_head")},
    }
    frozen = {"stem+layer1"}  # frozen_stages=1: no backward at all

    print(f"batch {B} canvas {H}x{W}  analytic fwd "
          f"{sum(own.values()) * B / 1e12:.2f} TFLOP  (peak {PEAK_TFLOPS} TF/s bf16)")
    print(f"{'stage':14s} {'fwd ms':>8s} {'TF/s':>6s} {'%pk':>4s}   "
          f"{'f+b ms':>8s} {'TF/s':>6s} {'%pk':>4s}")

    prev_f, prev_fb = 0.0, 0.0
    for name, method in prefixes:
        def fwd(x, eps, method=method):
            out = model.apply(
                {"params": params, **consts}, x + eps.astype(x.dtype),
                method=method,
            )
            return reduce_tree(out)

        f_fwd = jax.jit(fwd)
        ms_f = timeit_chained(f_fwd, imgs, n=args.iters) * 1e3

        def loss(p, x, method=method):
            out = model.apply(
                {"params": p, **consts}, x, method=method
            )
            return reduce_tree(out)

        gfn = jax.value_and_grad(loss)

        @jax.jit
        def f_fb(x, eps, gfn=gfn):
            # chain through loss AND the FULL grad tree: a fully-frozen
            # prefix has all-zero grads, and any single leaf may be a
            # frozen param's zero gradient — either way XLA would
            # constant-fold it and DCE the work out of the timing
            val, g = gfn(params, x + eps.astype(x.dtype))
            return val + reduce_tree(g)

        ms_fb = timeit_chained(f_fb, imgs, n=args.iters) * 1e3

        d_f, d_fb = ms_f - prev_f, ms_fb - prev_fb
        prev_f, prev_fb = ms_f, ms_fb
        fl_f = own[name] * B
        fl_fb = fl_f * (1 if name in frozen else 3)
        tf_f = fl_f / (max(d_f, 1e-6) / 1e3) / 1e12
        tf_fb = fl_fb / (max(d_fb, 1e-6) / 1e3) / 1e12
        print(f"{name:14s} {d_f:8.2f} {tf_f:6.1f} {tf_f / PEAK_TFLOPS * 100:3.0f}%   "
              f"{d_fb:8.2f} {tf_fb:6.1f} {tf_fb / PEAK_TFLOPS * 100:3.0f}%"
              f"   (cum {ms_f:.1f} / {ms_fb:.1f})")


if __name__ == "__main__":
    main()
