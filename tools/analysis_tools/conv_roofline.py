#!/usr/bin/env python
"""Per-stage conv roofline audit for the train step (run on TPU).

Times backbone stages, FPN, and RPN head separately (fwd and fwd+bwd),
reporting achieved TFLOP/s vs the chip's bf16 peak so conv-bound
tuning work can be targeted. Timing is chained through scalar data
dependencies (axon relay: block_until_ready unreliable).
"""
from __future__ import annotations

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


def conv_flops_resnet50(h, w, blocks=(3, 4, 6, 3)):
    """fwd FLOPs of ResNet-50 trunk at input (h, w) — rough analytic."""
    f = 2 * 49 * 3 * 64 * (h // 2) * (w // 2)  # stem 7x7/2
    chans = [(64, 256), (128, 512), (256, 1024), (512, 2048)]
    hh, ww = h // 4, w // 4
    for bi, (mid, out) in enumerate(chans):
        inp = 64 if bi == 0 else chans[bi - 1][1]
        if bi > 0:
            hh, ww = hh // 2, ww // 2
        for j in range(blocks[bi]):
            cin = inp if j == 0 else out
            f += 2 * hh * ww * (cin * mid + 9 * mid * mid + mid * out)
            if j == 0:
                f += 2 * hh * ww * cin * out  # downsample 1x1
    return f


def main(B=16, H=608, W=1024):
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    cfg = DetectorConfig(num_classes=20, compute_dtype="bfloat16")
    model = FasterRCNN(config=cfg)
    imgs = jnp.asarray(
        np.random.RandomState(0).randn(B, H, W, 3).astype(np.float32)
    )
    variables = model.init(jax.random.PRNGKey(0), imgs[:1])

    stages = {
        "backbone": lambda v, x: model.apply(
            v, x.astype(jnp.bfloat16), method=lambda m, y: m.backbone(y)
        )[-1],
        "backbone+fpn": lambda v, x: model.apply(
            v, x, method=model.extract_feat
        )[-1],
        "backbone+fpn+rpn": lambda v, x: model.apply(
            v, x, method=lambda m, y: m.rpn_head(m.extract_feat(y))[0][0]
        ),
    }
    fb_flops = conv_flops_resnet50(H, W) * B
    print(f"analytic backbone fwd: {fb_flops/1e12:.2f} TFLOP @ batch {B}")

    for name, fn in stages.items():
        f_fwd = jax.jit(lambda x, e, fn=fn: jnp.sum(
            fn(variables, x + e).astype(jnp.float32)
        ))
        ms = timeit_chained(f_fwd, imgs) * 1e3
        line = f"{name:20s} fwd : {ms:7.2f} ms"
        if name == "backbone":
            tf = fb_flops / (ms / 1e3) / 1e12
            line += f"  ({tf:.1f} TFLOP/s, {tf/PEAK_TFLOPS*100:.0f}% peak)"
        print(line)

        f_bwd = jax.jit(jax.grad(lambda x, e, fn=fn: jnp.sum(
            fn(variables, x + e).astype(jnp.float32)
        ), argnums=1))
        g = jax.jit(lambda x, e, f=f_bwd: jnp.sum(f(x, e)))
        ms = timeit_chained(g, imgs) * 1e3
        print(f"{name:20s} f+b : {ms:7.2f} ms")


if __name__ == "__main__":
    main()
