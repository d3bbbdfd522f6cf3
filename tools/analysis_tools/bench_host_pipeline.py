#!/usr/bin/env python
"""Host-pipeline-only throughput: decode+resize+flip+pad+pack, NO upload.

Isolates the tunnel variable from `bench.py real_data_train_img_per_sec`
(VERDICT r4 next #7): the real-data bench includes JPEG decode, batch
packing, host→device upload AND the train step; on a degraded axon
tunnel the upload dominates and hides whether the 1-vCPU host pipeline
itself could keep a chip fed. This runs the identical DetLoader
configuration and reports pure host img/s. No TPU claim.

  python tools/analysis_tools/bench_host_pipeline.py [--scale 1000x600]
      [--batch-size 16] [--epochs 3]
"""
from __future__ import annotations

import argparse
import os
import os.path as osp
import sys
import time

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)
sys.path.insert(0, osp.join(ROOT, "tools", "misc"))

# The loader path transitively imports jax (pytree registration in
# structures/sample.py) but never executes a device op. Force CPU both
# ways anyway so this bench can never claim the single-claim axon TPU
# out from under a concurrent training run (the env var alone is not
# sufficient under /root/.axon_site/sitecustomize.py).
os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--scale", default="1000x600")
    ap.add_argument("--batch-size", type=int, default=16)
    ap.add_argument("--epochs", type=int, default=3)
    ap.add_argument("--gt-capacity", type=int, default=64)
    args = ap.parse_args()
    w, h = (int(v) for v in args.scale.lower().split("x"))

    from nsgp_repre_tpu.datasets.loader import DetLoader
    from nsgp_repre_tpu.datasets.voc import VOCTaskDataset

    root = osp.join(ROOT, "data", "mini_voc", "VOCdevkit")
    if not osp.isdir(root):
        from make_mini_voc import generate  # type: ignore

        generate(root, n_train=160, n_test=80, seed=0)

    ds = VOCTaskDataset(
        root, "VOC2007/ImageSets/Main/trainval.txt",
        task_split=[0, 15, 20], task_id=1,
    )
    loader = DetLoader(
        ds, batch_size=args.batch_size, scale=(w, h), training=True,
        gt_capacity=args.gt_capacity, seed=0,
    )

    # warmup epoch (page cache, lazy imports)
    loader.set_epoch(0)
    n0 = sum(b.images.shape[0] for b, _ in loader)

    n_imgs, total_bytes = 0, 0
    t0 = time.perf_counter()
    for ep in range(1, args.epochs + 1):
        loader.set_epoch(ep)
        for batch, _meta in loader:
            n_imgs += batch.images.shape[0]
            total_bytes += batch.images.nbytes
    dt = time.perf_counter() - t0
    print(
        f"host pipeline: {n_imgs / dt:.1f} img/s "
        f"({total_bytes / dt / 2**20:.0f} MB/s of packed canvas), "
        f"{n_imgs} imgs in {dt:.1f}s, dataset {n0} imgs/epoch, "
        f"scale ({w},{h}) bs {args.batch_size}"
    )


if __name__ == "__main__":
    main()
