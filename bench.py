#!/usr/bin/env python
"""Benchmark suite (driver-run on real TPU hardware).

Measures three numbers on one chip, synthetic VOC-shaped data
(608x1024 canvas — the (1000,600) keep-ratio landscape bucket),
bfloat16 compute:

1. task-1 train step (plain Faster R-CNN R-50-FPN) — the headline,
   comparable to the reference's published 0.216 s/iter @ 2 img/GPU on
   8x V100 ⇒ 9.26 img/s/GPU (docs/en/model_zoo.md:330-336, BASELINE.md).
2. task-2 train step — the method's real steady-state cost: teacher
   pseudo-labeling + RePRE prototype replay + EWC + null-space-projected
   updates all active.
3. inference (predict) fps at batch 1 — reference anchor 21.4 fps V100
   (configs/faster_rcnn/README.md:22, protocol docs/en/model_zoo.md:13).

Prints ONE JSON line: the headline metric plus the auxiliary numbers as
extra keys.
"""
from __future__ import annotations

import json
import time

import numpy as np

BASELINE_IMG_PER_SEC_PER_CHIP = 9.26  # V100 train anchor (BASELINE.md)
BASELINE_INFER_FPS = 21.4  # V100 inference anchor (model zoo)


def _sync(x):
    """Force completion via a scalar data dependency (the axon relay's
    block_until_ready does not reliably block)."""
    import jax.numpy as jnp

    return float(jnp.sum(x))


def _bench_train(task_id: int):
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine import ewc as ewc_lib
    from nsgp_repre_tpu.engine import nsgp, optim
    from nsgp_repre_tpu.engine.train import TrainState, make_train_step, trainable_mask
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    B, H, W = 16, 608, 1024
    cfg = DetectorConfig(
        num_classes=20,
        task_split=(0, 15, 20) if task_id == 2 else (0, 20),
        task_id=task_id,
        compute_dtype="bfloat16",
    )
    model = FasterRCNN(config=cfg)
    batch = _tiny_batch(B, H, W, capacity=32)

    rng = jax.random.PRNGKey(0)
    variables = model.init(rng, batch.images[:1].astype(jnp.float32))
    params = variables["params"]
    mask = trainable_mask(params, cfg)
    optimizer = optim.masked(
        optim.sgd_nscl(0.02, momentum=0.9, weight_decay=1e-4), mask
    )
    opt_state = optimizer.init(params)

    teacher = None
    teacher_params = replay_feats = replay_labels = None
    ewc_terms = {}
    if task_id == 2:
        # full steady-state method cost: frozen teacher (task 1),
        # realistic NSGP projections on backbone+neck, 150 prototypes,
        # EWC terms on the BN params
        teacher = FasterRCNN(config=DetectorConfig(**{**cfg.__dict__, "task_id": 1,
        "roi_sampling_ratio": 1 if cfg.teacher_fast else cfg.roi_sampling_ratio}))
        teacher_params = jax.tree.map(jnp.copy, params)
        rs = np.random.RandomState(0)
        cov = {}
        for name, p in [
            ("neck/fpn_conv0/kernel", (3 * 3 * 256)),
            ("neck/fpn_conv1/kernel", (3 * 3 * 256)),
            ("neck/fpn_conv2/kernel", (3 * 3 * 256)),
            ("neck/fpn_conv3/kernel", (3 * 3 * 256)),
            ("neck/lateral_conv3/kernel", 2048),
        ]:
            X = rs.randn(64, p).astype(np.float32)
            cov[name] = jnp.asarray(X.T @ X)
        transforms = nsgp.build_transforms(cov)
        opt_state = optim.set_transforms(opt_state, transforms)
        imp = {k: jnp.ones_like(v) for k, v in ewc_lib.select_ewc_params(params).items()}
        ewc_terms = ewc_lib.append_task_terms({}, imp, params)
        replay_feats = jnp.asarray(rs.randn(150, 7 * 7 * 256).astype(np.float32))
        replay_labels = jnp.asarray((np.arange(150) % 15).astype(np.int32))

    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=opt_state,
        step=jnp.zeros((), jnp.int32),
        teacher_params=teacher_params,
        replay_feats=replay_feats,
        replay_labels=replay_labels,
        ewc_terms=ewc_terms,
    )
    train_step = make_train_step(model, optimizer, teacher_model=teacher)

    key = jax.random.PRNGKey(1)
    state, m = train_step(state, batch, key)
    _sync(m["loss"])

    n_iters = 20
    t0 = time.perf_counter()
    for i in range(n_iters):
        key = jax.random.fold_in(key, i)
        state, m = train_step(state, batch, key)
    _sync(m["loss"])
    dt = time.perf_counter() - t0
    uncached = B * n_iters / dt
    if task_id != 2:
        return uncached

    # ---- cached-teacher steady state (runner teacher_label_cache) ----
    # The runner computes pseudo-labels once per (image, flip) in a
    # 2-variant pre-pass and feeds them to the step from a host cache.
    # Steady-state per-step cost = cached step (incl. the host->device
    # upload _cached_pseudo pays every step) + the pre-pass teacher
    # predict amortized over the schedule (2 variants / 12 epochs,
    # schedule_1x).
    from nsgp_repre_tpu.engine.train import make_teacher_step

    teacher_step = make_teacher_step(teacher)
    tvars = {"params": state.teacher_params, "batch_stats": state.batch_stats}
    dets_dev = teacher_step(tvars, batch)
    _sync(dets_dev.scores)
    t0 = time.perf_counter()
    for _ in range(n_iters):
        dets_dev = teacher_step(tvars, batch)
    _sync(dets_dev.scores)
    teacher_dt = (time.perf_counter() - t0) / n_iters

    dets_host = jax.tree.map(lambda x: np.asarray(x), dets_dev)
    dets = jax.tree.map(jnp.asarray, dets_host)
    state, m = train_step(state, batch, key, dets)
    _sync(m["loss"])
    t0 = time.perf_counter()
    for i in range(n_iters):
        key = jax.random.fold_in(key, i)
        # per-step host cache assembly + upload, as in runner._cached_pseudo
        dets = jax.tree.map(lambda x: jnp.asarray(np.ascontiguousarray(x)), dets_host)
        state, m = train_step(state, batch, key, dets)
    _sync(m["loss"])
    cached_dt = (time.perf_counter() - t0) / n_iters

    amortized = cached_dt + (2.0 / 12.0) * teacher_dt
    return B / amortized, uncached


def _bench_train_real(task_id: int = 1):
    """Task-1 train throughput on REAL mini-VOC batches — host pipeline
    included (JPEG decode, resize/flip/pad, padding to gt_capacity 64,
    prefetch + device upload), real gt density. The synthetic headline
    (_bench_train) excludes host loading by design; this variant proves
    the host side keeps the chip fed (VERDICT r3 weak #3).

    Generates the offline mini-VOC dataset on first use (deterministic;
    tools/misc/make_mini_voc.py).
    """
    import os.path as osp

    import jax
    import jax.numpy as jnp

    from nsgp_repre_tpu.datasets.loader import DetLoader
    from nsgp_repre_tpu.datasets.prefetch import PrefetchLoader
    from nsgp_repre_tpu.datasets.voc import VOCTaskDataset
    from nsgp_repre_tpu.engine import optim
    from nsgp_repre_tpu.engine.train import TrainState, make_train_step, trainable_mask
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

    root = "data/mini_voc/VOCdevkit"
    if not osp.isdir(root):
        import sys

        sys.path.insert(0, osp.join(osp.dirname(__file__), "tools", "misc"))
        from make_mini_voc import generate  # type: ignore

        generate(root, n_train=160, n_test=80, seed=0)

    ds = VOCTaskDataset(
        root, "VOC2007/ImageSets/Main/trainval.txt",
        task_split=[0, 15, 20], task_id=task_id if task_id <= 2 else 1,
    )
    B = 16
    loader = DetLoader(
        ds, batch_size=B, scale=(1000, 600), training=True,
        gt_capacity=64, seed=0,
    )

    cfg = DetectorConfig(
        num_classes=20,
        task_split=(0, 15, 20),
        task_id=1,
        compute_dtype="bfloat16",
    )
    model = FasterRCNN(config=cfg)
    dev = jax.devices()[0]
    upload = lambda t: jax.tree.map(lambda a: jax.device_put(a, dev), t)  # noqa: E731

    loader.set_epoch(0)
    first, _ = next(iter(loader))
    variables = model.init(
        jax.random.PRNGKey(0), jnp.asarray(first.images[:1], jnp.float32)
    )
    params = variables["params"]
    mask = trainable_mask(params, cfg)
    optimizer = optim.masked(
        optim.sgd_nscl(0.02, momentum=0.9, weight_decay=1e-4), mask
    )
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
    )
    train_step = make_train_step(model, optimizer)

    key = jax.random.PRNGKey(1)
    # warmup epoch: compile every bucket canvas that occurs
    loader.set_epoch(0)
    for batch, _meta in PrefetchLoader(loader, buffer_size=2, transfer_fn=upload):
        state, m = train_step(state, batch, key)
    _sync(m["loss"])

    n_imgs = 0
    t0 = time.perf_counter()
    for ep in (1, 2, 3):
        loader.set_epoch(ep)
        for batch, _meta in PrefetchLoader(loader, buffer_size=2, transfer_fn=upload):
            key = jax.random.fold_in(key, n_imgs)
            state, m = train_step(state, batch, key)
            n_imgs += B
    _sync(m["loss"])
    return n_imgs / (time.perf_counter() - t0)


def _bench_infer(batch_size: int = 1):
    """Predict-mode fps (model-zoo protocol shapes: the COCO
    (1333,800) landscape bucket → 800x1344 canvas).

    batch_size=1 is the model-zoo latency protocol (21.4 fps V100
    anchor); larger batches measure serving throughput.
    """
    import jax
    import jax.numpy as jnp

    from __graft_entry__ import _tiny_batch
    from nsgp_repre_tpu.engine.train import make_eval_step
    from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

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
    dets = step(variables, batch)
    _sync(dets.scores)

    n_iters = 50
    t0 = time.perf_counter()
    for _ in range(n_iters):
        dets = step(variables, batch)
    _sync(dets.scores)
    dt = time.perf_counter() - t0
    return n_iters * batch_size / dt


def main():
    from nsgp_repre_tpu.utils.compile_cache import enable_compile_cache

    enable_compile_cache()
    t1 = _bench_train(task_id=1)
    t2, t2_uncached = _bench_train(task_id=2)
    t1_real = _bench_train_real(task_id=1)
    fps = _bench_infer()
    fps16 = _bench_infer(batch_size=16)
    print(
        json.dumps(
            {
                "metric": "faster_rcnn_r50_fpn_train_throughput",
                "value": round(t1, 2),
                "unit": "img/s/chip",
                "vs_baseline": round(t1 / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
                "task2_train_img_per_sec": round(t2, 2),
                "task2_vs_baseline": round(t2 / BASELINE_IMG_PER_SEC_PER_CHIP, 3),
                "task2_uncached_img_per_sec": round(t2_uncached, 2),
                "real_data_train_img_per_sec": round(t1_real, 2),
                "infer_fps_b1": round(fps, 2),
                "infer_vs_baseline": round(fps / BASELINE_INFER_FPS, 3),
                "infer_img_per_sec_b16": round(fps16, 2),
            }
        )
    )


if __name__ == "__main__":
    # the axon compile relay occasionally drops a response mid-read;
    # retry the whole run a couple of times before giving up
    for attempt in range(3):
        try:
            main()
            break
        except Exception as e:  # pragma: no cover
            if attempt == 2:
                raise
            import sys

            print(
                f"# bench attempt {attempt} failed ({type(e).__name__}); retrying",
                file=sys.stderr,
                flush=True,
            )
            time.sleep(10)
