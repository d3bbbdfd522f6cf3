"""Teacher pseudo-label caching (round-3 perf item).

The frozen teacher is deterministic per (image, flip), so its pseudo
labels are computed once per variant and fed back into the train step as
an explicit input instead of being recomputed in-graph every step
(faster_rcnn_roi_replay.py:65-109 recomputes per step; nothing in the
protocol depends on that). These tests pin the two invariants the cache
relies on:

1. ``make_train_step(...)(state, batch, rng, teacher_dets)`` with
   ``teacher_dets = make_teacher_step(teacher)(teacher_vars, batch)``
   produces the SAME losses as the uncached in-graph teacher path.
2. ``DetLoader(force_flip=...)`` enumerates both augmentation variants
   without disturbing the epoch plan, and ``BatchMeta.flips`` reports
   the per-image flip decisions the cache keys on.
"""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_batch
from nsgp_repre_tpu.datasets.loader import BatchMeta, DetLoader
from nsgp_repre_tpu.engine import optim
from nsgp_repre_tpu.engine.train import (
    TrainState,
    make_teacher_step,
    make_train_step,
    trainable_mask,
)
from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN

FEAT_DIM = 7 * 7 * 256


def _cfg(**kw):
    base = dict(
        num_classes=8,
        task_split=(0, 4, 8),
        task_id=2,
        rpn_nms_pre=64,
        rpn_max_per_img=32,
        rpn_num=16,
        rcnn_num=16,
        max_per_img=8,
        replay_mode="raw",
        backbone_blocks=(1, 1, 1, 1),  # cache semantics don't need R50
    )
    base.update(kw)
    return DetectorConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = FasterRCNN(config=cfg)
    teacher = FasterRCNN(config=_cfg(task_id=1))
    batch = _tiny_batch(2, 64, 64)
    variables = model.init(
        jax.random.PRNGKey(0), batch.images[:1].astype("float32")
    )
    rng = np.random.RandomState(7)
    params = variables["params"]
    mask = trainable_mask(params, cfg)
    optimizer = optim.masked(optim.sgd_nscl(0.01), mask)
    state = TrainState(
        params=params,
        batch_stats=variables.get("batch_stats", {}),
        opt_state=optimizer.init(params),
        step=jnp.zeros((), jnp.int32),
        teacher_params=jax.tree.map(jnp.copy, params),
        replay_feats=jnp.asarray(rng.randn(10, FEAT_DIM), jnp.float32),
        replay_labels=jnp.asarray(np.arange(10) % 4, jnp.int32),
    )
    return cfg, model, teacher, batch, state, optimizer


def test_cached_step_matches_uncached(setup):
    cfg, model, teacher, batch, state, optimizer = setup
    step = make_train_step(model, optimizer, teacher_model=teacher, donate=False)
    key = jax.random.PRNGKey(3)

    _, m_live = step(state, batch, key)

    teacher_step = make_teacher_step(teacher)
    teacher_vars = {
        "params": state.teacher_params,
        "batch_stats": state.batch_stats,
    }
    dets = teacher_step(teacher_vars, batch)
    # the detections really are padded to max_per_img in canvas coords
    assert dets.boxes.shape == (2, cfg.max_per_img, 4)
    _, m_cached = step(state, batch, key, dets)

    assert set(m_live) == set(m_cached)
    for k in m_live:
        np.testing.assert_allclose(
            float(m_live[k]), float(m_cached[k]), rtol=1e-5, atol=1e-6,
            err_msg=f"metric {k} differs between cached/uncached teacher",
        )


def test_cached_dets_roundtrip_through_host(setup):
    """The runner caches FETCHED numpy copies and re-uploads them
    (runner._cached_pseudo); the round trip must not change the step."""
    cfg, model, teacher, batch, state, optimizer = setup
    step = make_train_step(model, optimizer, teacher_model=teacher, donate=False)
    key = jax.random.PRNGKey(4)
    teacher_step = make_teacher_step(teacher)
    teacher_vars = {
        "params": state.teacher_params,
        "batch_stats": state.batch_stats,
    }
    dets = teacher_step(teacher_vars, batch)
    host = jax.tree.map(lambda x: np.asarray(x), dets)
    dev = jax.tree.map(jnp.asarray, host)
    _, m_a = step(state, batch, key, dets)
    _, m_b = step(state, batch, key, dev)
    for k in m_a:
        assert float(m_a[k]) == float(m_b[k]), k


class _StubDets:
    """Teacher-detection pytree stand-in with .boxes/.scores/etc."""

    def __init__(self, B, P, rng):
        self.boxes = rng.rand(B, P, 4).astype(np.float32)
        self.scores = rng.rand(B, P).astype(np.float32)
        self.labels = rng.randint(0, 8, (B, P)).astype(np.int32)
        self.valid = rng.rand(B, P) < 0.4


def _stub_runner(budget_mb, B=2, P=8, seed=0):
    """Minimal object exposing exactly what the cache methods touch,
    with the REAL NullSpaceRunner methods bound onto it."""
    from types import SimpleNamespace

    from nsgp_repre_tpu.engine.runner import NullSpaceRunner

    rng = np.random.RandomState(seed)
    stub = SimpleNamespace()
    stub._pseudo_cache = {}
    stub._pseudo_cache_bytes = 0
    stub._pseudo_cache_budget = budget_mb * (1 << 20)
    stub._pseudo_cache_full = False
    stub.det_cfg = SimpleNamespace(max_per_img=P)
    stub.train_loader = SimpleNamespace(
        loader=SimpleNamespace(local_batch=B, shard_id=0)
    )
    stub.teacher_step = lambda vars_, batch: _StubDets(B, P, rng)
    stub._teacher_vars = lambda: None
    stub._fetch = np.asarray
    stub._device_batch = lambda x: x
    stub._fill_pseudo_cache = NullSpaceRunner._fill_pseudo_cache.__get__(stub)
    stub._cached_pseudo = NullSpaceRunner._cached_pseudo.__get__(stub)
    stub._global_keys = NullSpaceRunner._global_keys
    return stub, B, P


class _Meta(list):
    def __init__(self, ids, flips):
        super().__init__(ids)
        self.flips = flips


def test_pseudo_cache_compaction_is_bit_exact():
    """Entries store only valid rows + positions; reassembly must
    reproduce the padded arrays exactly on the valid rows and report
    valid=False (zeros/-1) elsewhere — the shape the train step expects."""
    stub, B, P = _stub_runner(budget_mb=64)
    meta = _Meta(["a", "b"], [False, False])
    live = stub._fill_pseudo_cache(None, stub._global_keys(meta))
    assert len(stub._pseudo_cache) == 2
    out = stub._cached_pseudo(None, meta)
    np.testing.assert_array_equal(out.valid, live.valid)
    for i in range(B):
        v = live.valid[i]
        np.testing.assert_array_equal(out.boxes[i][v], live.boxes[i][v])
        np.testing.assert_array_equal(out.scores[i][v], live.scores[i][v])
        np.testing.assert_array_equal(out.labels[i][v], live.labels[i][v])
        assert not out.valid[i][~v].any()
        assert (out.labels[i][~v] == -1).all()


def test_pseudo_cache_budget_falls_back_to_live(caplog):
    """Past the byte budget new entries are NOT cached; batches touching
    them permanently route through the live teacher (no KeyError, no
    unbounded growth), and a warning is logged once."""
    import logging

    stub, B, P = _stub_runner(budget_mb=0)  # budget 0 → nothing fits
    meta = _Meta(["a", "b"], [False, False])
    with caplog.at_level(logging.WARNING):
        out1 = stub._cached_pseudo(None, meta)
        out2 = stub._cached_pseudo(None, meta)
    assert stub._pseudo_cache == {} and stub._pseudo_cache_bytes == 0
    assert stub._pseudo_cache_full
    assert isinstance(out1, _StubDets) and isinstance(out2, _StubDets)
    assert sum("budget reached" in r.message for r in caplog.records) == 1


def test_pseudo_cache_budget_partial_fill():
    """A budget that fits some-but-not-all entries caches greedily and
    the accounting matches what is stored."""
    stub, B, P = _stub_runner(budget_mb=64)
    # shrink the budget to just over one entry's size
    meta = _Meta(["a", "b"], [False, False])
    stub._fill_pseudo_cache(None, stub._global_keys(meta))
    one_entry = sum(a.nbytes for a in next(iter(stub._pseudo_cache.values())))
    stub2, _, _ = _stub_runner(budget_mb=64)
    stub2._pseudo_cache_budget = one_entry + 8
    stub2._fill_pseudo_cache(None, stub2._global_keys(meta))
    assert len(stub2._pseudo_cache) >= 1
    assert stub2._pseudo_cache_bytes <= stub2._pseudo_cache_budget
    got = sum(
        sum(a.nbytes for a in e) for e in stub2._pseudo_cache.values()
    )
    assert got == stub2._pseudo_cache_bytes


class TestForceFlipLoader:
    def _dataset(self, voc_root):
        from nsgp_repre_tpu.datasets.voc import VOCTaskDataset

        return VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/trainval.txt",
            task_split=[0, 20], task_id=1,
        )

    def test_meta_reports_flips(self, voc_root):
        ds = self._dataset(voc_root)
        for force, expect in ((False, {False}), (True, {True})):
            loader = DetLoader(
                ds, batch_size=2, scale=(100, 60), training=False,
                gt_capacity=8, force_flip=force,
            )
            flips = set()
            for _, meta in loader:
                assert isinstance(meta, BatchMeta)
                flips.update(meta.flips)
                assert len(meta.flips) == len(meta)
            assert flips == expect

    def test_force_flip_mirrors_images(self, voc_root):
        """Flip happens BEFORE canvas padding (mmdet RandomFlip then Pad),
        so the mirror relation holds on the valid img_shape region."""
        ds = self._dataset(voc_root)
        kw = dict(batch_size=2, scale=(100, 60), training=False, gt_capacity=8)
        plain = {m[i]: (b.images[i], np.asarray(b.img_shape[i]))
                 for b, m in DetLoader(ds, **kw) for i in range(len(m))}
        for batch, meta in DetLoader(ds, force_flip=True, **kw):
            for i, img_id in enumerate(meta):
                ref, (h, w) = plain[img_id]
                np.testing.assert_array_equal(
                    batch.images[i][:h, :w], ref[:h, :w][:, ::-1],
                )

    def test_plan_unchanged_by_force_flip(self, voc_root):
        """force_flip consumes the flip rng draw, so the shuffled epoch
        plan (ids order) is identical to the natural training plan."""
        ds = self._dataset(voc_root)
        kw = dict(batch_size=2, scale=(100, 60), training=True, seed=0)
        a, b = DetLoader(ds, **kw), DetLoader(ds, force_flip=True, **kw)
        a.set_epoch(1), b.set_epoch(1)
        ids_a = [list(m) for _, m in a]
        ids_b = [list(m) for _, m in b]
        assert ids_a == ids_b

    def test_training_meta_flips_match_images(self, voc_root):
        """BatchMeta.flips must describe the images actually built —
        the invariant the (img_id, flip) cache key rests on."""
        ds = self._dataset(voc_root)
        kw = dict(batch_size=2, scale=(100, 60), training=False, gt_capacity=8)
        variants = {}
        for force in (False, True):
            for b, m in DetLoader(ds, force_flip=force, **kw):
                for i in range(len(m)):
                    variants[(m[i], m.flips[i])] = b.images[i]
        tr = DetLoader(ds, batch_size=2, scale=(100, 60), training=True,
                       gt_capacity=8, seed=3)
        tr.set_epoch(2)
        checked = 0
        for batch, meta in tr:
            for i in range(len(meta)):
                np.testing.assert_array_equal(
                    batch.images[i], variants[(meta[i], meta.flips[i])],
                )
                checked += 1
        assert checked > 0
