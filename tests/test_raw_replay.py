"""Raw-feature replay head (StandardRoIReplayHead) — the third replay
variant: 64 randomly-sampled stored RoI features distilled against the
frozen teacher's bbox-head logits with an MSE loss
(standard_roi_replay_head.py:53-104)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from __graft_entry__ import _tiny_batch
from nsgp_repre_tpu.engine import optim
from nsgp_repre_tpu.engine.train import TrainState, make_train_step, trainable_mask
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
        backbone_blocks=(1, 1, 1, 1),  # replay math doesn't need R50
    )
    base.update(kw)
    return DetectorConfig(**base)


@pytest.fixture(scope="module")
def setup():
    cfg = _cfg()
    model = FasterRCNN(config=cfg)
    teacher = FasterRCNN(config=_cfg(task_id=1))
    batch = _tiny_batch(2, 64, 64)
    variables = model.init(jax.random.PRNGKey(0), batch.images[:1].astype("float32"))
    return cfg, model, teacher, batch, variables


def test_raw_replay_loss_zero_when_student_equals_teacher(setup):
    cfg, model, teacher, batch, variables = setup
    feats = jnp.asarray(np.random.RandomState(0).randn(5, FEAT_DIM), jnp.float32)
    t_cls, _ = teacher.apply(variables, feats, method=teacher.bbox_forward)
    loss = model.apply(variables, feats, t_cls, method=model.raw_replay_loss)
    # identical params on the mutually-active columns → exactly zero MSE
    assert float(loss) == 0.0


def test_raw_replay_loss_positive_and_finite_when_divergent(setup):
    cfg, model, teacher, batch, variables = setup
    feats = jnp.asarray(np.random.RandomState(1).randn(5, FEAT_DIM), jnp.float32)
    t_cls, _ = teacher.apply(variables, feats, method=teacher.bbox_forward)
    bumped = jax.tree.map(lambda p: p + 0.01, variables["params"])
    loss = model.apply(
        {"params": bumped, "batch_stats": variables.get("batch_stats", {})},
        feats, t_cls, method=model.raw_replay_loss,
    )
    # teacher logits include -inf-style masks on its future columns; the
    # restricted MSE must stay finite regardless
    assert np.isfinite(float(loss)) and float(loss) > 0.0


def test_train_step_raw_mode_end_to_end(setup):
    cfg, model, teacher, batch, variables = setup
    params = variables["params"]
    rng = np.random.RandomState(2)
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
    step = make_train_step(model, optimizer, teacher_model=teacher, donate=False)
    new_state, metrics = step(state, batch, jax.random.PRNGKey(3))
    assert "replay_loss_cls" in metrics
    vals = {k: float(v) for k, v in metrics.items()}
    assert all(np.isfinite(v) for v in vals.values()), vals
    # student == teacher initially → distillation term starts at zero
    assert vals["replay_loss_cls"] == 0.0
    # params moved (other losses are non-zero)
    moved = jax.tree.map(
        lambda a, b: float(jnp.abs(a - b).max()), new_state.params, state.params
    )
    assert max(jax.tree.leaves(moved)) > 0.0
