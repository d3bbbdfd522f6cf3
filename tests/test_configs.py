"""Smoke test: every config in cl_faster_rcnn_cfgs loads, maps onto a
DetectorConfig, and builds a working optimizer + LR schedule — the
reference's config surface is the compat contract (SURVEY §7), so every
leaf must stay loadable and runnable end to end."""
import glob
import os.path as osp

import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.engine.optim import set_transforms
from nsgp_repre_tpu.engine.runner import build_optimizer, detector_config_from_cfg
from nsgp_repre_tpu.engine.train import make_lr_schedule
from nsgp_repre_tpu.utils.config import load_config

ROOT = osp.join(osp.dirname(__file__), "..", "cl_faster_rcnn_cfgs")
LEAVES = sorted(
    p for p in glob.glob(osp.join(ROOT, "**", "*.py"), recursive=True)
    if "_base_" not in p
)
SCHEDULES = sorted(glob.glob(osp.join(ROOT, "_base_", "schedules", "*.py")))


def test_tree_nonempty():
    assert len(LEAVES) >= 22, LEAVES
    assert len(SCHEDULES) == 16, SCHEDULES


@pytest.mark.parametrize("path", LEAVES, ids=lambda p: osp.basename(p)[:-3])
def test_leaf_config_builds(path):
    cfg = load_config(path)
    det_cfg = detector_config_from_cfg(cfg)
    assert det_cfg.num_classes >= det_cfg.task_split[-1]
    assert 1 <= det_cfg.task_id <= len(det_cfg.task_split) - 1

    opt_cfg = cfg.get("optim_wrapper", {}).get("optimizer", {})
    pw_cfg = cfg.get("optim_wrapper", {}).get("paramwise_cfg")
    sched = make_lr_schedule(
        opt_cfg.get("lr", 0.02), steps_per_epoch=10,
        max_epochs=cfg.get("train_cfg", {}).get("max_epochs", 12),
    )
    params = {
        "backbone": {"bn1": {"scale": jnp.ones((4,))},
                     "conv1": {"kernel": jnp.ones((3, 3, 2, 4))}},
        "bbox_head": {"shared_fc1": {"kernel": jnp.ones((8, 4))}},
    }
    tx = build_optimizer(opt_cfg, sched, params, pw_cfg)
    state = tx.init(params)
    grads = params
    updates, state = tx.update(grads, state, params)
    for u in (updates["backbone"]["conv1"]["kernel"],
              updates["bbox_head"]["shared_fc1"]["kernel"]):
        assert np.isfinite(np.asarray(u)).all()
    # transforms installable on every optimizer type (NSCL machinery)
    set_transforms(state, {"bbox_head/shared_fc1/kernel": jnp.eye(8)})


def test_paramwise_mults_semantics():
    """norm_decay_mult zeroes BN decay; custom_keys backbone lr_mult
    follows mmengine longest-substring-match semantics
    (schedule_1x_adamwnscl.py:24-28)."""
    from nsgp_repre_tpu.engine.optim import paramwise_mults

    params = {
        "backbone": {"bn1": {"scale": jnp.ones(2), "bias": jnp.ones(2)},
                     "layer1_0": {"downsample_bn": {"scale": jnp.ones(2)},
                                  "conv1": {"kernel": jnp.ones((1, 1, 2, 2))}}},
        "neck": {"fpn_conv0": {"kernel": jnp.ones((3, 3, 2, 2))}},
    }
    lr_m, wd_m = paramwise_mults(
        params,
        dict(norm_decay_mult=0.0,
             custom_keys={"backbone": dict(lr_mult=10, decay_mult=1.0)}),
    )
    assert lr_m["backbone"]["bn1"]["scale"] == 10
    assert lr_m["backbone"]["layer1_0"]["conv1"]["kernel"] == 10
    assert lr_m["neck"]["fpn_conv0"]["kernel"] == 1.0
    assert wd_m["backbone"]["bn1"]["scale"] == 0.0
    assert wd_m["backbone"]["bn1"]["bias"] == 0.0
    assert wd_m["backbone"]["layer1_0"]["downsample_bn"]["scale"] == 0.0
    assert wd_m["backbone"]["layer1_0"]["conv1"]["kernel"] == 1.0


def test_optimizer_variant_leaves_resolve_types():
    """The three optimizer-ablation leaves select the intended types."""
    for stem, typ in [
        ("cl_faster_rcnn_nsgp_repre_15_5_2_adamnscl", "AdamNSCL"),
        ("cl_faster_rcnn_nsgp_repre_15_5_2_adamwnscl", "AdamWNSCL"),
        ("cl_faster_rcnn_nsgp_repre_15_5_2_sgdnsclna", "SGDNSCLNA"),
    ]:
        cfg = load_config(osp.join(ROOT, "incremental_task", stem + ".py"))
        assert cfg.get_nested("optim_wrapper.optimizer.type") == typ, stem
