"""Training-path gradient parity: converted mmdet-layout weights, one
batch, the SAME sampling decisions — the JAX train loss (model.loss +
RePRE replay + EWC) must agree with the independent torch replica
(tests/torch_loss_replica.py) on every loss term AND on every per-layer
gradient.

This is the VERDICT round-2 item 1(b) harness: it covers RPN target
assembly (assignment, delta encoding, BCE/L1 avg_factor), RoI sampling
consumption (labels/targets from injected decisions), the RoIAlign
backward, the Shared2FC task head with future-task masking, the replay
double-softmax CE gradient, and the EWC quadratic — end-to-end through
the converted-parameter mapping (conv/linear transposes), so a
transpose error in any layer's gradient cannot hide.

Sampling decisions are extracted by re-deriving the model's internal
key-split structure (loss → split(rng) → per-image split) with the
same PRNG keys; the torch side recomputes assignment/targets from
scratch and asserts the injected decisions are consistent with its own
assignment.
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nsgp_repre_tpu.engine.ewc import ewc_loss, select_ewc_params  # noqa: E402
from nsgp_repre_tpu.engine.train import total_loss  # noqa: E402
from nsgp_repre_tpu.models.assigners import max_iou_assign  # noqa: E402
from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN  # noqa: E402
from nsgp_repre_tpu.models.samplers import (  # noqa: E402
    random_sample_gather,
    random_sample_masks,
)
from nsgp_repre_tpu.structures.sample import DetBatch, InstanceArray  # noqa: E402
from nsgp_repre_tpu.utils.checkpoint import restore_into  # noqa: E402
from nsgp_repre_tpu.utils.torch_convert import convert_detector_state_dict  # noqa: E402

from torch_replica import TorchTaskFasterRCNN  # noqa: E402
from torch_loss_replica import mmdet_grad_dict, replica_losses  # noqa: E402

B, H, W = 2, 64, 64
CAP = 4
NUM_CLASSES = 6
TASK_SPLIT = (0, 2, 4, 6)
TASK_ID = 2
RPN_NUM, RCNN_NUM = 64, 32
P = 16  # rpn_max_per_img


def _flatten_params(tree):
    flat = {}
    for path, leaf in jax.tree_util.tree_flatten_with_path(tree)[0]:
        parts = [str(getattr(p, "key", getattr(p, "idx", p))) for p in path]
        flat["/".join(parts)] = np.asarray(leaf)
    return flat


@pytest.fixture(scope="module")
def setup():
    torch.manual_seed(0)
    tm = TorchTaskFasterRCNN(
        num_classes=NUM_CLASSES, task_split=TASK_SPLIT, task_id=TASK_ID
    )
    tm.eval()  # BN uses running stats = FrozenBatchNorm semantics
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)
    sd = tm.mmdet_state_dict()
    params_flat, stats_flat = convert_detector_state_dict(sd)

    cfg = DetectorConfig(
        num_classes=NUM_CLASSES,
        task_split=TASK_SPLIT,
        task_id=TASK_ID,
        rpn_num=RPN_NUM,
        rcnn_num=RCNN_NUM,
        rpn_nms_pre=32,
        rpn_max_per_img=P,
        max_per_img=8,
        use_approx_topk=False,
        roi_align_mode="gather",
        frozen_stages=-1,  # gradients everywhere
    )
    model = FasterRCNN(config=cfg)

    rs = np.random.RandomState(7)
    images = rs.randn(B, H, W, 3).astype(np.float32)
    gt_boxes = np.zeros((B, CAP, 4), np.float32)
    gt_labels = np.full((B, CAP), -1, np.int32)
    gt_valid = np.zeros((B, CAP), bool)
    boxes = [
        [(4, 6, 30, 40, 0), (20, 12, 60, 50, 3)],
        [(2, 2, 20, 22, 1), (30, 30, 62, 60, 2), (10, 40, 28, 62, 3)],
    ]
    for i, bl in enumerate(boxes):
        for j, (x1, y1, x2, y2, c) in enumerate(bl):
            gt_boxes[i, j] = (x1, y1, x2, y2)
            gt_labels[i, j] = c
            gt_valid[i, j] = True

    batch = DetBatch(
        images=jnp.asarray(images),
        img_shape=jnp.full((B, 2), 64, jnp.int32),
        ori_shape=jnp.full((B, 2), 64, jnp.int32),
        scale_factor=jnp.ones((B, 2), jnp.float32),
        gt=InstanceArray(
            boxes=jnp.asarray(gt_boxes),
            labels=jnp.asarray(gt_labels),
            valid=jnp.asarray(gt_valid),
        ),
    )
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    params = restore_into(variables["params"], params_flat)
    stats = restore_into(variables["batch_stats"], stats_flat)

    # replay prototypes: torch-(C,H,W)-major flat features, labels in
    # the seen range [0, task_split[task_id])
    replay_feats = rs.randn(12, 7 * 7 * 256).astype(np.float32) * 0.05
    replay_labels = (np.arange(12) % TASK_SPLIT[TASK_ID]).astype(np.int32)

    # EWC terms: random importance + old on every backbone BN affine
    ewc_sel = select_ewc_params(params)
    sd_imp = {k: (0.1 * np.abs(rs.randn(*v.shape))).astype(np.float32)
              for k, v in sd.items()}
    sd_old = {k: (np.asarray(v) + 0.003 * rs.randn(*v.shape)).astype(np.float32)
              for k, v in sd.items()}
    imp_flat, _ = convert_detector_state_dict(sd_imp)
    old_flat, _ = convert_detector_state_dict(sd_old)
    ewc_terms = {
        k: (jnp.asarray(imp_flat[k])[None], jnp.asarray(old_flat[k])[None])
        for k in ewc_sel
    }
    # BN affines: stem bn1, block bn1/2/3, and the stage-downsample BN
    # (torch name "downsample.1" — no literal "bn" in the key)
    torch_bn_keys = [
        k for k in sd
        if (".bn" in k or k.startswith("backbone.bn") or "downsample.1." in k)
        and (k.endswith(".weight") or k.endswith(".bias"))
        and k.startswith("backbone.")
    ]
    assert len(torch_bn_keys) == len(ewc_sel), (
        len(torch_bn_keys), len(ewc_sel),
    )
    tparams = dict(tm.backbone.named_parameters())
    torch_ewc = [
        (tparams[k[len("backbone."):]], sd_imp[k], sd_old[k])
        for k in torch_bn_keys
    ]

    return dict(
        tm=tm, model=model, cfg=cfg, params=params, stats=stats,
        batch=batch, images=images, gt=(gt_boxes, gt_labels, gt_valid),
        replay=(replay_feats, replay_labels),
        ewc_terms=ewc_terms, torch_ewc=torch_ewc,
    )


@pytest.fixture(scope="module")
def jax_run(setup):
    model, params, stats = setup["model"], setup["params"], setup["stats"]
    batch = setup["batch"]
    replay_feats, replay_labels = setup["replay"]
    ewc_terms = setup["ewc_terms"]
    rng = jax.random.PRNGKey(42)

    def loss_fn(p):
        losses = model.apply(
            {"params": p, "batch_stats": stats}, batch, rng,
            method=model.loss,
            replay_feats=jnp.asarray(replay_feats),
            replay_labels=jnp.asarray(replay_labels),
        )
        losses["ewc_loss"] = ewc_loss(p, ewc_terms)
        return total_loss(losses), losses

    (tot, losses), grads = jax.jit(
        jax.value_and_grad(loss_fn, has_aux=True)
    )(params)
    return dict(
        total=float(tot),
        losses={k: float(v) for k, v in losses.items()},
        grads=_flatten_params(grads),
        rng=rng,
    )


@pytest.fixture(scope="module")
def decisions(setup, jax_run):
    """Re-derive the model's internal sampling decisions with the same
    key-split structure as FasterRCNN.loss (loss → split(rng) → rpn
    per-image keys / _sample_rois per-image keys)."""
    model, params, stats, cfg = (
        setup["model"], setup["params"], setup["stats"], setup["cfg"],
    )
    batch = setup["batch"]
    gt_boxes, gt_labels, gt_valid = setup["gt"]
    variables = {"params": params, "batch_stats": stats}
    rng = jax_run["rng"]
    k1, k2 = jax.random.split(rng)

    feats = model.apply(variables, batch.images, method=model.extract_feat)
    anchors, sizes = model.apply(variables, feats, method=model._anchors)
    anchors = np.asarray(anchors)

    rpn_keys = jax.random.split(k1, B)
    rpn_pos = np.zeros((B, anchors.shape[0]), bool)
    rpn_neg = np.zeros((B, anchors.shape[0]), bool)
    for i in range(B):
        valid = model.apply(
            variables, sizes, batch.img_shape[i], method=model._anchor_valid
        )
        assigned, _ = max_iou_assign(
            jnp.asarray(anchors), batch.gt.boxes[i], batch.gt.valid[i],
            cfg.rpn_pos_iou_thr, cfg.rpn_neg_iou_thr, cfg.rpn_min_pos_iou,
            match_low_quality=True, prior_valid=valid,
        )
        pos, neg = random_sample_masks(
            rpn_keys[i], assigned, cfg.rpn_num, cfg.rpn_pos_fraction
        )
        rpn_pos[i] = np.asarray(pos)
        rpn_neg[i] = np.asarray(neg)

    _, proposals = model.apply(
        variables, feats, batch.gt, batch.img_shape, k1,
        method=model.rpn_loss_and_proposals, with_loss=False,
    )
    prop_np = np.asarray(proposals.boxes)

    roi_keys = jax.random.split(k2, B)
    S = cfg.rcnn_num
    roi_idx = np.zeros((B, S), np.int64)
    roi_idx_valid = np.zeros((B, S), bool)
    roi_idx_pos = np.zeros((B, S), bool)
    for i in range(B):
        cand = jnp.concatenate([batch.gt.boxes[i], proposals.boxes[i]])
        cand_valid = jnp.concatenate([batch.gt.valid[i], proposals.valid[i]])
        assigned, _ = max_iou_assign(
            cand, batch.gt.boxes[i], batch.gt.valid[i],
            cfg.rcnn_pos_iou_thr, cfg.rcnn_neg_iou_thr, cfg.rcnn_min_pos_iou,
            match_low_quality=False, prior_valid=cand_valid,
        )
        idx, idx_valid, idx_pos = random_sample_gather(
            roi_keys[i], assigned, cfg.rcnn_num, cfg.rcnn_pos_fraction
        )
        roi_idx[i] = np.asarray(idx)
        roi_idx_valid[i] = np.asarray(idx_valid)
        roi_idx_pos[i] = np.asarray(idx_pos)

    return dict(
        rpn_pos=rpn_pos, rpn_neg=rpn_neg, proposals=prop_np,
        roi_idx=roi_idx, roi_idx_valid=roi_idx_valid, roi_idx_pos=roi_idx_pos,
    )


@pytest.fixture(scope="module")
def torch_run(setup, decisions):
    tm = setup["tm"]
    tm.zero_grad(set_to_none=True)
    gt_boxes, gt_labels, gt_valid = setup["gt"]
    replay_feats, replay_labels = setup["replay"]
    losses = replica_losses(
        tm, setup["images"], gt_boxes, gt_labels, gt_valid,
        decisions["rpn_pos"], decisions["rpn_neg"], decisions["proposals"],
        decisions["roi_idx"], decisions["roi_idx_valid"],
        decisions["roi_idx_pos"],
        num_classes=NUM_CLASSES,
        replay_feats=replay_feats, replay_labels=replay_labels,
        ewc_terms=setup["torch_ewc"],
    )
    tot = sum(v for k, v in losses.items() if "loss" in k)
    tot.backward()
    return dict(
        total=float(tot),
        losses={k: float(v) for k, v in losses.items()},
        grads=convert_detector_state_dict(mmdet_grad_dict(tm))[0],
    )


def test_sampling_decisions_nontrivial(decisions):
    assert decisions["rpn_pos"].sum() > 0
    assert decisions["roi_idx_pos"].sum() > 0
    # partial slates (fewer valid candidates than rcnn_num) exercise the
    # invalid-slot weighting path — make sure both states appear
    assert decisions["roi_idx_valid"].any()


def test_loss_terms_match(jax_run, torch_run):
    jl, tl = jax_run["losses"], torch_run["losses"]
    assert set(k for k in jl if "loss" in k) == set(
        k for k in tl if "loss" in k
    ), (sorted(jl), sorted(tl))
    for k in sorted(tl):
        np.testing.assert_allclose(
            jl[k], tl[k], rtol=2e-3, atol=1e-5,
            err_msg=f"loss term {k}: jax {jl[k]} vs torch {tl[k]}",
        )
    np.testing.assert_allclose(jax_run["total"], torch_run["total"], rtol=2e-3)


def test_per_layer_gradients_match(jax_run, torch_run):
    jg, tg = jax_run["grads"], torch_run["grads"]
    missing = sorted(set(tg) - set(jg))
    assert not missing, missing[:5]
    checked = bad = 0
    report = []
    for name in sorted(tg):
        a, b = jg[name], tg[name]
        assert a.shape == b.shape, name
        scale = max(np.abs(b).max(), np.abs(a).max(), 1e-8)
        err = np.abs(a - b).max() / scale
        checked += 1
        if err > 5e-3:
            bad += 1
            report.append(f"{name}: rel err {err:.2e} (scale {scale:.2e})")
    assert bad == 0, f"{bad}/{checked} layers disagree:\n" + "\n".join(report[:10])
    assert checked > 190, checked  # full R50 (159) + FPN (16) + heads


def test_gradients_nonzero_everywhere(jax_run, decisions):
    """Every trainable parameter must receive gradient signal, except
    the structurally-dead ones: future-task heads (task 3 of 3 is
    masked at task_id=2) and — only when no sampled RPN anchor landed on
    P5/P6 — the conv producing them (fpn_conv3; its lateral still gets
    gradient through the top-down sum)."""
    zero = {
        k for k, v in jax_run["grads"].items()
        if np.abs(v).max() == 0.0 and "teacher" not in k
    }
    expected = {
        "bbox_head/fc_cls2/bias", "bbox_head/fc_cls2/kernel",
        "bbox_head/fc_reg2/bias", "bbox_head/fc_reg2/kernel",
    }
    # anchor layout at 64x64: levels (16,8,4,2,1)^2 x 3 anchors
    l3_start = (16 * 16 + 8 * 8 + 4 * 4) * 3
    sampled = decisions["rpn_pos"] | decisions["rpn_neg"]
    if not sampled[:, l3_start:].any():
        expected |= {"neck/fpn_conv3/bias", "neck/fpn_conv3/kernel"}
    assert zero == expected, sorted(zero ^ expected)[:10]
