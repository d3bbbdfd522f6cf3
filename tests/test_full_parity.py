"""End-to-end golden box parity: full mmdet-layout torch checkpoint →
convert_detector_state_dict → flax FasterRCNN.predict, compared against
an independent torch/numpy replica of the reference inference path
(tests/torch_replica.py; reference call stack two_stage.py:196 →
rpn_head.py:238 → standard_roi_head.py:266 → bbox_head.py:427).

This is the SURVEY §7 stage-4 milestone ("load reference ckpt, verify
boxes ≈ reference"): it validates every conversion rule (conv/linear
transposes, FPN/RPN/shared-FC/per-task-head naming, the trailing
background classifier) AND the whole JAX predict pipeline (anchors,
sigmoid+topk, delta decode, level NMS, RoI routing + align, task-head
masking, softmax, per-class decode, multiclass NMS) in one assertion.
Runs with use_approx_topk=False (exact parity mode).
"""
import numpy as np
import pytest

torch = pytest.importorskip("torch")
import torch.nn as tnn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from nsgp_repre_tpu.models.detector import DetectorConfig, FasterRCNN  # noqa: E402
from nsgp_repre_tpu.structures.sample import DetBatch, InstanceArray  # noqa: E402
from nsgp_repre_tpu.utils.checkpoint import restore_into  # noqa: E402
from nsgp_repre_tpu.utils.torch_convert import convert_detector_state_dict  # noqa: E402

from torch_replica import TorchTaskFasterRCNN, replica_predict  # noqa: E402


def _batch(img):
    H, W = img.shape[:2]
    cap = 2
    return DetBatch(
        images=jnp.asarray(img[None]),
        img_shape=jnp.array([[H, W]], jnp.int32),
        ori_shape=jnp.array([[H, W]], jnp.int32),
        scale_factor=jnp.ones((1, 2), jnp.float32),
        gt=InstanceArray(
            boxes=jnp.zeros((1, cap, 4), jnp.float32),
            labels=jnp.full((1, cap), -1, jnp.int32),
            valid=jnp.zeros((1, cap), bool),
        ),
    )


def test_full_detector_box_parity():
    torch.manual_seed(0)
    tm = TorchTaskFasterRCNN(num_classes=6, task_split=(0, 2, 4, 6), task_id=2)
    tm.eval()
    for m in tm.modules():
        if isinstance(m, tnn.BatchNorm2d):
            m.running_mean.uniform_(-0.5, 0.5)
            m.running_var.uniform_(0.5, 1.5)
            m.weight.data.uniform_(0.5, 1.5)
            m.bias.data.uniform_(-0.5, 0.5)

    sd = tm.mmdet_state_dict()
    params_flat, stats_flat = convert_detector_state_dict(sd)

    cfg = DetectorConfig(
        num_classes=6,
        task_split=(0, 2, 4, 6),
        task_id=2,
        rpn_nms_pre=32,
        rpn_max_per_img=16,
        max_per_img=8,
        use_approx_topk=False,
        roi_align_mode="gather",  # reference-exact level routing
    )
    model = FasterRCNN(config=cfg)
    img = np.random.RandomState(1).randn(64, 64, 3).astype(np.float32)
    batch = _batch(img)
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    params = restore_into(variables["params"], params_flat)
    stats = restore_into(variables["batch_stats"], stats_flat)

    det = jax.jit(
        lambda v, b: model.apply(v, b, method=model.predict)
    )({"params": params, "batch_stats": stats}, batch)

    gb, gs, gl = replica_predict(
        tm, img, rpn_nms_pre=32, rpn_max_per_img=16, max_per_img=8
    )

    valid = np.asarray(det.valid[0])
    n = int(valid.sum())
    assert n > 0, "degenerate test: no detections survived"
    assert n == len(gs), (n, len(gs))
    jl = np.asarray(det.labels[0])[:n]
    js = np.asarray(det.scores[0])[:n]
    jb = np.asarray(det.boxes[0])[:n]
    assert (jl == gl).all(), (jl, gl)
    np.testing.assert_allclose(js, gs, rtol=1e-3, atol=1e-4)
    np.testing.assert_allclose(jb, gb, rtol=1e-3, atol=5e-2)


def test_full_detector_future_task_masked():
    """Converted weights + task_id=2 of 3: no detection may carry a
    future-task label (classes 4..5), mirroring the -inf masking of
    convfc_bbox_head_task.py:272-275."""
    torch.manual_seed(3)
    tm = TorchTaskFasterRCNN(num_classes=6, task_split=(0, 2, 4, 6), task_id=2)
    tm.eval()
    img = np.random.RandomState(5).randn(64, 64, 3).astype(np.float32)
    gb, gs, gl = replica_predict(tm, img)
    assert (gl < 4).all()
