"""Alternate model families: RetinaNet, RPN, FastRCNN, MaskRCNN,
CascadeRCNN (SURVEY §1 layer 10 / reference _base_/models configs).

Mirrors the reference's test style (tests/test_models/test_detectors/
test_two_stage.py): tiny backbone, loss mode asserts loss-dict keys and
finite values, predict mode asserts padded-output shapes.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.models.cascade import CascadeConfig, CascadeRCNN
from nsgp_repre_tpu.models.detector import DetectorConfig
from nsgp_repre_tpu.models.mask import MaskRCNN, MaskRCNNConfig
from nsgp_repre_tpu.models.single_stage import RetinaNet, RetinaNetConfig
from nsgp_repre_tpu.models.two_stage_variants import RPN, FastRCNN
from nsgp_repre_tpu.structures.sample import DetBatch, InstanceArray

B, H, W = 1, 64, 64
KW = dict(
    num_classes=4, task_split=(0, 4), backbone_blocks=(1, 1, 1, 1),
    rpn_nms_pre=64, rpn_max_per_img=32, rcnn_num=16, max_per_img=8,
)


def _batch():
    gt = InstanceArray(
        boxes=jnp.asarray([[[10.0, 10.0, 40.0, 50.0], [20.0, 15.0, 55.0, 60.0]]] * B),
        labels=jnp.asarray([[1, 2]] * B, jnp.int32),
        valid=jnp.ones((B, 2), bool),
    )
    return DetBatch(
        images=jnp.zeros((B, H, W, 3), jnp.float32),
        img_shape=jnp.asarray([[H, W]] * B, jnp.int32),
        ori_shape=jnp.asarray([[H, W]] * B, jnp.int32),
        scale_factor=jnp.ones((B, 2)),
        gt=gt,
    )


def _finite(losses):
    for k, v in losses.items():
        assert np.isfinite(float(v)), f"{k} not finite"


def test_retinanet_loss_and_predict():
    cfg = RetinaNetConfig(num_classes=4, backbone_blocks=(1, 1, 1, 1))
    model = RetinaNet(config=cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    losses = jax.jit(lambda v, b: model.apply(v, b, method=model.loss))(
        variables, batch
    )
    assert set(losses) == {"loss_cls", "loss_bbox"}
    _finite(losses)
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.boxes.shape == (B, cfg.max_per_img, 4)
    assert dets.scores.shape == (B, cfg.max_per_img)


def test_retinanet_prior_bias():
    """Focal-loss prior bias: initial background probability ≈ 0.99."""
    cfg = RetinaNetConfig(num_classes=4, backbone_blocks=(1, 1, 1, 1))
    model = RetinaNet(config=cfg)
    variables = model.init(jax.random.PRNGKey(0), jnp.zeros((1, 32, 32, 3)))
    bias = variables["params"]["bbox_head"]["retina_cls"]["bias"]
    np.testing.assert_allclose(
        jax.nn.sigmoid(bias), 0.01, rtol=1e-5
    )


def test_rpn_standalone():
    cfg = DetectorConfig(**KW)
    model = RPN(config=cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    losses = jax.jit(
        lambda v, b: model.apply(v, b, jax.random.PRNGKey(1), method=model.loss)
    )(variables, batch)
    assert set(losses) == {"loss_rpn_cls", "loss_rpn_bbox"}
    _finite(losses)
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.boxes.shape == (B, cfg.rpn_max_per_img, 4)
    assert bool(jnp.all(dets.labels == 0))


def test_fast_rcnn_external_proposals():
    cfg = DetectorConfig(**KW)
    model = FastRCNN(config=cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    props = InstanceArray(
        boxes=jnp.tile(jnp.asarray([[5.0, 5.0, 50.0, 50.0]]), (B, 32, 1)),
        labels=jnp.zeros((B, 32), jnp.int32),
        valid=jnp.ones((B, 32), bool),
    )
    losses = jax.jit(
        lambda v, b, p: model.apply(
            v, b, jax.random.PRNGKey(1), p, method=model.loss
        )
    )(variables, batch, props)
    assert "loss_cls" in losses and "loss_bbox" in losses
    assert not any(k.startswith("loss_rpn") for k in losses)
    _finite(losses)
    dets = jax.jit(
        lambda v, b, p: model.apply(v, b, p, method=model.predict)
    )(variables, batch, props)
    assert dets.boxes.shape == (B, cfg.max_per_img, 4)


def test_cascade_rcnn():
    cfg = CascadeConfig(**KW)
    model = CascadeRCNN(config=cfg)
    batch = _batch()
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    # three stage heads exist
    for i in range(3):
        assert f"cascade_head{i}" in variables["params"]
    losses = jax.jit(
        lambda v, b: model.apply(v, b, jax.random.PRNGKey(1), method=model.loss)
    )(variables, batch)
    for i in range(3):
        assert f"s{i}.loss_cls" in losses and f"s{i}.loss_bbox" in losses
    _finite(losses)
    # stage loss weights scale the later stages down at init (CE ~ log C
    # is equal per stage before training)
    assert float(losses["s1.loss_cls"]) < float(losses["s0.loss_cls"])
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.boxes.shape == (B, cfg.max_per_img, 4)


def test_mask_rcnn():
    cfg = MaskRCNNConfig(**KW)
    model = MaskRCNN(config=cfg)
    batch = _batch()
    rng = np.random.RandomState(0)
    gtm = batch.gt.replace(
        masks=jnp.asarray(rng.rand(B, 2, 56, 56) > 0.5, jnp.float32)
    )
    batch = batch.replace(gt=gtm)
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    losses = jax.jit(
        lambda v, b: model.apply(v, b, jax.random.PRNGKey(1), method=model.loss)
    )(variables, batch)
    assert "loss_mask" in losses
    _finite(losses)
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.masks.shape == (B, cfg.max_per_img, 28, 28)


def test_mask_target_resample_identity():
    """A roi equal to the gt box resamples the crop ~identically."""
    from nsgp_repre_tpu.models.mask import _resample_normalized

    rng = np.random.RandomState(1)
    crop = jnp.asarray(rng.rand(56, 56) > 0.5, jnp.float32)
    box = jnp.asarray([10.0, 20.0, 66.0, 76.0])  # 56x56 box
    out = _resample_normalized(crop, box, box, 56)
    # away from 0.5-crossings the resample is exact
    agree = float(jnp.mean(((out > 0.5) == (crop > 0.5)).astype(jnp.float32)))
    assert agree > 0.9


def test_mask_paste_roundtrip():
    from nsgp_repre_tpu.structures.mask_paste import normalize_gt_masks, paste_masks

    img_h, img_w = 64, 80
    bitmap = np.zeros((1, img_h, img_w), np.uint8)
    bitmap[0, 10:30, 20:50] = 1
    boxes = np.asarray([[20.0, 10.0, 50.0, 30.0]])
    crops = normalize_gt_masks(bitmap, boxes, size=56)
    assert crops.shape == (1, 56, 56)
    assert crops.mean() > 0.9  # box-tight mask fills its crop
    pasted = paste_masks(crops, boxes, img_h, img_w)
    inter = (pasted[0] & (bitmap[0] > 0)).sum()
    union = (pasted[0] | (bitmap[0] > 0)).sum()
    assert inter / union > 0.85


def test_ssd300():
    from nsgp_repre_tpu.models.ssd import SSD, SSDConfig, ssd_anchor_sizes

    mn, mx = ssd_anchor_sizes(300, 6, (0.15, 0.9))
    assert mn == [21, 45, 99, 153, 207, 261]
    assert mx == [45, 99, 153, 207, 261, 315]

    cfg = SSDConfig(num_classes=4, max_per_img=8, nms_pre=64)
    model = SSD(config=cfg)
    imgs = jnp.zeros((B, 128, 128, 3), jnp.float32)
    gt = InstanceArray(
        boxes=jnp.asarray([[[10.0, 10.0, 60.0, 70.0], [30.0, 25.0, 100.0, 110.0]]] * B),
        labels=jnp.asarray([[1, 2]] * B, jnp.int32),
        valid=jnp.ones((B, 2), bool),
    )
    batch = DetBatch(
        images=imgs,
        img_shape=jnp.asarray([[128, 128]] * B, jnp.int32),
        ori_shape=jnp.asarray([[128, 128]] * B, jnp.int32),
        scale_factor=jnp.ones((B, 2)),
        gt=gt,
    )
    variables = model.init(jax.random.PRNGKey(0), imgs)
    # L2Norm parameter initialized at 20 (ssd300.py l2_norm_scale)
    np.testing.assert_allclose(variables["params"]["neck"]["l2_norm"], 20.0)
    losses = jax.jit(lambda v, b: model.apply(v, b, method=model.loss))(
        variables, batch
    )
    assert set(losses) == {"loss_cls", "loss_bbox"}
    _finite(losses)
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.boxes.shape == (B, cfg.max_per_img, 4)


def test_cascade_mask_rcnn():
    from nsgp_repre_tpu.models.cascade import CascadeMaskConfig, CascadeMaskRCNN

    cfg = CascadeMaskConfig(**KW)
    model = CascadeMaskRCNN(config=cfg)
    batch = _batch()
    rng = np.random.RandomState(0)
    batch = batch.replace(
        gt=batch.gt.replace(
            masks=jnp.asarray(rng.rand(B, 2, 56, 56) > 0.5, jnp.float32)
        )
    )
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    losses = jax.jit(
        lambda v, b: model.apply(v, b, jax.random.PRNGKey(1), method=model.loss)
    )(variables, batch)
    assert "loss_mask" in losses and "s2.loss_cls" in losses
    _finite(losses)
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.masks.shape == (B, cfg.max_per_img, 28, 28)


def test_c4_dc5_variants():
    from nsgp_repre_tpu.models.c4 import FasterRCNNC4, FasterRCNNDC5

    kw = dict(KW)
    kw.update(anchor_strides=(16,), anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
              roi_strides=(16,), backbone_blocks=(1, 1, 1, 1))
    batch = _batch()
    for cls in (FasterRCNNC4, FasterRCNNDC5):
        cfg = DetectorConfig(**kw)
        model = cls(config=cfg)
        variables = model.init(jax.random.PRNGKey(0), batch.images)
        losses = jax.jit(
            lambda v, b, m=model: m.apply(v, b, jax.random.PRNGKey(1), method=m.loss)
        )(variables, batch)
        assert "loss_cls" in losses and "loss_rpn_cls" in losses, cls.__name__
        _finite(losses)
        dets = jax.jit(
            lambda v, b, m=model: m.apply(v, b, method=m.predict)
        )(variables, batch)
        assert dets.boxes.shape == (B, cfg.max_per_img, 4)


def test_mask_rcnn_c4():
    """MaskRCNNC4 runs a real mask branch on the shared res5 features:
    loss_mask is produced and predict returns 14x14 mask probabilities
    (mask-rcnn_r50-caffe-c4.py: mask_roi_extractor=None, mask_size=14)."""
    from nsgp_repre_tpu.models.c4 import MaskRCNNC4

    kw = dict(KW)
    kw.update(anchor_strides=(16,), anchor_scales=(2.0, 4.0, 8.0, 16.0, 32.0),
              roi_strides=(16,), backbone_blocks=(1, 1, 1, 1))
    cfg = MaskRCNNConfig(**kw, mask_size=14, mask_roi_out_size=14, mask_convs=0)
    model = MaskRCNNC4(config=cfg)
    batch = _batch()
    rng = np.random.RandomState(0)
    batch = batch.replace(
        # non-zero images so res5 features (the mask head input) are
        # non-zero and the kernel gradient check below is meaningful
        images=jnp.asarray(rng.rand(B, H, W, 3), jnp.float32),
        gt=batch.gt.replace(
            masks=jnp.asarray(rng.rand(B, 2, 56, 56) > 0.5, jnp.float32)
        ),
    )
    variables = model.init(jax.random.PRNGKey(0), batch.images)
    losses = jax.jit(
        lambda v, b: model.apply(v, b, jax.random.PRNGKey(1), method=model.loss)
    )(variables, batch)
    assert "loss_mask" in losses and "loss_cls" in losses
    _finite(losses)
    # the mask loss must actually touch the mask-head params
    grads = jax.grad(
        lambda v: model.apply(v, batch, jax.random.PRNGKey(1),
                              method=model.loss)["loss_mask"]
    )(variables)
    g = grads["params"]["mask_head"]["conv_logits"]["kernel"]
    assert float(jnp.abs(g).sum()) > 0.0
    dets = jax.jit(lambda v, b: model.apply(v, b, method=model.predict))(
        variables, batch
    )
    assert dets.masks.shape == (B, cfg.max_per_img, 14, 14)


def test_gt_max_assign_all_flag():
    """SSD's gt_max_assign_all=False: a gt's low-quality match claims
    only the argmax prior, not every tying prior."""
    from nsgp_repre_tpu.models.assigners import max_iou_assign

    priors = jnp.asarray(
        [[0.0, 0.0, 10.0, 10.0], [0.0, 0.0, 10.0, 10.0], [50.0, 50.0, 60.0, 60.0]]
    )
    gt = jnp.asarray([[0.0, 0.0, 10.0, 12.0]])
    valid = jnp.ones((1,), bool)
    a_all, _ = max_iou_assign(priors, gt, valid, 0.95, 0.3, 0.0, True)
    a_one, _ = max_iou_assign(
        priors, gt, valid, 0.95, 0.3, 0.0, True, gt_max_assign_all=False
    )
    # both tying priors claimed with the default; only one without
    assert int((a_all == 0).sum()) == 2
    assert int((a_one == 0).sum()) == 1


def test_zoo_builder_from_configs():
    """Every new _base_/models config builds through the zoo."""
    from nsgp_repre_tpu.models.zoo import build_detector
    from nsgp_repre_tpu.utils.config import load_config

    import os.path as osp

    base = osp.join(osp.dirname(__file__), "..", "cl_faster_rcnn_cfgs", "_base_", "models")
    for name, cls_name in [
        ("retinanet_r50_fpn.py", "RetinaNet"),
        ("rpn_r50_fpn.py", "RPN"),
        ("fast-rcnn_r50_fpn.py", "FastRCNN"),
        ("mask-rcnn_r50_fpn.py", "MaskRCNN"),
        ("cascade-rcnn_r50_fpn.py", "CascadeRCNN"),
        ("cascade-mask-rcnn_r50_fpn.py", "CascadeMaskRCNN"),
        ("faster-rcnn_r50_fpn.py", "FasterRCNN"),
        ("faster-rcnn_r50-caffe-c4.py", "FasterRCNNC4"),
        ("faster-rcnn_r50-caffe-dc5.py", "FasterRCNNDC5"),
        ("mask-rcnn_r50-caffe-c4.py", "MaskRCNNC4"),
        ("rpn_r50-caffe-c4.py", "RPNC4"),
        ("ssd300.py", "SSD"),
    ]:
        cfg = load_config(osp.join(base, name))
        model, det_cfg = build_detector(
            cfg["model"], num_classes=4, backbone_blocks=(1, 1, 1, 1)
        )
        assert type(model).__name__ == cls_name, name
        assert det_cfg.num_classes == 4
