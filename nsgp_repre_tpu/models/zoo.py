"""Model zoo: build any supported detector from a reference-shaped model
config dict.

The incremental-learning runner builds FasterRCNN directly (it IS the
method); this builder covers the wider config surface — every model base
under cl_faster_rcnn_cfgs/_base_/models/ maps to a TPU-native family:

| config ``model.type``       | class                                   |
|-----------------------------|-----------------------------------------|
| FasterRCNN / FasterRCNNRoIReplay | models.detector.FasterRCNN         |
| RetinaNet                   | models.single_stage.RetinaNet           |
| RPN                         | models.two_stage_variants.RPN           |
| FastRCNN                    | models.two_stage_variants.FastRCNN      |
| MaskRCNN                    | models.mask.MaskRCNN                    |
| CascadeRCNN                 | models.cascade.CascadeRCNN              |
| CascadeMaskRCNN (SingleStageDetector/ssd, C4/DC5 variants: see
| models.ssd / models.resnet_c4)                                        |
"""
from __future__ import annotations

import dataclasses
from typing import Any, Dict, Optional, Tuple

from .c4 import FasterRCNNC4, FasterRCNNDC5, MaskRCNNC4, c4_config
from .cascade import CascadeConfig, CascadeMaskConfig, CascadeMaskRCNN, CascadeRCNN
from .detector import DetectorConfig, FasterRCNN
from .mask import MaskRCNN, MaskRCNNConfig
from .single_stage import RetinaNet, RetinaNetConfig
from .ssd import SSD, SSDConfig
from .two_stage_variants import RPN, FastRCNN


def _two_stage_kwargs(model: Dict[str, Any], num_classes: int) -> Dict[str, Any]:
    train_cfg = model.get("train_cfg", {}) or {}
    test_cfg = model.get("test_cfg", {}) or {}
    rpn_t = train_cfg.get("rpn", {}) or {}
    prop_t = train_cfg.get("rpn_proposal", {}) or {}
    rcnn_t = train_cfg.get("rcnn", {}) or {}
    if isinstance(rcnn_t, (list, tuple)):  # cascade: per-stage list
        rcnn_t = rcnn_t[0]
    rcnn_te = test_cfg.get("rcnn", {}) or {}
    bb = model.get("backbone", {}) or {}
    return dict(
        num_classes=num_classes,
        task_split=(0, num_classes),
        task_id=1,
        rpn_pos_iou_thr=rpn_t.get("assigner", {}).get("pos_iou_thr", 0.7),
        rpn_neg_iou_thr=rpn_t.get("assigner", {}).get("neg_iou_thr", 0.3),
        rpn_min_pos_iou=rpn_t.get("assigner", {}).get("min_pos_iou", 0.3),
        rpn_num=rpn_t.get("sampler", {}).get("num", 256),
        rpn_pos_fraction=rpn_t.get("sampler", {}).get("pos_fraction", 0.5),
        rpn_nms_pre=prop_t.get("nms_pre", 2000),
        rpn_max_per_img=prop_t.get("max_per_img", 1000),
        rpn_nms_iou=prop_t.get("nms", {}).get("iou_threshold", 0.7),
        rcnn_pos_iou_thr=rcnn_t.get("assigner", {}).get("pos_iou_thr", 0.5),
        rcnn_neg_iou_thr=rcnn_t.get("assigner", {}).get("neg_iou_thr", 0.5),
        rcnn_min_pos_iou=rcnn_t.get("assigner", {}).get("min_pos_iou", 0.5),
        rcnn_num=rcnn_t.get("sampler", {}).get("num", 512),
        rcnn_pos_fraction=rcnn_t.get("sampler", {}).get("pos_fraction", 0.25),
        score_thr=rcnn_te.get("score_thr", 0.05),
        nms_iou=rcnn_te.get("nms", {}).get("iou_threshold", 0.5),
        nms_type=rcnn_te.get("nms", {}).get("type", "nms"),
        soft_nms_sigma=rcnn_te.get("nms", {}).get("sigma", 0.5),
        soft_nms_min_score=rcnn_te.get("nms", {}).get("min_score", 1e-3),
        soft_nms_method=rcnn_te.get("nms", {}).get("method", "linear"),
        max_per_img=rcnn_te.get("max_per_img", 100),
        backbone_blocks=tuple(bb.get("stage_blocks", (3, 4, 6, 3))),
        frozen_stages=bb.get("frozen_stages", 1),
    )


def _only_fields(cls, kw: Dict[str, Any]) -> Dict[str, Any]:
    names = {f.name for f in dataclasses.fields(cls)}
    return {k: v for k, v in kw.items() if k in names}


def build_detector(
    model: Dict[str, Any],
    num_classes: Optional[int] = None,
    compute_dtype: str = "float32",
    **overrides,
):
    """(model-config dict) → (flax module, its config dataclass).

    ``num_classes`` overrides the config's head num_classes (the
    reference leaves COCO's 80 in the bases and overrides in leaves).
    Overrides not applicable to the selected family's config are
    silently dropped (e.g. ``backbone_blocks`` for the VGG-based SSD).
    """
    typ = model.get("type", "FasterRCNN")

    if typ == "RetinaNet":
        head = model.get("bbox_head", {}) or {}
        test_cfg = model.get("test_cfg", {}) or {}
        train_cfg = model.get("train_cfg", {}) or {}
        anchor = head.get("anchor_generator", {}) or {}
        bb = model.get("backbone", {}) or {}
        rkw = dict(
            num_classes=num_classes or head.get("num_classes", 80),
            anchor_strides=tuple(anchor.get("strides", (8, 16, 32, 64, 128))),
            anchor_ratios=tuple(anchor.get("ratios", (0.5, 1.0, 2.0))),
            octave_base_scale=anchor.get("octave_base_scale", 4),
            scales_per_octave=anchor.get("scales_per_octave", 3),
            stacked_convs=head.get("stacked_convs", 4),
            feat_channels=head.get("feat_channels", 256),
            pos_iou_thr=train_cfg.get("assigner", {}).get("pos_iou_thr", 0.5),
            neg_iou_thr=train_cfg.get("assigner", {}).get("neg_iou_thr", 0.4),
            min_pos_iou=train_cfg.get("assigner", {}).get("min_pos_iou", 0.0),
            focal_gamma=head.get("loss_cls", {}).get("gamma", 2.0),
            focal_alpha=head.get("loss_cls", {}).get("alpha", 0.25),
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.05),
            nms_iou=test_cfg.get("nms", {}).get("iou_threshold", 0.5),
            max_per_img=test_cfg.get("max_per_img", 100),
            backbone_blocks=tuple(bb.get("stage_blocks", (3, 4, 6, 3))),
            frozen_stages=bb.get("frozen_stages", 1),
            compute_dtype=compute_dtype,
        )
        rkw.update(_only_fields(RetinaNetConfig, overrides))
        cfg = RetinaNetConfig(**rkw)
        return RetinaNet(config=cfg), cfg

    if typ == "SSD":
        head = model.get("bbox_head", {}) or {}
        train_cfg = model.get("train_cfg", {}) or {}
        test_cfg = model.get("test_cfg", {}) or {}
        anchor = head.get("anchor_generator", {}) or {}
        skw = dict(
            num_classes=num_classes or head.get("num_classes", 80),
            input_size=anchor.get("input_size", 300),
            strides=tuple(anchor.get("strides", (8, 16, 32, 64, 100, 300))),
            level_ratios=tuple(
                tuple(float(x) for x in r)
                for r in anchor.get("ratios", [[2], [2, 3], [2, 3], [2, 3], [2], [2]])
            ),
            basesize_ratio_range=tuple(
                anchor.get("basesize_ratio_range", (0.15, 0.9))
            ),
            neg_pos_ratio=train_cfg.get("neg_pos_ratio", 3),
            smoothl1_beta=train_cfg.get("smoothl1_beta", 1.0),
            nms_pre=test_cfg.get("nms_pre", 1000),
            score_thr=test_cfg.get("score_thr", 0.02),
            nms_iou=test_cfg.get("nms", {}).get("iou_threshold", 0.45),
            max_per_img=test_cfg.get("max_per_img", 200),
            compute_dtype=compute_dtype,
        )
        skw.update(_only_fields(SSDConfig, overrides))
        cfg = SSDConfig(**skw)
        return SSD(config=cfg), cfg

    nc = num_classes if num_classes is not None else _head_num_classes(model)
    kw = _two_stage_kwargs(model, nc)
    kw["compute_dtype"] = compute_dtype
    kw.update(overrides)

    if typ in ("FasterRCNN", "FasterRCNNRoIReplay"):
        cfg = DetectorConfig(**kw)
        return FasterRCNN(config=cfg), cfg
    if typ == "RPN":
        # rpn-only: proposal settings live under test_cfg.rpn
        te = (model.get("test_cfg", {}) or {}).get("rpn", {}) or {}
        kw["rpn_nms_pre"] = te.get("nms_pre", kw["rpn_nms_pre"])
        kw["rpn_max_per_img"] = te.get("max_per_img", kw["rpn_max_per_img"])
        kw["rpn_nms_iou"] = te.get("nms", {}).get("iou_threshold", kw["rpn_nms_iou"])
        cfg = DetectorConfig(**kw)
        return RPN(config=cfg), cfg
    if typ == "FastRCNN":
        cfg = DetectorConfig(**kw)
        return FastRCNN(config=cfg), cfg
    if typ == "MaskRCNN":
        mh = (model.get("roi_head", {}) or {}).get("mask_head", {}) or {}
        cfg = MaskRCNNConfig(
            **kw,
            mask_convs=mh.get("num_convs", 4),
            mask_channels=mh.get("conv_out_channels", 256),
        )
        return MaskRCNN(config=cfg), cfg
    if typ in ("FasterRCNNC4", "MaskRCNNC4", "RPNC4", "FasterRCNNDC5"):
        # single-level caffe trunks: anchor scales [2..32] on stride 16
        anchor = (model.get("rpn_head", {}) or {}).get("anchor_generator", {}) or {}
        kw["anchor_strides"] = tuple(anchor.get("strides", (16,)))
        kw["anchor_scales"] = tuple(
            float(s) for s in anchor.get("scales", (2, 4, 8, 16, 32))
        )
        kw["roi_strides"] = kw["anchor_strides"]
        if typ == "MaskRCNNC4":
            # mask-rcnn_r50-caffe-c4.py: shared res5 mask branch,
            # FCNMaskHead(num_convs=0), train_cfg.rcnn.mask_size=14
            mh = (model.get("roi_head", {}) or {}).get("mask_head", {}) or {}
            cfg = MaskRCNNConfig(
                **kw,
                mask_size=14,
                mask_roi_out_size=14,
                mask_convs=mh.get("num_convs", 0),
                mask_channels=mh.get("conv_out_channels", 256),
            )
        else:
            cfg = DetectorConfig(**kw)
        cls = {
            "FasterRCNNC4": FasterRCNNC4,
            "MaskRCNNC4": MaskRCNNC4,
            "FasterRCNNDC5": FasterRCNNDC5,
        }.get(typ)
        if typ == "RPNC4":
            # rpn-only on the C4 trunk: reuse FasterRCNNC4's trunk with
            # RPN loss/predict via the generic RPN variant over it
            class RPNC4(FasterRCNNC4):
                loss = RPN.loss
                predict = RPN.predict
                __call__ = RPN.__call__

            return RPNC4(config=cfg), cfg
        return cls(config=cfg), cfg

    if typ == "CascadeMaskRCNN":
        rh = model.get("roi_head", {}) or {}
        rcnn_list = (model.get("train_cfg", {}) or {}).get("rcnn", []) or []
        heads = rh.get("bbox_head", []) or []
        extra = {}
        if rcnn_list and isinstance(rcnn_list, (list, tuple)):
            extra["stage_pos_iou"] = tuple(
                s.get("assigner", {}).get("pos_iou_thr", t)
                for s, t in zip(rcnn_list, (0.5, 0.6, 0.7))
            )
        if heads:
            extra["stage_stds"] = tuple(
                tuple(h.get("bbox_coder", {}).get("target_stds", (0.1, 0.1, 0.2, 0.2)))
                for h in heads
            )
            extra["num_stages"] = len(heads)
        if rh.get("stage_loss_weights"):
            extra["stage_loss_weights"] = tuple(rh["stage_loss_weights"])
        cfg = CascadeMaskConfig(**kw, **extra)
        return CascadeMaskRCNN(config=cfg), cfg

    if typ == "CascadeRCNN":
        rh = model.get("roi_head", {}) or {}
        rcnn_list = (model.get("train_cfg", {}) or {}).get("rcnn", []) or []
        heads = rh.get("bbox_head", []) or []
        extra = {}
        if rcnn_list and isinstance(rcnn_list, (list, tuple)):
            extra["stage_pos_iou"] = tuple(
                s.get("assigner", {}).get("pos_iou_thr", t)
                for s, t in zip(rcnn_list, (0.5, 0.6, 0.7))
            )
        if heads:
            extra["stage_stds"] = tuple(
                tuple(h.get("bbox_coder", {}).get("target_stds", (0.1, 0.1, 0.2, 0.2)))
                for h in heads
            )
            extra["num_stages"] = len(heads)
        if rh.get("stage_loss_weights"):
            extra["stage_loss_weights"] = tuple(rh["stage_loss_weights"])
        cfg = CascadeConfig(**kw, **extra)
        return CascadeRCNN(config=cfg), cfg
    raise ValueError(f"unsupported model type: {typ}")


def _head_num_classes(model: Dict[str, Any]) -> int:
    rh = model.get("roi_head", {}) or {}
    bh = rh.get("bbox_head", {})
    if isinstance(bh, (list, tuple)):
        bh = bh[0] if bh else {}
    return (bh or {}).get("num_classes", 80)
