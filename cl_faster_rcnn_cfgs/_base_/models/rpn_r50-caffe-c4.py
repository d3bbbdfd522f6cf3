# RPN R-50-caffe-C4 base model config (reference
# cl_faster_rcnn_cfgs/_base_/models/rpn_r50-caffe-c4.py) — RPN-only on
# the C4 trunk; builds nsgp_repre_tpu.models.c4 trunk with
# two_stage_variants.RPN semantics.
model = dict(
    type="RPNC4",
    data_preprocessor=dict(
        mean=[103.530, 116.280, 123.675],
        std=[1.0, 1.0, 1.0],
        bgr_to_rgb=False,
        pad_size_divisor=32,
    ),
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=3,
        strides=(1, 2, 2),
        dilations=(1, 1, 1),
        out_indices=(2,),
        frozen_stages=1,
        norm_eval=True,
        style="caffe",
        init_cfg=dict(type="Pretrained", checkpoint=None),
    ),
    rpn_head=dict(
        type="RPNHead",
        in_channels=1024,
        feat_channels=1024,
        anchor_generator=dict(
            scales=[2, 4, 8, 16, 32], ratios=[0.5, 1.0, 2.0], strides=[16]
        ),
        bbox_coder=dict(target_means=[0.0] * 4, target_stds=[1.0] * 4),
    ),
    train_cfg=dict(
        rpn=dict(
            assigner=dict(
                pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                match_low_quality=True,
            ),
            sampler=dict(num=256, pos_fraction=0.5, add_gt_as_proposals=False),
        )
    ),
    test_cfg=dict(
        rpn=dict(
            nms_pre=12000, max_per_img=2000, nms=dict(iou_threshold=0.7), min_bbox_size=0
        )
    ),
)
