# RPN R-50-FPN base model config (reference
# cl_faster_rcnn_cfgs/_base_/models/rpn_r50_fpn.py)
model = dict(
    type="RPN",
    data_preprocessor=dict(
        mean=[123.675, 116.28, 103.53],
        std=[58.395, 57.12, 57.375],
        bgr_to_rgb=True,
        pad_size_divisor=32,
    ),
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        out_indices=(0, 1, 2, 3),
        frozen_stages=1,
        norm_eval=True,
        style="pytorch",
        init_cfg=dict(type="Pretrained", checkpoint=None),
    ),
    neck=dict(type="FPN", in_channels=[256, 512, 1024, 2048], out_channels=256, num_outs=5),
    rpn_head=dict(
        type="RPNHead",
        in_channels=256,
        feat_channels=256,
        anchor_generator=dict(
            scales=[8], ratios=[0.5, 1.0, 2.0], strides=[4, 8, 16, 32, 64]
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
            allowed_border=-1,
        )
    ),
    test_cfg=dict(
        rpn=dict(
            nms_pre=2000,
            max_per_img=1000,
            nms=dict(iou_threshold=0.7),
            min_bbox_size=0,
        )
    ),
)
