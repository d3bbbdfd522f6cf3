# Faster R-CNN R-50-caffe-DC5 base model config (reference
# cl_faster_rcnn_cfgs/_base_/models/faster-rcnn_r50-caffe-dc5.py) —
# dilated stage 5, single stride-16 level; builds
# nsgp_repre_tpu.models.c4.FasterRCNNDC5.
model = dict(
    type="FasterRCNNDC5",
    data_preprocessor=dict(
        mean=[103.530, 116.280, 123.675],
        std=[1.0, 1.0, 1.0],
        bgr_to_rgb=False,
        pad_size_divisor=32,
    ),
    backbone=dict(
        type="ResNet",
        depth=50,
        num_stages=4,
        strides=(1, 2, 2, 1),
        dilations=(1, 1, 1, 2),
        out_indices=(3,),
        frozen_stages=1,
        norm_eval=True,
        style="caffe",
        init_cfg=dict(type="Pretrained", checkpoint=None),
    ),
    rpn_head=dict(
        type="RPNHead",
        in_channels=2048,
        feat_channels=2048,
        anchor_generator=dict(
            scales=[2, 4, 8, 16, 32], ratios=[0.5, 1.0, 2.0], strides=[16]
        ),
        bbox_coder=dict(target_means=[0.0] * 4, target_stds=[1.0] * 4),
    ),
    roi_head=dict(
        type="StandardRoIHead",
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=7, sampling_ratio=0),
            out_channels=2048,
            featmap_strides=[16],
        ),
        bbox_head=dict(
            type="Shared2FCBBoxHead",
            in_channels=2048,
            fc_out_channels=1024,
            roi_feat_size=7,
            num_classes=80,
            bbox_coder=dict(target_means=[0.0] * 4, target_stds=[0.1, 0.1, 0.2, 0.2]),
            reg_class_agnostic=False,
        ),
    ),
    train_cfg=dict(
        rpn=dict(
            assigner=dict(
                pos_iou_thr=0.7, neg_iou_thr=0.3, min_pos_iou=0.3,
                match_low_quality=True,
            ),
            sampler=dict(num=256, pos_fraction=0.5, add_gt_as_proposals=False),
        ),
        rpn_proposal=dict(
            nms_pre=12000, max_per_img=2000, nms=dict(iou_threshold=0.7), min_bbox_size=0
        ),
        rcnn=dict(
            assigner=dict(
                pos_iou_thr=0.5, neg_iou_thr=0.5, min_pos_iou=0.5,
                match_low_quality=False,
            ),
            sampler=dict(num=512, pos_fraction=0.25, add_gt_as_proposals=True),
        ),
    ),
    test_cfg=dict(
        rpn=dict(
            nms_pre=6000, max_per_img=1000, nms=dict(iou_threshold=0.7), min_bbox_size=0
        ),
        rcnn=dict(score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=100),
    ),
)
