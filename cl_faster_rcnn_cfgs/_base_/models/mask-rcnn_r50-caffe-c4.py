# Mask R-CNN R-50-caffe-C4 base model config (reference
# cl_faster_rcnn_cfgs/_base_/models/mask-rcnn_r50-caffe-c4.py) — mask
# branch shares the res5 head; builds nsgp_repre_tpu.models.c4.MaskRCNNC4.
model = dict(
    type="MaskRCNNC4",
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
    roi_head=dict(
        type="StandardRoIHead",
        shared_head=dict(type="ResLayer", depth=50, stage=3, stride=2, style="caffe"),
        bbox_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14, sampling_ratio=0),
            out_channels=1024,
            featmap_strides=[16],
        ),
        bbox_head=dict(
            type="BBoxHead",
            with_avg_pool=True,
            roi_feat_size=7,
            in_channels=2048,
            num_classes=80,
            bbox_coder=dict(target_means=[0.0] * 4, target_stds=[0.1, 0.1, 0.2, 0.2]),
            reg_class_agnostic=False,
        ),
        mask_head=dict(
            type="FCNMaskHead",
            num_convs=0,
            in_channels=2048,
            conv_out_channels=256,
            num_classes=80,
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
            mask_size=14,
        ),
    ),
    test_cfg=dict(
        rpn=dict(
            nms_pre=6000, max_per_img=1000, nms=dict(iou_threshold=0.7), min_bbox_size=0
        ),
        rcnn=dict(
            score_thr=0.05, nms=dict(iou_threshold=0.5), max_per_img=100,
            mask_thr_binary=0.5,
        ),
    ),
)
