# Cascade Mask R-CNN R-50-FPN base model config (reference
# cl_faster_rcnn_cfgs/_base_/models/cascade-mask-rcnn_r50_fpn.py) —
# cascade bbox stages + FCN mask head; builds
# nsgp_repre_tpu.models.cascade.CascadeMaskRCNN.
_base_ = "./cascade-rcnn_r50_fpn.py"
model = dict(
    type="CascadeMaskRCNN",
    roi_head=dict(
        mask_roi_extractor=dict(
            roi_layer=dict(type="RoIAlign", output_size=14, sampling_ratio=0),
            out_channels=256,
            featmap_strides=[4, 8, 16, 32],
        ),
        mask_head=dict(
            type="FCNMaskHead",
            num_convs=4,
            in_channels=256,
            conv_out_channels=256,
            num_classes=80,
        ),
    ),
)
