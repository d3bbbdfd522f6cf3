# NSGP-RePRE COCO 70+10 task 1 (ns3 variant; reference
# cl_faster_rcnn_cfgs/cl_coco/cl_faster_rcnn_ns3_split_id_70_10_1.py)
_base_ = [
    "../_base_/models/faster-rcnn_r50_fpn.py",
    "../_base_/datasets/coco_detection_70_10_task1.py",
    "../_base_/schedules/schedule_1x_sgdnscl.py",
    "../_base_/brnsrunetime.py",
]

task_id = 1
train_task_split = [0, 70, 80]

offset = 0.0
ignore_keys = ["rpn", "roi_head"]
previous_dir = "./work_dirs/ns3_coco/cl_faster_rcnn_ns3_split_id_70_10_0"
ckpt_keywords = "best"

max_prototype = 10
rr_thresh = [0.5, 0.7]
reserve_per_class = 50

train_cfg = dict(max_epochs=12)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=500),
    dict(type="MultiStepLR", begin=0, end=12, by_epoch=True, milestones=[8, 11], gamma=0.1),
]

model = dict(
    type="FasterRCNNRoIReplay",
    roi_head=dict(
        type="StandardMultiPrototypeReplayHead",
        previous_path=previous_dir,
        task_id=task_id,
        task_split=train_task_split,
        max_prototype=max_prototype,
        bbox_head=dict(
            type="Shared2FCBBoxHeadTask",
            task_id=task_id,
            task_split=train_task_split,
            num_classes=80,
        ),
    ),
)

work_dir = "./work_dirs/ns3_coco/cl_faster_rcnn_ns3_split_id_70_10_1"
