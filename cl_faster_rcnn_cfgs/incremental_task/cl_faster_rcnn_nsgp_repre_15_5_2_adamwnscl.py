# NSGP-RePRE VOC 15+5 task 2, AdamWNSCL optimizer (decoupled WD,
# AdamW_NSCL.py:87; backbone lr x10 via paramwise custom_keys)
_base_ = [
    "../_base_/models/faster-rcnn_r50_fpn.py",
    "../_base_/datasets/voc_15_5_task2_2007.py",
    "../_base_/schedules/schedule_1x_adamwnscl.py",
    "../_base_/brnsrunetime.py",
]

task_id = 2
train_task_split = [0, 15, 20]

offset = 0.0
ignore_keys = ["rpn", "roi_head"]
previous_dir = "./work_dirs/ns3_split_id/cl_faster_rcnn_ns3_split_id_15_5_1"
ckpt_keywords = "best"

max_prototype = 10
rr_thresh = [0.5, 0.7]

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
            num_classes=20,
        ),
    ),
)

work_dir = "./work_dirs/ns3_split_id/cl_faster_rcnn_ns3_split_id_15_5_2_adamwnscl"
