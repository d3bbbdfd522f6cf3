# Joint (non-incremental) VOC 20-class training — the upper-bound
# baseline; "joint" in work_dir disables the teacher (nsrunner:529).
_base_ = [
    "../_base_/models/faster-rcnn_r50_fpn.py",
    "../_base_/datasets/voc_20_task1_2007.py",
    "../_base_/schedules/schedule_1x_sgdnscl.py",
    "../_base_/brnsrunetime.py",
]

task_id = 1
train_task_split = [0, 20]
offset = 0.0
ignore_keys = ["rpn", "roi_head"]
ckpt_keywords = "best"

model = dict(
    type="FasterRCNNRoIReplay",
    roi_head=dict(
        type="StandardMultiPrototypeReplayHead",
        bbox_head=dict(
            type="Shared2FCBBoxHeadTask",
            task_id=1,
            task_split=train_task_split,
            num_classes=20,
        ),
    ),
)

work_dir = "./work_dirs/joint/cl_faster_rcnn_joint_voc20"
