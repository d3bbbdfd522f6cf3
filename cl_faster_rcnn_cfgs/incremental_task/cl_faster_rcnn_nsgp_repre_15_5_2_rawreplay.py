# NSGP-RePRE VOC 15+5 task 2, raw-feature replay ablation
# (StandardRoIReplayHead: 64 stored RoI feats/step distilled against the
# frozen teacher with MSE, standard_roi_replay_head.py:53-104)
_base_ = [
    "../_base_/models/faster-rcnn_r50_fpn.py",
    "../_base_/datasets/voc_15_5_task2_2007.py",
    "../_base_/schedules/schedule_1x_sgdnscl.py",
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
        type="StandardRoIReplayHead",
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

work_dir = "./work_dirs/ns3_split_id/cl_faster_rcnn_ns3_split_id_15_5_2_rawreplay"
