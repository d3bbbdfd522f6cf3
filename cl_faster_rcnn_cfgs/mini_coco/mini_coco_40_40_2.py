# NSGP-RePRE mini-COCO 40+40 task 2 — the offline real-data COCO
# regression run (see tools/misc/make_mini_coco.py for why COCO2017
# itself is unreachable). Same protocol as
# cl_coco/cl_faster_rcnn_ns2_split_id_40_40_2.py at the real COCO
# shapes ((1333, 800) scale, global batch 16, 80 classes, CocoMetric),
# pointed
# at the generated dataset. Deviations, all forced by the offline
# environment (no ImageNet checkpoint):
#   - backbone trains from scratch: frozen_stages=-1
#   - 24 epochs (vs schedule_1x's 12) to converge from scratch
#   - lr 0.01 (half the protocol 0.02@bs16 — from-scratch training
#     diverges at full lr, same halving as mini-VOC) + clip_grad,
#     200-iter warmup
_base_ = ["../cl_coco/cl_faster_rcnn_ns2_split_id_40_40_2.py"]

data_root = "data/mini_coco/"

train_dataloader = dict(dataset=dict(data_root=data_root))
val_dataloader = dict(dataset=dict(data_root=data_root))
test_dataloader = val_dataloader

model = dict(
    backbone=dict(frozen_stages=-1),
    roi_head=dict(previous_path="./work_dirs/mini_coco/mini_coco_40_40_1"),
)

train_cfg = dict(max_epochs=24)
optim_wrapper = dict(
    optimizer=dict(lr=0.01),
    clip_grad=dict(max_norm=35, norm_type=2),
)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=200),
    dict(type="MultiStepLR", begin=0, end=24, by_epoch=True,
         milestones=[16, 21], gamma=0.1),
]

previous_dir = "./work_dirs/mini_coco/mini_coco_40_40_1"
work_dir = "./work_dirs/mini_coco/mini_coco_40_40_2"
