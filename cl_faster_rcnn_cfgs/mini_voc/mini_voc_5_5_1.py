# NSGP-RePRE mini-VOC 5+5 task 1 — first task of the FOUR-task chain
# (reference protocol: cl_faster_rcnn_cfgs/incremental_task/
# cl_faster_rcnn_nsgp_repre_5_5_{1..4}.py + train_list.sh sequencing).
# Same offline-environment deviations as mini_voc_15_5_1.py:
# from-scratch backbone, lr 0.01 + clip_grad, 200-iter warmup.
_base_ = ["../incremental_task/cl_faster_rcnn_nsgp_repre_5_5_1.py"]

data_root = "data/mini_voc/VOCdevkit"

# list elements replace on merge (mmengine semantics) — restate the
# full leaf dataset dict
train_dataloader = dict(
    dataset=dict(dataset=dict(datasets=[dict(
        type="VOCTask",
        data_root=data_root,
        ann_file="VOC2007/ImageSets/Main/trainval.txt",
        data_prefix=dict(sub_data_root="VOC2007/"),
        task_split=[0, 5, 10, 15, 20],
        task_id=1,
        filter_cfg=dict(filter_empty_gt=True, min_size=5, bbox_min_size=5),
    )]))
)
val_dataloader = dict(dataset=dict(data_root=data_root))
test_dataloader = val_dataloader

model = dict(backbone=dict(frozen_stages=-1))

train_cfg = dict(max_epochs=30)
optim_wrapper = dict(
    optimizer=dict(lr=0.01),
    clip_grad=dict(max_norm=35, norm_type=2),
)
param_scheduler = [
    # ~5 steps/epoch at batch 16 (67-95 imgs/task after task filtering):
    # a 200-iter warmup would span 40 epochs, so warm up over 50
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=50),
    dict(type="MultiStepLR", begin=0, end=30, by_epoch=True,
         milestones=[20, 26], gamma=0.1),
]

previous_dir = None
work_dir = "./work_dirs/mini_voc/mini_voc_5_5_1"
