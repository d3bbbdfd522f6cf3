# NSGP-RePRE mini-VOC 15+5 task 1 — the offline real-data regression run.
#
# Same protocol as incremental_task/cl_faster_rcnn_nsgp_repre_15_5_1.py,
# pointed at the generated mini-VOC dataset (tools/misc/make_mini_voc.py;
# real JPEGs + XML, full pipeline). Two deviations, both forced by the
# offline environment (no ImageNet checkpoint is available):
#   - backbone trains from scratch: frozen_stages=-1 (the reference's
#     frozen_stages=1/norm_eval assume pretrained weights)
#   - warmup shortened to 100 iters and milestones late (48 steps/epoch
#     at batch 16; the 500-iter warmup of schedule_1x would span ~10
#     epochs here)
_base_ = ["../incremental_task/cl_faster_rcnn_nsgp_repre_15_5_1.py"]

data_root = "data/mini_voc/VOCdevkit"

# list elements replace on merge (mmengine semantics) — restate the
# full leaf dataset dict
train_dataloader = dict(
    dataset=dict(dataset=dict(datasets=[dict(
        type="VOCTask",
        data_root=data_root,
        ann_file="VOC2007/ImageSets/Main/trainval.txt",
        data_prefix=dict(sub_data_root="VOC2007/"),
        task_split=[0, 15, 20],
        task_id=1,
        filter_cfg=dict(filter_empty_gt=True, min_size=5, bbox_min_size=5),
    )]))
)
val_dataloader = dict(dataset=dict(data_root=data_root))
test_dataloader = val_dataloader

model = dict(backbone=dict(frozen_stages=-1))

train_cfg = dict(max_epochs=30)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=100),
    dict(type="MultiStepLR", begin=0, end=30, by_epoch=True,
         milestones=[20, 26], gamma=0.1),
]

previous_dir = None
work_dir = "./work_dirs/mini_voc/mini_voc_15_5_1"

# from-scratch training at lr 0.02 diverges once warmup completes
# (NaN at epoch ~6 on the first run); halve the LR, stretch warmup and
# clip gradients (the reference uses clip_grad for its from-scratch
# ablations too)
optim_wrapper = dict(
    optimizer=dict(lr=0.01),
    clip_grad=dict(max_norm=35, norm_type=2),
)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=200),
    dict(type="MultiStepLR", begin=0, end=30, by_epoch=True,
         milestones=[20, 26], gamma=0.1),
]
