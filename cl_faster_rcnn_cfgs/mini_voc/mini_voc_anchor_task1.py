# Reference-replica training ANCHOR config (task 1 only) — see
# tools/misc/run_anchor_mini_voc.py. A matched shortened schedule run
# from a SHARED torch-replica init (load_from below): the torch replica
# trains the identical protocol on CPU and final mAP is compared.
# Deviations from mini_voc_15_5_1.py, all mirrored on the torch side
# (the protocol is shrunk the way the reference's own tests shrink
# R50 -> R18, tests/test_models/test_detectors/test_two_stage.py:26):
#   - img_scale (400, 240): keeps the CPU torch run feasible
#   - backbone stage_blocks (1, 1, 1, 1): one bottleneck per stage —
#     full R50 width/strides, 1/4 the depth (the anchor validates the
#     TRAINING MATH, not the full-scale architecture; v2 at full R50
#     depth left only 240 affordable CPU steps — mAP 0.0 on both
#     stacks, which anchors nothing)
#   - repeat=1 (the 15+5 protocol's RepeatDataset(times=3) would triple
#     the CPU torch run; the dataset dict below is restated WITHOUT the
#     RepeatDataset wrapper so both stacks see 160 imgs -> 10 steps/epoch)
#   - 48 epochs, milestones [32, 44] (matched shortened schedule —
#     480 from-scratch steps; v2's 240 never left background-dominant
#     predictions)
#   - loads work_dirs/anchor/torch_init.pth (the shared starting point)
_base_ = ["mini_voc_15_5_1.py"]

img_scale = (400, 240)

model = dict(backbone=dict(stage_blocks=[1, 1, 1, 1], frozen_stages=-1))

data_root = "data/mini_voc/VOCdevkit"
train_dataloader = dict(
    dataset=dict(
        type="VOCTask",
        data_root=data_root,
        ann_file="VOC2007/ImageSets/Main/trainval.txt",
        data_prefix=dict(sub_data_root="VOC2007/"),
        task_split=[0, 15, 20],
        task_id=1,
        filter_cfg=dict(filter_empty_gt=True, min_size=5, bbox_min_size=5),
    ),
    _delete_=True,
    batch_size=16,
)

train_cfg = dict(max_epochs=48)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=100),
    dict(type="MultiStepLR", begin=0, end=48, by_epoch=True,
         milestones=[32, 44], gamma=0.1),
]

load_from = "./work_dirs/anchor/torch_init.pth"
work_dir = "./work_dirs/anchor/jax_task1"
