# NSGP-RePRE mini-COCO 40+40 task 1 — the offline real-data COCO
# regression run (see tools/misc/make_mini_coco.py for why COCO2017
# itself is unreachable). Same protocol as
# cl_coco/cl_faster_rcnn_ns2_split_id_40_40_1.py at the real COCO
# shapes ((1333, 800) scale, global batch 16, 80 classes, CocoMetric),
# pointed
# at the generated dataset. Deviations, all forced by the offline
# environment (no ImageNet checkpoint):
#   - backbone trains from scratch: frozen_stages=-1
#   - 24 epochs (vs schedule_1x's 12) to converge from scratch
#   - batch 8/chip + lr 0.005 (see train_dataloader note below)
#     + clip_grad, 200-iter warmup
_base_ = ["../cl_coco/cl_faster_rcnn_ns2_split_id_40_40_1.py"]

data_root = "data/mini_coco/"

# per-chip batch 8 = the reference's own per-device batch
# (2 GPUs x 8): under the axon dev harness the remote worker
# destabilizes after tens of bs-16 executions at the COCO canvas
# (worker crash, no diagnostics — 2026-08-19); bs 8 is stable. lr
# scales linearly: protocol 0.02@16 -> 0.01@8, halved again for
# from-scratch training -> 0.005.
train_dataloader = dict(batch_size=8, dataset=dict(data_root=data_root))
val_dataloader = dict(dataset=dict(data_root=data_root))
test_dataloader = val_dataloader

model = dict(backbone=dict(frozen_stages=-1))

train_cfg = dict(max_epochs=24)
optim_wrapper = dict(
    optimizer=dict(lr=0.005),
    clip_grad=dict(max_norm=35, norm_type=2),
)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=200),
    dict(type="MultiStepLR", begin=0, end=24, by_epoch=True,
         milestones=[16, 21], gamma=0.1),
]

previous_dir = None
work_dir = "./work_dirs/mini_coco/mini_coco_40_40_1"

# The Pallas windowed-DMA RoIAlign destabilizes the TPU worker at the
# COCO canvas + batch 16 (worker crash after ~19 steps; reproduced with
# synthetic data 2026-08-19, under investigation — landscape bs16 with
# roi_align_mode="gather" runs 40+ steps clean). The gather path is the
# reference-exact routing and this run is upload-bound anyway, so the
# kernel choice does not affect wall time here.
roi_align_mode = "gather"
