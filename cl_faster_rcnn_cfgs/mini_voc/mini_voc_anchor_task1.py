# Reference-replica training ANCHOR config (task 1 only) — see
# tools/misc/run_anchor_mini_voc.py. A matched shortened schedule run
# from a SHARED torch-replica init (load_from below): the torch replica
# trains the identical protocol on CPU and final mAP is compared.
# Deviations from mini_voc_15_5_1.py, all mirrored on the torch side:
#   - img_scale (500, 300): keeps the CPU torch run feasible (~1h)
#   - 10 epochs, milestone [8] (matched shortened schedule)
#   - loads work_dirs/anchor/torch_init.pth (the shared starting point)
_base_ = ["mini_voc_15_5_1.py"]

img_scale = (500, 300)

train_cfg = dict(max_epochs=10)
param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=100),
    dict(type="MultiStepLR", begin=0, end=10, by_epoch=True,
         milestones=[8], gamma=0.1),
]

load_from = "./work_dirs/anchor/torch_init.pth"
work_dir = "./work_dirs/anchor/jax_task1"
