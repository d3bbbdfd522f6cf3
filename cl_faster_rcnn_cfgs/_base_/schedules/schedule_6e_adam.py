# 6-epoch Adam
# (reference cl_faster_rcnn_cfgs/_base_/schedules/schedule_6e_adam.py)
train_cfg = dict(type="EpochBasedTrainLoop", max_epochs=6, val_interval=1)
val_cfg = dict(type="ValLoop")
test_cfg = dict(type="TestLoop")

param_scheduler = [
    dict(type="LinearLR", start_factor=0.001, by_epoch=False, begin=0, end=500),
    dict(type="MultiStepLR", begin=0, end=6, by_epoch=True, milestones=[3, 5], gamma=0.1),
]

optim_wrapper = dict(
    type="OptimWrapper",
    optimizer=dict(type="Adam", lr=0.00002, weight_decay=0.0001),
)

auto_scale_lr = dict(enable=False, base_batch_size=16)
