# runtime defaults (reference _base_/brnsrunetime.py)
default_hooks = dict(
    logger=dict(type="LoggerHook", interval=50),
    checkpoint=dict(type="CheckpointHook", interval=1, max_keep_ckpts=1, save_best="auto"),
)
log_level = "INFO"
load_from = None
resume = False
runner_type = "BRNullSpaceRunner"

# TPU compute dtype: bf16 MXU path (mmdet's FP16 row shows identical mAP
# for this model — configs/faster_rcnn/README.md:23); set "float32" for
# exact-parity debugging.
compute_dtype = "bfloat16"
