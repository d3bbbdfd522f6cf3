# teacher-baseline runtime (reference _base_/default_runtime.py)
default_hooks = dict(
    logger=dict(type="LoggerHook", interval=50),
    checkpoint=dict(type="CheckpointHook", interval=1, max_keep_ckpts=1, save_best="auto"),
)
log_level = "INFO"
load_from = None
resume = False
runner_type = "TeacherRunner"

compute_dtype = "bfloat16"
