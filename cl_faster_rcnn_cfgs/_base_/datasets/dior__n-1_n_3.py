# DIOR incremental task 3 (classes 10..15) dataset config
# (reference _base_/datasets/dior__n-1_n_3.py)
dataset_type = "DIORTask"
data_root = "data/DIOR"
img_scale = (800, 800)

task_id = 3
train_task_split = [0, 5, 10, 15, 20]
val_task_split = [0, 15]

train_dataloader = dict(
    batch_size=16,
    dataset=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file="ImageSets/Main/trainval.txt",
        data_prefix=dict(sub_data_root=""),
        task_split=train_task_split,
        task_id=task_id,
    ),
)
val_dataloader = dict(
    batch_size=16,
    dataset=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file="ImageSets/Main/test.txt",
        data_prefix=dict(sub_data_root=""),
        task_split=val_task_split,
        task_id=1,
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
val_evaluator = dict(type="VOCMetric", metric="mAP", eval_mode="11points")
test_evaluator = val_evaluator
