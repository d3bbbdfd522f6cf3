# COCO 40+40 task 2 dataset config (reference
# _base_/datasets/coco_detection_40_40_task2.py)
dataset_type = "CocoTaskDataset"
data_root = "data/coco/"
img_scale = (1333, 800)

task_id = 2
train_task_split = [0, 40, 80]
val_task_split = [0, 80]

train_dataloader = dict(
    # GLOBAL batch (this loader's convention): the reference trains
    # 2 GPUs x batch_size=8 (coco_detection_40_40_task2.py:40,
    # train_list.sh:1) = 16 images per step
    batch_size=16,
    dataset=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file="annotations/instances_train2017.json",
        data_prefix=dict(img="train2017/"),
        task_split=train_task_split,
        task_id=task_id,
    ),
)
val_dataloader = dict(
    batch_size=4,
    dataset=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file="annotations/instances_val2017.json",
        data_prefix=dict(img="val2017/"),
        task_split=val_task_split,
        task_id=1,
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
val_evaluator = dict(type="CocoMetric", metric="bbox")
test_evaluator = val_evaluator
