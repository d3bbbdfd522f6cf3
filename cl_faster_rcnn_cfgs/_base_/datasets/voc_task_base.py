# shared VOC task dataset template (reference voc_*_task*_2007.py shape)
dataset_type = "VOCTask"
data_root = "data/VOCdevkit"
img_scale = (1000, 600)

# task_id / train_task_split are set by the leaf dataset config
task_id = 1
train_task_split = [0, 20]

train_dataloader = dict(
    batch_size=16,
    dataset=dict(
        type="RepeatDataset",
        times=3,
        dataset=dict(
            type="ConcatDataset",
            datasets=[
                dict(
                    type=dataset_type,
                    data_root=data_root,
                    ann_file="VOC2007/ImageSets/Main/trainval.txt",
                    data_prefix=dict(sub_data_root="VOC2007/"),
                    task_split=train_task_split,
                    task_id=task_id,
                    filter_cfg=dict(filter_empty_gt=True, min_size=5, bbox_min_size=5),
                )
            ],
        ),
    ),
)

val_dataloader = dict(
    batch_size=16,
    dataset=dict(
        type=dataset_type,
        data_root=data_root,
        ann_file="VOC2007/ImageSets/Main/test.txt",
        data_prefix=dict(sub_data_root="VOC2007/"),
        task_split=[0, train_task_split[task_id]],
        task_id=1,
        test_mode=True,
    ),
)
test_dataloader = val_dataloader
val_evaluator = dict(type="VOCMetric", metric="mAP", eval_mode="11points")
test_evaluator = val_evaluator
