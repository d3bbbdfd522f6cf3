# VOC 10+10 task 1 dataset config
_base_ = ["voc_task_base.py"]

task_id = 1
train_task_split = [0, 10, 20]
val_task_split = [0, 10]

train_dataloader = dict(
    dataset=dict(dataset=dict(datasets=[dict(task_split=train_task_split, task_id=task_id)]))
)
val_dataloader = dict(dataset=dict(task_split=val_task_split, task_id=1))
test_dataloader = val_dataloader
