"""End-to-end incremental pipeline test on a synthetic COCO dataset.

The COCO analogue of tests/test_pipeline.py: the full two-task
NSGP-RePRE protocol driven through NullSpaceRunner with
``CocoTaskDataset`` (category-id → contiguous-label mapping, task-range
filtering, crowd → ignore) and the ``CocoMetric`` val path
(eval_coco_map) — i.e. exactly the wiring the mini-COCO 40+40 run
exercises at real shapes (reference protocol:
cl_faster_rcnn_cfgs/cl_coco/cl_faster_rcnn_ns2_split_id_40_40_{1,2}.py,
mmdet/datasets/coco_task.py:176-230).

The VOC pipeline test covers the runner machinery; this one pins the
COCO-specific glue (dataset build keys, seen-classes val split, COCO
scorer in runner.val) so a COCO-format run can't break silently.
"""
import json
import os
import os.path as osp

import numpy as np
import pytest

from nsgp_repre_tpu.utils.config import Config


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import cv2

    from nsgp_repre_tpu.datasets.coco import COCO_CLASSES

    root = tmp_path_factory.mktemp("coco")
    (root / "train").mkdir()
    rng = np.random.RandomState(0)
    cats = [
        {"id": i * 7 + 3, "name": n} for i, n in enumerate(COCO_CLASSES)
    ]  # non-contiguous ids like real COCO
    images, annotations = [], []
    aid = 1
    for i in range(8):
        fname = f"{i:06d}.jpg"
        cv2.imwrite(
            str(root / "train" / fname),
            rng.randint(0, 255, (60, 80, 3), np.uint8),
        )
        images.append(dict(id=i + 1, file_name=fname, width=80, height=60))
        # one task-1 object (label < 40) and one task-2 object (>= 40)
        # per image, so both task filters keep every image
        for label, bbox in (
            (i % 4, [8.0, 8.0, 32.0, 32.0]),
            (40 + i % 4, [34.0, 20.0, 36.0, 30.0]),
        ):
            annotations.append(
                dict(
                    id=aid, image_id=i + 1,
                    category_id=cats[label]["id"],
                    bbox=bbox, area=bbox[2] * bbox[3], iscrowd=0,
                )
            )
            aid += 1
    # one crowd box → the ignore path
    annotations.append(
        dict(id=aid, image_id=1, category_id=cats[0]["id"],
             bbox=[1.0, 1.0, 20.0, 20.0], area=400.0, iscrowd=1)
    )
    (root / "ann.json").write_text(
        json.dumps(dict(images=images, annotations=annotations, categories=cats))
    )
    return str(root)


def make_cfg(coco_root, work_root, task_id):
    split = [0, 40, 80]
    ds = dict(
        type="CocoTaskDataset",
        data_root=coco_root,
        ann_file="ann.json",
        data_prefix=dict(img="train/"),
        task_split=split,
        task_id=task_id,
    )
    # val over all classes seen so far (reference eval protocol)
    val_ds = dict(
        type="CocoTaskDataset",
        data_root=coco_root,
        ann_file="ann.json",
        data_prefix=dict(img="train/"),
        task_split=[0, split[task_id]],
        task_id=1,
        test_mode=True,
    )
    return Config.wrap(
        dict(
            task_id=task_id,
            train_task_split=split,
            offset=0.0,
            ignore_keys=["rpn", "roi_head"],
            previous_dir=osp.join(work_root, f"task_{task_id - 1}"),
            ckpt_keywords="best",
            max_prototype=3,
            rr_thresh=[0.05, 0.1],  # low thresholds so pseudo-labels flow
            img_scale=(100, 60),
            seed=0,
            model=dict(
                type="FasterRCNNRoIReplay",
                backbone=dict(stage_blocks=(1, 1, 1, 1)),
                roi_head=dict(
                    type="StandardMultiPrototypeReplayHead",
                    bbox_head=dict(num_classes=80),
                ),
                train_cfg=dict(
                    rpn=dict(sampler=dict(num=16)),
                    rpn_proposal=dict(nms_pre=64, max_per_img=32),
                    rcnn=dict(sampler=dict(num=16)),
                ),
                test_cfg=dict(rcnn=dict(max_per_img=8)),
            ),
            train_dataloader=dict(batch_size=2, dataset=ds),
            val_dataloader=dict(batch_size=2, dataset=val_ds),
            train_cfg=dict(max_epochs=1),
            optim_wrapper=dict(optimizer=dict(type="SGDNSCL", lr=0.001)),
            val_evaluator=dict(type="CocoMetric", metric="bbox"),
            work_dir=osp.join(work_root, f"task_{task_id}"),
        )
    )


def test_two_task_coco_pipeline(coco_root, tmp_path):
    from nsgp_repre_tpu.engine.runner import NullSpaceRunner
    from nsgp_repre_tpu.utils import checkpoint as ckpt_io

    work_root = str(tmp_path / "work")

    # ---- task 1 (first 40 classes) ----
    cfg1 = make_cfg(coco_root, work_root, task_id=1)
    r1 = NullSpaceRunner(cfg1)
    assert r1.teacher_params is None
    # the task filter kept only task-1 labels
    for rec in r1.train_dataset.records:
        assert (rec["labels"] < 40).all()
    r1.train()
    wd1 = cfg1["work_dir"]
    assert osp.exists(osp.join(wd1, "covariance.npz"))
    assert osp.exists(osp.join(wd1, "rois_etc.npz"))
    assert any(f.startswith("best_") for f in os.listdir(wd1))
    rois = ckpt_io.load_rois_etc(wd1)
    # stored features come from task-1 classes (or bg=80 for padding)
    assert ((rois[1] < 40) | (rois[1] == 80)).all()

    # ---- task 2: teacher + NSGP + EWC + RePRE on classes 40-79 ----
    cfg2 = make_cfg(coco_root, work_root, task_id=2)
    r2 = NullSpaceRunner(cfg2)
    assert r2.teacher_params is not None
    assert r2.state.replay_feats is not None
    assert len(r2.ewc_terms) > 0
    for rec in r2.train_dataset.records:
        assert ((rec["labels"] >= 40) & (rec["labels"] < 80)).all()
    r2.train()
    # merged artifacts grew across the task boundary
    rois2 = ckpt_io.load_rois_etc(cfg2["work_dir"])
    assert len(rois2[0]) > len(rois[0])
    # val over all 80 seen classes through the COCO scorer
    mAP = r2.val()
    assert np.isfinite(mAP)
