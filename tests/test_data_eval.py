import os
import os.path as osp

import numpy as np
import pytest

from nsgp_repre_tpu.datasets import DetLoader, VOCTaskDataset
from nsgp_repre_tpu.evaluation import eval_coco_map, eval_voc_map
from nsgp_repre_tpu.utils.config import load_config


class TestVOCDataset:
    def test_task_filtering(self, voc_root):
        ds = VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/trainval.txt",
            task_split=[0, 15, 20], task_id=1,
        )
        for rec in ds.records:
            assert (rec["labels"] < 15).all()
            assert len(rec["labels"]) > 0  # empty images dropped

    def test_task2_filtering(self, voc_root):
        ds = VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/trainval.txt",
            task_split=[0, 15, 20], task_id=2,
        )
        for rec in ds.records:
            assert ((rec["labels"] >= 15) & (rec["labels"] < 20)).all()

    def test_test_mode_keeps_empty(self, voc_root):
        ds_all = VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/test.txt",
            task_split=[0, 20], task_id=1, test_mode=True,
        )
        assert len(ds_all) == 6

    def test_bad_task_id(self, voc_root):
        with pytest.raises(AssertionError):
            VOCTaskDataset(
                voc_root, "VOC2007/ImageSets/Main/test.txt",
                task_split=[0, 20], task_id=2,
            )


class TestLoader:
    def test_batch_shapes_and_buckets(self, voc_root):
        ds = VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/trainval.txt",
            task_split=[0, 20], task_id=1,
        )
        loader = DetLoader(ds, batch_size=2, scale=(100, 60), training=True, gt_capacity=8)
        seen_shapes = set()
        for batch, img_ids in loader:
            assert batch.images.dtype == np.uint8
            seen_shapes.add(batch.images.shape)
            assert batch.gt.boxes.shape == (2, 8, 4)
            # boxes are inside the resized image
            v = batch.gt.valid
            assert (batch.gt.boxes[v][:, 2] <= batch.images.shape[2]).all()
        # two aspect buckets → two static shapes max
        assert len(seen_shapes) <= 2

    def test_threaded_decode_matches_serial(self, voc_root, monkeypatch):
        """The shared decode pool fans each batch row out to worker
        threads; every thread writes only its own row, so the batch
        content must be identical to a single-thread decode."""
        from concurrent.futures import ThreadPoolExecutor

        from nsgp_repre_tpu.datasets import loader as loader_mod

        ds = VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/trainval.txt",
            task_split=[0, 20], task_id=1,
        )

        def batches():
            loader = DetLoader(ds, batch_size=4, scale=(100, 60),
                               training=True, gt_capacity=8)
            loader.set_epoch(0)
            return [(b, ids) for b, ids in loader]

        monkeypatch.setattr(loader_mod, "_DECODE_POOL",
                            ThreadPoolExecutor(max_workers=1))
        serial = batches()
        monkeypatch.setattr(loader_mod, "_DECODE_POOL",
                            ThreadPoolExecutor(max_workers=8))
        threaded = batches()
        assert len(serial) == len(threaded)
        for (b1, ids1), (b2, ids2) in zip(serial, threaded):
            assert list(ids1) == list(ids2)
            np.testing.assert_array_equal(b1.images, b2.images)
            np.testing.assert_array_equal(b1.gt.boxes, b2.gt.boxes)
            np.testing.assert_array_equal(b1.gt.labels, b2.gt.labels)
            np.testing.assert_array_equal(b1.gt.valid, b2.gt.valid)

    def test_deterministic_per_epoch(self, voc_root):
        ds = VOCTaskDataset(
            voc_root, "VOC2007/ImageSets/Main/trainval.txt",
            task_split=[0, 20], task_id=1,
        )
        loader = DetLoader(ds, batch_size=2, scale=(100, 60), training=True)
        loader.set_epoch(0)
        ids1 = [ids for _, ids in loader]
        loader.set_epoch(0)
        ids2 = [ids for _, ids in loader]
        assert ids1 == ids2


class TestVOCMap:
    def test_perfect_detection(self):
        ann = [dict(
            boxes=np.array([[0, 0, 10, 10], [20, 20, 40, 40]], np.float32),
            labels=np.array([0, 1]),
            difficult=np.zeros(2, np.int32),
        )]
        det = [{
            0: (np.array([[0, 0, 10, 10]], np.float32), np.array([0.9])),
            1: (np.array([[20, 20, 40, 40]], np.float32), np.array([0.8])),
        }]
        mean_ap, res = eval_voc_map(det, ann, num_classes=2)
        assert mean_ap > 0.99

    def test_miss_lowers_ap(self):
        ann = [dict(
            boxes=np.array([[0, 0, 10, 10], [50, 50, 60, 60]], np.float32),
            labels=np.array([0, 0]),
            difficult=np.zeros(2, np.int32),
        )]
        det = [{0: (np.array([[0, 0, 10, 10]], np.float32), np.array([0.9]))}]
        mean_ap, _ = eval_voc_map(det, ann, num_classes=1)
        assert 0.3 < mean_ap < 0.7

    def test_difficult_ignored(self):
        ann = [dict(
            boxes=np.array([[0, 0, 10, 10]], np.float32),
            labels=np.array([0]),
            difficult=np.ones(1, np.int32),
        )]
        # no detections, but the only gt is difficult → class has no gts
        mean_ap, res = eval_voc_map([{}], ann, num_classes=1)
        assert res[0]["num_gts"] == 0

    def test_false_positive_only(self):
        ann = [dict(
            boxes=np.array([[0, 0, 10, 10]], np.float32),
            labels=np.array([0]),
            difficult=np.zeros(1, np.int32),
        )]
        det = [{0: (np.array([[50, 50, 60, 60]], np.float32), np.array([0.9]))}]
        mean_ap, _ = eval_voc_map(det, ann, num_classes=1)
        assert mean_ap == 0.0


class TestCocoMap:
    def test_perfect(self):
        ann = [dict(
            boxes=np.array([[0, 0, 50, 50]], np.float32),
            labels=np.array([0]),
        )]
        det = [{0: (np.array([[0, 0, 50, 50]], np.float32), np.array([0.95]))}]
        res = eval_coco_map(det, ann, num_classes=1)
        assert res["mAP"] > 0.99
        assert res["mAP_50"] > 0.99

    def test_loose_box_has_partial_ap(self):
        ann = [dict(boxes=np.array([[0, 0, 100, 100]], np.float32), labels=np.array([0]))]
        # IoU ≈ 0.64 → counts at 0.5/0.55/0.6 but not higher
        det = [{0: (np.array([[0, 0, 80, 80]], np.float32), np.array([0.9]))}]
        res = eval_coco_map(det, ann, num_classes=1)
        assert 0.2 < res["mAP"] < 0.5
        assert res["mAP_50"] > 0.99


class TestConfig:
    def test_base_inheritance(self):
        cfg = load_config(
            "cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_2.py"
        )
        assert cfg.task_id == 2
        assert cfg.train_task_split == [0, 15, 20]
        assert cfg.model.roi_head.type == "StandardMultiPrototypeReplayHead"
        # base model values survive the merge
        assert cfg.model.train_cfg.rcnn.sampler.num == 512
        assert cfg.optim_wrapper.optimizer.type == "SGDNSCL"
        assert cfg.runner_type == "BRNullSpaceRunner"
        assert cfg.rr_thresh == [0.5, 0.7]

    def test_override(self):
        cfg = load_config(
            "cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_1.py",
            overrides=["task_id=5", "model.train_cfg.rcnn.sampler.num=128"],
        )
        assert cfg.task_id == 5
        assert cfg.model.train_cfg.rcnn.sampler.num == 128

    def test_detector_config_mapping(self):
        from nsgp_repre_tpu.engine.runner import detector_config_from_cfg

        cfg = load_config(
            "cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_2.py"
        )
        det = detector_config_from_cfg(cfg)
        assert det.num_classes == 20
        assert det.task_split == (0, 15, 20)
        assert det.task_id == 2
        assert det.rpn_thresh == 0.5 and det.roi_thresh == 0.7
        assert det.rcnn_num == 512


class TestMoreConfigs:
    def test_dior_config(self):
        cfg = load_config("cl_faster_rcnn_cfgs/_base_/datasets/dior__n-1_n_2.py")
        assert cfg.task_id == 2
        assert cfg.train_task_split == [0, 5, 10, 15, 20]
        assert cfg.train_dataloader.dataset.type == "DIORTask"

    def test_joint_config(self):
        cfg = load_config(
            "cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_joint_voc20.py"
        )
        assert "joint" in cfg.work_dir
        assert cfg.train_task_split == [0, 20]

    def test_coco_leaf_config(self):
        cfg = load_config(
            "cl_faster_rcnn_cfgs/cl_coco/cl_faster_rcnn_ns2_split_id_40_40_2.py"
        )
        assert cfg.task_id == 2
        assert cfg.model.roi_head.bbox_head.num_classes == 80
        assert cfg.reserve_per_class == 50
        assert cfg.train_cfg.max_epochs == 12
        from nsgp_repre_tpu.engine.runner import detector_config_from_cfg

        det = detector_config_from_cfg(cfg)
        assert det.num_classes == 80
        assert det.task_split == (0, 40, 80)
