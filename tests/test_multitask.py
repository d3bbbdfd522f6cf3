"""Multi-task (5+5-style, 4 tasks) model behavior + COCO dataset round trip."""
import json
import os.path as osp

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from nsgp_repre_tpu.models import FasterRCNN
from nsgp_repre_tpu.models.bbox_head import NEG_INF_SCORE, Shared2FCBBoxHeadTask
from nsgp_repre_tpu.testing import demo_det_batch, tiny_detector_config


class TestFourTaskHead:
    def test_mid_task_masking(self):
        # 4 tasks of 2 classes each, currently at task 3
        head = Shared2FCBBoxHeadTask(
            task_split=(0, 2, 4, 6, 8), task_id=3, num_classes=8
        )
        x = jnp.ones((2, 7, 7, 256))
        variables = head.init(jax.random.PRNGKey(0), x)
        cls, reg = head.apply(variables, x)
        assert cls.shape == (2, 9)
        c = np.asarray(cls)
        assert np.isfinite(c[:, :6]).all()  # tasks 1-3 active
        np.testing.assert_allclose(c[:, 6:8], NEG_INF_SCORE)  # task 4 masked
        assert np.isfinite(c[:, 8]).all()  # background
        r = np.asarray(reg)
        np.testing.assert_allclose(r[:, 24:], 0.0)  # task-4 regs zeroed

    def test_detector_task3_loss_and_predict(self):
        cfg = tiny_detector_config(
            num_classes=8, task_split=(0, 2, 4, 6, 8), task_id=3
        )
        model = FasterRCNN(config=cfg)
        batch = demo_det_batch(batch_size=1, num_classes=6, gt_capacity=6)
        variables = model.init(jax.random.PRNGKey(0), batch.images.astype(jnp.float32))
        losses = model.apply(variables, batch, jax.random.PRNGKey(1), method=model.loss)
        assert all(np.isfinite(float(v)) for v in losses.values())
        dets = model.apply(variables, batch, method=model.predict)
        lab = np.asarray(dets.labels)[np.asarray(dets.valid)]
        assert (lab < 6).all()  # no future-task detections

    def test_replay_loss_task3(self):
        cfg = tiny_detector_config(
            num_classes=8, task_split=(0, 2, 4, 6, 8), task_id=3
        )
        model = FasterRCNN(config=cfg)
        batch = demo_det_batch(batch_size=1, num_classes=6, gt_capacity=6)
        variables = model.init(jax.random.PRNGKey(0), batch.images.astype(jnp.float32))
        feats = jnp.asarray(np.random.RandomState(0).randn(4, 7 * 7 * 256), jnp.float32)
        labels = jnp.asarray([0, 1, 2, 3], jnp.int32)  # old-task classes
        loss = model.apply(variables, feats, labels, method=model.replay_loss)
        assert np.isfinite(float(loss)) and float(loss) > 0


@pytest.fixture(scope="module")
def coco_root(tmp_path_factory):
    import cv2

    from nsgp_repre_tpu.datasets.coco import COCO_CLASSES

    root = tmp_path_factory.mktemp("coco")
    (root / "train").mkdir()
    rng = np.random.RandomState(0)
    images, annotations = [], []
    cats = [
        {"id": i * 3 + 1, "name": n} for i, n in enumerate(COCO_CLASSES)
    ]  # non-contiguous ids like real COCO
    name_to_id = {c["name"]: c["id"] for c in cats}
    aid = 1
    for i in range(6):
        fname = f"{i:06d}.jpg"
        cv2.imwrite(str(root / "train" / fname), rng.randint(0, 255, (60, 80, 3), np.uint8))
        images.append(dict(id=i + 1, file_name=fname, width=80, height=60))
        for cls_idx in (i % 50, 40 + i % 40):
            annotations.append(
                dict(
                    id=aid, image_id=i + 1,
                    category_id=name_to_id[COCO_CLASSES[cls_idx]],
                    bbox=[5.0, 5.0, 30.0, 25.0], area=750.0, iscrowd=0,
                )
            )
            aid += 1
    ann = dict(images=images, annotations=annotations, categories=cats)
    (root / "ann.json").write_text(json.dumps(ann))
    return str(root)


class TestCocoEndToEnd:
    def test_task_filtering(self, coco_root):
        from nsgp_repre_tpu.datasets import CocoTaskDataset

        ds = CocoTaskDataset(
            coco_root, "ann.json", img_prefix="train",
            task_split=[0, 40, 80], task_id=1, min_size=0,
        )
        assert len(ds) > 0
        for rec in ds.records:
            assert (rec["labels"] < 40).all()

        ds2 = CocoTaskDataset(
            coco_root, "ann.json", img_prefix="train",
            task_split=[0, 40, 80], task_id=2, min_size=0,
        )
        for rec in ds2.records:
            assert ((rec["labels"] >= 40) & (rec["labels"] < 80)).all()

    def test_loader_and_eval_round_trip(self, coco_root):
        from nsgp_repre_tpu.datasets import CocoTaskDataset, DetLoader
        from nsgp_repre_tpu.evaluation import eval_coco_map

        ds = CocoTaskDataset(
            coco_root, "ann.json", img_prefix="train",
            task_split=[0, 80], task_id=1, min_size=0, test_mode=True,
        )
        loader = DetLoader(ds, batch_size=2, scale=(100, 60), training=False, gt_capacity=8)
        n = sum(len(ids) for _, ids in loader)
        assert n == len(ds)

        # perfect "detections" straight from gt → mAP 1
        dets, anns = [], []
        for rec in ds.records:
            per = {}
            for c in np.unique(rec["labels"]):
                m = rec["labels"] == c
                per[int(c)] = (rec["boxes"][m], np.full(m.sum(), 0.9, np.float32))
            dets.append(per)
            anns.append(dict(boxes=rec["boxes"], labels=rec["labels"]))
        res = eval_coco_map(dets, anns, num_classes=80)
        assert res["mAP"] > 0.99
