#!/usr/bin/env python
"""Generate mini-COCO: a small, fully offline COCO-format detection
dataset over the real 80 COCO class names, built with the same
real-material compositor as mini-VOC (tools/misc/make_mini_voc.py —
matplotlib's grace_hopper.jpg for 'person', labmaze photographic
textures × shape masks × hue/saturation shifts for the other 79).

Why it exists: the environment has no network egress, so COCO2017
cannot be downloaded. This dataset is the strongest real-data
substitute available: real JPEG encode/decode, real COCO json
annotations (xywh boxes, areas, iscrowd), the full (1333, 800)
resize/flip/pad pipeline, multi-epoch convergence and the incremental
40+40 protocol (CocoTaskDataset filtering, teacher pseudo-labels,
COCO-protocol mAP via the oracle-validated scorer) all run end-to-end
on it. Reference protocol: /root/reference/cl_faster_rcnn_cfgs/cl_coco/
cl_faster_rcnn_ns2_split_id_40_40_{1,2}.py and
/root/reference/mmdet/datasets/coco_task.py:176-230.

Images mix classes from both task halves freely (as real COCO does);
task filtering happens in the dataset layer, so task-2 objects present
in task-1 images correctly become background.

A small fraction of annotations are emitted as iscrowd=1 to exercise
the COCO evaluator's crowd-ignore path end-to-end.

Usage:
    python tools/misc/make_mini_coco.py [--root data/mini_coco]
        [--train 640] [--val 160] [--seed 7]
"""
from __future__ import annotations

import argparse
import json
import os
import os.path as osp
import sys

import cv2
import numpy as np

sys.path.insert(0, osp.dirname(__file__))
from make_mini_voc import ClassLibrary, compose_scene  # noqa: E402

sys.path.insert(0, osp.join(osp.dirname(__file__), "..", ".."))
from nsgp_repre_tpu.datasets.coco import COCO_CLASSES  # noqa: E402

PERSON_IDX = COCO_CLASSES.index("person")  # 0


def generate(root: str, n_train: int, n_val: int, seed: int):
    rng = np.random.RandomState(seed)
    lib = ClassLibrary(rng, n_classes=80, person_idx=PERSON_IDX)

    counts = np.zeros(80, np.int64)
    img_id = 0
    ann_id = 0
    for split, n in (("train2017", n_train), ("val2017", n_val)):
        img_dir = osp.join(root, split)
        os.makedirs(img_dir, exist_ok=True)
        os.makedirs(osp.join(root, "annotations"), exist_ok=True)
        images, annotations = [], []
        for k in range(n):
            # round-robin a guaranteed class so every class appears in
            # both splits (80-way round robin needs n ≥ 80 per split)
            forced = k % 80
            pool = np.concatenate([[forced], rng.randint(0, 80, 8)])
            while True:
                scene, anns = compose_scene(lib, pool, rng)
                if anns:
                    break
            img_id += 1
            name = f"{img_id:012d}.jpg"
            cv2.imwrite(
                osp.join(img_dir, name), scene,
                [cv2.IMWRITE_JPEG_QUALITY, int(rng.uniform(85, 96))],
            )
            h, w = scene.shape[:2]
            images.append(dict(id=img_id, file_name=name, width=w, height=h))
            for cls_idx, x1, y1, x2, y2, difficult in anns:
                counts[cls_idx] += 1
                ann_id += 1
                bw, bh = float(x2 - x1), float(y2 - y1)
                # VOC 'difficult' (tiny objects) has no COCO analogue;
                # mark a small random fraction as crowd instead so the
                # evaluator's iscrowd-ignore path is exercised
                crowd = int(rng.rand() < 0.03)
                annotations.append(dict(
                    id=ann_id, image_id=img_id,
                    category_id=cls_idx + 1,
                    bbox=[float(x1), float(y1), bw, bh],
                    area=bw * bh, iscrowd=crowd,
                ))
        categories = [
            dict(id=i + 1, name=nm, supercategory="object")
            for i, nm in enumerate(COCO_CLASSES)
        ]
        out = dict(
            info=dict(description=f"mini-COCO {split} (offline synthetic"
                      " composite of real photographic material)"),
            images=images, annotations=annotations, categories=categories,
        )
        with open(osp.join(root, "annotations",
                           f"instances_{split}.json"), "w") as f:
            json.dump(out, f)
        print(f"mini-COCO {split}: {n} images, "
              f"{len(annotations)} annotations")
    lo40, hi40 = counts[:40].sum(), counts[40:].sum()
    print(f"instances: task-1 classes (0-39) {lo40}, task-2 (40-79) {hi40}")
    print(f"min instances for a class: {counts.min()} "
          f"({COCO_CLASSES[int(counts.argmin())]})")


if __name__ == "__main__":
    ap = argparse.ArgumentParser()
    ap.add_argument("--root", default="data/mini_coco")
    ap.add_argument("--train", type=int, default=640)
    ap.add_argument("--val", type=int, default=160)
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()
    generate(args.root, args.train, args.val, args.seed)
