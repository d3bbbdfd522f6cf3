#!/usr/bin/env python
"""Old/new class AP split from a tools/test.py --out detections dump.

The incremental protocol's headline quality claim is RETENTION: how much
AP the final model keeps on the classes of earlier tasks (reference
evaluates all-seen-classes mAP per task — voc_15_5_task2_2007.py:4-6 —
and the paper reports per-group splits). This recomputes per-class AP
offline from detections.pkl + the config's val dataset and prints the
mean AP of each task's class group.

  python tools/analysis_tools/class_split_ap.py \
      cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_2.py \
      work_dirs/mini_coco/mini_coco_40_40_2/detections.pkl \
      --boundaries 40
  python tools/analysis_tools/class_split_ap.py \
      cl_faster_rcnn_cfgs/mini_voc/mini_voc_5_5_4.py \
      work_dirs/mini_voc/mini_voc_5_5_4/detections.pkl \
      --boundaries 5 10 15

Runs host-side only (numpy eval; no TPU claim).
"""
from __future__ import annotations

import argparse
import os.path as osp
import pickle
import sys

import numpy as np

ROOT = osp.join(osp.dirname(osp.abspath(__file__)), "..", "..")
sys.path.insert(0, ROOT)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("config")
    ap.add_argument("detections")
    ap.add_argument(
        "--boundaries", type=int, nargs="+", required=True,
        help="class-group boundaries, e.g. 40 for 40+40; 5 10 15 for 5+5x4",
    )
    args = ap.parse_args()

    from nsgp_repre_tpu.engine.runner import _leaf_dataset, build_dataset
    from nsgp_repre_tpu.utils.config import load_config

    cfg = load_config(args.config)
    ds = build_dataset(_leaf_dataset(cfg["val_dataloader"]["dataset"]))
    num_classes = cfg.get_nested("model.roi_head.bbox_head.num_classes") or len(
        getattr(ds, "classes", [])
    )
    by_id = {r["img_id"]: r for r in ds.records}

    with open(args.detections, "rb") as f:
        dumped = pickle.load(f)

    detections, annotations = [], []
    for d in dumped:
        r = by_id[d["img_id"]]
        per_cls = {}
        for c in range(num_classes):
            m = d["labels"] == c
            per_cls[c] = (d["boxes"][m], d["scores"][m])
        detections.append(per_cls)
        annotations.append(
            dict(
                boxes=r["boxes"],
                labels=r["labels"],
                difficult=r.get("difficult"),
                ignore_boxes=r.get("ignore_boxes"),
                iscrowd=r.get("iscrowd"),
            )
        )

    metric = cfg.get("val_evaluator", {}).get("type", "VOCMetric")
    if metric == "CocoMetric":
        from nsgp_repre_tpu.evaluation.coco_map import eval_coco_map

        res = eval_coco_map(detections, annotations, num_classes)
        per_class = res["per_class_mAP"]
        print(f"overall mAP {res['mAP']:.4f}  mAP@50 {res['mAP_50']:.4f}")
    else:
        from nsgp_repre_tpu.evaluation.voc_map import eval_voc_map

        mode = cfg.get("val_evaluator", {}).get("eval_mode", "11points")
        mean_ap, results = eval_voc_map(
            detections, annotations, num_classes, mode=mode
        )
        per_class = np.asarray(
            [r["ap"] if r["num_gts"] > 0 else np.nan for r in results]
        )
        print(f"overall mAP ({mode}) {mean_ap:.4f}")

    names = getattr(ds, "classes", [str(i) for i in range(num_classes)])
    for c, a in enumerate(per_class):
        print(f"  {names[c]:16s} {'--' if np.isnan(a) else f'{a:.4f}'}")

    edges = [0] + sorted(args.boundaries) + [num_classes]
    for lo, hi in zip(edges[:-1], edges[1:]):
        if lo >= hi:
            continue
        grp = per_class[lo:hi]
        grp = grp[~np.isnan(grp)]
        print(
            f"classes [{lo},{hi}): mean AP "
            f"{'--' if not len(grp) else f'{grp.mean():.4f}'} ({len(grp)} classes with gt)"
        )


if __name__ == "__main__":
    main()
