#!/usr/bin/env bash
# Mini-COCO 40+40 two-task regression run (real JPEGs + real COCO json
# through the full pipeline at the reference's (1333,800)/batch-4 COCO
# shapes; see tools/misc/make_mini_coco.py and
# cl_faster_rcnn_cfgs/mini_coco/). Produces the BENCHMARKS.md COCO
# accuracy table. Single TPU claim — do not run anything else on the chip.
set -e
cd "$(dirname "$0")/../.."

[ -d data/mini_coco/train2017 ] || python tools/misc/make_mini_coco.py

# task 1 (first 40 COCO classes)
python tools/train.py cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_1.py --resume

# task 2: teacher + RePRE + EWC + NSGP on top of task-1 artifacts
python tools/train.py cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_2.py

# final eval over all 80 classes + per-image detections dump
BEST=$(ls work_dirs/mini_coco/mini_coco_40_40_2/best_*.npz | head -1)
python tools/test.py cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_2.py "$BEST" \
  --out work_dirs/mini_coco/mini_coco_40_40_2/detections.pkl
