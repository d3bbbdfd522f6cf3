#!/usr/bin/env bash
# Mini-VOC 15+5 two-task regression run (real JPEGs through the full
# pipeline; see tools/misc/make_mini_voc.py and
# cl_faster_rcnn_cfgs/mini_voc/). Produces the README accuracy table
# numbers. Single TPU claim — do not run anything else on the chip.
set -e
cd "$(dirname "$0")/../.."

[ -d data/mini_voc/VOCdevkit ] || python tools/misc/make_mini_voc.py

# task 1 (resumes from work_dirs/mini_voc/mini_voc_15_5_1/resume_state.npz
# if a previous attempt was interrupted)
python tools/train.py cl_faster_rcnn_cfgs/mini_voc/mini_voc_15_5_1.py --resume

# task 2: teacher + RePRE + EWC + NSGP on top of task-1 artifacts
python tools/train.py cl_faster_rcnn_cfgs/mini_voc/mini_voc_15_5_2.py

# final eval over all 20 seen classes + per-image detections dump
BEST=$(ls work_dirs/mini_voc/mini_voc_15_5_2/best_*.npz | head -1)
python tools/test.py cl_faster_rcnn_cfgs/mini_voc/mini_voc_15_5_2.py "$BEST" \
  --out work_dirs/mini_voc/mini_voc_15_5_2/detections.pkl
