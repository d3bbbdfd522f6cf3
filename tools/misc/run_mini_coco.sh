#!/usr/bin/env bash
# Mini-COCO 40+40 two-task regression run (real JPEGs + real COCO json
# through the full pipeline at the reference's (1333,800)/batch-4 COCO
# shapes; see tools/misc/make_mini_coco.py and
# cl_faster_rcnn_cfgs/mini_coco/). Produces the BENCHMARKS.md COCO
# accuracy table. Single TPU claim — do not run anything else on the chip.
set -e
cd "$(dirname "$0")/../.."

[ -d data/mini_coco/train2017 ] || python tools/misc/make_mini_coco.py

# task 1 (first 40 COCO classes). The axon dev harness's remote worker
# occasionally dies mid-run ("TPU worker process crashed", no
# diagnostics); task 1 checkpoints every epoch, so retry-with-resume
# makes forward progress through flakes.
for attempt in $(seq 1 30); do
  python tools/train.py cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_1.py --resume && break
  echo "task-1 attempt $attempt crashed; resuming" >&2
  sleep 10
done

# task 2: teacher + RePRE + EWC + NSGP on top of task-1 artifacts.
# Resume IS supported for task>1 here (unlike the reference,
# nsrunner:551): the teacher / NSGP transforms / prototypes / EWC rows
# are all rebuilt deterministically from task-1's on-disk artifacts at
# startup, so a crash only needs the loop state back (runner.py
# _try_resume).
for attempt in $(seq 1 10); do
  python tools/train.py cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_2.py --resume && break
  echo "task-2 attempt $attempt crashed; resuming" >&2
  sleep 10
done

# final eval over all 80 classes + per-image detections dump
BEST=$(ls work_dirs/mini_coco/mini_coco_40_40_2/best_*.npz | head -1)
python tools/test.py cl_faster_rcnn_cfgs/mini_coco/mini_coco_40_40_2.py "$BEST" \
  --out work_dirs/mini_coco/mini_coco_40_40_2/detections.pkl
