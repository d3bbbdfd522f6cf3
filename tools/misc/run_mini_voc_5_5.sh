#!/usr/bin/env bash
# Mini-VOC 5+5 FOUR-task chain regression run (real JPEGs through the
# full pipeline; see tools/misc/make_mini_voc.py and
# cl_faster_rcnn_cfgs/mini_voc/mini_voc_5_5_*.py). Mirrors the
# reference's train_list.sh sequencing of
# cl_faster_rcnn_nsgp_repre_5_5_{1..4}.py: each task trains on 5 new
# classes while covariance / rois_etc / EWC / mask artifacts accumulate
# across ≥3 merges — the depth the two-task runs never exercise.
# Produces the BENCHMARKS.md 4-row accuracy table.
# Single TPU claim — do not run anything else on the chip.
set -e
cd "$(dirname "$0")/../.."

[ -d data/mini_voc/VOCdevkit ] || python tools/misc/make_mini_voc.py

# task 1 (resumes from work_dirs/.../resume_state.npz if interrupted).
# The axon dev harness's remote worker occasionally dies mid-run; task 1
# checkpoints every epoch, so retry-with-resume makes forward progress
# through flakes (same guard as run_mini_coco.sh).
for attempt in $(seq 1 10); do
  python tools/train.py cl_faster_rcnn_cfgs/mini_voc/mini_voc_5_5_1.py --resume && break
  echo "task-1 attempt $attempt crashed; resuming" >&2
  sleep 10
done

# tasks 2-4: teacher + RePRE + EWC + NSGP on top of the previous task's
# artifacts (covariance, rois_etc, ewc terms, masks all re-merged).
# Resume is supported for task>1 here (unlike the reference,
# nsrunner:551): every cross-task input is rebuilt deterministically
# from the previous task's artifacts at startup (runner.py _try_resume).
for n in 2 3 4; do
  for attempt in $(seq 1 10); do
    python tools/train.py cl_faster_rcnn_cfgs/mini_voc/mini_voc_5_5_$n.py --resume && break
    echo "task-$n attempt $attempt crashed; resuming" >&2
    sleep 10
  done
done

# final eval over all 20 seen classes + per-image detections dump
BEST=$(ls work_dirs/mini_voc/mini_voc_5_5_4/best_*.npz | head -1)
python tools/test.py cl_faster_rcnn_cfgs/mini_voc/mini_voc_5_5_4.py "$BEST" \
  --out work_dirs/mini_voc/mini_voc_5_5_4/detections.pkl
