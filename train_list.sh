#!/usr/bin/env bash
# Sequential multi-task driver (reference train_list.sh surface): run
# each task's config in order; artifacts flow between tasks through the
# work_dirs (covariance.npz / rois_etc.npz / ewc_reg_terms_ewc.npz).
set -e

CONFIG_LIST=(
  "cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_1.py"
  "cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_2.py"
)

for CFG in "${CONFIG_LIST[@]}"; do
  echo "=== training $CFG ==="
  python tools/train.py "$CFG"
done
