#!/usr/bin/env bash
# Real-VOC 15+5 paper-comparison run — ONE command from a networked
# machine to paper-comparable numbers. See docs/REAL_VOC_REPRO.md for
# the full protocol, seed policy and expected anchors.
# Usage: run_real_voc_15_5.sh [--data-root data] [--seed 0]
set -e
cd "$(dirname "$0")/../.."

DATA_ROOT=data
SEED=0
while [ $# -gt 0 ]; do
  case "$1" in
    --data-root) DATA_ROOT=$2; shift 2;;
    --seed) SEED=$2; shift 2;;
    *) echo "unknown arg $1"; exit 1;;
  esac
done

# 1. dataset (no-op if already laid out; fails fast with mirror URLs
#    when the machine has no network)
python tools/misc/download_dataset.py --dataset-name voc2007 --data-root "$DATA_ROOT" \
  || { echo "VOC2007 fetch failed — see mirror URLs above"; exit 1; }
python tools/misc/download_dataset.py --dataset-name voc2007 --data-root "$DATA_ROOT" --verify-only

# 2. ImageNet backbone = torchvision ResNet-50 IMAGENET1K_V1 (the
#    reference's imagenet_pretrained_backbone.pth provenance — see
#    docs/REAL_VOC_REPRO.md §2)
BACKBONE="$DATA_ROOT/imagenet_pretrained_backbone.pth"
[ -f "$BACKBONE" ] || python - "$BACKBONE" <<'EOF'
import sys, torch, torchvision
sd = torchvision.models.resnet50(weights="IMAGENET1K_V1").state_dict()
torch.save(sd, sys.argv[1])
print("wrote", sys.argv[1])
EOF

# 3. the unmodified protocol configs
T1=cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_1.py
T2=cl_faster_rcnn_cfgs/incremental_task/cl_faster_rcnn_nsgp_repre_15_5_2.py
WD1=./work_dirs/ns3_split_id/cl_faster_rcnn_ns3_split_id_15_5_1
WD2=./work_dirs/ns3_split_id/cl_faster_rcnn_ns3_split_id_15_5_2

python tools/train.py "$T1" --resume --cfg-options \
  model.backbone.init_cfg.checkpoint="$BACKBONE" \
  previous_dir=None seed="$SEED" \
  train_dataloader.dataset.dataset.datasets.0.data_root="$DATA_ROOT/VOCdevkit" \
  val_dataloader.dataset.data_root="$DATA_ROOT/VOCdevkit"

python tools/train.py "$T2" --cfg-options \
  previous_dir="$WD1" model.roi_head.previous_path="$WD1" seed="$SEED" \
  train_dataloader.dataset.dataset.datasets.0.data_root="$DATA_ROOT/VOCdevkit" \
  val_dataloader.dataset.data_root="$DATA_ROOT/VOCdevkit"

# 4. final 20-class eval + detections dump
BEST=$(ls "$WD2"/best_*.npz | head -1)
python tools/test.py "$T2" "$BEST" --out "$WD2/detections.pkl" --cfg-options \
  val_dataloader.dataset.data_root="$DATA_ROOT/VOCdevkit" seed="$SEED"
