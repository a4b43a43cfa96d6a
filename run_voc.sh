#!/usr/bin/env bash
# VOC12 pipeline with the reference config-of-record (train_acr.sh:1-49):
# train (vitb_hybrid, lr .05, global batch 4, alpha 125, crop 384,
# 10 epochs) -> GETAM CAM inference (start_layer 10, func grad, affinity
# refinement) -> 100-point background-threshold mIoU curve.
#
# Usage: ./run_voc.sh <VOC_JPEGImages_dir> <SegmentationClassAug_dir> [session]
set -euo pipefail

IMPATH=${1:?usage: run_voc.sh IMpath gt_dir [session]}
GTDIR=${2:?usage: run_voc.sh IMpath gt_dir [session]}
EXP_NAME=${3:-acr_001}

mkdir -p weight
cp "$0" "weight/${EXP_NAME}.sh"

python -m acr_wsss_tpu.pipeline \
  --session_name "$EXP_NAME" \
  --IMpath "$IMPATH" \
  --gt_dir "$GTDIR" \
  --out_cam "output/${EXP_NAME}_cam_npy" \
  --logfile evallog.txt

echo "$EXP_NAME"
