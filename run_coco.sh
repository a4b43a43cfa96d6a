#!/usr/bin/env bash
# MS-COCO config of record (reference train_acr_coco.sh:1-13 + the COCO
# branch of the inference/eval toolbox): vitb_hybrid, lr 0.05, alpha 125,
# crop 384, 5 epochs, labels from per-image bbox txts.
#
# Usage: ./run_coco.sh <train2014_dir> <bbox_txt_dir> <gt_dir> [val2014_dir] [session]
set -euo pipefail

IMPATH=${1:?coco train2014 image dir}
BBOX=${2:?per-image bbox txt dir}
GT=${3:?segmentation ground-truth dir}
VALPATH=${4:-}
SESSION=${5:-acr_coco_001}

ARGS=(
  --dataset coco
  --session_name "$SESSION"
  --backbone vitb_hybrid
  --IMpath "$IMPATH"
  --bbox_dir "$BBOX"
  --gt_dir "$GT"
  --lr 0.05
  --batch_size 4
  --alpha 125
  --crop_size 384
  --max_epoches 5
)
if [[ -n "$VALPATH" ]]; then
  ARGS+=(--valpath "$VALPATH")
fi

python -m acr_wsss_tpu.pipeline "${ARGS[@]}"
