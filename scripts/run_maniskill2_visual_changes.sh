#!/usr/bin/env bash
# Visual-change generalization sweep: lighting / background / object-color /
# noise env variants (reference scripts/run_maniskill2_visual_changes.sh).
# Usage: bash scripts/run_maniskill2_visual_changes.sh <EXP> <MODEL> <TASK> <CKPT>
set -euo pipefail

EXP=${1:?exp group}
MODEL=${2:?model variant}
TASK=${3:?task, e.g. PickCube-v0}
CKPT=${4:?checkpoint path}
BASE=${TASK%-v0}

VARIANTS=(
  "${BASE}-light-0.03-v0" "${BASE}-light-0.1-v0" "${BASE}-light-0.3-v0"
  "${BASE}-light-1.5-v0" "${BASE}-light-3-v0"
  "${BASE}-background-red-0.3-v0" "${BASE}-background-green-0.3-v0"
  "${BASE}-StereoDepth-v0"
)

for variant in "${VARIANTS[@]}"; do
  python src/validate.py \
    "${EXP}=base" \
    "${EXP}/maniskill2_pcd_task@maniskill2_pcd_task=${TASK}" \
    "${EXP}/maniskill2_model@maniskill2_model=${MODEL}" \
    "ckpt_path=${CKPT}" \
    "model.env_id=${variant}" \
    "train=false" "test=true"
done
