#!/usr/bin/env bash
# Camera-view generalization sweep: evaluate a trained checkpoint under the
# MultiView camera rigs (reference scripts/run_maniskill2_camera_view.sh).
# Usage: bash scripts/run_maniskill2_camera_view.sh <EXP> <MODEL> <TASK> <CKPT>
set -euo pipefail

EXP=${1:?exp group, e.g. exp_maniskill2_act_policy}
MODEL=${2:?model variant, e.g. scratch_pointnet_pcd}
TASK=${3:?task, e.g. PickCube-v0}
CKPT=${4:?checkpoint path}

for angle in 5 10 15 20 25 30 35 40 45; do
  for cam in left_camera down_camera; do
    python src/validate.py \
      "${EXP}=base" \
      "${EXP}/maniskill2_pcd_task@maniskill2_pcd_task=${TASK}" \
      "${EXP}/maniskill2_model@maniskill2_model=${MODEL}" \
      "ckpt_path=${CKPT}" \
      "model.env_id=${TASK}-MultiView-v0" \
      "+model.camera_name=${cam}_${angle}" \
      "train=false" "test=true"
  done
done
