#!/usr/bin/env bash
# Camera-view generalization sweep: evaluate a trained checkpoint under the
# MultiView camera rigs, reference protocol
# (reference scripts/run_maniskill2_camera_view.sh).
# Every env id swept here is produced by
# pointcloudmatters_tpu.envs.custom_maniskill2.iter_env_ids() —
# tests/test_env_registry.py asserts script<->registry consistency.
#
# Usage: bash scripts/run_maniskill2_camera_view.sh <CKPT> <TASK> <MODEL> <SEED>
set -euo pipefail

ckpt_path=${1:?checkpoint path}
task=${2:?task, e.g. PickCube-v0}
model=${3:?model variant, e.g. scratch_pointnet_pcd}
seed=${4:?seed}

task_name=${task%-v0}
if [ "$task_name" = "PegInsertionSide" ]; then
  model_env_id=${task_name}-3steps-MultiView
else
  model_env_id=${task_name}-MultiView
fi

echo "Starting validation for task: ${task} with model: ${model} and checkpoint path: ${ckpt_path}"
echo "Model environment ID: ${model_env_id}"
echo "Seed: ${seed}"

if [[ "$model" == *"pcd"* ]]; then
  echo "Running validation for PCD camera views..."
  # Camera-ID mapping in the MultiView rig (4 base cams first):
  #   4:left_camera_5  5:down_camera_5  6:left_camera_10  7:down_camera_10
  for camera in 4 5 6 7; do
    echo "Validating with camera ID: ${camera}"
    python src/validate.py exp_maniskill2_act_policy=base \
      "exp_maniskill2_act_policy/maniskill2_pcd_task@maniskill2_pcd_task=${task}" \
      "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=${model}" \
      "ckpt_path=${ckpt_path}" \
      "model.env_id=${model_env_id}" \
      "data.train.camera_ids=[${camera}]" "seed=${seed}"
  done
else
  echo "Running validation for RGB or RGBD camera views..."
  for camera in left_camera_5 left_camera_10 down_camera_5 down_camera_10; do
    echo "Validating with camera view: ${camera}"
    python src/validate.py exp_maniskill2_act_policy=base \
      "exp_maniskill2_act_policy/maniskill2_task@maniskill2_task=${task}" \
      "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=${model}" \
      "ckpt_path=${ckpt_path}" \
      "model.env_id=${model_env_id}" \
      "data.train.camera_names=[${camera}]" "seed=${seed}"
  done
fi
