#!/usr/bin/env bash
# RLBench camera-view perturbation sweep (reference
# scripts/run_rlbench_camera_view.sh): rotate/translate the front camera at
# eval time and measure success-rate degradation.
# Usage: bash scripts/run_rlbench_camera_view.sh <MODEL> <TASK> <CKPT>
set -euo pipefail

MODEL=${1:?model variant, e.g. scratch_pointnet_pcd}
TASK=${2:?rlbench task, e.g. close_jar}
CKPT=${3:?checkpoint path}

for angle in 5 10 15 20; do
  for axis in y z; do
    python src/test_rlbench_act.py \
      "exp_rlbench_act_policy=base" \
      "exp_rlbench_act_policy/rlbench_model@rlbench_model=${MODEL}" \
      "rlbench_task=${TASK}" \
      "ckpt_path=${CKPT}" \
      "camera_view_test.apply=true" \
      "camera_view_test.rot_axis=${axis}" \
      "camera_view_test.rot_angle=${angle}" \
      "result_name=${MODEL}_${axis}_${angle}"
  done
done
