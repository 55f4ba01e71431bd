#!/usr/bin/env bash
# Visual-change generalization sweep, reference protocol
# (reference scripts/run_maniskill2_visual_changes.sh:6-63):
#   1) ambient-light intensities {0.03 0.05 0.15 0.6 1.8 3}
#   2) ray-tracing noise via shader_dir=rt, rt_samples_per_pixel {2 16 32 64},
#      denoiser off
#   3) background colors red/green {0.2 0.6 1.0}
# Every env id swept here is produced by
# pointcloudmatters_tpu.envs.custom_maniskill2.iter_env_ids() —
# tests/test_env_registry.py asserts script<->registry consistency.
#
# Usage: bash scripts/run_maniskill2_visual_changes.sh <CKPT> <MODEL> <SEED>
set -euo pipefail

ckpt_path=${1:?checkpoint path}
model=${2:?model variant, e.g. scratch_pointnet_pcd}
seed=${3:?seed}

echo "Starting validation with model: ${model} and checkpoint path: ${ckpt_path}"
echo "Seed: ${seed}"

# 1) lighting intensity evaluation
light_intensities=("0.03" "0.05" "0.15" "0.6" "1.8" "3")
for light in "${light_intensities[@]}"; do
  echo "Running validation for light intensity: ${light}"
  python src/validate.py exp_maniskill2_act_policy=base \
    "exp_maniskill2_act_policy/maniskill2_pcd_task@maniskill2_pcd_task=StackCube-v0" \
    "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=${model}" \
    "ckpt_path=${ckpt_path}" \
    "model.env_id=StackCube-light-${light}" \
    "task_name=${model}-light-${light}" \
    "seed=${seed}"
done

# 2) ray-tracing noise level evaluation
noise_levels=("2" "16" "32" "64")
for noise in "${noise_levels[@]}"; do
  echo "Running validation for rt noise level: ${noise}"
  python src/validate.py exp_maniskill2_act_policy=base \
    "exp_maniskill2_act_policy/maniskill2_pcd_task@maniskill2_pcd_task=StackCube-v0" \
    "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=${model}" \
    "ckpt_path=${ckpt_path}" \
    "model.env_id=StackCube-v0" \
    "model.shader_dir=rt" \
    "model.rt_samples_per_pixel=${noise}" "model.rt_use_denoiser=false" \
    "task_name=${model}-noise-${noise}" \
    "seed=${seed}"
done

# 3) background color evaluation
colors=("0.2" "0.6" "1.0")
for red_color in "${colors[@]}"; do
  echo "Running validation for red background with R value: ${red_color}"
  python src/validate.py exp_maniskill2_act_policy=base \
    "exp_maniskill2_act_policy/maniskill2_pcd_task@maniskill2_pcd_task=StackCube-v0" \
    "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=${model}" \
    "ckpt_path=${ckpt_path}" \
    "model.env_id=StackCube-background-red-${red_color}" \
    "task_name=${model}-red_color-${red_color}" \
    "seed=${seed}"
done

for green_color in "${colors[@]}"; do
  echo "Running validation for green background with G value: ${green_color}"
  python src/validate.py exp_maniskill2_act_policy=base \
    "exp_maniskill2_act_policy/maniskill2_pcd_task@maniskill2_pcd_task=StackCube-v0" \
    "exp_maniskill2_act_policy/maniskill2_model@maniskill2_model=${model}" \
    "ckpt_path=${ckpt_path}" \
    "model.env_id=StackCube-background-green-${green_color}" \
    "task_name=${model}-green_color-${green_color}" \
    "seed=${seed}"
done
