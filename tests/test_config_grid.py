"""Golden test: every experiment config composes and its model instantiates.

VERDICT r1 item 4 ("done" criterion): the full experiment grid — all four
families x every model variant (reference
`configs/exp_*/{maniskill2,rlbench}_model/*.yaml`) — must compose through the
config engine and build its policy object. Instantiation here constructs the
flax module tree (cheap; parameters are only materialized at ``init``) and
the task module wiring around it.
"""

from __future__ import annotations

import os
import pathlib

import pytest

from pointcloudmatters_tpu.utils import config as C

CONFIG_DIR = str(pathlib.Path(__file__).resolve().parent.parent / "configs")


def _variants(family: str, group: str) -> list[str]:
    d = pathlib.Path(CONFIG_DIR) / family / group
    return sorted(p.stem for p in d.glob("*.yaml"))


def _compose(family: str, group: str, model: str, extra=()):
    overrides = [
        f"{family}=base",
        f"{family}/{group}@{group}={model}",
    ]
    if family.startswith("exp_maniskill2"):
        task_group = (
            "maniskill2_pcd_task" if "_pcd" in model else "maniskill2_task"
        )
        overrides.append(f"{family}/{task_group}@{task_group}=PickCube-v0")
    overrides += ["logger=csv", *extra]
    return C.compose(CONFIG_DIR, "train", overrides)


FAMILIES = [
    ("exp_maniskill2_act_policy", "maniskill2_model"),
    ("exp_maniskill2_diffusion_policy", "maniskill2_model"),
    ("exp_rlbench_act_policy", "rlbench_model"),
    ("exp_rlbench_diffusion_policy", "rlbench_model"),
]

GRID = [
    (family, group, model)
    for family, group in FAMILIES
    for model in _variants(family, group)
]


def test_grid_is_reference_complete():
    """Every model variant the reference ships exists in our tree."""
    ref_root = pathlib.Path("/root/reference/configs")
    if not ref_root.is_dir():
        pytest.skip("reference tree unavailable")
    missing = []
    for family, group in FAMILIES:
        ours = set(_variants(family, group))
        theirs = {p.stem for p in (ref_root / family / group).glob("*.yaml")}
        missing += [f"{family}/{group}/{m}" for m in sorted(theirs - ours)]
    assert not missing, f"missing model variants: {missing}"


@pytest.mark.parametrize(
    "family,group,model", GRID, ids=[f"{f.split('exp_')[1]}:{m}" for f, _, m in GRID]
)
def test_compose_and_instantiate(family, group, model, tmp_path):
    cfg = _compose(
        family, group, model,
        extra=[f"paths.log_dir={tmp_path}/logs"],
    )
    from pointcloudmatters_tpu.utils.config import resolve_config, set_runtime

    set_runtime(output_dir=str(tmp_path / "out"), cwd=str(tmp_path))
    cfg = resolve_config(cfg)
    # reference quirk kept verbatim: rlbench_diffusion_policy/
    # pretrained_multimae_rgbd.yaml mislabels its own task_name as
    # scratch_multivit_rgbd (copy-paste bug upstream)
    if model != "pretrained_multimae_rgbd" or "rlbench_diffusion" not in family:
        assert cfg.task_name == model
    module = C.instantiate(cfg.model)
    assert module is not None
    policy = getattr(module, "policy", None)
    assert policy is not None, f"{model}: task module has no policy"
