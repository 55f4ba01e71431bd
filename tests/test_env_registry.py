"""Sweep-script <-> env-registry consistency + env kwargs plumbing.

VERDICT r3 items 3/4: every env id named in the sweep shell scripts must be
produced by ``register_custom_envs()``'s id generator (the r3 scripts swept
ids the registry never registers — every invocation died at gym.make), and
the ray-tracing / stereo-depth knobs must actually reach ``gym.make``.
"""

from __future__ import annotations

import os
import re
import subprocess

from pointcloudmatters_tpu.envs.custom_maniskill2 import iter_env_ids
from pointcloudmatters_tpu.envs.rollout import maniskill2_env_kwargs

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

# ids ManiSkill2 itself registers (not our custom surface)
STANDARD_IDS = {
    "PickCube-v0", "LiftCube-v0", "StackCube-v0", "PegInsertionSide-v0",
    "TurnFaucet-v0", "Hang-v0", "Pour-v0", "Fill-v0", "Excavate-v0",
}


def _script_env_ids(script: str) -> set[str]:
    """All concrete model.env_id values a sweep script can produce, by
    running the script with a stubbed python that records its argv."""
    record = os.path.join(REPO, ".pytest_envids.txt")
    if os.path.exists(record):
        os.remove(record)
    bindir = os.path.join(REPO, ".pytest_stub_bin")
    os.makedirs(bindir, exist_ok=True)
    stub = os.path.join(bindir, "python")
    with open(stub, "w") as f:
        f.write(f"#!/usr/bin/env bash\necho \"$@\" >> {record}\n")
    os.chmod(stub, 0o755)
    try:
        env = dict(os.environ, PATH=f"{bindir}:{os.environ['PATH']}")
        for args in (["/ckpt.ckpt", "scratch_pointnet_pcd", "0"],
                     ["/ckpt.ckpt", "PickCube-v0", "scratch_pointnet_pcd", "0"],
                     ["/ckpt.ckpt", "PegInsertionSide-v0",
                      "scratch_resnet18_rgbd", "0"]):
            subprocess.run(
                ["bash", os.path.join(REPO, "scripts", script), *args],
                env=env, cwd=REPO, capture_output=True, timeout=60,
            )
        ids = set()
        if os.path.exists(record):
            for line in open(record):
                for m in re.finditer(r"model\.env_id=(\S+)", line):
                    ids.add(m.group(1))
        return ids
    finally:
        if os.path.exists(record):
            os.remove(record)
        os.remove(stub)
        os.rmdir(bindir)


def test_visual_changes_script_ids_are_registered():
    ids = _script_env_ids("run_maniskill2_visual_changes.sh")
    assert ids, "script produced no env ids (parse failure?)"
    registered = set(iter_env_ids()) | STANDARD_IDS
    missing = ids - registered
    assert not missing, f"sweep ids not in the registry: {sorted(missing)}"
    # the reference protocol's axes are all present
    for light in ("0.03", "0.05", "0.15", "0.6", "1.8", "3"):
        assert f"StackCube-light-{light}" in ids
    for c in ("red", "green"):
        for v in ("0.2", "0.6", "1.0"):
            assert f"StackCube-background-{c}-{v}" in ids


def test_camera_view_script_ids_are_registered():
    ids = _script_env_ids("run_maniskill2_camera_view.sh")
    assert ids, "script produced no env ids (parse failure?)"
    registered = set(iter_env_ids()) | STANDARD_IDS
    missing = ids - registered
    assert not missing, f"sweep ids not in the registry: {sorted(missing)}"
    assert "PickCube-MultiView" in ids
    assert "PegInsertionSide-3steps-MultiView" in ids


def test_rt_noise_knobs_reach_gym_make():
    env_id, kwargs = maniskill2_env_kwargs(
        "StackCube-v0", shader_dir="rt", rt_samples_per_pixel=16,
        rt_use_denoiser=False,
    )
    assert env_id == "StackCube-v0"
    assert kwargs["shader_dir"] == "rt"
    assert kwargs["render_config"] == {
        "rt_samples_per_pixel": 16, "rt_use_denoiser": False,
    }


def test_stereo_depth_knob_reaches_camera_cfgs():
    _, kwargs = maniskill2_env_kwargs("Hang-v0", use_stereo_depth=True)
    assert kwargs["camera_cfgs"]["use_stereo_depth"] is True
    _, kwargs = maniskill2_env_kwargs("Hang-v0", use_stereo_depth=False)
    assert "use_stereo_depth" not in kwargs["camera_cfgs"]


def test_peg_insertion_eval_remap_quirk():
    env_id, _ = maniskill2_env_kwargs("PegInsertionSide-v0")
    assert env_id == "PegInsertionSide-3steps-v0"


def test_register_custom_envs_matches_generator(monkeypatch):
    """Execute the real registration logic against stubbed ManiSkill2 modules
    and let the built-in consistency check compare the registered ids to
    iter_env_ids() (the generator the sweep tests rely on)."""
    import sys
    import types

    import pointcloudmatters_tpu.envs.custom_maniskill2 as reg

    class _Pose:
        p = [0.0, 0.0, 0.0]
        q = [1.0, 0.0, 0.0, 0.0]

    def look_at(eye, target):
        return _Pose()

    class CameraConfig:
        def __init__(self, *a, **k):
            pass

    registered = {}

    def register_env(uid, max_episode_steps=None, override=False):
        def deco(cls):
            registered[uid] = (cls, max_episode_steps)
            return cls

        return deco

    def stub(name, **attrs):
        mod = types.ModuleType(name)
        for k, v in attrs.items():
            setattr(mod, k, v)
        monkeypatch.setitem(sys.modules, name, mod)
        return mod

    class _BaseEnv:
        enable_shadow = False

        def evaluate(self, **kw):
            return {}

    ms2 = stub("mani_skill2")
    stub("mani_skill2.sensors")
    stub("mani_skill2.sensors.camera", CameraConfig=CameraConfig)
    stub("mani_skill2.utils")
    stub("mani_skill2.utils.registration", register_env=register_env)
    stub("mani_skill2.utils.sapien_utils", look_at=look_at)
    stub("mani_skill2.envs")
    stub("mani_skill2.envs.pick_and_place")
    stub("mani_skill2.envs.pick_and_place.pick_cube",
         PickCubeEnv=type("PickCubeEnv", (_BaseEnv,), {}),
         LiftCubeEnv=type("LiftCubeEnv", (_BaseEnv,), {}))
    stub("mani_skill2.envs.pick_and_place.stack_cube",
         StackCubeEnv=type("StackCubeEnv", (_BaseEnv,), {}))
    stub("mani_skill2.envs.assembly")
    stub("mani_skill2.envs.assembly.peg_insertion_side",
         PegInsertionSideEnv=type("PegInsertionSideEnv", (_BaseEnv,), {}))
    stub("mani_skill2.envs.misc")
    stub("mani_skill2.envs.misc.turn_faucet",
         TurnFaucetEnv=type("TurnFaucetEnv", (_BaseEnv,), {}))
    # soft-body import left absent -> the exemption path is exercised

    monkeypatch.setattr(reg, "_registered", False)
    assert reg.register_custom_envs() is True

    got = set(registered)
    expected = set(iter_env_ids())
    # everything registered is declared
    assert got <= expected, sorted(got - expected)
    # everything non-soft-body declared is registered
    softbody = ("Hang", "Pour", "Fill", "Excavate")
    hard = {u for u in expected if not any(t in u for t in softbody)}
    assert hard <= got, sorted(hard - got)
    # spot-check the per-variant episode budgets
    assert registered["PegInsertionSide-3steps-v0"][1] == 200
    assert registered["StackCube-MultiView"][1] == 200
    monkeypatch.setattr(reg, "_registered", False)
