"""CLI: generate a synthetic ManiSkill2-format trajectory file for smoke runs.

    python -m tests.make_synthetic_data /tmp/pickcube.h5 [--episodes 3]
"""

from __future__ import annotations

import argparse

from tests.synth import make_synthetic_maniskill2


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("out", help="output .h5 path (a .json sidecar is written too)")
    ap.add_argument("--episodes", type=int, default=3)
    ap.add_argument("--episode-len", type=int, default=20)
    ap.add_argument("--action-dim", type=int, default=7)
    ap.add_argument("--qpos-dim", type=int, default=9)
    ap.add_argument("--cam-side", type=int, default=32)
    ap.add_argument("--env-id", default="PickCube-v0")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args()
    path = make_synthetic_maniskill2(
        args.out, n_episodes=args.episodes, episode_len=args.episode_len,
        action_dim=args.action_dim, qpos_dim=args.qpos_dim,
        cam_side=args.cam_side, env_id=args.env_id, seed=args.seed,
    )
    print(f"wrote {path}")


if __name__ == "__main__":
    main()
