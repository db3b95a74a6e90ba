"""Round-4 follow-up TPU queue (run AFTER tpu_session_r4.py exits):
dense overlay curves for the flagship trio, the flat-optimizer A/B, and
the corrected (packed-shuffle) flagship phase profile.

    python benchmarks/tpu_session_r4b.py [stage ...]
"""

from __future__ import annotations

import pathlib
import sys

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

from tpu_session_r4 import run_script  # noqa: E402  (same-dir import)


def main(argv):
    stages = argv or ["overlay", "fixups", "flappy_chunk", "pixels_long",
                      "flatopt", "profile"]
    art = str(HERE / "artifacts")

    if "overlay" in stages:
        # dense (env_steps, avg100) curves for reference-vs-repo overlays
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r4_overlay.jsonl",
                    "--seeds", "0,1,2", "--log-every", "3",
                    "ppo_lunarlander", "dqn_cartpole", "sac_pendulum"])

    if "fixups" in stages:
        # rainbow_gamma99 was budget-capped at rainbow's reference 250k in
        # the first sweep (solve point is ~520k); rerun at the r3 ablation
        # cell's 1M schedule. The two PER workloads' unsolved seeds get the
        # 3M budget their dqn sibling already had.
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r4.jsonl", "--seeds", "0,1,2",
                    "rainbow_dqn_cartpole_gamma99"])
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r4.jsonl", "--seed", "1",
                    "ddqn_per_cartpole"])
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r4.jsonl", "--seed", "2",
                    "ddqn_per_duel_cartpole"])

    if "flappy_chunk" in stages:
        run_script("curves.py", ["--out", f"{art}/CURVES_r4.jsonl",
                                 "ppo_rnn_flappybird_chunk"])

    if "pixels_long" in stages:
        # r4 pixel curve was still climbing at its 1M cap (380 avg100 at
        # the endpoint) — give it the 3M horizon
        run_script("curves.py", ["--out", f"{art}/CURVES_r4.jsonl",
                                 "dqn_cartpole_pixels_3m"])

    if "flatopt" in stages:
        run_script("ab_flatopt.py", [])

    if "profile" in stages:
        run_script("profile_ppo.py", [])

    print('{"stage": "R4B_DONE"}', flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
