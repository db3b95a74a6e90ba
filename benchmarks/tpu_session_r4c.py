"""Round-4 final TPU session: validate the new bench default + last arms.

    python benchmarks/tpu_session_r4c.py [stage ...]
"""

from __future__ import annotations

import pathlib
import sys

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))

from tpu_session_r4 import run_script  # noqa: E402


def main(argv):
    stages = argv or ["flatopt_solve", "pixels_stab", "bench"]
    art = str(HERE / "artifacts")

    if "flatopt_solve" in stages:
        # learning validation for the bench's new flat_optimizer default
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r4.jsonl", "--seeds", "0,1",
                    "ppo_lunarlander_flatopt"])

    if "pixels_stab" in stages:
        run_script("curves.py", ["--out", f"{art}/CURVES_r4.jsonl",
                                 "dqn_cartpole_pixels_stab"])

    if "bench" in stages:
        # the shipped bench exactly as the driver runs it
        run_script("../bench.py", [])

    print('{"stage": "R4C_DONE"}', flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
