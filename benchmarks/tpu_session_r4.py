"""Round-4 TPU measurement queue — ONE long-lived relay client.

The axon relay wedges under client churn (CLAUDE.md gotchas), so every
chip measurement of the round runs from this single process, in stages,
each wrapped so a failure doesn't kill the queue. Results stream to
stdout/files as they complete, so partial progress survives.

    python benchmarks/tpu_session_r4.py [stage ...]

Stages (default: all, in this order):
  health      backend + tiny matmul probe
  bench       bench.py config baseline (in-session ladder anchor)
  throughput  per-family matrix (throughput.py) -> THROUGHPUT_r4.json lines
  profile     flagship phase split + recurrent phase splits
  solve       seed matrix 0,1,2 for all learnable workloads -> SOLVE_r4.jsonl
  curves      pixels + flappybird bounded curve runs -> CURVES_r4.jsonl
  ablate      ppg/rainbow decisive-cell seed-1 replications
"""

from __future__ import annotations

import json
import pathlib
import runpy
import sys
import time
import traceback

HERE = pathlib.Path(__file__).resolve().parent
ROOT = HERE.parent
sys.path.insert(0, str(ROOT))

import jax


def run_script(script: str, argv: list[str]):
    t0 = time.time()
    print(json.dumps({"stage": script, "argv": argv, "start": 1}), flush=True)
    old = sys.argv
    try:
        sys.argv = [script] + argv
        runpy.run_path(str(HERE / script), run_name="__main__")
        print(json.dumps({"stage": script, "ok": True,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    except SystemExit as e:
        print(json.dumps({"stage": script, "ok": e.code in (0, None),
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    except Exception:
        traceback.print_exc()
        print(json.dumps({"stage": script, "ok": False,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    finally:
        sys.argv = old


SOLVE_WORKLOADS = [
    "ppo_lunarlander", "dqn_cartpole", "sac_pendulum",  # flagship trio first
    "ddqn_per_cartpole", "ddqn_per_duel_cartpole", "noisy_dqn_cartpole",
    "rainbow_dqn_cartpole_gamma99", "ppo_rnn_we_lunarlander",
    "ppg_rnn_lunarlander", "ppo_full_lunarlander", "ppo_lstm_lunarlander",
    "sac_cartpole", "td3_pendulum", "ddpg_pendulum",
]


def main(argv):
    stages = argv or ["health", "bench", "throughput", "profile", "solve",
                      "curves", "ablate"]
    art = str(HERE / "artifacts")

    if "health" in stages:
        import jax.numpy as jnp

        t0 = time.time()
        s = float((jnp.ones((128, 128)) @ jnp.ones((128, 128))).sum())
        print(json.dumps({"stage": "health", "backend": jax.default_backend(),
                          "matmul_sum": s,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)

    if "bench" in stages:
        run_script("tpu_session.py", ["--skip-profile", "--skip-bf16"])

    if "throughput" in stages:
        run_script("throughput.py", [])

    if "profile" in stages:
        run_script("profile_ppo.py", [])
        run_script("profile_rnn.py", ["--workload", "ppo_rnn"])
        run_script("profile_rnn.py", ["--workload", "ppo_lstm"])

    if "solve" in stages:
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r4.jsonl", "--seeds", "0,1,2"]
                   + SOLVE_WORKLOADS)

    if "curves" in stages:
        run_script("curves.py", ["--out", f"{art}/CURVES_r4.jsonl",
                                 "dqn_cartpole_pixels"])
        run_script("curves.py", ["--out", f"{art}/CURVES_r4.jsonl",
                                 "ppo_rnn_flappybird"])
        run_script("curves.py", ["--out", f"{art}/CURVES_r4.jsonl",
                                 "noisy_dqn_flappybird"])

    if "ablate" in stages:
        run_script("ablate_ppg.py",
                   ["--out", f"{art}/ABLATION_ppg_r4.jsonl", "--seed", "1",
                    "behavior_every1", "defaults"])
        run_script("ablate_rainbow.py",
                   ["--out", f"{art}/ABLATION_rainbow_r4.jsonl", "--seed", "1",
                    "ratio_1to1_250k", "gamma_99"])

    print(json.dumps({"stage": "ALL_DONE"}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
