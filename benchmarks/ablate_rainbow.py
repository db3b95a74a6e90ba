"""Rainbow diagnosis grid — why does Rainbow plateau at ~280 on CartPole
while DDQN+PER+Duel (496 @ 1.84M) and NoisyDQN (495 @ 1.5M) solve?

Context (VERDICT r2 item 2): the reference's in-code acceptance is
avg100 ≥ 495 within 500 episodes ≈ 250k steps
(algorithms/rainbow_dqn_cartpole.py:36,275,400) — but a full run of the
reference's OWN script recorded this round shows it nowhere near that bar
at its budget (benchmarks/artifacts/refrainbow_run.log). This grid walks
Rainbow's deltas back toward the solving DDQN+PER+Duel config one at a
time to locate what caps the curve.

    python benchmarks/ablate_rainbow.py [--out FILE] [--seed N] [cell ...]
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import sys
import time

from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config
from gymrl_tpu.run.loop import TrainLoop

_SCALE = dict(num_envs=128, steps_per_iter=64, updates_per_step=16,
              max_train_steps=1_000_000)

CELLS = {
    # the reference config at vector scale (plateaued ~276 @ 1M in r2)
    "reference": dict(_SCALE),
    # clip priorities like ddqn_per (per_error_max=1.0 vs rainbow's None)
    "clip_priorities": dict(_SCALE, per_error_max=1.0, per_eps=1e-4),
    # single-step targets (drop the n-step-5 fold)
    "n_step_1": dict(_SCALE, n_steps=1),
    # epsilon-greedy instead of noisy heads
    "no_noisy": dict(_SCALE, noisy_heads=False, epsilon_decay=20_000.0),
    # hard target sync every 500 learn steps (noisy_dqn's scheme) vs soft
    "hard_target": dict(_SCALE, target_mode="hard_step", target_update_freq=500),
    # no lr decay
    "no_lr_decay": dict(_SCALE, lr_decay=False),
    # γ=0.99 like the other CartPole scripts (rainbow alone uses 0.9)
    "gamma_99": dict(_SCALE, gamma=0.99),
    # reference update:data ratio (1 update per env step) at small scale,
    # reference 250k budget — cadence parity per SURVEY §7.3 item 5
    "ratio_1to1_250k": dict(num_envs=16, steps_per_iter=64, updates_per_step=16,
                            max_train_steps=250_000),
}


def run_cell(name: str, seed: int):
    cfg = rainbow_config(**CELLS[name])
    trainer = DQNFamilyTrainer(cfg)
    loop = TrainLoop(trainer, f"rainbow_ablate_{name}", log_metrics=False,
                     log_every=100)
    t0 = time.time()
    _, stats = loop.train(cfg.max_train_steps, solve_threshold=495.0, seed=seed)
    return {
        "cell": name,
        "solved": stats["solved"],
        "env_steps": stats["env_steps"],
        "avg100": round(stats["avg100"], 1),
        "wall_s": round(time.time() - t0, 1),
        "seed": seed,
        "curve": stats["curve"][:: max(1, len(stats["curve"]) // 40)],
    }


def main(argv):
    out_path = None
    seed = 0
    names = []
    it = iter(argv)
    for a in it:
        if a == "--out":
            out_path = next(it)
        elif a == "--seed":
            seed = int(next(it))
        else:
            names.append(a)

    for name in names or list(CELLS):
        line = json.dumps(run_cell(name, seed))
        print(line, flush=True)
        if out_path:
            with open(out_path, "a") as f:
                f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
