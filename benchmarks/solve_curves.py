"""Learning-curve validation: train workloads to their reference solve
thresholds and record env-steps + wall time to solve.

The reference's acceptance criterion is "avg100 reward ≥ threshold"
(SURVEY.md §4); this harness reproduces that check per workload with the
vectorized trainers. Usage:

    python benchmarks/solve_curves.py ppo_lunarlander dqn_cartpole ...

One JSON line per workload: {"workload", "solved", "env_steps", "wall_s",
"avg100"}.
"""

from __future__ import annotations

import json
import sys

from gymrl_tpu.run.loop import TrainLoop


def build(name):
    if name == "dqn_cartpole":
        from gymrl_tpu.algos.dqn import DQNConfig, DQNTrainer
        cfg = DQNConfig(num_envs=128, steps_per_iter=64, updates_per_step=2,
                        epsilon_decay=20_000.0, max_train_steps=3_000_000)
        return DQNTrainer(cfg), 495.0
    if name == "ppo_cartpole":
        from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
        cfg = PPOConfig(env_name="CartPole-v1", num_envs=64, rollout_steps=64,
                        minibatch_size=512, max_train_steps=2_000_000)
        return PPOTrainer(cfg), 495.0
    if name == "ppo_lunarlander":
        from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
        cfg = PPOConfig(env_name="LunarLander-v3", num_envs=64, rollout_steps=64,
                        minibatch_size=256, max_train_steps=10_000_000)
        return PPOTrainer(cfg), 200.0
    if name == "ddqn_per_cartpole":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_config
        cfg = ddqn_per_config(num_envs=128, steps_per_iter=64, updates_per_step=2,
                              epsilon_decay=20_000.0)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "rainbow_dqn_cartpole":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config
        cfg = rainbow_config(num_envs=128, steps_per_iter=64, updates_per_step=2)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "sac_pendulum":
        from gymrl_tpu.algos.continuous import SACTrainer, sac_config
        cfg = sac_config(num_envs=64, steps_per_iter=64, updates_per_step=8)
        return SACTrainer(cfg), -200.0  # pendulum has no official threshold
    raise KeyError(name)


def main(argv):
    for name in argv or ["dqn_cartpole", "ppo_cartpole", "ppo_lunarlander"]:
        trainer, threshold = build(name)
        loop = TrainLoop(trainer, f"curve_{name}", log_metrics=False, log_every=50)
        ts, stats = loop.train(trainer.cfg.max_train_steps, solve_threshold=threshold)
        print(json.dumps({
            "workload": name,
            "solved": stats["solved"],
            "env_steps": stats["env_steps"],
            "wall_s": round(stats["wall_s"], 1),
            "avg100": round(stats["avg100"], 1),
        }), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
