"""Learning-curve validation: train workloads to their reference solve
thresholds and record env-steps + wall time to solve.

The reference's acceptance criterion is "avg100 reward ≥ threshold"
(SURVEY.md §4: e.g. algorithms/dqn_cartpole.py:207 avg100 ≥ 495,
algorithms/ppo_full_lunarlander.py:659-666 / ppg_rnn_lunarlander.py:493
avg100 ≥ 200); this harness reproduces that check per workload with the
vectorized trainers. Usage:

    python benchmarks/solve_curves.py [--out FILE] [--seed N | --seeds 0,1,2]
                                      [--log-every K] <workload> ...

Seeds loop inside one process per workload (compiled train_iter reused —
seeds 1+ skip the relay-expensive XLA compile). --log-every sets curve
density (one point per K train iterations; overlay runs use 2-3).

One JSON line per (workload, seed), appended to --out if given:
{"workload", "solved", "env_steps", "wall_s", "avg100", "seed", "curve"}.
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import sys

from gymrl_tpu.run.loop import TrainLoop

# Pendulum has no official solve threshold; the reference just watches the
# curve. avg100 ≥ -200 is the community-standard "solved" bar we adopt.
PENDULUM_BAR = -200.0


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
    if name == "ppo_lunarlander_flatopt":
        # learning validation for the flat-optimizer option (bench default
        # since r4) — same update math, re-associated reductions only
        from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
        cfg = PPOConfig(env_name="LunarLander-v3", num_envs=64, rollout_steps=64,
                        minibatch_size=256, max_train_steps=10_000_000,
                        flat_optimizer=True)
        return PPOTrainer(cfg), 200.0
    if name == "ppo_lunarlander_sgd_bf16":
        # learning validation for the mixed-precision SGD option
        from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
        cfg = PPOConfig(env_name="LunarLander-v3", num_envs=64, rollout_steps=64,
                        minibatch_size=256, max_train_steps=10_000_000,
                        sgd_bf16=True)
        return PPOTrainer(cfg), 200.0
    if name == "ppo_lunarlander_flat_bf16":
        # the candidate r5 bench default: flat master-vector Adam + bf16
        # minibatch forward/backward together (A/B: 5.73M → 6.28M steps/s)
        from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
        cfg = PPOConfig(env_name="LunarLander-v3", num_envs=64, rollout_steps=64,
                        minibatch_size=256, max_train_steps=10_000_000,
                        flat_optimizer=True, sgd_bf16=True)
        return PPOTrainer(cfg), 200.0
    if name == "ppg_rnn_lunarlander_flatopt":
        from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config
        return PPGTrainer(ppg_rnn_lunarlander_config(
            max_train_steps=3_000_000, flat_optimizer=True)), 200.0
    if name == "ppo_lstm_lunarlander_flatopt":
        from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer
        return PPOLSTMTrainer(PPOLSTMConfig(flat_optimizer=True)), 200.0
    if name == "ppo_full_lunarlander":
        from gymrl_tpu.algos.ppo_full import PPOFullConfig, PPOFullTrainer
        return PPOFullTrainer(PPOFullConfig()), 200.0
    if name == "ppo_full_lunarlander_flatopt":
        from gymrl_tpu.algos.ppo_full import PPOFullConfig, PPOFullTrainer
        return PPOFullTrainer(PPOFullConfig(flat_optimizer=True)), 200.0
    if name == "ppo_lstm_lunarlander":
        from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer
        return PPOLSTMTrainer(PPOLSTMConfig()), 200.0
    if name == "ppg_rnn_lunarlander":
        # canonical shipped config (whole-episode BPTT + canonical-PPG aux;
        # see gymrl_tpu/algos/ppg.py docstring + ABLATION_ppg_r3.json)
        from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config
        return PPGTrainer(ppg_rnn_lunarlander_config(max_train_steps=3_000_000)), 200.0
    if name == "ppg_ref_lunarlander":  # reference aux semantics (behavior clone, every update)
        from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config
        cfg = ppg_rnn_lunarlander_config(max_train_steps=10_000_000,
                                         clone_target="behavior", aux_every=1)
        return PPGTrainer(cfg), 200.0
    if name == "ppo_rnn_lunarlander":
        from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_lunarlander_config
        cfg = ppo_rnn_lunarlander_config(max_train_steps=10_000_000)
        return PPORNNTrainer(cfg), 200.0
    if name == "ppo_rnn_we_lunarlander":  # whole-episode BPTT (exact ref semantics)
        from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_lunarlander_config
        cfg = ppo_rnn_lunarlander_config(
            max_train_steps=10_000_000, whole_episode_bptt=True,
            episode_rows_per_env=8, seq_minibatch=64,
        )
        return PPORNNTrainer(cfg), 200.0
    if name == "ppo_rnn_we_lunarlander_flatopt":
        # learning validation for flat_optimizer on the recurrent family
        # (r5): same whole-episode solve config, flat master-vector Adam
        from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_lunarlander_config
        cfg = ppo_rnn_lunarlander_config(
            max_train_steps=10_000_000, whole_episode_bptt=True,
            episode_rows_per_env=8, seq_minibatch=64, flat_optimizer=True,
        )
        return PPORNNTrainer(cfg), 200.0
    if name == "ddqn_per_cartpole":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_config
        cfg = ddqn_per_config(num_envs=128, steps_per_iter=64, updates_per_step=2,
                              epsilon_decay=20_000.0, max_train_steps=3_000_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "ddqn_per_duel_cartpole":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_duel_config
        cfg = ddqn_per_duel_config(num_envs=128, steps_per_iter=64, updates_per_step=2,
                                   epsilon_decay=20_000.0, max_train_steps=3_000_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "ddqn_per_cartpole_ref1to1":
        # reference-exact semantics AND cadence (1 update per env step,
        # ε-decay 800 as in ddqn_per_cartpole.py:40-42) at the reference
        # run's own ~90k-step budget — the rainbow curve-parity instrument
        # applied to the DDQN-PER pair (VERDICT r4 #1)
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_config
        cfg = ddqn_per_config(num_envs=16, steps_per_iter=64, updates_per_step=16,
                              max_train_steps=100_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "ddqn_per_duel_cartpole_ref1to1":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_duel_config
        cfg = ddqn_per_duel_config(num_envs=16, steps_per_iter=64, updates_per_step=16,
                                   max_train_steps=100_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "ddqn_per_cartpole_gamma99_3m":
        # seed-retry budget: the dqn sibling's 3M (ddqn_per seed 1 is the
        # one chronically slow seed — r4 saw it plateau ~303 at 3M under
        # γ=0.9; this cell asks whether γ=0.99 merely needs more horizon)
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_config
        cfg = ddqn_per_config(num_envs=128, steps_per_iter=64, updates_per_step=2,
                              epsilon_decay=20_000.0, gamma=0.99,
                              max_train_steps=3_000_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "ddqn_per_cartpole_gamma99":
        # single documented deviation from the reference's γ=0.9
        # (ddqn_per_cartpole.py:38) — the γ-delta cell of the rainbow
        # playbook; γ=0.9 caps CartPole avg100 in the ~150-370 band
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_config
        cfg = ddqn_per_config(num_envs=128, steps_per_iter=64, updates_per_step=2,
                              epsilon_decay=20_000.0, gamma=0.99,
                              max_train_steps=1_500_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "ddqn_per_duel_cartpole_gamma99":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_duel_config
        cfg = ddqn_per_duel_config(num_envs=128, steps_per_iter=64, updates_per_step=2,
                                   epsilon_decay=20_000.0, gamma=0.99,
                                   max_train_steps=1_500_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "noisy_dqn_cartpole":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, noisy_dqn_config
        # reference cadence is 1 update per single-env step; 16 per vector
        # step of 128 envs keeps the update:data ratio high enough to learn
        cfg = noisy_dqn_config(num_envs=128, steps_per_iter=64, updates_per_step=16)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "rainbow_dqn_cartpole":
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config
        cfg = rainbow_config(num_envs=128, steps_per_iter=64, updates_per_step=16)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "rainbow_dqn_cartpole_ref1to1":
        # reference-exact semantics AND cadence (1 update per env step) at
        # the reference's 250k budget — the r3/r4-adjudicated curve-parity
        # cell (ABLATION_rainbow ratio_1to1_250k), exposed here so overlay
        # runs can record dense curves against refrainbow_run.log
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config
        cfg = rainbow_config(num_envs=16, steps_per_iter=64, updates_per_step=16,
                             max_train_steps=250_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "rainbow_dqn_cartpole_gamma99":
        # single documented deviation from the reference's γ=0.9 — the one
        # binding constraint (ABLATION_rainbow_r3.json); solves CartPole
        from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config
        cfg = rainbow_config(num_envs=128, steps_per_iter=64, updates_per_step=16,
                             gamma=0.99, max_train_steps=1_000_000)
        return DQNFamilyTrainer(cfg), 495.0
    if name == "sac_pendulum":
        from gymrl_tpu.algos.continuous import SACTrainer, sac_config
        cfg = sac_config(num_envs=64, steps_per_iter=64, updates_per_step=8)
        return SACTrainer(cfg), PENDULUM_BAR
    if name == "sac_pendulum_ratio1":
        # reference update:data cadence (1 update per env step,
        # sac_pendulum.py per-step update loop): 64 updates per 64-env
        # vector step. The shipped 1:8 config trades sample efficiency for
        # wall clock; this arm shows the gap is the ratio, not the
        # algorithm (overlay: ref reaches the bar by ~40k samples)
        from gymrl_tpu.algos.continuous import SACTrainer, sac_config
        cfg = sac_config(num_envs=64, steps_per_iter=64, updates_per_step=64)
        return SACTrainer(cfg), PENDULUM_BAR
    if name == "td3_pendulum":
        from gymrl_tpu.algos.continuous import TD3Trainer, td3_config
        cfg = td3_config(num_envs=64, steps_per_iter=64, updates_per_step=8)
        return TD3Trainer(cfg), PENDULUM_BAR
    if name == "td3_pendulum_ratio1":
        # reference update:data cadence (1 update per env step,
        # td3_pendulum.py:216-224 updates once per step) — adjudicates the
        # shipped 1:8 config's seed-1 divergence (VERDICT r4 #2): the
        # sac_pendulum_ratio1 precedent says the ratio dominates stability
        from gymrl_tpu.algos.continuous import TD3Trainer, td3_config
        cfg = td3_config(num_envs=64, steps_per_iter=64, updates_per_step=64)
        return TD3Trainer(cfg), PENDULUM_BAR
    if name == "ddpg_pendulum":
        from gymrl_tpu.algos.continuous import DDPGTrainer, ddpg_config
        cfg = ddpg_config(num_envs=64, steps_per_iter=64, updates_per_step=8)
        return DDPGTrainer(cfg), PENDULUM_BAR
    if name == "sac_cartpole":
        from gymrl_tpu.algos.continuous import DiscreteSACTrainer, sac_discrete_config
        cfg = sac_discrete_config(num_envs=64, steps_per_iter=64, updates_per_step=8,
                                  memory_capacity=65536, max_train_steps=3_000_000)
        return DiscreteSACTrainer(cfg), 495.0
    raise KeyError(name)


def main(argv):
    out_path = None
    seeds = [0]
    log_every = 50
    names = []
    it = iter(argv)
    for a in it:
        if a == "--out":
            out_path = next(it)
        elif a == "--seed":
            seeds = [int(next(it))]
        elif a == "--seeds":
            seeds = [int(s) for s in next(it).split(",")]
        elif a == "--log-every":
            # curve sampling density: one (env_steps, avg100) point per
            # log_every train iterations (overlay runs want ~2-5)
            log_every = int(next(it))
        else:
            names.append(a)

    for name in names or ["dqn_cartpole", "ppo_cartpole", "ppo_lunarlander"]:
        # one trainer per workload, seeds looped inside: the jitted
        # train_iter caches on the trainer instance, so seeds 1+ skip the
        # (relay-expensive) XLA compile entirely
        trainer, threshold = build(name)
        for seed in seeds:
            loop = TrainLoop(trainer, f"curve_{name}", log_metrics=False, log_every=log_every)
            ts, stats = loop.train(trainer.cfg.max_train_steps,
                                   solve_threshold=threshold, seed=seed)
            curve = stats["curve"]
            line = json.dumps({
                "workload": name,
                "solved": stats["solved"],
                "env_steps": stats["env_steps"],
                "wall_s": round(stats["wall_s"], 1),
                "avg100": round(stats["avg100"], 1),
                "threshold": threshold,
                "seed": seed,
                "curve": curve[:: max(1, len(curve) // 40)],
            })
            print(line, flush=True)
            if out_path:
                with open(out_path, "a") as f:
                    f.write(line + "\n")


if __name__ == "__main__":
    main(sys.argv[1:])
