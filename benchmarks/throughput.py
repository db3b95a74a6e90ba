"""Per-workload throughput sweep: env-steps/s for each trainer family.

Usage: python benchmarks/throughput.py [workload ...]
Prints one JSON line per workload. `bench.py` at the repo root remains the
driver-facing single-line benchmark; this file is the broader matrix.
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import sys
import time

import jax


def _bench_trainer(trainer, iters: int = 5):
    trainer.donate = True  # production drivers donate (base.Trainer note)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)  # compile + warmup
    jax.block_until_ready(jax.tree_util.tree_leaves(ts)[0])
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(jax.tree_util.tree_leaves(ts)[0])
    dt = time.perf_counter() - t0
    steps = iters * trainer.cfg.num_envs * getattr(
        trainer.cfg, "rollout_steps", getattr(trainer.cfg, "steps_per_iter", 1)
    )
    return steps / dt


def ppo_lunarlander():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    return PPOTrainer(PPOConfig(env_name="LunarLander-v3", num_envs=2048,
                                rollout_steps=64, minibatch_size=16384, num_epochs=4))


def ppo_cartpole():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    return PPOTrainer(PPOConfig(env_name="CartPole-v1", num_envs=4096,
                                rollout_steps=64, minibatch_size=32768, num_epochs=4))


def dqn_cartpole():
    from gymrl_tpu.algos.dqn import DQNConfig, DQNTrainer

    return DQNTrainer(DQNConfig(num_envs=1024, steps_per_iter=64, updates_per_step=1))


def rainbow_cartpole():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config

    return DQNFamilyTrainer(rainbow_config(num_envs=512, steps_per_iter=32,
                                           updates_per_step=1))


def sac_pendulum():
    from gymrl_tpu.algos.continuous import SACTrainer, sac_config

    return SACTrainer(sac_config(num_envs=1024, steps_per_iter=64, updates_per_step=1))


def ppo_lstm_lunarlander():
    from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer

    return PPOLSTMTrainer(PPOLSTMConfig(num_envs=512, rollout_steps=64,
                                        seq_minibatch=512,
                                        flat_optimizer=True))


def ppo_lunarlander_refcadence():
    """Reference-exact scale AND SGD cadence (ppo_lunarlander.py:261-272):
    2048-sample rollout, 10 epochs x minibatch 64 = 320 grad steps/iter.
    This is the honest like-for-like throughput number next to bench.py's
    batch-scaled config (see bench.py docstring for the stated deviation)."""
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    # flat optimizer since r5 (+52% on this maximally SGD-bound cadence,
    # REFCADENCE_r5.json — representation change only, cadence identical)
    return PPOTrainer(PPOConfig(env_name="LunarLander-v3", num_envs=32,
                                rollout_steps=64, minibatch_size=64,
                                num_epochs=10, flat_optimizer=True,
                                sgd_unroll=8))


def ppo_rnn_lunarlander():
    """Solve-config (whole-episode BPTT) throughput — the config of the
    SOLVE sweeps, so wall-clock there is directly explained."""
    from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_lunarlander_config

    return PPORNNTrainer(ppo_rnn_lunarlander_config())


def ppg_rnn_lunarlander():
    from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config

    return PPGTrainer(ppg_rnn_lunarlander_config())


def ppo_full_lunarlander():
    """Shipped full-tricks workload config (flat optimizer since r5)."""
    from gymrl_tpu.algos.ppo_full import PPOFullConfig, PPOFullTrainer

    return PPOFullTrainer(PPOFullConfig(flat_optimizer=True))


WORKLOADS = {
    "ppo_lunarlander": ppo_lunarlander,
    "ppo_full_lunarlander": ppo_full_lunarlander,
    "ppo_lunarlander_refcadence": ppo_lunarlander_refcadence,
    "ppo_cartpole": ppo_cartpole,
    "dqn_cartpole": dqn_cartpole,
    "rainbow_cartpole": rainbow_cartpole,
    "sac_pendulum": sac_pendulum,
    "ppo_lstm_lunarlander": ppo_lstm_lunarlander,
    "ppo_rnn_lunarlander": ppo_rnn_lunarlander,
    "ppg_rnn_lunarlander": ppg_rnn_lunarlander,
}


def main(argv):
    names = argv or list(WORKLOADS)
    for name in names:
        trainer = WORKLOADS[name]()
        sps = _bench_trainer(trainer)
        print(json.dumps({"workload": name, "env_steps_per_s": round(sps, 1)}), flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
