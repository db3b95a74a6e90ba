"""Workload entry points — `python -m gymrl_tpu.run.cli <workload>`.

Replicates the reference UX of `python algorithms/<script>.py`
(SURVEY.md §2.2 scaffolding): each workload name maps to the same
algorithm + canonical env + tuned hyperparameters; Ctrl+C stops training
gracefully and runs the final evaluation (ref dqn_cartpole.py:256-272 —
here via the loop's KeyboardInterrupt handler).
"""

from __future__ import annotations

import sys

from gymrl_tpu.run.loop import TrainLoop
from gymrl_tpu.utils.logging import get_logger

logger = get_logger()


def show_config(cfg, algo: str) -> None:
    """Pretty-print the config at startup (ref BasicConfig.show,
    utils/runner.py:39-43)."""
    logger.info(f"{algo} config:")
    fields = getattr(cfg, "__dataclass_fields__", None)
    items = (
        {k: getattr(cfg, k) for k in fields} if fields else vars(cfg)
    )
    for k, v in items.items():
        logger.info(f"  {k}: {v}")


def _dqn_cartpole():
    from gymrl_tpu.algos.dqn import DQNConfig, DQNTrainer
    return DQNTrainer(DQNConfig()), "DQN", 495.0


def _ddqn_per_cartpole():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_config
    return DQNFamilyTrainer(ddqn_per_config()), "DDQN_PER", 495.0


def _ddqn_per_duel_cartpole():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, ddqn_per_duel_config
    return DQNFamilyTrainer(ddqn_per_duel_config()), "DDQN_PER_DUEL", 495.0


def _noisy_dqn_cartpole():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, noisy_dqn_config
    return DQNFamilyTrainer(noisy_dqn_config()), "NoisyDQN", 495.0


def _rainbow_dqn_cartpole():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, rainbow_config
    return DQNFamilyTrainer(rainbow_config()), "RainbowDQN", 495.0


def _ppo_lunarlander():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
    return PPOTrainer(PPOConfig()), "PPO", 200.0


def _ppo_cartpole():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
    cfg = PPOConfig(env_name="CartPole-v1", solve_threshold=495.0)
    return PPOTrainer(cfg), "PPO", 495.0


def _sac_pendulum():
    from gymrl_tpu.algos.continuous import SACTrainer, sac_config
    return SACTrainer(sac_config()), "SAC", None


def _sac_cartpole():
    from gymrl_tpu.algos.continuous import DiscreteSACTrainer, sac_discrete_config
    return DiscreteSACTrainer(sac_discrete_config()), "SACD", 495.0


def _td3_pendulum():
    from gymrl_tpu.algos.continuous import TD3Trainer, td3_config
    return TD3Trainer(td3_config()), "TD3", None


def _ddpg_pendulum():
    from gymrl_tpu.algos.continuous import DDPGTrainer, ddpg_config
    return DDPGTrainer(ddpg_config()), "DDPG", None


def _ppo_rnn_lunarlander():
    from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_lunarlander_config
    return PPORNNTrainer(ppo_rnn_lunarlander_config()), "PPO_RNN", 200.0


def _ppo_rnn_flappybird():
    from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_flappybird_config
    return PPORNNTrainer(ppo_rnn_flappybird_config()), "PPO_RNN", None


def _ppo_full_lunarlander():
    from gymrl_tpu.algos.ppo_full import PPOFullConfig, PPOFullTrainer
    # r5: flat master-vector Adam, +16% (260k->302k steps/s), solve-
    # validated 3/3 (516k/467k/528k, SOLVE_r5.jsonl)
    return PPOFullTrainer(PPOFullConfig(flat_optimizer=True)), "PPO_FULL", 200.0


def _ppo_lstm_lunarlander():
    from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer
    # r5: flat master-vector Adam, +5.6% at this config, solve-validated
    # 3/3 (430k/524k/569k, SOLVE_r5.jsonl)
    return PPOLSTMTrainer(PPOLSTMConfig(flat_optimizer=True)), "PPO_LSTM", 200.0


def _ppg_rnn_lunarlander():
    from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config
    return PPGTrainer(ppg_rnn_lunarlander_config()), "PPG_RNN", 200.0


def _noisy_dqn_flappybird():
    from gymrl_tpu.algos.dqn_variants import (
        DQNFamilyTrainer,
        noisy_dqn_flappybird_config,
    )
    return DQNFamilyTrainer(noisy_dqn_flappybird_config()), "NoisyDQN", None


def _dqn_cartpole_pixels():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, dqn_pixels_config
    return DQNFamilyTrainer(dqn_pixels_config()), "DQN_Pixels", 495.0


def _qlearning_frozenlake():
    from gymrl_tpu.algos.tabular import QLearningTrainer, qlearning_frozenlake_config
    return QLearningTrainer(qlearning_frozenlake_config()), "QLearning", None


def _qlearning_cliffwalking():
    from gymrl_tpu.algos.tabular import QLearningTrainer, qlearning_cliffwalking_config
    return QLearningTrainer(qlearning_cliffwalking_config()), "QLearning", None


def _mountaincar_baseline():
    from gymrl_tpu.algos.tabular import MountainCarBaseline
    import jax

    agent = MountainCarBaseline()
    ts = agent.init(jax.random.PRNGKey(0))
    returns, lengths = agent.eval_episodes(ts, jax.random.PRNGKey(1), 10)
    import numpy as np

    logger.info(
        f"rule-based MountainCar: {float(np.mean(np.asarray(returns))):.1f} "
        f"± {float(np.std(np.asarray(returns))):.1f} over 10 episodes"
    )
    return None


WORKLOADS = {
    "dqn_cartpole": _dqn_cartpole,
    "ddqn_per_cartpole": _ddqn_per_cartpole,
    "ddqn_per_duel_cartpole": _ddqn_per_duel_cartpole,
    "noisy_dqn_cartpole": _noisy_dqn_cartpole,
    "rainbow_dqn_cartpole": _rainbow_dqn_cartpole,
    "ppo_lunarlander": _ppo_lunarlander,
    "ppo_cartpole": _ppo_cartpole,
    "ppo_rnn_lunarlander": _ppo_rnn_lunarlander,
    "ppo_rnn_flappybird": _ppo_rnn_flappybird,
    "ppo_full_lunarlander": _ppo_full_lunarlander,
    "ppo_lstm_lunarlander": _ppo_lstm_lunarlander,
    "ppg_rnn_lunarlander": _ppg_rnn_lunarlander,
    "noisy_dqn_flappybird": _noisy_dqn_flappybird,
    "dqn_cartpole_pixels": _dqn_cartpole_pixels,
    "sac_pendulum": _sac_pendulum,
    "sac_cartpole": _sac_cartpole,
    "td3_pendulum": _td3_pendulum,
    "ddpg_pendulum": _ddpg_pendulum,
    "qlearning_frozenlake": _qlearning_frozenlake,
    "qlearning_cliffwalking": _qlearning_cliffwalking,
    "mountaincar_baseline": _mountaincar_baseline,
}


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    if not argv or argv[0] not in WORKLOADS:
        print(f"usage: python -m gymrl_tpu.run.cli <workload>\n"
              f"workloads: {', '.join(sorted(WORKLOADS))}")
        return 1

    name = argv[0]
    built = WORKLOADS[name]()
    if built is None:  # baseline-style workloads run themselves
        return 0
    trainer, algo, solve = built
    show_config(trainer.cfg, algo)
    loop = TrainLoop(trainer, algo, save_every=100_000, eval_every=100_000)
    ts, stats = loop.train(trainer.cfg.max_train_steps, solve_threshold=solve)
    loop.test(ts)
    logger.info(f"done: {stats}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
