from gymrl_tpu.algos.base import IterOut, Trainer
from gymrl_tpu.algos.dqn import DQNConfig, DQNTrainer
from gymrl_tpu.algos.dqn_variants import (
    DQNFamilyConfig,
    DQNFamilyTrainer,
    ddqn_per_config,
    ddqn_per_duel_config,
    noisy_dqn_config,
    rainbow_config,
)
from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
from gymrl_tpu.algos.continuous import (
    DDPGTrainer,
    DiscreteSACTrainer,
    OffPolicyConfig,
    SACTrainer,
    TD3Trainer,
    ddpg_config,
    sac_config,
    sac_discrete_config,
    td3_config,
)
from gymrl_tpu.algos.ppo_rnn import (
    PPORNNConfig,
    PPORNNTrainer,
    ppo_rnn_flappybird_config,
    ppo_rnn_lunarlander_config,
)
from gymrl_tpu.algos.ppo_full import PPOFullConfig, PPOFullTrainer
from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer
from gymrl_tpu.algos.ppg import PPGConfig, PPGTrainer
from gymrl_tpu.algos.tabular import (
    MountainCarBaseline,
    QLearningConfig,
    QLearningTrainer,
    qlearning_cliffwalking_config,
    qlearning_frozenlake_config,
)

__all__ = [
    "IterOut", "Trainer",
    "DQNConfig", "DQNTrainer",
    "DQNFamilyConfig", "DQNFamilyTrainer",
    "ddqn_per_config", "ddqn_per_duel_config", "noisy_dqn_config", "rainbow_config",
    "PPOConfig", "PPOTrainer",
    "PPORNNConfig", "PPORNNTrainer",
    "ppo_rnn_lunarlander_config", "ppo_rnn_flappybird_config",
    "PPOFullConfig", "PPOFullTrainer",
    "PPOLSTMConfig", "PPOLSTMTrainer",
    "PPGConfig", "PPGTrainer",
    "OffPolicyConfig", "DDPGTrainer", "TD3Trainer", "SACTrainer", "DiscreteSACTrainer",
    "ddpg_config", "td3_config", "sac_config", "sac_discrete_config",
    "QLearningConfig", "QLearningTrainer", "MountainCarBaseline",
    "qlearning_frozenlake_config", "qlearning_cliffwalking_config",
]
