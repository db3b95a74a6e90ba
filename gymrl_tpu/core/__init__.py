from gymrl_tpu.core.normalization import (
    RunningMeanStd,
    rms_init,
    rms_update,
    rms_update_batch,
    normalize_obs,
    RewardScaler,
    reward_scaler_init,
    reward_scaler_step,
    reward_scaler_reset,
)
from gymrl_tpu.core.gae import compute_gae, compute_gae_dual_lambda
from gymrl_tpu.core.schedules import linear_anneal, exp_epsilon_decay, ref_lr_decay

__all__ = [
    "RunningMeanStd",
    "rms_init",
    "rms_update",
    "rms_update_batch",
    "normalize_obs",
    "RewardScaler",
    "reward_scaler_init",
    "reward_scaler_step",
    "reward_scaler_reset",
    "compute_gae",
    "compute_gae_dual_lambda",
    "linear_anneal",
    "exp_epsilon_decay",
    "ref_lr_decay",
]
