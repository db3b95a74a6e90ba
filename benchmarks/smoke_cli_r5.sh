#!/bin/bash
# final whole-surface CLI smoke: every remaining workload family gets a
# short TPU drive through the r5 loop (SIGINT -> final eval path)
cd /root/repo
for w in dqn_cartpole ddqn_per_cartpole ddqn_per_duel_cartpole noisy_dqn_cartpole \
         rainbow_dqn_cartpole sac_pendulum sac_cartpole td3_pendulum ddpg_pendulum \
         qlearning_frozenlake qlearning_cliffwalking mountaincar_baseline \
         ppo_lunarlander ppo_lstm_lunarlander ppg_rnn_lunarlander \
         noisy_dqn_flappybird ppo_rnn_flappybird dqn_cartpole_pixels; do
  echo "=== $w"
  PYTHONUNBUFFERED=1 timeout -s INT 200 python -m gymrl_tpu.run.cli $w 2>&1 | tail -n 2
done
echo SMOKE_DONE
