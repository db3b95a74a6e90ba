#!/bin/bash
# r5 wave 2: solve validations for candidate defaults + dense overlay curves
cd /root/repo
OUT=benchmarks/artifacts/SOLVE_r5.jsonl
# 3-seed learning validation of the new default candidates
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $OUT --seeds 0,1,2 \
  ppo_lunarlander_sgd_bf16 ppo_lunarlander_flat_bf16 \
  ppg_rnn_lunarlander_flatopt ppo_lstm_lunarlander_flatopt
# dense curves for the three new overlay panels
DOUT=benchmarks/artifacts/SOLVE_r5_overlay.jsonl
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $DOUT --seeds 0,1 --log-every 2 \
  ddqn_per_cartpole_ref1to1 ddqn_per_duel_cartpole_ref1to1
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $DOUT --seeds 0,1,2 --log-every 3 \
  ddqn_per_cartpole_gamma99 ddqn_per_duel_cartpole_gamma99
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $DOUT --seeds 0,1,2,3,4 --log-every 2 \
  td3_pendulum_ratio1
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $DOUT --seeds 0,1,2 --log-every 2 \
  td3_pendulum
echo ALL_DONE_WAVE2
