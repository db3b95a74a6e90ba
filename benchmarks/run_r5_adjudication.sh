#!/bin/bash
# r5 adjudication sweeps — sequential TPU clients (never concurrent)
cd /root/repo
OUT=benchmarks/artifacts/SOLVE_r5.jsonl
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $OUT --seeds 0,1 --log-every 3 \
  ddqn_per_cartpole_ref1to1 ddqn_per_duel_cartpole_ref1to1
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $OUT --seeds 0,1,2 \
  ddqn_per_cartpole_gamma99 ddqn_per_duel_cartpole_gamma99
PYTHONUNBUFFERED=1 python benchmarks/solve_curves.py --out $OUT --seeds 0,1,2,3,4 \
  td3_pendulum_ratio1
echo ALL_DONE
