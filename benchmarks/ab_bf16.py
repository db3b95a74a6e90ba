"""A/B the bf16 rollout-forward flag at bench scale (TPU).

    python benchmarks/ab_bf16.py

Prints one JSON line per arm. (The companion Pallas A/B was measured and
deleted in round 3 after losing by 5.9% — PALLAS_AB_r3.json and the
history note in PPOConfig record the outcome.)
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time, jax
from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

for rollout_bf16 in (False, True):
    cfg = PPOConfig(env_name="LunarLander-v3", num_envs=8192, rollout_steps=64,
                    minibatch_size=16384, num_epochs=4, rollout_bf16=rollout_bf16)
    tr = PPOTrainer(cfg)
    tr.donate = True
    ts = tr.init(jax.random.PRNGKey(0))
    ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    for _ in range(5):
        ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    print(json.dumps({"rollout_bf16": rollout_bf16,
                      "steps_per_s": round(5 * cfg.num_envs * cfg.rollout_steps / dt, 1)}),
          flush=True)
