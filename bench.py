"""Throughput benchmark: PPO on pure-JAX LunarLander, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.json): 1M env-steps/s aggregate on
PPO-LunarLander at 1 host. vs_baseline = value / 1e6.
"""

import json
import time

import jax


def main():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    cfg = PPOConfig(
        env_name="LunarLander-v3",
        num_envs=8192,
        rollout_steps=64,
        minibatch_size=16384,
        num_epochs=4,
    )
    trainer = PPOTrainer(cfg)
    trainer.donate = True  # rebinding loop → in-place state buffers
    ts = trainer.init(jax.random.PRNGKey(0))

    # compile + warmup
    ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, out = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0

    steps = iters * cfg.num_envs * cfg.rollout_steps
    sps = steps / dt
    print(json.dumps({
        "metric": "ppo_lunarlander_env_steps_per_s",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
