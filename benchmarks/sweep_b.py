"""Quick throughput sweep over num_envs for the PPO bench config."""

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json
import sys
import time

import jax


def run(num_envs: int, rollout_steps: int = 64):
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    cfg = PPOConfig(
        env_name="LunarLander-v3",
        num_envs=num_envs,
        rollout_steps=rollout_steps,
        minibatch_size=min(16384, num_envs * rollout_steps // 8),
        num_epochs=4,
    )
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, out = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    sps = iters * num_envs * rollout_steps / dt
    print(json.dumps({"num_envs": num_envs, "rollout_steps": rollout_steps,
                      "steps_per_s": round(sps, 1)}), flush=True)


if __name__ == "__main__":
    for b in [int(x) for x in sys.argv[1:]] or [2048, 4096, 8192, 16384]:
        run(b)
