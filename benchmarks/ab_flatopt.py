"""A/B the flat-vector optimizer at bench scale (TPU) — the r4 attack on
the SGD floor (PROFILE_r3.md: 128 sequential grad steps, optimizer
elementwise tail). Same update math, re-associated reductions only.

    python benchmarks/ab_flatopt.py

Prints one JSON line per arm.
"""
import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import json, time, jax

for flat in (False, True):
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    cfg = PPOConfig(env_name="LunarLander-v3", num_envs=8192, rollout_steps=64,
                    minibatch_size=16384, num_epochs=4, flat_optimizer=flat)
    tr = PPOTrainer(cfg)
    tr.donate = True
    ts = tr.init(jax.random.PRNGKey(0))
    ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    iters = 5
    for _ in range(iters):
        ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    sps = iters * cfg.num_envs * cfg.rollout_steps / dt
    print(json.dumps({"arm": "flat" if flat else "pytree",
                      "steps_per_s": round(sps, 1)}), flush=True)
