import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))
import time, jax
from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

for use_pallas in (False, True):
    cfg = PPOConfig(env_name="LunarLander-v3", num_envs=8192, rollout_steps=64,
                    minibatch_size=16384, num_epochs=4, use_pallas=use_pallas)
    tr = PPOTrainer(cfg)
    ts = tr.init(jax.random.PRNGKey(0))
    ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    for _ in range(5):
        ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    print(f"use_pallas={use_pallas}: {5*cfg.num_envs*cfg.rollout_steps/dt:,.0f} steps/s", flush=True)
