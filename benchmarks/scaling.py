"""Weak-scaling benchmark over a device mesh (SURVEY.md §2.4 north star:
≥0.8 scaling efficiency at 4 hosts).

Runs the sharded PPO train step with the env batch scaled proportionally to
the mesh size and reports per-mesh-size env-steps/s + efficiency vs. the
1-device run. On a real pod, run under `jax.distributed`; for CI it
exercises the same code on virtual CPU devices:

    JAX_PLATFORMS=cpu XLA_FLAGS=--xla_force_host_platform_device_count=8 \
        python benchmarks/scaling.py --sizes 1 2 4 8
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time

import jax


def bench_mesh(n_devices: int, envs_per_device: int, iters: int = 3):
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
    from gymrl_tpu.distributed.mesh import make_mesh

    mesh = make_mesh(n_data=n_devices)
    cfg = PPOConfig(
        env_name="LunarLander-v3",
        num_envs=envs_per_device * n_devices,
        rollout_steps=32,
        minibatch_size=envs_per_device * n_devices * 4,
        num_epochs=2,
    )
    trainer = PPOTrainer(cfg, mesh=mesh)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    return iters * cfg.batch_total / dt


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sizes", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--envs-per-device", type=int, default=256)
    args = ap.parse_args()

    base = None
    for n in args.sizes:
        if n > len(jax.devices()):
            break
        sps = bench_mesh(n, args.envs_per_device)
        if base is None:
            base = sps
        eff = sps / (base * n)
        print(json.dumps({
            "devices": n,
            "env_steps_per_s": round(sps, 1),
            "scaling_efficiency": round(eff, 3),
        }), flush=True)


if __name__ == "__main__":
    main()
