"""Run the full TPU measurement queue inside ONE process/client.

The axon relay in this environment wedges when clients connect in quick
succession (CLAUDE.md "Environment gotchas"); batching every measurement
into a single long-lived client avoids reconnects. Prints one JSON line
per result as it goes, so partial progress survives a wedge mid-queue.

    python benchmarks/tpu_session.py [--skip-bf16] [--skip-profile]
"""

from __future__ import annotations

import json
import pathlib
import sys
import time

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp


def bench_arm(tag: str, iters: int = 5, **cfg_kw):
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    cfg = PPOConfig(
        env_name="LunarLander-v3", num_envs=8192, rollout_steps=64,
        minibatch_size=16384, num_epochs=4, **cfg_kw,
    )
    tr = PPOTrainer(cfg)
    tr.donate = True
    ts = tr.init(jax.random.PRNGKey(0))
    ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, _ = tr.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    sps = iters * cfg.num_envs * cfg.rollout_steps / dt
    print(json.dumps({"arm": tag, "steps_per_s": round(sps, 1), **cfg_kw}),
          flush=True)
    return sps


def profile_phases():
    """Phase split at bench scale (see profile_ppo.py for the standalone)."""
    import optax
    from jax import tree_util as jtu

    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
    from gymrl_tpu.core.gae import compute_gae, standardize

    cfg = PPOConfig(env_name="LunarLander-v3", num_envs=8192, rollout_steps=64,
                    minibatch_size=16384, num_epochs=4)
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))

    def timeit(fn, *args, iters=5):
        out = fn(*args)
        jax.block_until_ready(out)
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        jax.block_until_ready(out)
        return (time.perf_counter() - t0) / iters * 1e3

    @jax.jit
    def rollout_only(ts):
        vec_state, obs_rms, key, roll, _ = trainer._collect(ts)
        return vec_state.obs, roll.reward

    _, _, _, roll, _ = jax.jit(trainer._collect)(ts)
    jax.block_until_ready(roll.obs)

    @jax.jit
    def gae_only(params, roll):
        next_nobs = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
        _, next_values = trainer.net.apply(params, next_nobs)
        next_values = next_values.reshape(roll.value.shape)
        adv, v_target = compute_gae(
            roll.reward, roll.value, next_values, roll.terminated, roll.done,
            cfg.gamma, cfg.gae_lambda,
        )
        return standardize(adv), v_target

    adv, v_target = gae_only(ts.params, roll)
    jax.block_until_ready(adv)

    @jax.jit
    def sgd_only(ts, roll, adv, v_target):
        flat = jtu.tree_map(
            lambda x: x.reshape((cfg.batch_total,) + x.shape[2:]), roll
        )
        adv_flat, ret_flat = adv.reshape(-1), v_target.reshape(-1)

        def epoch(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, cfg.batch_total)

            def to_mb(x):
                return x[perm].reshape(
                    (cfg.num_minibatches, cfg.minibatch_size) + x.shape[1:]
                )

            mb_xs = (jtu.tree_map(to_mb, flat), to_mb(adv_flat), to_mb(ret_flat))

            def minibatch(carry, mb):
                params, opt_state = carry
                batch, adv_mb, ret_mb = mb
                (_, m), grads = jax.value_and_grad(trainer._loss, has_aux=True)(
                    params, batch, adv_mb, ret_mb
                )
                updates, opt_state = trainer.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), m

            carry, m = jax.lax.scan(minibatch, (params, opt_state), mb_xs)
            return carry, m

        keys = jax.random.split(ts.key, cfg.num_epochs)
        (params, _), _ = jax.lax.scan(epoch, (ts.params, ts.opt_state), keys)
        return params

    res = {
        "ms_rollout": round(timeit(rollout_only, ts), 1),
        "ms_bootstrap_gae": round(timeit(gae_only, ts.params, roll), 1),
        "ms_sgd_epochs": round(timeit(sgd_only, ts, roll, adv, v_target), 1),
    }
    print(json.dumps({"arm": "profile_phases", **res}), flush=True)


def main(argv):
    print(json.dumps({"arm": "backend", "backend": jax.default_backend(),
                      "devices": str(jax.devices())}), flush=True)
    bench_arm("baseline")
    if "--skip-bf16" not in argv:
        bench_arm("bf16", rollout_bf16=True)
        bench_arm("sgd_bf16", sgd_bf16=True)
        bench_arm("all_bf16", rollout_bf16=True, sgd_bf16=True)
    if "--skip-profile" not in argv:
        profile_phases()


if __name__ == "__main__":
    main(sys.argv[1:])
