"""Phase decomposition of the PPO train_iter at bench scale — where does
the time go? (VERDICT r2 item 3: perf work must start from a measured
breakdown, not guesses.)

Times three jitted programs on the ambient device and reports the split:
  * rollout  — the T-step lax.scan of (policy forward → env physics)
  * bootstrap+gae — the big [T·B] forward + reverse-scan GAE
  * sgd      — epoch × minibatch permutation/gather + grad steps
  * full     — the real fused train_iter (sanity: ≈ sum of phases)

Optionally writes a jax.profiler trace for the full program
(--trace DIR) to drill further.

    python benchmarks/profile_ppo.py [--num-envs 8192] [--trace DIR]

Prints one JSON line with ms per phase and the steps/s implied by full.
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--rollout-steps", type=int, default=64)
    ap.add_argument("--trace", type=str, default=None)
    args = ap.parse_args()

    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
    from gymrl_tpu.core.gae import compute_gae, standardize

    cfg = PPOConfig(
        env_name="LunarLander-v3",
        num_envs=args.num_envs,
        rollout_steps=args.rollout_steps,
        minibatch_size=16384,
        num_epochs=4,
    )
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))

    # -- phase 1: rollout only
    @jax.jit
    def rollout_only(ts):
        vec_state, obs_rms, key, roll, _ = trainer._collect(ts)
        return vec_state.obs, roll.reward  # keep outputs small

    # -- phase 2: bootstrap forward + GAE (on a fixed rollout)
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

    # -- phase 3: SGD epochs only (fixed data), PACKED shuffle — mirrors
    # the shipped _train_iter path exactly (an earlier version measured the
    # pre-r3 leaf-by-leaf pytree shuffle here, overstating this phase by
    # ~60 ms vs the fused program)
    from gymrl_tpu.algos.ppo import MinibatchData

    @jax.jit
    def sgd_only(ts, roll, adv, v_target):
        import optax

        obs_dim = roll.obs.shape[-1]
        n = cfg.batch_total
        packed = jnp.concatenate(
            [
                roll.obs.reshape(n, obs_dim),
                roll.action.reshape(n).astype(jnp.float32)[:, None],
                roll.logp.reshape(n)[:, None],
                adv.reshape(n)[:, None],
                v_target.reshape(n)[:, None],
            ],
            axis=1,
        )

        def epoch(carry, k_epoch):
            params, opt_state = carry
            perm = jax.random.permutation(k_epoch, n)
            mb_xs = packed[perm].reshape(
                (cfg.num_minibatches, cfg.minibatch_size, obs_dim + 4)
            )

            def minibatch(carry, mb):
                params, opt_state = carry
                batch = MinibatchData(
                    obs=mb[:, :obs_dim],
                    action=mb[:, obs_dim].astype(jnp.int32),
                    logp=mb[:, obs_dim + 1],
                )
                (_, metrics), grads = jax.value_and_grad(
                    trainer._loss, has_aux=True
                )(params, batch, mb[:, obs_dim + 2], mb[:, obs_dim + 3])
                updates, opt_state = trainer.tx.update(grads, opt_state, params)
                params = optax.apply_updates(params, updates)
                return (params, opt_state), metrics

            carry, metrics = jax.lax.scan(minibatch, (params, opt_state), mb_xs)
            return carry, metrics

        keys = jax.random.split(ts.key, cfg.num_epochs)
        (params, _), _ = jax.lax.scan(epoch, (ts.params, ts.opt_state), keys)
        return params

    ms_rollout = timeit(rollout_only, ts)
    ms_gae = timeit(gae_only, ts.params, roll)
    ms_sgd = timeit(sgd_only, ts, roll, adv, v_target)
    ms_full = timeit(lambda ts: trainer.train_iter(ts)[0].params, ts)

    if args.trace:
        with jax.profiler.trace(args.trace):
            out, _ = trainer.train_iter(ts)
            jax.block_until_ready(out.params)

    steps = cfg.num_envs * cfg.rollout_steps
    print(json.dumps({
        "backend": jax.default_backend(),
        "num_envs": cfg.num_envs,
        "rollout_steps": cfg.rollout_steps,
        "ms_rollout": round(ms_rollout, 1),
        "ms_bootstrap_gae": round(ms_gae, 1),
        "ms_sgd_epochs": round(ms_sgd, 1),
        "ms_full_train_iter": round(ms_full, 1),
        "env_steps_per_s_full": round(steps / (ms_full / 1e3), 1),
    }))


if __name__ == "__main__":
    main()
