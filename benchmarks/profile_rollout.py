"""Micro-profile of the PPO rollout phase: where do 238 ms go?

Splits the rollout scan (the 62% phase, PROFILE_r3.md) into
  * env-only   — vmapped LunarLander physics + autoreset, random actions
  * fwd-only   — policy forward + categorical sample over a fixed obs batch
  * full       — the real interleaved rollout
and re-times env-only at reduced contact-solver sweep counts
(gymrl_tpu.envs.lunarlander.SOLVER_SWEEPS) to size the solver's share.

    python benchmarks/profile_rollout.py [--num-envs 8192] [--steps 64]
"""

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import importlib
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
    return (time.perf_counter() - t0) / iters * 1e3


def env_only_ms(B, T):
    from gymrl_tpu.envs.registry import make_vec

    venv = make_vec("LunarLander-v3", B)
    vs = venv.reset(jax.random.PRNGKey(0))

    @jax.jit
    def run(vs, key):
        def step(carry, _):
            vs, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            act = jax.random.randint(k_act, (B,), 0, 4)
            vs, tr = venv.step(vs, act, k_step)
            return (vs, key), tr.reward

        (vs, _), rew = jax.lax.scan(step, (vs, key), None, length=T)
        return vs.obs, rew

    return timeit(run, vs, jax.random.PRNGKey(1))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--num-envs", type=int, default=8192)
    ap.add_argument("--steps", type=int, default=64)
    args = ap.parse_args()
    B, T = args.num_envs, args.steps

    import gymrl_tpu.envs.lunarlander as ll

    res = {"num_envs": B, "steps": T, "backend": jax.default_backend()}

    # env-only at the shipped sweep count and reduced counts
    for sweeps in (10, 4, 1, 0):
        ll.SOLVER_SWEEPS = sweeps
        # new env instances pick up the module constant (Python unroll)
        res[f"ms_env_only_sweeps{sweeps}"] = round(env_only_ms(B, T), 1)
    ll.SOLVER_SWEEPS = 10

    # forward + sample only (fixed obs, no env)
    from gymrl_tpu.algos.ppo import ActorCritic

    net = ActorCritic(4, 256)
    obs = jnp.zeros((B, 8), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), obs)

    @jax.jit
    def fwd(params, key):
        def step(key, _):
            key, k = jax.random.split(key)
            logits, value = net.apply(params, obs)
            act = jax.random.categorical(k, logits)
            return key, (act, value)

        _, outs = jax.lax.scan(step, key, None, length=T)
        return outs

    res["ms_forward_sample_only"] = round(timeit(fwd, params, jax.random.PRNGKey(2)), 1)

    # the autoreset tax: VecEnv evaluates reset() for the whole batch on
    # every step (selected per-env by done) — T batched resets ≈ its cost
    from gymrl_tpu.envs.registry import make_vec

    venv = make_vec("LunarLander-v3", B)

    @jax.jit
    def resets(key):
        def step(key, _):
            key, k = jax.random.split(key)
            vs = venv.reset(k)
            return key, vs.obs[0, 0]
        _, outs = jax.lax.scan(step, key, None, length=T)
        return outs

    res["ms_batched_reset_xT"] = round(timeit(resets, jax.random.PRNGKey(3)), 1)

    print(json.dumps(res))


if __name__ == "__main__":
    main()
