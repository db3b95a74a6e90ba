"""Is the rollout's 190 ms threefry? Time the env-only scan under the
default threefry2x32 PRNG vs the TPU-fast rbg PRNG, and with autoreset
disabled (stepping the raw batch with no reset/select), at bench scale.

    python benchmarks/profile_rng.py [rbg]   # arg selects the PRNG impl
"""

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import jax

if "rbg" in sys.argv[1:]:
    jax.config.update("jax_default_prng_impl", "rbg")

import jax.numpy as jnp


def timeit(fn, *args, iters=5):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3


def main():
    B, T = 8192, 64
    from gymrl_tpu.envs.registry import make_vec

    venv = make_vec("LunarLander-v3", B)
    vs = venv.reset(jax.random.PRNGKey(0))

    @jax.jit
    def full(vs, key):
        def step(carry, _):
            vs, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            act = jax.random.randint(k_act, (B,), 0, 4)
            vs, tr = venv.step(vs, act, k_step)
            return (vs, key), tr.reward

        (vs, _), rew = jax.lax.scan(step, (vs, key), None, length=T)
        return vs.obs, rew

    @jax.jit
    def no_autoreset(vs, key):
        env = venv.env

        def step(carry, _):
            st, key = carry
            key, k_act, k_step = jax.random.split(key, 3)
            act = jax.random.randint(k_act, (B,), 0, 4)
            sr = env.step_batch(venv.params, st, act, k_step)
            return (sr.state, key), sr.reward

        (st, _), rew = jax.lax.scan(step, (vs.env_state, key), None, length=T)
        return jax.tree_util.tree_leaves(st)[0], rew

    res = {
        "prng": jax.config.jax_default_prng_impl,
        "ms_env_full": round(timeit(full, vs, jax.random.PRNGKey(1)), 1),
        "ms_env_no_autoreset": round(timeit(no_autoreset, vs, jax.random.PRNGKey(1)), 1),
    }
    print(json.dumps(res), flush=True)


if __name__ == "__main__":
    main()
