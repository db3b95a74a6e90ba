"""Phase split of the r5 bench default (flat + bf16 SGD) and the next
candidate rungs, measured as full-program deltas (same method caveats as
profile_ppo.py — phases are jitted separately, full is the fused truth).

Arms (all B=8192, T=64, 4×16384 cadence):
  * rollout-only / gae-only sub-programs (shared across arms)
  * full: flat               (the r4 default, in-session re-baseline)
  * full: flat+sgd_bf16      (the r5 default)
  * full: flat+sgd_bf16+rollout_bf16  (candidate next rung: bf16 acting
    forward too — behavior-logp rounding validated in r3,
    tests/test_ppo.py::test_rollout_bf16_runs_and_stays_close)

    python benchmarks/profile_r5.py
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import json
import time

import jax
import jax.numpy as jnp


def timeit(fn, *args, iters=8):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def main():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
    from gymrl_tpu.core.gae import compute_gae, standardize

    base = dict(env_name="LunarLander-v3", num_envs=8192, rollout_steps=64,
                minibatch_size=16384, num_epochs=4)
    steps = base["num_envs"] * base["rollout_steps"]
    out = {}

    # shared sub-programs from the plain config
    trainer = PPOTrainer(PPOConfig(**base))
    ts = trainer.init(jax.random.PRNGKey(0))

    @jax.jit
    def rollout_only(ts):
        vec_state, obs_rms, key, roll, _ = trainer._collect(ts)
        return vec_state.obs, roll.reward

    out["rollout_ms"] = round(timeit(rollout_only, ts), 2)

    _, _, _, roll, _ = jax.jit(trainer._collect)(ts)
    jax.block_until_ready(roll.obs)

    @jax.jit
    def gae_only(params, roll):
        next_nobs = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
        _, next_values = trainer.net.apply(params, next_nobs)
        next_values = next_values.reshape(roll.value.shape)
        adv, v_target = compute_gae(
            roll.reward, roll.value, next_values, roll.terminated, roll.done,
            0.99, 0.95,
        )
        return standardize(adv), v_target

    out["gae_ms"] = round(timeit(gae_only, ts.params, roll), 2)

    for name, kw in [
        ("flat", dict(flat_optimizer=True)),
        ("flat_bf16", dict(flat_optimizer=True, sgd_bf16=True)),
        ("flat_bf16_rollout_bf16",
         dict(flat_optimizer=True, sgd_bf16=True, rollout_bf16=True)),
    ]:
        tr = PPOTrainer(PPOConfig(**base, **kw))
        tr.donate = True
        tss = tr.init(jax.random.PRNGKey(0))
        tss, _ = tr.train_iter(tss)
        jax.block_until_ready(tss.params)
        t0 = time.perf_counter()
        iters = 8
        for _ in range(iters):
            tss, _ = tr.train_iter(tss)
        jax.block_until_ready(tss.params)
        ms = (time.perf_counter() - t0) / iters * 1e3
        out[name] = {"full_ms": round(ms, 2),
                     "steps_per_s": round(iters and steps / (ms / 1e3), 1),
                     "sgd_ms_approx": round(ms - out["rollout_ms"] - out["gae_ms"], 2)}
        print(json.dumps({name: out[name]}), flush=True)

    print(json.dumps(out), flush=True)
    (pathlib.Path(__file__).parent / "artifacts" / "PROFILE_PPO_r5.json").write_text(
        json.dumps(out, indent=1)
    )


if __name__ == "__main__":
    main()
