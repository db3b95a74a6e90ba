"""Phase decomposition of the recurrent PPO train_iter (VERDICT r3 item 4:
the recurrent family's 8-11k steps/s had never been profiled).

Same method as profile_ppo.py: time jitted sub-programs on the ambient
device and compare against the fused train_iter.
  * rollout   — T-step scan of (PSCN→GRU cell forward → env step)
  * gae+pack  — advanced-hidden bootstrap forward, GAE, episode pack (or
                chunking) and the packed-shuffle matrix build
  * full      — the real fused train_iter
  * sgd       — full − rollout − gae+pack (the epoch×minibatch re-unrolls)

    python benchmarks/profile_rnn.py [--workload ppo_rnn|ppg|ppo_lstm]

Prints one JSON line with ms per phase + steps/s.
"""

from __future__ import annotations

import sys, pathlib; sys.path.insert(0, str(pathlib.Path(__file__).resolve().parents[1]))

import argparse
import json
import time

import jax


def timeit(fn, *args, iters=10):
    out = fn(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters * 1e3  # ms


def build(name):
    if name == "ppo_rnn":
        from gymrl_tpu.algos.ppo_rnn import PPORNNTrainer, ppo_rnn_lunarlander_config

        return PPORNNTrainer(ppo_rnn_lunarlander_config())
    if name == "ppg":
        from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config

        return PPGTrainer(ppg_rnn_lunarlander_config())
    if name == "ppo_lstm":
        from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer

        return PPOLSTMTrainer(PPOLSTMConfig())
    raise KeyError(name)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--workload", default="ppo_rnn")
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    trainer = build(args.workload)
    cfg = trainer.cfg
    ts = trainer.init(jax.random.PRNGKey(0))

    @jax.jit
    def rollout_only(ts):
        out = trainer._collect(ts)
        roll = out[-2]
        return roll.reward  # keep fetch small; full scan still runs

    collected = jax.jit(trainer._collect)(ts)
    roll = collected[-2]
    jax.block_until_ready(roll.obs)

    from gymrl_tpu.algos.base import pack_fields
    from gymrl_tpu.core.gae import standardize

    if args.workload == "ppo_lstm":
        from gymrl_tpu.core.gae import compute_gae_dual_lambda

        @jax.jit
        def gae_pack_only(params, roll):
            flat_h = roll.h_post.reshape(-1, roll.h_post.shape[-1])
            flat_next = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
            _, _, next_values, _, _ = trainer.net.apply(params, flat_h, flat_next)
            next_values = next_values.reshape(roll.value.shape)
            adv, ret = compute_gae_dual_lambda(
                roll.reward, roll.value, next_values, roll.done, roll.done,
                cfg.gamma, cfg.lam_actor, cfg.lam_critic,
            )
            adv = standardize(adv)
            L = cfg.seq_len
            n_chunks = cfg.rollout_steps // L

            def to_seq(x):
                import jax.numpy as jnp
                x = x.reshape((n_chunks, L) + x.shape[1:])
                x = jnp.moveaxis(x, 2, 1)
                return x.reshape((n_chunks * cfg.num_envs, L) + x.shape[3:])

            data = {
                "obs": to_seq(roll.obs), "action": to_seq(roll.action),
                "logp": to_seq(roll.logp), "old_entropy": to_seq(roll.entropy),
                "old_value": to_seq(roll.value), "adv": to_seq(adv),
                "ret": to_seq(ret), "h0": to_seq(roll.h_pre)[:, 0],
            }
            packed, _ = pack_fields(data)
            return packed
    else:
        from gymrl_tpu.core.gae import compute_gae

        @jax.jit
        def gae_pack_only(params, roll):
            flat_h = roll.h_post.reshape(-1, roll.h_post.shape[-1])
            flat_next = roll.next_obs.reshape(-1, roll.next_obs.shape[-1])
            _, _, next_values = trainer._apply_cell(params, flat_h, flat_next)
            next_values = next_values.reshape(roll.value.shape)
            adv, v_target = compute_gae(
                roll.reward, roll.value, next_values, roll.terminated, roll.done,
                cfg.gamma, cfg.gae_lambda,
            )
            adv = standardize(adv)
            data, _, _ = trainer._training_data(roll, adv, v_target)
            packed, _ = pack_fields(data)
            return packed

    trainer.donate = False
    ms_rollout = timeit(rollout_only, ts, iters=args.iters)
    ms_gae_pack = timeit(gae_pack_only, ts.params, roll, iters=args.iters)
    ms_full = timeit(lambda ts: trainer.train_iter(ts)[0].env_steps, ts,
                     iters=args.iters)

    steps = cfg.num_envs * cfg.rollout_steps
    print(json.dumps({
        "workload": args.workload,
        "num_envs": cfg.num_envs,
        "rollout_steps": cfg.rollout_steps,
        "ms_rollout": round(ms_rollout, 2),
        "ms_gae_pack": round(ms_gae_pack, 2),
        "ms_full": round(ms_full, 2),
        "ms_sgd_derived": round(ms_full - ms_rollout - ms_gae_pack, 2),
        "env_steps_per_s": round(steps / (ms_full / 1e3), 1),
    }))


if __name__ == "__main__":
    main()
