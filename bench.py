"""Throughput benchmark: PPO on pure-JAX LunarLander, single chip.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline north star (BASELINE.json): 1M env-steps/s aggregate on
PPO-LunarLander at 1 host. vs_baseline = value / 1e6.

SGD-cadence deviation, stated for the record: this config runs 4 epochs x
minibatch 16384 (128 grad steps per 524288-sample rollout). The reference
workload (algorithms/ppo_lunarlander.py:261-272) runs 10 epochs x
minibatch 64 — preserving that cadence at B=8192 would mean 81,920
sequential grad steps per rollout, which no batch-scaled runner would
ship. The solve configs (algos/ppo.py defaults, SOLVE_r*.jsonl) keep the
reference cadence exactly; a reference-cadence throughput number at the
reference's own scale (B=32, T=64, mb=64, 10 epochs) is recorded
alongside the family matrix in THROUGHPUT_r4.json
(benchmarks/throughput.py). The bench config has been held fixed since
round 1, so cross-round vs_baseline ladders are like-for-like.
"""

import json
import time

import jax


def main():
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    cfg = PPOConfig(
        env_name="LunarLander-v3",
        num_envs=8192,
        rollout_steps=64,
        minibatch_size=16384,
        num_epochs=4,
        # r4: optimizer on one raveled master vector — same update math
        # (reductions re-associated only; CPU equivalence-checked, TPU
        # solve-validated), +3.6% at bench scale (5.83M vs 5.63M in the
        # same session — benchmarks/artifacts/tpu_session_r4b.log flatopt
        # A/B). First config change since r1; stated here for ladder
        # comparability.
        flat_optimizer=True,
        # r5: bf16 minibatch forward/backward with f32 master params +
        # optimizer state — +9.6% same-session A/B (5.73M → 6.28M,
        # AB_BF16_r5.json) and solve-validated 3/3 both alone
        # (ppo_lunarlander_sgd_bf16: 119k/139k/131k) and in this exact
        # combo (ppo_lunarlander_flat_bf16: 205k/250k/131k — SOLVE_r5).
        sgd_bf16=True,
        # r5: unroll 8 SGD bodies per scan iteration — the 128 grad steps
        # are latency-bound, and the longer straight-line program schedules
        # better (+1.4% same-session, AB_UNROLL_r5.json). Identical math.
        sgd_unroll=8,
        # r5: same trick on the T-step collection scan (+1.0%,
        # AB_UNROLL_r5.json rollout section). Identical math.
        rollout_unroll=8,
    )
    trainer = PPOTrainer(cfg)
    trainer.donate = True  # rebinding loop → in-place state buffers
    ts = trainer.init(jax.random.PRNGKey(0))

    # compile + warmup
    ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)

    iters = 5
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, out = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0

    steps = iters * cfg.num_envs * cfg.rollout_steps
    sps = steps / dt
    print(json.dumps({
        "metric": "ppo_lunarlander_env_steps_per_s",
        "value": round(sps, 1),
        "unit": "steps/s",
        "vs_baseline": round(sps / 1_000_000, 4),
    }))


if __name__ == "__main__":
    main()
