"""Round-5 TPU measurement queue (one long-lived client; stages run
sequentially — never run concurrently with another TPU client).

Stages:
  * rnn_bscale — ppo_rnn B-scaling (VERDICT r4 #6): chunk-mode steps/s at
    B=32/128/512 and the whole-episode solve config, each with the flat
    raveled-vector optimizer off/on. Shows where the ~25k steps/s solve-
    config floor comes from (parity cadence, not the framework).
  * rnn_flatopt_families — ppg + ppo_lstm solve-config throughput,
    flat_optimizer off/on.
  * bf16_bench — bench-scale flagship A/B: flat (the r4 bench default)
    vs flat+sgd_bf16 (VERDICT r4 #8 stretch).
  * gamma99_retry — ddqn_per γ=0.99 chronic seed 1 (+ fresh seeds 3,4)
    at the 3M budget.
  * flatopt_solve — 3-seed learning validation of the recurrent flat
    optimizer at the ppo_rnn whole-episode solve config.

    python benchmarks/tpu_session_r5.py [stage ...]
"""

from __future__ import annotations

import json
import pathlib
import runpy
import sys
import time
import traceback

HERE = pathlib.Path(__file__).resolve().parent
sys.path.insert(0, str(HERE.parent))
ART = HERE / "artifacts"


def run_script(script: str, argv: list[str]):
    t0 = time.time()
    print(json.dumps({"stage": script, "argv": argv, "start": 1}), flush=True)
    old = sys.argv
    try:
        sys.argv = [script] + argv
        runpy.run_path(str(HERE / script), run_name="__main__")
        print(json.dumps({"stage": script, "ok": True,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    except SystemExit as e:
        print(json.dumps({"stage": script, "ok": e.code in (0, None),
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    except Exception:
        traceback.print_exc()
        print(json.dumps({"stage": script, "ok": False,
                          "wall_s": round(time.time() - t0, 1)}), flush=True)
    finally:
        sys.argv = old


def time_trainer(trainer, iters=5):
    import jax

    trainer.donate = True
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    t0 = time.perf_counter()
    for _ in range(iters):
        ts, _ = trainer.train_iter(ts)
    jax.block_until_ready(ts.params)
    dt = time.perf_counter() - t0
    cfg = trainer.cfg
    return iters * cfg.num_envs * cfg.rollout_steps / dt


def stage_rnn_bscale(out):
    from gymrl_tpu.algos.ppo_rnn import (
        PPORNNConfig, PPORNNTrainer, ppo_rnn_lunarlander_config,
    )

    rows = []
    for flat in (False, True):
        for B in (32, 128, 512):
            cfg = PPORNNConfig(env_name="LunarLander-v3", num_envs=B,
                               rollout_steps=128, seq_len=16,
                               seq_minibatch=64, flat_optimizer=flat)
            sps = time_trainer(PPORNNTrainer(cfg))
            rows.append({"mode": "chunk", "num_envs": B, "flat": flat,
                         "steps_per_s": round(sps, 1)})
            print(json.dumps(rows[-1]), flush=True)
        cfg = ppo_rnn_lunarlander_config(flat_optimizer=flat)
        sps = time_trainer(PPORNNTrainer(cfg))
        rows.append({"mode": "whole_episode_solve_cfg", "num_envs": cfg.num_envs,
                     "flat": flat, "steps_per_s": round(sps, 1)})
        print(json.dumps(rows[-1]), flush=True)
    (ART / "RNN_BSCALE_r5.json").write_text(json.dumps(rows, indent=1))


def stage_rnn_flatopt_families(out):
    from gymrl_tpu.algos.ppg import PPGTrainer, ppg_rnn_lunarlander_config
    from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer

    rows = []
    for flat in (False, True):
        sps = time_trainer(PPGTrainer(ppg_rnn_lunarlander_config(flat_optimizer=flat)))
        rows.append({"family": "ppg_solve_cfg", "flat": flat,
                     "steps_per_s": round(sps, 1)})
        print(json.dumps(rows[-1]), flush=True)
        sps = time_trainer(PPOLSTMTrainer(PPOLSTMConfig(flat_optimizer=flat)))
        rows.append({"family": "ppo_lstm_solve_cfg", "flat": flat,
                     "steps_per_s": round(sps, 1)})
        print(json.dumps(rows[-1]), flush=True)
    (ART / "RNN_FLATOPT_r5.json").write_text(json.dumps(rows, indent=1))


def stage_bf16_bench(out):
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    rows = []
    for bf16 in (False, True):
        cfg = PPOConfig(env_name="LunarLander-v3", num_envs=8192,
                        rollout_steps=64, minibatch_size=16384, num_epochs=4,
                        flat_optimizer=True, sgd_bf16=bf16)
        sps = time_trainer(PPOTrainer(cfg))
        rows.append({"arm": "flat+sgd_bf16" if bf16 else "flat",
                     "steps_per_s": round(sps, 1)})
        print(json.dumps(rows[-1]), flush=True)
    (ART / "AB_BF16_r5.json").write_text(json.dumps(rows, indent=1))


def main(argv):
    stages = argv or ["rnn_bscale", "rnn_flatopt_families", "bf16_bench",
                      "gamma99_retry", "flatopt_solve"]
    art = str(ART)
    if "rnn_bscale" in stages:
        stage_rnn_bscale(art)
    if "rnn_flatopt_families" in stages:
        stage_rnn_flatopt_families(art)
    if "bf16_bench" in stages:
        stage_bf16_bench(art)
    if "gamma99_retry" in stages:
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r5.jsonl", "--seeds", "1,3,4",
                    "ddqn_per_cartpole_gamma99_3m"])
    if "flatopt_solve" in stages:
        run_script("solve_curves.py",
                   ["--out", f"{art}/SOLVE_r5.jsonl", "--seeds", "0,1,2",
                    "ppo_rnn_we_lunarlander_flatopt"])
    print("R5_SESSION_DONE", flush=True)


if __name__ == "__main__":
    main(sys.argv[1:])
