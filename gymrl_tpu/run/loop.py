"""Generic host-side training loop — the framework's `BenchMark`/runner.

Replicates the reference UX (SURVEY.md §3.4-3.5, §2.2 scaffolding):
  * per-iteration console lines ``Episode | Reward | Avg(100) | Steps``
    (reference algorithms/dqn_cartpole.py:199-205),
  * avg-100-episode solve-threshold early stop (dqn_cartpole.py:207),
  * periodic deterministic evaluation with frozen normalization
    (utils/runner.py:156-158, 169-184),
  * periodic Orbax checkpoints (utils/runner.py:160-161),
  * TensorBoard metrics with NaN skipping (utils/runner.py:46-49),
  * SIGINT → graceful final evaluation (dqn_cartpole.py:256-272) — the
    loop catches KeyboardInterrupt and runs `test()`.

TPU shape: the device does `steps_per_iter` fused env+update steps per
`train_iter` call; the host only folds the (small) episode-stat arrays into
the rolling window between calls, so the device never waits on python
bookkeeping at step granularity.
"""

from __future__ import annotations

import time
from collections import deque

import jax
import numpy as np

from gymrl_tpu.utils.checkpoint import checkpoint_path, restore_checkpoint, save_checkpoint
from gymrl_tpu.utils.logging import MetricsWriter, get_logger

logger = get_logger()


class TrainLoop:
    def __init__(
        self,
        trainer,
        algo_name: str,
        *,
        log_metrics: bool = True,
        log_every: int = 20,  # train_iter calls between console lines
        eval_every: int = 0,  # env steps between evals; 0 = off
        save_every: int = 0,  # env steps between checkpoint saves; 0 = off
        eval_episodes: int = 5,
    ):
        self.trainer = trainer
        # production loop rebinds the state every iteration → donate it so
        # XLA updates replay/params in place instead of copying per iter
        trainer.donate = True
        self.algo_name = algo_name
        self.env_name = trainer.venv.env.name
        self.writer = MetricsWriter(algo_name, self.env_name, enabled=log_metrics)
        self.log_every = log_every
        self.eval_every = eval_every
        self.save_every = save_every
        self.eval_episodes = eval_episodes
        self.ckpt_path = checkpoint_path(algo_name, self.env_name)

    # -- training -------------------------------------------------------------
    def train(
        self,
        total_env_steps: int,
        *,
        solve_threshold: float | None = None,
        seed: int = 0,
        load_model: bool = False,
        ts=None,
    ):
        trainer = self.trainer
        if ts is None:
            ts = trainer.init(jax.random.PRNGKey(seed))
            if load_model:
                try:
                    ts = restore_checkpoint(self.ckpt_path, ts)
                    logger.info(f"restored checkpoint from {self.ckpt_path}")
                except Exception as e:  # non-fatal, like the reference's logger.catch
                    logger.warning(f"checkpoint restore failed ({e}); training from scratch")

        window: deque = deque(maxlen=100)
        curve: list = []  # (env_steps, avg100) at each console-log point
        episodes = 0
        iters = 0
        next_eval = self.eval_every or float("inf")
        next_save = self.save_every or float("inf")
        t0 = time.time()
        steps0 = int(ts.env_steps)
        solved = False

        env_steps = steps0
        try:
            while env_steps < total_env_steps and not solved:
                ts, out = trainer.train_iter(ts)
                iters += 1

                # ONE bundled device→host fetch per iteration instead of
                # 3-4 sequential ones (ep_done, ep_return, env_steps each
                # forced a full round trip; over a high-latency link —
                # e.g. the axon relay — the loop is RTT-bound, not
                # compute-bound: DQN solve-config train_iter is 0.24 ms
                # on-chip but the r4 loop ran ~150 ms/iter end-to-end).
                ep_done, ep_ret, env_steps = jax.device_get(
                    (out.ep_done, out.ep_return, ts.env_steps)
                )
                env_steps = int(env_steps)
                done = np.asarray(ep_done)
                if done.any():
                    finals = np.asarray(ep_ret)[done]
                    episodes += int(done.sum())
                    window.extend(finals.tolist())
                if iters % self.log_every == 0:
                    avg = float(np.mean(window)) if window else float("nan")
                    curve.append((env_steps, round(avg, 1)))
                    last = window[-1] if window else float("nan")
                    sps = (env_steps - steps0) / max(time.time() - t0, 1e-9)
                    # one bundled fetch for the whole metrics dict — same
                    # RTT argument as the per-iter bundle above
                    metrics = {
                        k: float(v)
                        for k, v in jax.device_get(out.metrics).items()
                    }
                    self.writer.log(
                        {"reward/avg100": avg, "steps_per_s": sps, **metrics}, env_steps
                    )
                    logger.info(
                        f"Episode: {episodes} | Reward: {last:.1f} | "
                        f"Avg(100): {avg:.1f} | Steps: {env_steps} | {sps:,.0f} steps/s"
                    )

                if env_steps >= next_eval:
                    next_eval += self.eval_every
                    mean_r, _ = self.evaluate(ts, episodes=self.eval_episodes)
                    self.writer.log({"reward/eval": mean_r}, env_steps)
                    logger.info(f"eval: {mean_r:.1f} over {self.eval_episodes} episodes")
                if env_steps >= next_save:
                    next_save += self.save_every
                    save_checkpoint(self.ckpt_path, ts)

                if (
                    solve_threshold is not None
                    and len(window) == window.maxlen
                    and float(np.mean(window)) >= solve_threshold
                ):
                    logger.info(
                        f"solved: avg100 {float(np.mean(window)):.1f} ≥ {solve_threshold} "
                        f"after {episodes} episodes / {env_steps} steps"
                    )
                    solved = True
        except KeyboardInterrupt:
            logger.info("interrupted — running final evaluation")

        if self.save_every:
            save_checkpoint(self.ckpt_path, ts)
        return ts, {
            "episodes": episodes,
            "env_steps": int(ts.env_steps),
            "avg100": float(np.mean(window)) if window else float("nan"),
            "solved": solved,
            "wall_s": time.time() - t0,
            "curve": curve,
        }

    # -- evaluation -----------------------------------------------------------
    def evaluate(self, ts, episodes: int = 5, seed: int = 1234):
        """Deterministic policy, frozen normalization (ref utils/runner.py:169-184)."""
        returns, lengths = self.trainer.eval_episodes(ts, jax.random.PRNGKey(seed), episodes)
        return float(np.mean(returns)), float(np.mean(lengths))

    def test(self, ts, episodes: int = 5, render: bool = False):
        """Reference `test()` = eval + a rendered episode (dqn_cartpole.py:237-253).

        Headless render: writes a GIF under ./exp/renders/ instead of a
        window when the env has a renderer.
        """
        mean_r, mean_len = self.evaluate(ts, episodes)
        logger.info(f"test: mean reward {mean_r:.1f}, mean length {mean_len:.0f}")
        if render:
            path = self.render_episode(ts)
            if path:
                logger.info(f"render saved to {path}")
        return mean_r

    def render_episode(self, ts, seed: int = 0, max_frames: int = 1000):
        """Roll one deterministic episode and save it as a GIF."""
        import os

        from gymrl_tpu.envs.render import render, save_gif

        env = self.trainer.venv.env
        params = self.trainer.venv.params
        if render(env, env.reset(params, jax.random.PRNGKey(seed))[0]) is None:
            logger.info(f"no renderer registered for {env.name}")
            return None

        step = jax.jit(env.step)
        key = jax.random.PRNGKey(seed)
        state, obs = jax.jit(env.reset)(params, key)
        frames = [render(env, jax.device_get(state))]
        # carry-through policy: recurrent trainers thread their GRU/LSTM
        # hidden across steps (ref utils/runner.py:169-206); feedforward
        # trainers get carry=None and behave exactly as before
        carry = self.trainer.policy_reset(1)
        for _ in range(min(max_frames, env.max_steps)):
            key, k_act, k_step = jax.random.split(key, 3)
            carry, action = self.trainer.policy_step(
                ts, carry, obs[None, ...], k_act, deterministic=True
            )
            action = action[0]
            sr = step(params, state, action, k_step)
            state, obs = sr.state, sr.obs
            frames.append(render(env, jax.device_get(state)))
            if bool(sr.terminated) or bool(sr.truncated):
                break
        os.makedirs("./exp/renders", exist_ok=True)
        path = f"./exp/renders/{self.algo_name}_{self.env_name}.gif"
        return save_gif(frames, path)


def run_benchmark(trainer_cls, cfg, algo_name: str, *, seed: int = 0, **loop_kwargs):
    """`BenchMark.train` equivalent (reference utils/runner.py:209-226)."""
    trainer = trainer_cls(cfg)
    loop = TrainLoop(trainer, algo_name, **loop_kwargs)
    ts, stats = loop.train(
        cfg.max_train_steps,
        solve_threshold=getattr(cfg, "solve_threshold", None),
        seed=seed,
    )
    return loop, ts, stats
