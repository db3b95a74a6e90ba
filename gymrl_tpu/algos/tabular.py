"""Tabular Q-learning + the rule-based MountainCar baseline.

Reference parity:
  * FrozenLake Q-learning — algorithms/qlearning_frozenlake.py: Q-table
    [16, 4] (:47), lr 0.1, γ 0.9, ε exp decay (start 0.95, end 0.01,
    decay 200, counted per action selection :56-61), TD(0) with
    done-cut target (:84-92), reward shaping hole −10 / goal +100 /
    no-move −5 / step −1 applied on next_state (:63-79).
  * CliffWalking Q-learning — algorithms/qlearning_cliffwalking.py: same
    update, decay 300, NO shaping (:61-69).
  * MountainCar rule policy — algorithms/mountaincar_baseline.py:35-45:
    push right inside the phase-space band lb < v < ub, else push left.

TPU-native: the Q-table is a device array updated by scatter; B lockstep
envs emit B TD updates per step applied with a segment-mean (duplicate
(s,a) pairs within a step average their targets — at the reference's
single-env cadence this reduces to the exact reference update). The whole
iteration (act → step → scatter-update) is one fused scan.
"""

from __future__ import annotations

from dataclasses import dataclass
from functools import partial
from typing import Any, NamedTuple

import jax
import jax.numpy as jnp

from gymrl_tpu.algos.base import IterOut, Trainer
from gymrl_tpu.core.schedules import exp_epsilon_decay
from gymrl_tpu.envs.registry import make_vec


@dataclass(frozen=True)
class QLearningConfig:
    env_name: str = "FrozenLake-v1"
    num_envs: int = 16
    steps_per_iter: int = 64
    lr: float = 0.1
    gamma: float = 0.9
    epsilon_start: float = 0.95
    epsilon_end: float = 0.01
    epsilon_decay: float = 200.0
    use_reward_shaping: bool = True  # FrozenLake only
    max_train_steps: int = 200_000
    solve_threshold: float | None = None


# FrozenLake 4x4 shaping constants (qlearning_frozenlake.py:63-79)
_FL_HOLES = (5, 7, 11, 12)
_FL_GOAL = 15


def _shape_frozenlake(state, next_state, reward):
    is_hole = jnp.isin(next_state, jnp.asarray(_FL_HOLES))
    is_goal = next_state == _FL_GOAL
    no_move = state == next_state
    return jnp.where(
        is_hole, -10.0, jnp.where(is_goal, 100.0, jnp.where(no_move, -5.0, -1.0))
    )


class QLearningTrainState(NamedTuple):
    q_table: jax.Array  # f32[n_states, n_actions]
    vec_state: Any
    key: jax.Array
    env_steps: jax.Array
    sample_count: jax.Array  # drives ε decay (per action selection)


class QLearningTrainer(Trainer):
    def __init__(self, cfg: QLearningConfig):
        super().__init__(cfg)
        self.venv = make_vec(cfg.env_name, cfg.num_envs)
        self.n_states = self.venv.env.n_states
        self.n_actions = self.venv.env.n_actions
        self.shaped = cfg.use_reward_shaping and cfg.env_name.startswith("FrozenLake")

    def init(self, key) -> QLearningTrainState:
        k_env, k_iter = jax.random.split(key)
        return QLearningTrainState(
            q_table=jnp.zeros((self.n_states, self.n_actions), jnp.float32),
            vec_state=self.venv.reset(k_env),
            key=k_iter,
            env_steps=jnp.zeros((), jnp.int32),
            sample_count=jnp.zeros((), jnp.int32),
        )

    def policy(self, ts, obs, key, deterministic: bool = True):
        return jnp.argmax(ts.q_table[obs], axis=-1).astype(jnp.int32)

    def _train_iter(self, ts: QLearningTrainState) -> tuple[QLearningTrainState, IterOut]:
        cfg = self.cfg

        def env_step(ts: QLearningTrainState, _):
            key, k_eps, k_rand, k_step = jax.random.split(ts.key, 4)
            obs = ts.vec_state.obs  # i32[B] cell indices
            eps = exp_epsilon_decay(
                ts.sample_count, cfg.epsilon_start, cfg.epsilon_end, cfg.epsilon_decay
            )
            greedy = jnp.argmax(ts.q_table[obs], axis=-1).astype(jnp.int32)
            randoms = jax.random.randint(k_rand, (cfg.num_envs,), 0, self.n_actions)
            explore = jax.random.uniform(k_eps, (cfg.num_envs,)) < eps
            action = jnp.where(explore, randoms, greedy)

            vec_state, tr = self.venv.step(ts.vec_state, action, k_step)
            next_obs = tr.next_obs  # true successor (terminal cell at done)
            reward = tr.reward
            if self.shaped:
                reward = _shape_frozenlake(obs, next_obs, reward)

            # TD(0): target = r (+ γ max Q(s') unless done) — ref :84-92
            max_next = jnp.max(ts.q_table[next_obs], axis=-1)
            target = reward + cfg.gamma * max_next * (1.0 - tr.done.astype(jnp.float32))
            td = target - ts.q_table[obs, action]
            # Batched scatter: duplicates within the step average their TDs
            # (segment mean) so the effective lr per (s,a) stays cfg.lr.
            num = jnp.zeros_like(ts.q_table).at[obs, action].add(td)
            cnt = jnp.zeros_like(ts.q_table).at[obs, action].add(1.0)
            q_table = ts.q_table + cfg.lr * num / jnp.maximum(cnt, 1.0)

            new_ts = QLearningTrainState(
                q_table=q_table, vec_state=vec_state, key=key,
                env_steps=ts.env_steps + cfg.num_envs,
                sample_count=ts.sample_count + cfg.num_envs,
            )
            return new_ts, (tr.final_return, tr.final_length, tr.done, eps)

        ts, (ep_ret, ep_len, ep_done, epss) = jax.lax.scan(
            env_step, ts, None, length=cfg.steps_per_iter
        )
        out = IterOut(
            ep_return=ep_ret, ep_length=ep_len, ep_done=ep_done,
            metrics={"epsilon": epss[-1], "q_max": jnp.max(ts.q_table)},
        )
        return ts, out

    def success_rate(self, ts, key, episodes: int = 20) -> float:
        """FrozenLake eval metric (qlearning_frozenlake.py:131-152)."""
        returns, _ = self.eval_episodes(ts, key, episodes)
        return float((jnp.asarray(returns) > 0).mean())


def qlearning_frozenlake_config(**kw) -> QLearningConfig:
    base = dict(env_name="FrozenLake-v1", epsilon_decay=200.0, use_reward_shaping=True)
    base.update(kw)
    return QLearningConfig(**base)


def qlearning_cliffwalking_config(**kw) -> QLearningConfig:
    base = dict(env_name="CliffWalking-v0", epsilon_decay=300.0, use_reward_shaping=False)
    base.update(kw)
    return QLearningConfig(**base)


class MountainCarBaseline(Trainer):
    """Hand-crafted phase-space policy (mountaincar_baseline.py:26-45)."""

    def __init__(self, cfg=None):
        super().__init__(cfg)
        self.venv = make_vec("MountainCar-v0", 1)

    def init(self, key):
        class _TS(NamedTuple):
            env_steps: jax.Array

        return _TS(env_steps=jnp.zeros((), jnp.int32))

    def policy(self, ts, obs, key, deterministic: bool = True):
        position, velocity = obs[..., 0], obs[..., 1]
        lb = jnp.minimum(
            -0.09 * (position + 0.25) ** 2 + 0.03,
            0.3 * (position + 0.9) ** 4 - 0.008,
        )
        ub = -0.07 * (position + 0.38) ** 2 + 0.07
        return jnp.where((lb < velocity) & (velocity < ub), 2, 0).astype(jnp.int32)
