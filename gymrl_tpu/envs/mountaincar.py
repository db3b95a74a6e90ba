"""Pure-JAX MountainCar-v0 engine (gymnasium semantics).

Canonical env of the reference's rule-based baseline
(algorithms/mountaincar_baseline.py). Discrete 3 actions, vel += (a−1)·0.001
− cos(3·pos)·0.0025, pos ∈ [−1.2, 0.6], vel ∈ ±0.07, left-wall velocity
zeroing, goal at pos ≥ 0.5 (vel ≥ 0), reward −1/step, 200-step limit,
init pos ∈ U(−0.6, −0.4), vel = 0.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult, time_limit


class MountainCarParams(NamedTuple):
    min_position: float = -1.2
    max_position: float = 0.6
    max_speed: float = 0.07
    goal_position: float = 0.5
    goal_velocity: float = 0.0
    force: float = 0.001
    gravity: float = 0.0025


class MountainCarState(NamedTuple):
    position: jax.Array
    velocity: jax.Array
    t: jax.Array


class MountainCar(Env):
    name = "MountainCar-v0"
    n_actions = 3
    obs_shape = (2,)
    max_steps = 200

    def default_params(self) -> MountainCarParams:
        return MountainCarParams()

    def _obs(self, state: MountainCarState) -> jax.Array:
        return jnp.stack([state.position, state.velocity]).astype(jnp.float32)

    def reset(self, params: MountainCarParams, key):
        position = jax.random.uniform(key, (), jnp.float32, -0.6, -0.4)
        state = MountainCarState(position, jnp.zeros((), jnp.float32), jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def step(self, params: MountainCarParams, state: MountainCarState, action, key) -> StepResult:
        velocity = state.velocity + (action.astype(jnp.float32) - 1.0) * params.force + jnp.cos(
            3.0 * state.position
        ) * (-params.gravity)
        velocity = jnp.clip(velocity, -params.max_speed, params.max_speed)
        position = jnp.clip(state.position + velocity, params.min_position, params.max_position)
        velocity = jnp.where(
            (position == params.min_position) & (velocity < 0.0), 0.0, velocity
        )
        t = state.t + 1

        new_state = MountainCarState(position, velocity, t)
        terminated = (position >= params.goal_position) & (velocity >= params.goal_velocity)
        truncated = time_limit(t, self.max_steps, terminated)
        reward = jnp.full((), -1.0, jnp.float32)
        return StepResult(new_state, self._obs(new_state), reward, terminated, truncated)
