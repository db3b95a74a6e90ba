"""Pure-JAX Pendulum-v1 engine.

Gymnasium semantics (canonical env for DDPG/TD3/SAC — e.g.
reference algorithms/sac_pendulum.py): torque clipped to ±2, reward
−(Δθ² + 0.1·θ̇² + 0.001·u²), dt=0.05, g=10, m=1, l=1, θ̇ clipped ±8,
init θ ∈ U(−π, π), θ̇ ∈ U(−1, 1), obs = [cosθ, sinθ, θ̇], 200-step limit,
never terminates.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult, time_limit


class PendulumParams(NamedTuple):
    max_speed: float = 8.0
    max_torque: float = 2.0
    dt: float = 0.05
    g: float = 10.0
    m: float = 1.0
    l: float = 1.0


class PendulumState(NamedTuple):
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


def _angle_normalize(x):
    return ((x + jnp.pi) % (2.0 * jnp.pi)) - jnp.pi


class Pendulum(Env):
    name = "Pendulum-v1"
    act_dim = 1
    action_bound = 2.0
    obs_shape = (3,)
    max_steps = 200

    def default_params(self) -> PendulumParams:
        return PendulumParams()

    def _obs(self, state: PendulumState) -> jax.Array:
        return jnp.stack(
            [jnp.cos(state.theta), jnp.sin(state.theta), state.theta_dot]
        ).astype(jnp.float32)

    def reset(self, params: PendulumParams, key):
        k1, k2 = jax.random.split(key)
        theta = jax.random.uniform(k1, (), jnp.float32, -jnp.pi, jnp.pi)
        theta_dot = jax.random.uniform(k2, (), jnp.float32, -1.0, 1.0)
        state = PendulumState(theta, theta_dot, jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def step(self, params: PendulumParams, state: PendulumState, action, key) -> StepResult:
        u = jnp.clip(jnp.reshape(action, ()).astype(jnp.float32), -params.max_torque, params.max_torque)
        th, thdot = state.theta, state.theta_dot

        cost = _angle_normalize(th) ** 2 + 0.1 * thdot**2 + 0.001 * u**2

        newthdot = thdot + (
            3.0 * params.g / (2.0 * params.l) * jnp.sin(th)
            + 3.0 / (params.m * params.l**2) * u
        ) * params.dt
        newthdot = jnp.clip(newthdot, -params.max_speed, params.max_speed)
        newth = th + newthdot * params.dt
        t = state.t + 1

        new_state = PendulumState(newth, newthdot, t)
        terminated = jnp.zeros((), bool)
        truncated = time_limit(t, self.max_steps, terminated)
        return StepResult(new_state, self._obs(new_state), -cost, terminated, truncated)
