"""Pure-JAX CartPole-v1 engine.

Semantics match gymnasium's ``CartPoleEnv`` (the canonical env of the
reference's DQN family and discrete SAC — e.g. algorithms/dqn_cartpole.py:97):
Euler integration at dt=0.02, force ±10 N, termination at |x| > 2.4 or
|θ| > 12°, reward 1.0 every step (including the terminating one), uniform
(−0.05, 0.05) initial state, 500-step time limit. Verified against the
gymnasium oracle in tests/test_envs_classic.py.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult, time_limit


class CartPoleParams(NamedTuple):
    gravity: float = 9.8
    masscart: float = 1.0
    masspole: float = 0.1
    length: float = 0.5  # half pole length
    force_mag: float = 10.0
    tau: float = 0.02
    theta_threshold: float = 12.0 * 2.0 * jnp.pi / 360.0
    x_threshold: float = 2.4


class CartPoleState(NamedTuple):
    x: jax.Array
    x_dot: jax.Array
    theta: jax.Array
    theta_dot: jax.Array
    t: jax.Array


class CartPole(Env):
    name = "CartPole-v1"
    n_actions = 2
    obs_shape = (4,)
    max_steps = 500

    def default_params(self) -> CartPoleParams:
        return CartPoleParams()

    def _obs(self, state: CartPoleState) -> jax.Array:
        return jnp.stack([state.x, state.x_dot, state.theta, state.theta_dot]).astype(jnp.float32)

    def reset(self, params: CartPoleParams, key):
        vals = jax.random.uniform(key, (4,), jnp.float32, -0.05, 0.05)
        state = CartPoleState(vals[0], vals[1], vals[2], vals[3], jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def step(self, params: CartPoleParams, state: CartPoleState, action, key) -> StepResult:
        force = jnp.where(action == 1, params.force_mag, -params.force_mag)
        costheta = jnp.cos(state.theta)
        sintheta = jnp.sin(state.theta)
        total_mass = params.masscart + params.masspole
        polemass_length = params.masspole * params.length

        temp = (force + polemass_length * state.theta_dot**2 * sintheta) / total_mass
        thetaacc = (params.gravity * sintheta - costheta * temp) / (
            params.length * (4.0 / 3.0 - params.masspole * costheta**2 / total_mass)
        )
        xacc = temp - polemass_length * thetaacc * costheta / total_mass

        x = state.x + params.tau * state.x_dot
        x_dot = state.x_dot + params.tau * xacc
        theta = state.theta + params.tau * state.theta_dot
        theta_dot = state.theta_dot + params.tau * thetaacc
        t = state.t + 1

        new_state = CartPoleState(x, x_dot, theta, theta_dot, t)
        terminated = (
            (jnp.abs(x) > params.x_threshold) | (jnp.abs(theta) > params.theta_threshold)
        )
        truncated = time_limit(t, self.max_steps, terminated)
        reward = jnp.ones((), jnp.float32)
        return StepResult(new_state, self._obs(new_state), reward, terminated, truncated)
