"""Pure-JAX CliffWalking-v0 engine (gymnasium semantics).

Canonical env of reference algorithms/qlearning_cliffwalking.py. 4x12 grid,
start (3,0) = state 36, goal (3,11) = state 47; actions 0=UP, 1=RIGHT,
2=DOWN, 3=LEFT; stepping into a cliff cell (row 3, cols 1..10) yields −100
and teleports back to start without terminating; every step costs −1; the
episode terminates only at the goal. Gymnasium applies no time limit; we cap
at a generous 1000 steps so vectorized rollouts stay bounded.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from gymrl_tpu.envs.base import Env, StepResult, time_limit


class CliffWalkingParams(NamedTuple):
    start: int = 36
    goal: int = 47


class CliffWalkingState(NamedTuple):
    pos: jax.Array
    t: jax.Array


class CliffWalking(Env):
    name = "CliffWalking-v0"
    n_actions = 4
    obs_shape = ()
    max_steps = 1000
    nrow = 4
    ncol = 12
    n_states = 48

    def default_params(self) -> CliffWalkingParams:
        return CliffWalkingParams()

    def _obs(self, state: CliffWalkingState) -> jax.Array:
        return state.pos

    def reset(self, params: CliffWalkingParams, key):
        state = CliffWalkingState(jnp.asarray(params.start, jnp.int32), jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def step(self, params: CliffWalkingParams, state: CliffWalkingState, action, key) -> StepResult:
        action = action.astype(jnp.int32)
        row, col = state.pos // self.ncol, state.pos % self.ncol
        # 0=UP, 1=RIGHT, 2=DOWN, 3=LEFT — gymnasium order
        row = jnp.where(action == 0, jnp.maximum(row - 1, 0), row)
        col = jnp.where(action == 1, jnp.minimum(col + 1, self.ncol - 1), col)
        row = jnp.where(action == 2, jnp.minimum(row + 1, self.nrow - 1), row)
        col = jnp.where(action == 3, jnp.maximum(col - 1, 0), col)
        pos = row * self.ncol + col

        is_cliff = (row == 3) & (col >= 1) & (col <= 10)
        reward = jnp.where(is_cliff, -100.0, -1.0).astype(jnp.float32)
        pos = jnp.where(is_cliff, params.start, pos)

        t = state.t + 1
        terminated = pos == params.goal
        truncated = time_limit(t, self.max_steps, terminated)
        new_state = CliffWalkingState(pos, t)
        return StepResult(new_state, self._obs(new_state), reward, terminated, truncated)
