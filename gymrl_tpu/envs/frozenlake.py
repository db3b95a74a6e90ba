"""Pure-JAX FrozenLake-v1 (4x4, slippery) engine.

Gymnasium semantics (canonical env of reference
algorithms/qlearning_frozenlake.py): discrete 16 states / 4 actions
(0=LEFT, 1=DOWN, 2=RIGHT, 3=UP); with ``is_slippery`` the executed action is
one of {a−1, a, a+1} (mod 4) with probability 1/3 each; reward 1.0 only on
reaching the goal; episodes terminate in holes/goal; 100-step limit.

The reference trainer's reward *shaping* (hole −10, goal +100, no-move −5,
step −1 — qlearning_frozenlake.py:63-79) is a trainer concern and lives in
`algos/qlearning.py`, keeping this engine a faithful gymnasium oracle.

Observation is the integer cell index (as i32 scalar array).
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np

from gymrl_tpu.envs.base import Env, StepResult, time_limit

MAP_4X4 = ["SFFF", "FHFH", "FFFH", "HFFG"]


class FrozenLakeParams(NamedTuple):
    holes: jax.Array  # bool[16]
    goal: jax.Array  # i32[]
    is_slippery: jax.Array  # bool[]


class FrozenLakeState(NamedTuple):
    pos: jax.Array  # i32[] cell index
    t: jax.Array


class FrozenLake(Env):
    name = "FrozenLake-v1"
    n_actions = 4
    obs_shape = ()
    max_steps = 100
    nrow = 4
    ncol = 4
    n_states = 16

    def __init__(self, is_slippery: bool = True):
        self.is_slippery = is_slippery

    def default_params(self) -> FrozenLakeParams:
        desc = np.array([list(r) for r in MAP_4X4])
        holes = jnp.asarray((desc == "H").reshape(-1))
        goal = jnp.asarray(int(np.flatnonzero((desc == "G").reshape(-1))[0]), jnp.int32)
        return FrozenLakeParams(holes=holes, goal=goal, is_slippery=jnp.asarray(self.is_slippery))

    def _obs(self, state: FrozenLakeState) -> jax.Array:
        return state.pos

    def reset(self, params: FrozenLakeParams, key):
        state = FrozenLakeState(jnp.zeros((), jnp.int32), jnp.zeros((), jnp.int32))
        return state, self._obs(state)

    def _move(self, pos, action):
        row, col = pos // self.ncol, pos % self.ncol
        # 0=LEFT, 1=DOWN, 2=RIGHT, 3=UP — gymnasium order
        col = jnp.where(action == 0, jnp.maximum(col - 1, 0), col)
        row = jnp.where(action == 1, jnp.minimum(row + 1, self.nrow - 1), row)
        col = jnp.where(action == 2, jnp.minimum(col + 1, self.ncol - 1), col)
        row = jnp.where(action == 3, jnp.maximum(row - 1, 0), row)
        return row * self.ncol + col

    def step(self, params: FrozenLakeParams, state: FrozenLakeState, action, key) -> StepResult:
        action = action.astype(jnp.int32)
        # Slippery: perpendicular slip with prob 1/3 each side.
        slip = jax.random.randint(key, (), -1, 2)  # ∈ {−1, 0, 1}
        eff_action = jnp.where(params.is_slippery, (action + slip) % 4, action)
        pos = self._move(state.pos, eff_action)
        t = state.t + 1

        is_goal = pos == params.goal
        is_hole = params.holes[pos]
        terminated = is_goal | is_hole
        truncated = time_limit(t, self.max_steps, terminated)
        reward = jnp.where(is_goal, 1.0, 0.0).astype(jnp.float32)

        new_state = FrozenLakeState(pos, t)
        return StepResult(new_state, self._obs(new_state), reward, terminated, truncated)
