"""Functional environment API for pure-JAX vectorized engines.

The reference drives one gymnasium env per trainer with host-side stepping
(reference utils/runner.py:52-78, algorithms/dqn_cartpole.py:174-183). Here
an environment is a stateless object exposing pure functions over explicit
state pytrees, so thousands of instances step in lockstep under ``vmap``
inside ``jit`` with zero host round trips:

    state, obs = env.reset(params, key)
    state, obs, reward, terminated, truncated = env.step(params, state, action, key)

Conventions:
  * ``terminated`` — true MDP termination ("dw" in the reference,
    utils/buffer.py:23-28); cuts value bootstrap.
  * ``truncated``  — time-limit cut; ``done = terminated | truncated`` cuts
    the GAE trace but not the bootstrap.
  * Every state pytree carries a ``t`` step counter; ``truncated`` is
    produced by the engine itself from ``max_steps`` (the gymnasium
    TimeLimit wrapper folded into the engine).
  * ``step`` applies the action to the *current* state; auto-reset is NOT
    done here — `rollout.autoreset_step` wraps it so trainers choose the
    reset semantics (gymnasium-style: obs after done is the reset obs).

Metadata mirrors what the reference's ``make_env`` injects into configs
(utils/runner.py:69-77): ``obs_dim``/``obs_shape``, ``n_actions`` or
``act_dim`` + ``action_bound``, ``max_steps``.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class StepResult(NamedTuple):
    state: Any
    obs: jax.Array
    reward: jax.Array
    terminated: jax.Array
    truncated: jax.Array


class Env:
    """Base class: static metadata + pure reset/step.

    Subclasses define ``Params``/``State`` NamedTuples and implement
    ``reset_fn``/``step_fn``. Instances are hashable static config holders so
    they can be closed over by jitted functions.
    """

    name: str = "Env"
    # Discrete action spaces set n_actions; continuous set act_dim + action_bound.
    n_actions: int | None = None
    act_dim: int | None = None
    action_bound: float | None = None
    obs_shape: tuple[int, ...] = ()
    max_steps: int = 1000

    @property
    def obs_dim(self) -> int:
        d = 1
        for s in self.obs_shape:
            d *= s
        return d

    @property
    def discrete(self) -> bool:
        return self.n_actions is not None

    def default_params(self):
        raise NotImplementedError

    def reset(self, params, key):
        raise NotImplementedError

    def step(self, params, state, action, key) -> StepResult:
        raise NotImplementedError

    # -- vectorized views ---------------------------------------------------
    def reset_batch(self, params, key, num_envs: int):
        keys = jax.random.split(key, num_envs)
        return jax.vmap(self.reset, in_axes=(None, 0))(params, keys)

    def step_batch(self, params, states, actions, key) -> StepResult:
        num = jax.tree_util.tree_leaves(states)[0].shape[0]
        keys = jax.random.split(key, num)
        return jax.vmap(self.step, in_axes=(None, 0, 0, 0))(params, states, actions, keys)

    def __hash__(self):
        return hash((type(self).__name__, self.name))

    def __eq__(self, other):
        return type(self) is type(other) and self.name == getattr(other, "name", None)


def time_limit(t: jax.Array, max_steps: int, terminated: jax.Array) -> jax.Array:
    """Gymnasium TimeLimit: truncated at t >= max_steps unless terminated."""
    return jnp.logical_and(t >= max_steps, jnp.logical_not(terminated))
