"""Hyperparameter schedules used across the algorithm zoo.

Parity targets:
  * ε-greedy exponential decay ``ε_end + (ε_start - ε_end)·exp(-t/decay)``
    (reference algorithms/dqn_cartpole.py:117-122).
  * linear anneal of lr / entropy coef with training progress
    (reference ppo_lunarlander.py:337-341; ppo_full_lunarlander.py:659-666).
  * the Rainbow lr decay ``0.9·lr·(1 - t/T) + 0.1·lr``
    (reference rainbow_dqn_cartpole.py:354-359).
  * PER β anneal 0.4 → 1.0 (reference ddqn_per_cartpole.py:137-138 adds a
    fixed increment per sample; rainbow anneals linearly with progress).

All are pure functions of a (traced) step count so they run inside jit.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def exp_epsilon_decay(step, eps_start: float, eps_end: float, decay: float) -> jax.Array:
    step = jnp.asarray(step, jnp.float32)
    return eps_end + (eps_start - eps_end) * jnp.exp(-step / decay)


def linear_anneal(step, total_steps, init_value: float, final_frac: float = 0.0) -> jax.Array:
    """init·(1 - progress·(1 - final_frac)); progress clipped to [0, 1]."""
    progress = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
    return init_value * (1.0 - progress * (1.0 - final_frac))


def ref_lr_decay(step, total_steps, init_lr: float) -> jax.Array:
    """0.9·lr·(1 - t/T) + 0.1·lr — reference rainbow_dqn_cartpole.py:354-359."""
    progress = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
    return 0.9 * init_lr * (1.0 - progress) + 0.1 * init_lr


def per_beta_anneal(step, total_steps, beta_start: float = 0.4) -> jax.Array:
    """β: beta_start → 1.0 linearly with progress (rainbow_dqn_cartpole.py:229-231)."""
    progress = jnp.clip(jnp.asarray(step, jnp.float32) / total_steps, 0.0, 1.0)
    return beta_start + (1.0 - beta_start) * progress
