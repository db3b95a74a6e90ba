"""Generalized Advantage Estimation as reverse `lax.scan`s.

Capability parity:
  * plain GAE with the reference's dw/done distinction — ``dw`` (terminated)
    cuts the bootstrap, ``done`` (terminated | truncated) cuts the trace
    (reference utils/buffer.py:23-28; algorithms/ppo_lunarlander.py:179-196).
  * dual-λ "decouple-lambda": actor advantages from λ_actor, critic returns
    from λ_critic (reference algorithms/ppo_full_lunarlander.py:507-535).

All functions take time-major arrays ``[T, ...]`` (trailing batch dims are
fine — the scan carries broadcast element-wise) and are pure, so they fuse
into the jitted train step. The reverse Python-loop of the reference becomes
a `lax.scan` over reversed time, which XLA compiles to a tight on-device loop.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def compute_gae(
    rewards: jax.Array,  # f32[T, ...]
    values: jax.Array,  # f32[T, ...]
    next_values: jax.Array,  # f32[T, ...] — V(s') aligned per step
    terminated: jax.Array,  # bool/f32[T, ...] — "dw": true termination only
    done: jax.Array,  # bool/f32[T, ...] — terminated | truncated
    gamma: float,
    lam: float,
) -> tuple[jax.Array, jax.Array]:
    """Returns ``(advantages, v_target)`` with ``v_target = adv + values``.

    Matches reference utils/buffer.py:20-35 semantics:
      delta = r + γ·V(s')·(1-dw) − V(s)
      A_t   = delta + γλ·(1-done)·A_{t+1}
    """
    terminated = terminated.astype(jnp.float32)
    done = done.astype(jnp.float32)
    deltas = rewards + gamma * next_values * (1.0 - terminated) - values

    def scan_fn(carry, xs):
        delta, d = xs
        adv = delta + gamma * lam * (1.0 - d) * carry
        return adv, adv

    _, advs_rev = jax.lax.scan(
        scan_fn, jnp.zeros_like(deltas[0]), (deltas[::-1], done[::-1])
    )
    advantages = advs_rev[::-1]
    return advantages, advantages + values


def compute_gae_dual_lambda(
    rewards: jax.Array,
    values: jax.Array,
    next_values: jax.Array,
    terminated: jax.Array,
    done: jax.Array,
    gamma: float,
    lam_actor: float,
    lam_critic: float,
) -> tuple[jax.Array, jax.Array]:
    """Decoupled-λ GAE (reference ppo_full_lunarlander.py:507-535).

    Returns ``(actor_advantages, critic_returns)`` where actor advantages use
    λ_actor and critic returns are ``adv_critic(λ_critic) + values``.
    """
    adv_a, _ = compute_gae(rewards, values, next_values, terminated, done, gamma, lam_actor)
    adv_c, returns = compute_gae(rewards, values, next_values, terminated, done, gamma, lam_critic)
    return adv_a, returns


def standardize(x: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Rollout-wide advantage standardization (ppo_lunarlander.py:236)."""
    return (x - jnp.mean(x)) / (jnp.std(x) + eps)
