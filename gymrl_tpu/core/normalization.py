"""Running normalization statistics as pure pytree state.

Capability parity with the reference's ``utils/normalization.py``:

  * ``RunningMeanStd`` — Welford-style running mean/std
    (reference utils/normalization.py:4-22). The reference has an ``n == 1``
    quirk where ``std`` is set to ``x`` itself on the first sample; we keep
    the same observable behavior for the single-sample update path so the
    first normalized observation matches, but the batched merge below uses
    the numerically sound Chan parallel update (SURVEY.md §7.3 item 4).
  * ``Normalization`` — ``(x - mean) / (std + 1e-8)`` with an
    ``update=False`` eval freeze (reference utils/normalization.py:25-35).
    Here freezing is just "don't call rms_update", since state is explicit.
  * ``RewardScaling`` — running std of the discounted return ``R = γR + r``,
    emitting ``r / (std + 1e-8)``; divide-only, no centering
    (reference utils/normalization.py:38-52), reset per episode. Because our
    engines run thousands of env instances in lockstep, the discounted-return
    accumulator is **per env instance** while the std statistics are shared.

Everything here is a pure function over small pytrees so it can live inside
the jitted rollout scan with zero host involvement.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp


class RunningMeanStd(NamedTuple):
    """Running first/second moments. ``shape``-shaped mean/std, scalar count."""

    mean: jax.Array  # f32[shape]
    s: jax.Array  # f32[shape] — sum of squared deviations (M2 in Welford)
    std: jax.Array  # f32[shape] — cached std, refreshed on update
    count: jax.Array  # f32[] — number of samples folded in


def rms_init(shape) -> RunningMeanStd:
    return RunningMeanStd(
        mean=jnp.zeros(shape, jnp.float32),
        s=jnp.zeros(shape, jnp.float32),
        std=jnp.ones(shape, jnp.float32),
        count=jnp.zeros((), jnp.float32),
    )


def rms_update(rms: RunningMeanStd, x: jax.Array) -> RunningMeanStd:
    """Fold in ONE sample, reproducing the reference's update exactly.

    Reference utils/normalization.py:10-22 — including the quirk that the
    very first sample sets ``std = x`` (not zero).
    """
    x = x.astype(jnp.float32)
    n = rms.count + 1.0
    old_mean = rms.mean
    new_mean = old_mean + (x - old_mean) / n
    new_s = rms.s + (x - old_mean) * (x - new_mean)
    new_std = jnp.where(n == 1.0, x, jnp.sqrt(new_s / n))
    return RunningMeanStd(mean=jnp.where(n == 1.0, x, new_mean), s=new_s, std=new_std, count=n)


def rms_update_batch(rms: RunningMeanStd, xb: jax.Array) -> RunningMeanStd:
    """Fold in a batch of samples ``xb[f32[B, *shape]]`` with Chan's merge.

    With thousands of lockstep env instances we fold a whole batch per step;
    this is the documented deviation from the reference's one-sample cadence
    (SURVEY.md §7.3 item 4) — statistics converge to the same limits.
    """
    xb = xb.astype(jnp.float32)
    b = jnp.asarray(xb.shape[0], jnp.float32)
    b_mean = jnp.mean(xb, axis=0)
    b_s = jnp.sum(jnp.square(xb - b_mean), axis=0)

    n = rms.count + b
    delta = b_mean - rms.mean
    new_mean = rms.mean + delta * (b / n)
    new_s = rms.s + b_s + jnp.square(delta) * (rms.count * b / n)
    new_std = jnp.sqrt(new_s / n)
    # First-ever batch: match the reference spirit (stats become the batch's).
    first = rms.count == 0.0
    new_mean = jnp.where(first, b_mean, new_mean)
    new_std = jnp.where(first, jnp.sqrt(b_s / jnp.maximum(b, 1.0)) + 1e-8, new_std)
    return RunningMeanStd(mean=new_mean, s=new_s, std=new_std, count=n)


def normalize_obs(rms: RunningMeanStd, x: jax.Array) -> jax.Array:
    """``(x - mean) / (std + 1e-8)`` — reference utils/normalization.py:30-34."""
    return (x - rms.mean) / (rms.std + 1e-8)


class RewardScaler(NamedTuple):
    """Per-env-instance discounted-return accumulator + shared running std."""

    rms: RunningMeanStd  # scalar-shaped stats over R
    ret: jax.Array  # f32[B] — per-instance discounted return R
    gamma: jax.Array  # f32[]


def reward_scaler_init(num_envs: int, gamma: float) -> RewardScaler:
    return RewardScaler(
        rms=rms_init(()),
        ret=jnp.zeros((num_envs,), jnp.float32),
        gamma=jnp.asarray(gamma, jnp.float32),
    )


def reward_scaler_step(scaler: RewardScaler, reward: jax.Array) -> tuple[RewardScaler, jax.Array]:
    """Update R ← γR + r per instance, fold R batch into stats, emit r/(std+1e-8).

    Divide-only (no mean subtraction), matching reference
    utils/normalization.py:44-48.
    """
    ret = scaler.gamma * scaler.ret + reward
    rms = rms_update_batch(scaler.rms, ret)
    scaled = reward / (rms.std + 1e-8)
    return RewardScaler(rms=rms, ret=ret, gamma=scaler.gamma), scaled


def reward_scaler_reset(scaler: RewardScaler, done: jax.Array) -> RewardScaler:
    """Zero the return accumulator of instances whose episode ended.

    Mirrors the reference's per-episode ``reset()``
    (utils/normalization.py:51-52, called at utils/runner.py:107).
    """
    return scaler._replace(ret=jnp.where(done, 0.0, scaler.ret))
