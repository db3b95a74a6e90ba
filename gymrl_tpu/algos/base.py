"""Shared trainer scaffolding.

The reference's duck-typed agent contract (choose_action/evaluate/update —
utils/runner.py:115-151) becomes, TPU-side, a `Trainer` exposing:

  * ``init(key) -> TrainState``      — build params/opt/replay/env pytree
  * ``train_iter(ts) -> (ts, IterOut)`` — PURE, jittable: scan of
    `steps_per_iter` fused env-step→store→update iterations
  * ``policy(params, obs, key, deterministic) -> action`` — for eval

One `train_iter` call is the only host↔device boundary; the reference's
per-step host loop (SURVEY.md §3.1) lives inside it as `lax.scan`.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp
import optax


class IterOut(NamedTuple):
    """Per-iteration outputs fetched to host at coarse cadence.

    Episode stats are sparse: `ep_return[t, b]` is valid where
    `ep_done[t, b]`; the runner reduces them into the avg-100 window that
    drives the reference's solve checks (e.g. dqn_cartpole.py:199-207).
    """

    ep_return: jax.Array  # f32[T, B]
    ep_length: jax.Array  # i32[T, B]
    ep_done: jax.Array  # bool[T, B]
    metrics: dict[str, jax.Array]  # scalars, already averaged over the iter


def hard_update(target_params, online_params):
    return jax.tree_util.tree_map(lambda t, o: o, target_params, online_params)


def soft_update(target_params, online_params, tau: float):
    """Polyak update (reference rainbow_dqn_cartpole.py:347-352 et al.)."""
    return jax.tree_util.tree_map(
        lambda t, o: (1.0 - tau) * t + tau * o, target_params, online_params
    )


def clip_grads_by_value(grads, clip: float):
    """Per-parameter gradient clamp ±clip (reference dqn_cartpole.py:163-165)."""
    return jax.tree_util.tree_map(lambda g: jnp.clip(g, -clip, clip), grads)


def adam(lr, eps: float = 1e-8, clip_norm: float | None = None):
    """Adam with optional global-norm clipping; lr may be a schedule."""
    tx = [optax.clip_by_global_norm(clip_norm)] if clip_norm else []
    tx.append(optax.adam(lr, eps=eps))
    return optax.chain(*tx)


def masked_mean(x: jax.Array, mask: jax.Array, eps: float = 1e-8) -> jax.Array:
    """Mean over entries where mask (reference ppo_lstm_lunarlander.py:646-655)."""
    mask = mask.astype(x.dtype)
    return jnp.sum(x * mask) / (jnp.sum(mask) + eps)


def assert_flat_tp_ok(mesh) -> None:
    """flat_optimizer guard, shared by every PPO-family trainer: the flat
    master vector cannot carry per-leaf TP layouts. Call from __init__
    (covers externally restored TrainStates, which never pass init())."""
    assert mesh is None or mesh.shape.get("model", 1) == 1, (
        "flat_optimizer is incompatible with model-axis TP"
    )


def flat_opt_target(params, flat: bool):
    """What the optimizer is initialized over: the raveled master vector
    (flat) or the param pytree."""
    if flat:
        from jax.flatten_util import ravel_pytree

        return ravel_pytree(params)[0]
    return params


def flat_params_repr(params, flat: bool):
    """(params0, unravel) for a train_iter's SGD scans: the flat master
    vector + its unraveler, or the pytree + identity. One fused Adam over
    one wide vector instead of ~6 ops × ~12 leaves per grad step — the r4
    flagship win, shared across ppo/ppo_full/ppo_rnn/ppg/ppo_lstm."""
    if flat:
        from jax.flatten_util import ravel_pytree

        return ravel_pytree(params)
    return params, lambda p: p


def pack_fields(data: dict) -> tuple[jax.Array, dict]:
    """Pack a dict of [n, ...] arrays into ONE [n, F] f32 matrix + layout spec.

    Epoch shuffles that gather random rows leaf-by-leaf over many narrow
    arrays are the worst HBM pattern on TPU (~1% of bandwidth at bench
    scale — PROFILE_r3.md measured 88 ms/iter for the flagship's 10-leaf
    Rollout shuffle vs 15 ms packed). Packing the minibatch fields into one
    matrix makes the shuffle a single wide gather; `unpack_fields` restores
    the dict (and dtypes) inside each minibatch. Integer fields roundtrip
    exactly through f32 for |v| < 2^24 (asserted here for int leaves'
    dtype, values are action/index-scale by construction).
    """
    spec = {}
    cols = []
    off = 0
    for k in sorted(data):
        x = data[k]
        flat = x.reshape(x.shape[0], -1)
        assert flat.dtype in (jnp.float32, jnp.int32, jnp.bool_), (
            f"{k}: {flat.dtype} — int leaves ride through f32, exact only "
            "for |v| < 2^24 (action/index-scale); add a direct int path "
            "before packing step-count-scale fields"
        )
        spec[k] = (off, off + flat.shape[1], x.shape[1:], x.dtype)
        off += flat.shape[1]
        cols.append(flat.astype(jnp.float32))
    return jnp.concatenate(cols, axis=1), spec


def unpack_fields(rows: jax.Array, spec: dict) -> dict:
    """Inverse of `pack_fields` for a [m, F] minibatch of packed rows."""
    return {
        k: rows[:, a:b].reshape((rows.shape[0],) + shape).astype(dtype)
        for k, (a, b, shape, dtype) in spec.items()
    }


class Trainer:
    """Base: holds cfg + static net/env; subclasses implement the API.

    Contract (the TPU-side of the reference's duck-typed agent,
    utils/runner.py:115-151):
      * ``init(key) -> TrainState``
      * ``train_iter(ts) -> (ts, IterOut)`` — pure + jitted
      * ``policy(ts, obs, key, deterministic) -> action`` — batched; must
        apply the trainer's own observation normalization (frozen stats).
    """

    def __init__(self, cfg, mesh=None):
        self.cfg = cfg
        self.mesh = mesh
        # When True the jitted train_iter DONATES the incoming state: XLA
        # reuses the replay/param buffers in place instead of copying them
        # every iteration (the pixel replay alone is ~150 MB/copy). Opt-in
        # because a donated state is dead after the call — production
        # drivers (TrainLoop, bench) rebind and set this; tests that replay
        # the same state for determinism checks leave it off.
        self.donate = False

    def init(self, key) -> Any:
        raise NotImplementedError

    def _in_shardings(self):
        """Input shardings for the jitted train_iter (None = unconstrained).
        Default: the off-policy DP layout (env batch on 'data',
        replay/params replicated — distributed.mesh.train_state_shardings).
        Trainers with bespoke layouts (PPO's TP trunk) override this."""
        if self.mesh is None:
            return None
        from gymrl_tpu.distributed.mesh import train_state_shardings

        # Abstract trace only: no real env-reset/param-init compute, and no
        # dependence on the subclass init() signature (the sharding helpers
        # read only leaf shapes/ndim).
        example = jax.eval_shape(self.init, jax.random.PRNGKey(0))
        return train_state_shardings(self.mesh, example)

    def train_iter(self, ts) -> tuple[Any, IterOut]:
        """Jit `self._train_iter` once per (donate flag), binding shardings
        and the donation policy at first call. Keyed on ``self.donate`` so a
        warmup call before TrainLoop flips donate=True doesn't freeze the
        no-donate compilation (and a determinism check that flips it back
        doesn't hit donated-buffer errors)."""
        cache = self.__dict__.setdefault("_jit_train_iter_fns", {})
        fn = cache.get(self.donate)
        if fn is None:
            kw = {}
            sh = self._in_shardings()
            if sh is not None:
                kw["in_shardings"] = (sh,)
            if self.donate:
                kw["donate_argnums"] = (0,)
            fn = jax.jit(self._train_iter, **kw)
            cache[self.donate] = fn
        return fn(ts)

    def _train_iter(self, ts) -> tuple[Any, IterOut]:
        raise NotImplementedError

    def policy(self, ts, obs, key, deterministic: bool = True):
        raise NotImplementedError

    # -- carry-through policy surface ----------------------------------------
    # The reference's render/test path threads rnn_h across env steps
    # (utils/model.py:307-324, utils/runner.py:169-206). Stateless trainers
    # get the trivial carry (None); recurrent trainers override both hooks
    # so step-by-step drivers (TrainLoop.render_episode, user demo loops)
    # actually use the policy's memory.
    def policy_reset(self, batch: int):
        """Initial policy carry for a fresh batch of episodes (None = stateless)."""
        return None

    def policy_step(self, ts, carry, obs, key, deterministic: bool = True):
        """One policy step threading `carry`: returns (carry', action[b])."""
        return carry, self.policy(ts, obs, key, deterministic)

    def eval_episodes(self, ts, key, n_episodes: int):
        """Deterministic eval: n parallel fresh episodes, scan to termination.

        Replaces the reference's sequential eval loop
        (utils/runner.py:169-184) with one jitted batched rollout; rewards
        accumulate only until each instance's first done (latched mask).
        Returns (returns[f32[n]], lengths[i32[n]]).
        """
        env = self.venv.env
        params = self.venv.params
        # per-instance jit cache (keyed on episode count); an instance
        # attribute rather than a global id()-keyed dict so the compiled fn
        # dies with the trainer instead of leaking (or aliasing after id reuse)
        cache = self.__dict__.setdefault("_eval_fns", {})
        if n_episodes not in cache:
            from functools import partial

            cache[n_episodes] = jax.jit(
                partial(_eval_rollout, self, env, params, n_episodes)
            )
        return cache[n_episodes](ts, key)


def _eval_rollout(trainer, env, params, n_episodes, ts, key):
    k_reset, k_roll = jax.random.split(key)
    keys = jax.random.split(k_reset, n_episodes)
    state, obs = jax.vmap(env.reset, in_axes=(None, 0))(params, keys)

    def body(carry, k):
        state, obs, done, ret, length = carry
        k_act, k_step = jax.random.split(k)
        action = trainer.policy(ts, obs, k_act, deterministic=True)
        step_keys = jax.random.split(k_step, n_episodes)
        sr = jax.vmap(env.step, in_axes=(None, 0, 0, 0))(params, state, action, step_keys)
        alive = jnp.logical_not(done)
        ret = ret + sr.reward * alive
        length = length + alive.astype(jnp.int32)
        done = done | sr.terminated | sr.truncated
        return (sr.state, sr.obs, done, ret, length), None

    init = (
        state,
        obs,
        jnp.zeros((n_episodes,), bool),
        jnp.zeros((n_episodes,), jnp.float32),
        jnp.zeros((n_episodes,), jnp.int32),
    )
    keys = jax.random.split(k_roll, env.max_steps)
    (_, _, _, returns, lengths), _ = jax.lax.scan(body, init, keys)
    return returns, lengths
