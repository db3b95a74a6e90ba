"""Padded episode-major rollout storage + FIFO queue + state ring.

Parity targets from the reference's shared library:
  * ``EpisodeBuffer`` — the on-policy v2 layout: preallocated
    ``[n_episodes, max_steps]`` arrays with an ``active`` mask
    (utils/buffer.py:53-102 — the reference's own JAX-friendly design).
    Episodes of different lengths pad to max_steps; masked reductions
    recover per-episode statistics. This is the storage the recurrent
    trainers would use for whole-episode BPTT.
  * ``Queue`` — fixed-size FIFO ring with random sampling
    (utils/buffer.py:139-169).
  * ``StateRing`` — ring of env-state pytrees for save/restore of
    recent states (utils/model.py:378-386 ``StateManager``, unused by the
    reference's algorithms but part of the inventory).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class EpisodeBufferState(NamedTuple):
    data: Any  # pytree of [n_episodes, max_steps, ...]
    active: jax.Array  # bool[n_episodes, max_steps] — valid-step mask
    lengths: jax.Array  # i32[n_episodes]
    ep_index: jax.Array  # i32[] — episode currently being written
    full: jax.Array  # bool[] — all episode rows filled
    # pack-mode overflow accounting ("no silent caps"): steps/episode-segments
    # beyond rows_per_env discarded by episode_buffer_pack. Always 0 for the
    # sequential store path (it wraps rows instead of dropping).
    dropped_steps: jax.Array = jnp.zeros((), jnp.int32)
    dropped_episodes: jax.Array = jnp.zeros((), jnp.int32)


def episode_buffer_init(example: Any, n_episodes: int, max_steps: int) -> EpisodeBufferState:
    def alloc(x):
        x = jnp.asarray(x)
        return jnp.zeros((n_episodes, max_steps) + x.shape, x.dtype)

    return EpisodeBufferState(
        data=jax.tree_util.tree_map(alloc, example),
        active=jnp.zeros((n_episodes, max_steps), bool),
        lengths=jnp.zeros((n_episodes,), jnp.int32),
        ep_index=jnp.zeros((), jnp.int32),
        full=jnp.asarray(False),
    )


def episode_buffer_store(state: EpisodeBufferState, transition: Any, done) -> EpisodeBufferState:
    """Append one (unbatched) transition to the current episode row; advance
    to the next row when the episode ends (matches v2 store_transition)."""
    n_episodes = state.active.shape[0]
    ep, step = state.ep_index, state.lengths[state.ep_index]

    def write(store, x):
        return store.at[ep, step].set(jnp.asarray(x).astype(store.dtype))

    data = jax.tree_util.tree_map(write, state.data, transition)
    active = state.active.at[ep, step].set(True)
    lengths = state.lengths.at[ep].add(1)
    done = jnp.asarray(done)
    next_ep = jnp.where(done, (ep + 1) % n_episodes, ep)
    full = state.full | (done & (ep + 1 >= n_episodes))
    # A row being re-entered starts fresh.
    lengths = jnp.where(done & (next_ep != ep), lengths.at[next_ep].set(0), lengths)
    active = jnp.where(
        (done & (next_ep != ep)), active.at[next_ep].set(False), active
    )
    return EpisodeBufferState(data=data, active=active, lengths=lengths,
                              ep_index=next_ep, full=full)


def episode_buffer_pack(data: Any, done, rows_per_env: int) -> EpisodeBufferState:
    """Vectorized episode-major packing of a [T, B] rollout.

    The TPU-native equivalent of calling ``episode_buffer_store`` T·B times
    (reference utils/buffer.py:70-88 semantics): every episode segment of
    every env column lands in its own ``[max_steps=T]`` row, left-aligned,
    with an ``active`` mask over its valid steps. One gather-free scatter
    instead of T·B sequential dynamic writes.

    Each env column contributes up to ``rows_per_env`` rows; the row order
    within a column is episode order, so row ``b·R`` is column b's first
    (possibly mid-episode continuation) segment. Episode segments beyond R
    are dropped, and the drop is COUNTED: the returned state carries
    ``dropped_steps`` / ``dropped_episodes`` so callers can surface the loss
    as a train metric instead of silently biasing toward each window's
    earliest episodes.

    done: [T, B] — episode boundary AFTER step t (terminated|truncated).
    Returns rows for ``n_rows = B·rows_per_env`` episodes.
    """
    done = jnp.asarray(done)
    T, B = done.shape
    R = rows_per_env
    t_range = jnp.arange(T)[:, None]  # [T, 1]

    done_prev = jnp.concatenate(
        [jnp.zeros((1, B), done.dtype), done[:-1]], axis=0
    ).astype(bool)
    ep_id = jnp.cumsum(done_prev.astype(jnp.int32), axis=0)  # [T, B]
    starts = done_prev.at[0, :].set(True)
    start_t = jax.lax.cummax(jnp.where(starts, t_range, -1), axis=0)
    step_in_ep = t_range - start_t  # [T, B]

    valid = ep_id < R
    n_rows = B * R
    row = jnp.where(valid, jnp.arange(B)[None, :] * R + ep_id, n_rows)  # overflow → garbage row

    def scatter(x):
        x = jnp.asarray(x)
        out = jnp.zeros((n_rows + 1, T) + x.shape[2:], x.dtype)
        return out.at[row, step_in_ep].set(x)[:n_rows]

    active = jnp.zeros((n_rows + 1, T), bool).at[row, step_in_ep].set(valid)[:n_rows]
    n_segments = ep_id[-1] + 1  # [B] — segments started in each column
    return EpisodeBufferState(
        data=jax.tree_util.tree_map(scatter, data),
        active=active,
        lengths=jnp.sum(active.astype(jnp.int32), axis=1),
        ep_index=jnp.zeros((), jnp.int32),
        full=jnp.asarray(True),
        dropped_steps=jnp.sum(jnp.logical_not(valid).astype(jnp.int32)),
        dropped_episodes=jnp.sum(jnp.maximum(n_segments - R, 0)),
    )


def episode_buffer_clear(state: EpisodeBufferState) -> EpisodeBufferState:
    return EpisodeBufferState(
        data=state.data,
        active=jnp.zeros_like(state.active),
        lengths=jnp.zeros_like(state.lengths),
        ep_index=jnp.zeros((), jnp.int32),
        full=jnp.asarray(False),
    )


class QueueState(NamedTuple):
    data: Any
    pos: jax.Array
    size: jax.Array


def queue_init(example: Any, capacity: int) -> QueueState:
    def alloc(x):
        x = jnp.asarray(x)
        return jnp.zeros((capacity,) + x.shape, x.dtype)

    return QueueState(
        data=jax.tree_util.tree_map(alloc, example),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def queue_push(state: QueueState, item: Any) -> QueueState:
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]

    def write(store, x):
        return store.at[state.pos].set(jnp.asarray(x).astype(store.dtype))

    return QueueState(
        data=jax.tree_util.tree_map(write, state.data, item),
        pos=(state.pos + 1) % capacity,
        size=jnp.minimum(state.size + 1, capacity),
    )


def queue_sample(state: QueueState, key, batch_size: int) -> Any:
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    return jax.tree_util.tree_map(lambda s: s[idx], state.data)


# StateRing is a Queue of env-state pytrees; provided under the reference's
# name for discoverability (utils/model.py:378-386).
StateRing = QueueState
state_ring_init = queue_init
state_ring_push = queue_push
state_ring_sample = queue_sample
