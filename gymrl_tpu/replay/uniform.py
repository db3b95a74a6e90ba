"""On-device uniform replay: a preallocated ring buffer over a pytree.

Replaces the reference's host-side buffers (deque of tuples in
algorithms/dqn_cartpole.py:68-88; circular numpy object array in
utils/buffer.py:105-135) with device-resident storage so sampling feeds the
jitted update without any H2D copy.

Storage is structure-of-arrays: one [capacity, ...] array per transition
leaf. Batched pushes write B consecutive (mod capacity) slots via scatter —
with thousands of lockstep envs one push per env-step inserts the whole
batch. Sampling draws uniform indices in [0, size); by default *with*
replacement (the reference's random.sample is without — at 64 draws from
≥500 elements the collision effect is far below seed variance; documented
deviation for O(1) on-device sampling).
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class ReplayState(NamedTuple):
    data: Any  # pytree of [capacity, ...] arrays
    pos: jax.Array  # i32[] — next write slot
    size: jax.Array  # i32[] — current fill level


def replay_init(example: Any, capacity: int) -> ReplayState:
    """Allocate storage from one example transition (unbatched pytree)."""

    def alloc(x):
        x = jnp.asarray(x)
        return jnp.zeros((capacity,) + x.shape, x.dtype)

    return ReplayState(
        data=jax.tree_util.tree_map(alloc, example),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
    )


def replay_push_batch(state: ReplayState, batch: Any) -> ReplayState:
    """Insert a batch (leading dim B) of transitions at the ring position."""
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    idx = (state.pos + jnp.arange(b)) % capacity

    def write(store, xs):
        return store.at[idx].set(xs.astype(store.dtype))

    return ReplayState(
        data=jax.tree_util.tree_map(write, state.data, batch),
        pos=(state.pos + b) % capacity,
        size=jnp.minimum(state.size + b, capacity),
    )


def replay_sample(state: ReplayState, key: jax.Array, batch_size: int) -> Any:
    """Uniform sample of batch_size transitions (with replacement)."""
    idx = jax.random.randint(key, (batch_size,), 0, jnp.maximum(state.size, 1))
    return jax.tree_util.tree_map(lambda store: store[idx], state.data)


def replay_sample_no_replacement(state: ReplayState, key: jax.Array, batch_size: int) -> Any:
    """Without-replacement sample (Gumbel top-k over the fill region).

    Exact parity with the reference's random.sample when needed; O(capacity).
    """
    capacity = jax.tree_util.tree_leaves(state.data)[0].shape[0]
    g = jax.random.gumbel(key, (capacity,))
    g = jnp.where(jnp.arange(capacity) < state.size, g, -jnp.inf)
    _, idx = jax.lax.top_k(g, batch_size)
    return jax.tree_util.tree_map(lambda store: store[idx], state.data)
