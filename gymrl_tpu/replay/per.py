"""On-device Prioritized Experience Replay: dense sum-tree + stratified sampling.

Capability parity with the reference's PER stack
(algorithms/ddqn_per_cartpole.py:67-150, rainbow_dqn_cartpole.py:116-265):
  * sum-tree with max-priority insertion for new transitions (:114-117),
  * stratified segment sampling: segment i draws from
    [i·total/B, (i+1)·total/B) (:123-133),
  * IS weights ``(N·p)^-β / max_batch`` (:125,137-138); β annealing is the
    trainer's concern (core.schedules.per_beta_anneal),
  * priority updates ``min(|δ|+ε, 1)^α`` are computed by the trainer and
    written back via `per_update_priorities`.

TPU-native design (SURVEY.md §7.3 item 2): the tree is ONE dense f32[2N]
array (leaves at [N, 2N)), N a power of two. A batched priority update
scatters leaf deltas and then propagates them up the log2(N) levels with
one scatter-add per level — duplicate parents accumulate naturally, so a
B-element update costs log2(N) scatters instead of B sequential walks.
Sampling descends all B segments in lockstep with a `fori_loop` over
levels (gather-compare-select per level), so the learner never serializes.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import numpy as np

import jax
import jax.numpy as jnp


class PERState(NamedTuple):
    data: Any  # pytree of [capacity, ...]
    tree: jax.Array  # f32[2·capacity] — tree[1] is the total, leaves at [N, 2N)
    pos: jax.Array  # i32[]
    size: jax.Array  # i32[]
    max_priority: jax.Array  # f32[] — priority given to fresh transitions


def _levels(capacity: int) -> int:
    levels = int(np.log2(capacity))
    assert 2**levels == capacity, f"PER capacity must be a power of two, got {capacity}"
    return levels


def per_init(example: Any, capacity: int) -> PERState:
    _levels(capacity)

    def alloc(x):
        x = jnp.asarray(x)
        return jnp.zeros((capacity,) + x.shape, x.dtype)

    return PERState(
        data=jax.tree_util.tree_map(alloc, example),
        tree=jnp.zeros((2 * capacity,), jnp.float32),
        pos=jnp.zeros((), jnp.int32),
        size=jnp.zeros((), jnp.int32),
        max_priority=jnp.ones((), jnp.float32),  # ref: initial max priority 1.0
    )


def _tree_set(tree: jax.Array, leaf_idx: jax.Array, values: jax.Array) -> jax.Array:
    """Set leaf priorities and propagate sums to the root, vectorized per level."""
    capacity = tree.shape[0] // 2
    node = leaf_idx + capacity
    delta = values - tree[node]
    tree = tree.at[node].add(delta)
    for _ in range(_levels(capacity)):
        node = node // 2
        tree = tree.at[node].add(delta)
    return tree


def per_push_batch(state: PERState, batch: Any) -> PERState:
    """Insert a batch at the ring position with current max priority."""
    capacity = state.tree.shape[0] // 2
    b = jax.tree_util.tree_leaves(batch)[0].shape[0]
    idx = (state.pos + jnp.arange(b)) % capacity

    def write(store, xs):
        return store.at[idx].set(xs.astype(store.dtype))

    tree = _tree_set(state.tree, idx, jnp.full((b,), state.max_priority))
    return PERState(
        data=jax.tree_util.tree_map(write, state.data, batch),
        tree=tree,
        pos=(state.pos + b) % capacity,
        size=jnp.minimum(state.size + b, capacity),
        max_priority=state.max_priority,
    )


def per_sample(state: PERState, key: jax.Array, batch_size: int, beta) -> tuple[Any, jax.Array, jax.Array]:
    """Stratified sample. Returns (batch, leaf_indices, is_weights)."""
    capacity = state.tree.shape[0] // 2
    total = state.tree[1]
    seg = total / batch_size
    u = jax.random.uniform(key, (batch_size,), jnp.float32)
    targets = (jnp.arange(batch_size, dtype=jnp.float32) + u) * seg

    def descend(_, carry):
        node, target = carry
        left = 2 * node
        left_sum = state.tree[left]
        go_left = target < left_sum
        node = jnp.where(go_left, left, left + 1)
        target = jnp.where(go_left, target, target - left_sum)
        return node, target

    node0 = jnp.ones((batch_size,), jnp.int32)
    node, _ = jax.lax.fori_loop(0, _levels(capacity), descend, (node0, targets))
    leaf_idx = node - capacity
    # numerical guard: never pick an unfilled slot
    leaf_idx = jnp.minimum(leaf_idx, jnp.maximum(state.size - 1, 0))

    priorities = state.tree[leaf_idx + capacity]
    probs = priorities / jnp.maximum(total, 1e-8)
    n = jnp.maximum(state.size.astype(jnp.float32), 1.0)
    weights = jnp.power(n * jnp.maximum(probs, 1e-8), -beta)
    weights = weights / jnp.maximum(jnp.max(weights), 1e-8)  # ref: /max over batch

    batch = jax.tree_util.tree_map(lambda store: store[leaf_idx], state.data)
    return batch, leaf_idx, weights


def per_update_priorities(state: PERState, leaf_idx: jax.Array, priorities: jax.Array) -> PERState:
    """Write back post-exponent priorities; track the running max for inserts.

    Duplicate indices within one batch are deduplicated (first occurrence
    wins) so the level-wise delta propagation never double-counts a leaf.
    Cost: log2(N) scatter-adds of B deltas — B² dedup compare is trivial
    for minibatch-sized B.
    """
    capacity = state.tree.shape[0] // 2
    b = leaf_idx.shape[0]
    eq = leaf_idx[None, :] == leaf_idx[:, None]  # [B, B]
    first = jnp.sum(jnp.tril(eq, k=-1), axis=1) == 0  # no earlier equal index
    old = state.tree[leaf_idx + capacity]
    delta = jnp.where(first, priorities - old, 0.0)

    node = leaf_idx + capacity
    tree = state.tree.at[node].add(delta)
    for _ in range(_levels(capacity)):
        node = node // 2
        tree = tree.at[node].add(delta)
    max_priority = jnp.maximum(state.max_priority, jnp.max(priorities))
    return state._replace(tree=tree, max_priority=max_priority)
