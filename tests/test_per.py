"""Prioritized replay: sum-tree invariants, stratified sampling, IS weights."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.replay.per import (
    per_init,
    per_push_batch,
    per_sample,
    per_update_priorities,
)


def _example():
    return {"a": jnp.zeros((), jnp.int32)}


def _batch(lo, hi):
    return {"a": jnp.arange(lo, hi, dtype=jnp.int32)}


def _tree_ok(state):
    """Internal nodes must equal the sum of their children."""
    tree = np.asarray(state.tree)
    n = tree.shape[0] // 2
    for i in range(1, n):
        assert abs(tree[i] - (tree[2 * i] + tree[2 * i + 1])) < 1e-4, f"node {i}"


def test_push_gets_max_priority():
    st = per_init(_example(), capacity=16)
    st = per_push_batch(st, _batch(0, 4))
    leaves = np.asarray(st.tree[16:])
    np.testing.assert_allclose(leaves[:4], 1.0)  # initial max priority 1.0
    assert float(st.tree[1]) == 4.0
    _tree_ok(st)

    # raise a priority, then new pushes inherit the new max
    st = per_update_priorities(st, jnp.array([2]), jnp.array([5.0]))
    assert float(st.max_priority) == 5.0
    st = per_push_batch(st, _batch(4, 6))
    leaves = np.asarray(st.tree[16:])
    np.testing.assert_allclose(leaves[4:6], 5.0)
    _tree_ok(st)


def test_update_priorities_with_duplicates():
    st = per_init(_example(), capacity=8)
    st = per_push_batch(st, _batch(0, 8))
    st = per_update_priorities(
        st, jnp.array([1, 1, 3]), jnp.array([2.0, 7.0, 0.5])
    )
    leaves = np.asarray(st.tree[8:])
    assert leaves[1] in (2.0, 7.0)  # deduplicated, consistent
    assert leaves[3] == 0.5
    _tree_ok(st)


def test_sampling_follows_priorities():
    st = per_init(_example(), capacity=16)
    st = per_push_batch(st, _batch(0, 16))
    # give slot 5 90% of total mass
    pri = np.full(16, 0.1, np.float32)
    pri[5] = 0.1 * 15 * 9
    st = per_update_priorities(st, jnp.arange(16), jnp.asarray(pri))
    _tree_ok(st)

    sample = jax.jit(lambda k: per_sample(st, k, 64, 0.4)[1])
    idx = np.concatenate([np.asarray(sample(jax.random.PRNGKey(i))) for i in range(20)])
    frac5 = (idx == 5).mean()
    assert 0.8 < frac5 < 1.0, frac5  # ~90% of draws hit the heavy slot


def test_is_weights_max_normalized():
    st = per_init(_example(), capacity=16)
    st = per_push_batch(st, _batch(0, 16))
    pri = np.linspace(0.1, 2.0, 16).astype(np.float32)
    st = per_update_priorities(st, jnp.arange(16), jnp.asarray(pri))
    batch, idx, w = per_sample(st, jax.random.PRNGKey(0), 32, 0.4)
    w = np.asarray(w)
    assert w.max() <= 1.0 + 1e-6
    assert w.min() > 0.0
    # lower-priority samples get larger IS weights
    idx = np.asarray(idx)
    lo, hi = w[idx == idx.min()], w[idx == idx.max()]
    if len(lo) and len(hi):
        assert lo.mean() >= hi.mean()


def test_ring_wraparound_keeps_tree_consistent():
    st = per_init(_example(), capacity=8)
    for lo in range(0, 40, 4):
        st = per_push_batch(st, _batch(lo, lo + 4))
    assert int(st.size) == 8
    _tree_ok(st)
