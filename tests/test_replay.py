"""Replay buffer tests: ring semantics, wraparound, sampling."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.replay.uniform import (
    replay_init,
    replay_push_batch,
    replay_sample,
    replay_sample_no_replacement,
)


def _example():
    return {"x": jnp.zeros((3,), jnp.float32), "a": jnp.zeros((), jnp.int32)}


def _batch(lo, hi):
    n = hi - lo
    return {
        "x": jnp.arange(lo, hi, dtype=jnp.float32)[:, None].repeat(3, 1),
        "a": jnp.arange(lo, hi, dtype=jnp.int32),
    }


def test_push_and_size():
    st = replay_init(_example(), capacity=10)
    st = replay_push_batch(st, _batch(0, 4))
    assert int(st.size) == 4 and int(st.pos) == 4
    st = replay_push_batch(st, _batch(4, 8))
    assert int(st.size) == 8
    np.testing.assert_array_equal(np.asarray(st.data["a"][:8]), np.arange(8))


def test_wraparound_overwrites_oldest():
    st = replay_init(_example(), capacity=10)
    st = replay_push_batch(st, _batch(0, 8))
    st = replay_push_batch(st, _batch(8, 14))  # wraps: slots 8,9,0,1,2,3
    assert int(st.size) == 10
    assert int(st.pos) == 4
    expected = np.array([10, 11, 12, 13, 4, 5, 6, 7, 8, 9])
    np.testing.assert_array_equal(np.asarray(st.data["a"]), expected)


def test_sample_only_valid_slots():
    st = replay_init(_example(), capacity=100)
    st = replay_push_batch(st, _batch(0, 20))
    batch = replay_sample(st, jax.random.PRNGKey(0), 512)
    a = np.asarray(batch["a"])
    assert a.min() >= 0 and a.max() < 20
    assert batch["x"].shape == (512, 3)


def test_sample_no_replacement_unique():
    st = replay_init(_example(), capacity=64)
    st = replay_push_batch(st, _batch(0, 40))
    batch = replay_sample_no_replacement(st, jax.random.PRNGKey(1), 32)
    a = np.asarray(batch["a"])
    assert len(np.unique(a)) == 32
    assert a.max() < 40


def test_push_inside_jit_scan():
    """Pushes compose with lax.scan (the trainer's usage pattern)."""
    st = replay_init(_example(), capacity=16)

    @jax.jit
    def run(st):
        def body(st, i):
            b = {"x": jnp.full((2, 3), i, jnp.float32), "a": jnp.full((2,), i, jnp.int32)}
            return replay_push_batch(st, b), None

        st, _ = jax.lax.scan(body, st, jnp.arange(10))
        return st

    st = run(st)
    assert int(st.size) == 16
    assert int(st.pos) == 4
