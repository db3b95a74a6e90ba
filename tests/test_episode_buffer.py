"""Episode-major padded buffer, FIFO queue, NoisyConv2d parity tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.nn.layers import NoisyConv2d
from gymrl_tpu.replay.episode import (
    episode_buffer_clear,
    episode_buffer_init,
    episode_buffer_store,
    queue_init,
    queue_push,
    queue_sample,
)


def test_episode_buffer_padding_and_rollover():
    st = episode_buffer_init({"r": jnp.zeros(())}, n_episodes=3, max_steps=5)
    # episode 0: length 2; episode 1: length 3
    for i, done in [(1, False), (2, True), (10, False), (11, False), (12, True)]:
        st = episode_buffer_store(st, {"r": jnp.asarray(float(i))}, done)
    assert int(st.ep_index) == 2
    lengths = np.asarray(st.lengths)
    assert lengths[0] == 2 and lengths[1] == 3
    active = np.asarray(st.active)
    assert active[0, :2].all() and not active[0, 2:].any()
    assert active[1, :3].all() and not active[1, 3:].any()
    data = np.asarray(st.data["r"])
    np.testing.assert_allclose(data[0, :2], [1, 2])
    np.testing.assert_allclose(data[1, :3], [10, 11, 12])
    assert not bool(st.full)

    # fill episode 2 → buffer reports full, wraps to row 0 and clears it
    st = episode_buffer_store(st, {"r": jnp.asarray(99.0)}, True)
    assert bool(st.full)
    assert int(st.ep_index) == 0
    assert int(st.lengths[0]) == 0  # row 0 reset for reuse

    st = episode_buffer_clear(st)
    assert not bool(st.full) and int(st.lengths.sum()) == 0


def test_queue_fifo_and_sample():
    st = queue_init({"x": jnp.zeros(())}, capacity=4)
    for i in range(6):  # overflows: keeps last 4 (ring semantics)
        st = queue_push(st, {"x": jnp.asarray(float(i))})
    assert int(st.size) == 4
    vals = set(np.asarray(st.data["x"]).tolist())
    assert vals == {2.0, 3.0, 4.0, 5.0}
    batch = queue_sample(st, jax.random.PRNGKey(0), 16)
    assert set(np.asarray(batch["x"]).tolist()) <= vals


def test_noisy_conv2d():
    layer = NoisyConv2d(8, kernel_size=(3, 3))
    x = jnp.ones((2, 10, 10, 3))
    params = layer.init({"params": jax.random.PRNGKey(0)}, x)
    det = layer.apply(params, x, deterministic=True)
    assert det.shape == (2, 8, 8, 8)
    na = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    nb = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    assert not np.allclose(np.asarray(na), np.asarray(nb))
    np.testing.assert_array_equal(
        np.asarray(layer.apply(params, x, deterministic=True)), np.asarray(det)
    )


def test_episode_buffer_pack_vectorized():
    """episode_buffer_pack splits [T, B] columns into left-aligned padded
    episode rows with exact active masks (the vectorized equivalent of T·B
    episode_buffer_store calls)."""
    from gymrl_tpu.replay.episode import episode_buffer_pack

    T, B, R = 6, 2, 3
    x = jnp.arange(T * B, dtype=jnp.float32).reshape(T, B)  # x[t, b] = 2t + b
    # col 0 episodes: [0,1,2], [3,4], [5...(open)]; col 1: [0,1,2,3,4,5] open
    done = jnp.array(
        [[0, 0], [0, 0], [1, 0], [0, 0], [1, 0], [0, 0]], jnp.float32
    )
    st = episode_buffer_pack({"x": x}, done, rows_per_env=R)
    assert st.data["x"].shape == (B * R, T)
    np.testing.assert_array_equal(np.asarray(st.lengths), [3, 2, 1, 6, 0, 0])
    # col 0, episode 0 = steps t=0..2 → x values 0, 2, 4
    np.testing.assert_allclose(np.asarray(st.data["x"][0, :3]), [0.0, 2.0, 4.0])
    np.testing.assert_allclose(np.asarray(st.data["x"][1, :2]), [6.0, 8.0])
    np.testing.assert_allclose(np.asarray(st.data["x"][2, :1]), [10.0])
    # col 1 is one long open episode
    np.testing.assert_allclose(
        np.asarray(st.data["x"][3]), [1.0, 3.0, 5.0, 7.0, 9.0, 11.0]
    )
    # masks match lengths; padding stays zero
    assert np.asarray(st.active).sum() == 3 + 2 + 1 + 6
    assert float(st.data["x"][1, 2:].sum()) == 0.0


def test_episode_buffer_pack_overflow_rows_dropped():
    from gymrl_tpu.replay.episode import episode_buffer_pack

    T = 6
    done = jnp.ones((T, 1), jnp.float32)  # six 1-step episodes, R=2 keeps 2
    st = episode_buffer_pack({"x": jnp.arange(T, dtype=jnp.float32)[:, None]},
                             done, rows_per_env=2)
    np.testing.assert_array_equal(np.asarray(st.lengths), [1, 1])
    np.testing.assert_allclose(np.asarray(st.data["x"][:, 0]), [0.0, 1.0])
    # the 4 discarded episodes are COUNTED, not silent
    assert int(st.dropped_episodes) == 4
    assert int(st.dropped_steps) == 4


def test_episode_buffer_pack_short_episode_overflow_counted():
    """Worst case from VERDICT r2: short episodes overflowing rows_per_env
    (T=128, ~10-step episodes, R=8 → 12-13 segments per column) must report
    exact drop counts, and no drop when R is sized to fit."""
    from gymrl_tpu.replay.episode import episode_buffer_pack

    T, B, ep_len = 128, 4, 10
    done = jnp.zeros((T, B))
    done = done.at[ep_len - 1 :: ep_len, :].set(1.0)  # dones at t=9,19,...,119
    x = jnp.zeros((T, B))

    st = episode_buffer_pack({"x": x}, done, rows_per_env=8)
    # 12 full episodes + 1 open 8-step tail per column; 8 kept → 5 segments
    # dropped per column, 4·ep_len + 8 steps dropped per column
    assert int(st.dropped_episodes) == B * 5
    assert int(st.dropped_steps) == B * (4 * ep_len + 8)
    assert int(jnp.sum(st.active)) == B * 8 * ep_len

    st_ok = episode_buffer_pack({"x": x}, done, rows_per_env=13)
    assert int(st_ok.dropped_episodes) == 0
    assert int(st_ok.dropped_steps) == 0
    assert int(jnp.sum(st_ok.active)) == T * B


def test_ppo_rnn_whole_episode_surfaces_drop_metric():
    """The whole-episode BPTT trainer exposes dropped_steps/episodes in its
    per-iter metrics (replay/episode.py pack overflow accounting)."""
    from gymrl_tpu.algos.ppo_rnn import PPORNNConfig, PPORNNTrainer

    cfg = PPORNNConfig(
        env_name="CartPole-v1", num_envs=4, rollout_steps=16, seq_len=4,
        num_epochs=1, seq_minibatch=4, whole_episode_bptt=True,
        episode_rows_per_env=2,
    )
    tr = PPORNNTrainer(cfg)
    ts = tr.init(jax.random.PRNGKey(0))
    _, out = tr.train_iter(ts)
    assert "dropped_steps" in out.metrics and "dropped_episodes" in out.metrics
    assert float(out.metrics["dropped_steps"]) >= 0.0
