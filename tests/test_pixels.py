"""Pixel-observation pipeline: rendering sanity, frame mechanics, conv DQN.

Covers the reference's image-obs capability (make_env's AtariPreprocessing
+ PyTorchFrame path, utils/runner.py:57-66) in its TPU-native form: jitted
rasterization + frame stack + NHWC conv trunk.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.envs.pixels import CartPolePixels, rasterize_box, rasterize_segment
from gymrl_tpu.envs.registry import make, make_vec


def test_rasterizers():
    box = np.asarray(rasterize_box(16, 16, 8.0, 8.0, 2.0, 1.0))
    assert box[8, 8] == 1.0 and box[8, 11] == 0.0 and box[10, 8] == 0.0
    assert 0.0 < box[8, 6] < 1.0 and 0.0 < box[9, 8] < 1.0  # AA soft edge
    seg = np.asarray(rasterize_segment(16, 16, 2.0, 2.0, 13.0, 13.0, 1.0))
    assert seg[5, 5] == 1.0 and seg[2, 13] == 0.0  # on/off the diagonal


def test_rasterizers_subpixel_motion():
    """AA coverage must change CONTINUOUSLY under sub-pixel translation —
    the property that lets pixel agents see small state changes (binary
    masks are step functions and hide them)."""
    a = np.asarray(rasterize_box(16, 16, 8.0, 8.0, 2.0, 1.0))
    b = np.asarray(rasterize_box(16, 16, 8.3, 8.0, 2.0, 1.0))
    diff = np.abs(a - b).sum()
    assert 0.0 < diff < 4.0, diff  # visible but small
    # center of mass tracks the 0.3-px shift
    cols = np.arange(16, dtype=np.float64)
    com_a = (a.sum(0) * cols).sum() / a.sum()
    com_b = (b.sum(0) * cols).sum() / b.sum()
    assert 0.1 < com_b - com_a < 0.5
    s0 = np.asarray(rasterize_segment(16, 16, 8.0, 2.0, 8.0, 13.0, 1.2))
    s1 = np.asarray(rasterize_segment(16, 16, 8.25, 2.0, 8.25, 13.0, 1.2))
    assert 0.0 < np.abs(s0 - s1).sum() < 8.0


def test_pixel_cartpole_reset_and_step_shapes():
    env = make("CartPolePixels-v0")
    params = env.default_params()
    state, obs = env.reset(params, jax.random.PRNGKey(0))
    assert obs.shape == (48, 48, 4)
    assert obs.dtype == jnp.float32
    assert 0.0 <= float(obs.min()) and float(obs.max()) <= 1.0
    # fresh reset: all stack slots hold the same frame
    np.testing.assert_array_equal(np.asarray(obs[..., 0]), np.asarray(obs[..., 3]))
    res = env.step(params, state, jnp.int32(1), jax.random.PRNGKey(1))
    assert res.obs.shape == (48, 48, 4)
    assert float(res.reward) == 1.0
    # stack advanced: oldest slot is the reset frame, newest differs
    np.testing.assert_array_equal(
        np.asarray(res.obs[..., 2]), np.asarray(obs[..., 3])
    )


def test_pixel_frame_tracks_cart_motion():
    env = make("CartPolePixels-v0")
    params = env.default_params()
    state, obs = env.reset(params, jax.random.PRNGKey(0))
    # push right repeatedly: the rendered cart column mass must move right
    for i in range(25):
        res = env.step(params, state, jnp.int32(1), jax.random.PRNGKey(i))
        state = res.state
    col0 = np.asarray(obs[..., -1]).sum(axis=0)
    col1 = np.asarray(res.obs[..., -1]).sum(axis=0)
    com0 = (col0 * np.arange(48)).sum() / col0.sum()
    com1 = (col1 * np.arange(48)).sum() / col1.sum()
    assert com1 > com0 + 0.5, f"cart did not move right: {com0} -> {com1}"


def test_pixel_vec_env_autoreset():
    venv = make_vec("CartPolePixels-v0", 4)
    vs = venv.reset(jax.random.PRNGKey(0))
    assert vs.obs.shape == (4, 48, 48, 4)
    vs, tr = venv.step(vs, jnp.zeros((4,), jnp.int32), jax.random.PRNGKey(1))
    assert tr.next_obs.shape == (4, 48, 48, 4)
    assert np.isfinite(np.asarray(tr.reward)).all()


def test_conv_dqn_learns_cartpole_pixels():
    """Bounded CI learning check for the conv path (VERDICT r2 item 5):
    20k env-steps of pixel DQN must beat the untrained-policy eval (~9)
    by a clear margin. Calibration (CPU, seed 7): eval 9.5 @ 5k steps →
    42.6 @ 20k; full-budget runs reach avg100 ~130 @ 1M (CURVES_r3.jsonl).
    """
    import numpy as np
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, dqn_pixels_config

    # pinned fast-learning calibration (NOT the shipped solve defaults,
    # which trade early speed for late stability: lr 1e-4 + sync 1000 +
    # lr_decay solve at 1.79M but are too slow for a 20k-step CI check)
    cfg = dqn_pixels_config(num_envs=16, steps_per_iter=32, batch_size=64,
                            memory_capacity=4096, updates_per_step=4, lr=1e-3,
                            epsilon_decay=4000.0, target_update_freq=500,
                            lr_decay=False)
    tr = DQNFamilyTrainer(cfg)
    ts = tr.init(jax.random.PRNGKey(7))
    for _ in range(40):
        ts, _ = tr.train_iter(ts)
    rets, _ = tr.eval_episodes(ts, jax.random.PRNGKey(39), 8)
    mean_r = float(np.mean(np.asarray(rets)))
    assert mean_r > 25.0, f"conv DQN failed to learn from pixels: {mean_r}"


def test_conv_dqn_train_iter_runs():
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, dqn_pixels_config

    cfg = dqn_pixels_config(
        num_envs=4, steps_per_iter=8, batch_size=8, memory_capacity=64,
        updates_per_step=1, target_update_freq=4,
    )
    tr = DQNFamilyTrainer(cfg)
    ts = tr.init(jax.random.PRNGKey(0))
    ts, out = tr.train_iter(ts)
    ts, out = tr.train_iter(ts)
    assert int(ts.env_steps) == 2 * 8 * 4
    assert np.isfinite(float(out.metrics["loss"]))
    # eval path (argmax over conv Q-net) produces valid actions
    a = tr.policy(ts, ts.vec_state.obs, jax.random.PRNGKey(2))
    assert a.shape == (4,) and set(np.asarray(a)) <= {0, 1}


def test_pixel_uint8_replay_roundtrip():
    """obs_uint8: frames quantize into the replay as uint8 and dequantize
    within half a quantum (1/510) of the rendered [0, 1] frame."""
    from gymrl_tpu.algos.dqn_variants import DQNFamilyTrainer, dqn_pixels_config

    cfg = dqn_pixels_config(num_envs=4, steps_per_iter=4, memory_capacity=128,
                            batch_size=8, updates_per_step=1)
    tr = DQNFamilyTrainer(cfg)
    ts = tr.init(jax.random.PRNGKey(0))
    assert ts.replay.data.obs.dtype == jnp.uint8
    ts, out = tr.train_iter(ts)
    stored = np.asarray(ts.replay.data.obs[0]).astype(np.float32) / 255.0
    assert stored.min() >= 0.0 and stored.max() <= 1.0
    # the stored frame must be a quantized render, not garbage: every value
    # is a multiple of 1/255 and the frame is non-trivial
    assert stored.max() > 0.1
    ts, out = tr.train_iter(ts)
    assert np.isfinite(float(out.metrics["loss"]))
