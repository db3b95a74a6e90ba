"""DQN end-to-end: the framework's minimum slice (SURVEY.md §7.2 step 1)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gymrl_tpu.algos.dqn import DQNConfig, DQNTrainer


@pytest.fixture(scope="module")
def trainer():
    cfg = DQNConfig(num_envs=8, steps_per_iter=16, updates_per_step=2,
                    memory_capacity=10_000)
    return DQNTrainer(cfg)


def test_train_iter_shapes_and_finiteness(trainer):
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert out.ep_return.shape == (16, 8)
    assert np.isfinite(float(out.metrics["loss"]))
    assert int(ts.env_steps) == 16 * 8
    # replay filled by exactly steps_per_iter pushes of num_envs each
    assert int(ts.replay.size) == 16 * 8


def test_train_iter_is_pure(trainer):
    """Same input state → same output state (no hidden host state)."""
    ts = trainer.init(jax.random.PRNGKey(0))
    ts1, _ = trainer.train_iter(ts)
    ts2, _ = trainer.train_iter(ts)
    for a, b in zip(jax.tree_util.tree_leaves(ts1), jax.tree_util.tree_leaves(ts2)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_target_sync_cadence(trainer):
    """Target net syncs only when the 4-episode counter advances."""
    ts = trainer.init(jax.random.PRNGKey(0))
    for _ in range(8):
        ts, _ = trainer.train_iter(ts)
    assert int(ts.episodes) > 0
    assert int(ts.target_syncs) == int(ts.episodes) // trainer.cfg.target_update_freq


def test_eval_episodes(trainer):
    ts = trainer.init(jax.random.PRNGKey(0))
    returns, lengths = trainer.eval_episodes(ts, jax.random.PRNGKey(1), 4)
    assert returns.shape == (4,)
    r = np.asarray(returns)
    l = np.asarray(lengths)
    np.testing.assert_array_equal(r, l.astype(np.float32))  # CartPole: return == length
    assert np.all(r >= 1) and np.all(r <= 500)


def test_dqn_learns_cartpole():
    """Short learning check: avg return must clearly beat the random policy.

    Full solve (≥495 avg100) is the TPU bench's job; on CPU CI we assert
    unambiguous learning progress in a small budget.
    """
    cfg = DQNConfig(num_envs=16, steps_per_iter=32, updates_per_step=1,
                    memory_capacity=20_000, epsilon_decay=2000.0)
    trainer = DQNTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(42))
    for _ in range(60):  # 60 * 32 * 16 = ~30k env steps
        ts, out = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(7), 8)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 120.0, f"DQN failed to learn: eval return {mean_r}"
