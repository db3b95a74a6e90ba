"""DQN-family trainer: preset wiring, n-step fold, target modes, smoke runs."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gymrl_tpu.algos.dqn_variants import (
    DQNFamilyTrainer,
    NStepWindow,
    ddqn_per_config,
    ddqn_per_duel_config,
    noisy_dqn_config,
    noisy_dqn_flappybird_config,
    rainbow_config,
)

SMALL = dict(num_envs=4, steps_per_iter=8, updates_per_step=1, memory_capacity=1024)


@pytest.mark.parametrize(
    "cfg_fn", [ddqn_per_config, ddqn_per_duel_config, noisy_dqn_config, rainbow_config]
)
def test_variant_smoke(cfg_fn):
    cfg = cfg_fn(**SMALL)
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["loss"]))
    assert int(ts.env_steps) == 2 * 8 * 4
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(1), 2)
    assert np.all(np.asarray(returns) >= 1)


def test_flappybird_preset_network_and_normalization():
    """noisy_dqn_flappybird parity (ref :219-250, 484-487): PSCN-512 +
    MLP[512,256,256] all-Noisy trunk, MLP[·,64,·] dueling streams, inline
    state-norm + reward scaling, Double-DQN, hard-step-400 target sync."""
    cfg = noisy_dqn_flappybird_config(**SMALL, batch_size=32)
    assert cfg.double and cfg.dueling and cfg.noisy
    assert cfg.target_mode == "hard_step" and cfg.target_update_freq == 400
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))

    # network structure: PSCN trunk (4 noisy MLP blocks), post-PSCN MLP of 3
    # noisy layers, dueling streams each a 2-layer noisy MLP
    p = ts.params["params"]
    assert set(p["pscn"]) == {"mlp_0", "mlp_1", "mlp_2", "mlp_3"}
    assert set(p["trunk_mlp"]) >= {"layer_0", "layer_1", "layer_2"}
    for stream in ("value", "advantage"):
        assert set(p[stream]) >= {"layer_0", "layer_1"}
        assert "kernel_mu" in p[stream]["layer_0"]  # noisy streams
    # PSCN output width 512, post-trunk 256, stream hidden 64
    assert p["trunk_mlp"]["layer_2"]["kernel_mu"].shape[-1] == 256
    assert p["value"]["layer_0"]["kernel_mu"].shape == (256, 64)

    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["loss"]))
    # normalization stats advanced with the rollout
    assert float(ts.obs_rms.count) == 8 * 4
    assert float(ts.reward_scaler.rms.count) == 8 * 4
    # replay stores NORMALIZED obs: with running stats the stored next_obs
    # magnitudes are O(1) even though FlappyBird obs aren't
    stored = np.asarray(ts.replay.data.obs[: 8 * 4])
    assert np.isfinite(stored).all()
    # eval uses frozen stats
    before = float(ts.obs_rms.count)
    trainer.eval_episodes(ts, jax.random.PRNGKey(1), 2)
    assert float(ts.obs_rms.count) == before


def test_nstep_fold_semantics():
    """The emitted transition folds rewards up to the first done in-window."""
    cfg = rainbow_config(**SMALL, n_steps=3, gamma=0.5)
    trainer = DQNFamilyTrainer(cfg)
    B, D = 1, 4
    w = NStepWindow(
        obs=jnp.arange(3 * B * D, dtype=jnp.float32).reshape(3, B, D),
        action=jnp.array([[7], [8], [9]], jnp.int32),
        reward=jnp.array([[1.0], [2.0], [4.0]]),
        next_obs=jnp.stack([jnp.full((B, D), i, jnp.float32) for i in [10, 20, 30]]),
        terminated=jnp.array([[0.0], [1.0], [0.0]]),
        done=jnp.array([[0.0], [1.0], [0.0]]),  # episode ends at window step 1
    )
    tr = trainer._fold_window(w)
    # folding stops at step 1's done: r = 1 + 0.5·2 = 2 (step 2 excluded)
    np.testing.assert_allclose(np.asarray(tr.reward), [[2.0]][0])
    np.testing.assert_allclose(np.asarray(tr.next_obs), np.full((B, D), 20.0))
    np.testing.assert_allclose(np.asarray(tr.terminated), [1.0])
    assert int(tr.action[0]) == 7  # oldest entry's action

    # no done in window: full 3-step fold, bootstrap from newest entry
    w2 = w._replace(terminated=jnp.zeros((3, 1)), done=jnp.zeros((3, 1)))
    tr2 = trainer._fold_window(w2)
    np.testing.assert_allclose(np.asarray(tr2.reward), [1 + 0.5 * 2 + 0.25 * 4])
    np.testing.assert_allclose(np.asarray(tr2.next_obs), np.full((B, D), 30.0))


def test_soft_target_update_moves_slowly():
    cfg = rainbow_config(**SMALL, batch_size=32)  # small enough to warm up fast
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    p0 = jax.tree_util.tree_leaves(ts.target_params)[0].copy()
    for _ in range(4):
        ts, _ = trainer.train_iter(ts)
    assert int(ts.learn_steps) > 0
    p1 = jax.tree_util.tree_leaves(ts.target_params)[0]
    online = jax.tree_util.tree_leaves(ts.params)[0]
    # target moved, but less than online
    assert not np.allclose(np.asarray(p0), np.asarray(p1))
    assert np.linalg.norm(np.asarray(p1 - p0)) < np.linalg.norm(np.asarray(online - p0))


def test_noisy_hard_step_target_sync():
    cfg = noisy_dqn_config(**SMALL, target_update_freq=4)
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    for _ in range(4):
        ts, _ = trainer.train_iter(ts)
    assert int(ts.learn_steps) > 0
    assert int(ts.target_syncs) == int(ts.learn_steps) // 4


def test_beta_modes():
    # stateful increment (ddqn_per): +0.001 per sample() call
    cfg = ddqn_per_config(**SMALL)
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    for _ in range(3):
        ts, out = trainer.train_iter(ts)
    n_samples = int(ts.learn_steps)
    np.testing.assert_allclose(float(ts.beta), min(1.0, 0.4 + 0.001 * n_samples), atol=1e-5)

    # progress anneal (rainbow): β follows env-step progress, stays in [0.4, 1]
    cfg2 = rainbow_config(**SMALL, max_train_steps=4 * 8 * 4)
    trainer2 = DQNFamilyTrainer(cfg2)
    ts2 = trainer2.init(jax.random.PRNGKey(0))
    for _ in range(2):
        ts2, out2 = trainer2.train_iter(ts2)
    assert 0.4 <= float(out2.metrics["beta"]) <= 1.0


def test_ddqn_learns_cartpole():
    cfg = ddqn_per_config(num_envs=16, steps_per_iter=32, updates_per_step=1,
                          memory_capacity=16384, epsilon_decay=2000.0)
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(3))
    for _ in range(50):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(5), 8)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 120.0, f"DDQN+PER failed to learn: {mean_r}"


def test_noisy_dqn_learns_cartpole():
    """Bounded CI learning check: per-sample acting noise must drive real
    exploration (full solve 495.2 @ 1.5M recorded in SOLVE_r2.jsonl)."""
    cfg = noisy_dqn_config(num_envs=16, steps_per_iter=32, updates_per_step=4,
                           memory_capacity=16384)
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(11))
    for _ in range(50):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(12), 8)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 120.0, f"NoisyDQN failed to learn: {mean_r}"


def test_rainbow_learns_cartpole():
    """Bounded CI learning check for the rainbow stack (PER + n-step-5 +
    noisy heads + soft target + lr decay): μ-only targets per the reference
    (rainbow_dqn_cartpole.py:281) — noisy targets plateau the run."""
    cfg = rainbow_config(num_envs=16, steps_per_iter=32, updates_per_step=4,
                         max_train_steps=50_000)
    trainer = DQNFamilyTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(13))
    for _ in range(60):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(14), 8)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 120.0, f"Rainbow failed to learn: {mean_r}"
