"""Recurrent PPO: cell semantics, chunking, hidden handling, learning."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.algos.ppo_rnn import PPORNNConfig, PPORNNTrainer
from gymrl_tpu.nn.recurrent import MLPRNNCell, URNNCell


def small_cfg(**kw):
    base = dict(
        env_name="CartPole-v1", num_envs=8, rollout_steps=32, seq_len=8,
        seq_minibatch=16, num_epochs=2, normalize_obs=True, scale_rewards=True,
    )
    base.update(kw)
    return PPORNNConfig(**base)


def test_mlprnn_cell_split():
    """3/4 linear + 1/4 GRU concat (utils/model.py:290-302)."""
    cell = MLPRNNCell(output_dim=64)
    h = cell.initial_state(2)
    assert h.shape == (2, 16)
    params = cell.init(jax.random.PRNGKey(0), h, jnp.zeros((2, 10)))
    h1, out = cell.apply(params, h, jnp.ones((2, 10)))
    assert out.shape == (2, 64)
    assert h1.shape == (2, 16)
    # the GRU quarter of the output IS the new hidden state
    np.testing.assert_array_equal(np.asarray(out[:, 48:]), np.asarray(h1))


def test_urnn_packing():
    for cell_type, chunks in [("gru", 1), ("lstm", 2)]:
        cell = URNNCell(hidden_size=32, cell_type=cell_type)
        h = cell.initial_state(3)
        assert h.shape == (3, 32 * chunks)
        params = cell.init(jax.random.PRNGKey(0), h, jnp.zeros((3, 8)))
        h1, out = cell.apply(params, h, jnp.ones((3, 8)))
        assert h1.shape == (3, 32 * chunks)
        assert out.shape == (3, 32)


def test_train_iter_runs_and_counts():
    trainer = PPORNNTrainer(small_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert int(ts.env_steps) == 8 * 32
    for k in ["policy_loss", "value_loss", "entropy", "approx_kl"]:
        assert np.isfinite(float(out.metrics[k])), k
    # normalization statistics advanced by the rollout
    assert float(ts.obs_rms.count) == 8 * 32


def test_hidden_resets_at_done():
    """After an iteration, live hiddens are nonzero; the scan zeroes at dones."""
    trainer = PPORNNTrainer(small_cfg(rollout_steps=64))
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert np.asarray(out.ep_done).any()  # some CartPole episodes ended
    # carried hidden is finite and not all-zero (most envs mid-episode)
    h = np.asarray(ts.hidden)
    assert np.isfinite(h).all()
    assert np.abs(h).sum() > 0


def test_sequence_chunking_shapes():
    cfg = small_cfg(num_envs=4, rollout_steps=16, seq_len=4, seq_minibatch=8)
    assert cfg.seqs_per_rollout == 16
    assert cfg.num_minibatches == 2
    trainer = PPORNNTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["policy_loss"]))


def test_recurrent_eval_runs():
    trainer = PPORNNTrainer(small_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    returns, lengths = trainer.eval_episodes(ts, jax.random.PRNGKey(1), 4)
    assert returns.shape == (4,)
    assert np.all(np.asarray(returns) >= 1)


def test_seq_forward_matches_stepwise_apply():
    """The hoisted training unroll (encode/heads batched over mb·L, only
    the GRU cell sequential — r5) must equal the step-by-step full
    __call__ unroll exactly (same weights, re-batched)."""
    trainer = PPORNNTrainer(small_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    mb, L = 4, 8
    obs = jax.random.normal(jax.random.PRNGKey(1),
                            (mb, L, trainer.venv.env.obs_dim))
    h0 = jnp.zeros((mb, trainer.net.rnn_size), jnp.float32)

    logits_h, values_h = trainer._seq_forward(ts.params, h0, obs)

    h = h0
    logits_s, values_s = [], []
    for t in range(L):
        h, lg, v = trainer.net.apply(ts.params, h, obs[:, t])
        logits_s.append(lg)
        values_s.append(v)
    np.testing.assert_allclose(np.asarray(logits_h),
                               np.stack([np.asarray(x) for x in logits_s], 1),
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(values_h),
                               np.stack([np.asarray(x) for x in values_s], 1),
                               atol=1e-5)


def test_rnn_flat_optimizer_matches_pytree():
    """flat_optimizer on the recurrent family: representation change only —
    same seed, 2 train_iters, params agree to reduction-order noise."""
    tr_f = PPORNNTrainer(small_cfg(flat_optimizer=True))
    tr_t = PPORNNTrainer(small_cfg())
    ts_f = tr_f.init(jax.random.PRNGKey(11))
    ts_t = tr_t.init(jax.random.PRNGKey(11))
    for _ in range(2):
        ts_f, _ = tr_f.train_iter(ts_f)
        ts_t, _ = tr_t.train_iter(ts_t)
    for a, b in zip(jax.tree_util.tree_leaves(ts_f.params),
                    jax.tree_util.tree_leaves(ts_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_policy_step_carries_hidden():
    """The carry-through policy API threads the GRU hidden (VERDICT r4 #3):
    the carry must evolve step to step, and step 1 from the threaded carry
    must equal applying the cell manually — while the stateless policy()
    view stays pinned at h=0."""
    trainer = PPORNNTrainer(small_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    obs = jnp.ones((1, trainer.venv.env.obs_dim))
    key = jax.random.PRNGKey(1)

    c0 = trainer.policy_reset(1)
    assert c0.shape == (1, trainer.net.rnn_size)
    c1, a1 = trainer.policy_step(ts, c0, obs, key)
    c2, a2 = trainer.policy_step(ts, c1, obs, key)
    assert not np.allclose(np.asarray(c1), np.asarray(c0))
    assert not np.allclose(np.asarray(c2), np.asarray(c1))
    # threaded step == manual cell application from the threaded carry
    nobs = trainer._norm(ts.obs_rms, obs)
    h_manual, logits_manual, _ = trainer._apply_cell(ts.params, c1, nobs)
    np.testing.assert_allclose(np.asarray(c2), np.asarray(h_manual), rtol=1e-6)
    np.testing.assert_array_equal(
        np.asarray(a2), np.argmax(np.asarray(logits_manual), axis=-1)
    )
    # stateless view = policy_step from a fresh carry, every call
    a_stateless = trainer.policy(ts, obs, key)
    _, a_fresh = trainer.policy_step(ts, trainer.policy_reset(1), obs, key)
    np.testing.assert_array_equal(np.asarray(a_stateless), np.asarray(a_fresh))


def test_render_episode_threads_carry(monkeypatch, tmp_path):
    """TrainLoop.render_episode must drive recurrent policies through
    policy_step (memoryful), not the stateless policy()."""
    from gymrl_tpu.run.loop import TrainLoop

    trainer = PPORNNTrainer(small_cfg(env_name="CartPole-v1"))
    ts = trainer.init(jax.random.PRNGKey(0))
    seen_carries = []
    orig = type(trainer).policy_step

    def spy(self, ts, carry, obs, key, deterministic=True):
        seen_carries.append(np.asarray(carry))
        return orig(self, ts, carry, obs, key, deterministic)

    monkeypatch.setattr(type(trainer), "policy_step", spy)
    monkeypatch.chdir(tmp_path)
    loop = TrainLoop(trainer, "ppo_rnn", log_metrics=False)
    loop.render_episode(ts, max_frames=5)
    assert len(seen_carries) >= 2
    # first call gets the fresh zero carry; later calls a non-zero one
    assert not seen_carries[0].any()
    assert any(c.any() for c in seen_carries[1:])


def test_ppo_rnn_learns_cartpole():
    cfg = small_cfg(num_envs=16, rollout_steps=64, seq_len=8, seq_minibatch=32,
                    num_epochs=4)
    trainer = PPORNNTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(1))
    for _ in range(25):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(2), 6)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 100.0, f"recurrent PPO failed to learn: {mean_r}"


def test_whole_episode_bptt_mode():
    """whole_episode_bptt=True: episode-major padded rows, true per-episode
    initial hiddens (reference ppo_rnn_lunarlander.py:322-327 semantics)."""
    cfg = small_cfg(whole_episode_bptt=True, episode_rows_per_env=8,
                    seq_minibatch=16)
    assert cfg.n_train_items == 8 * 8
    trainer = PPORNNTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    for k in ("policy_loss", "value_loss", "entropy", "approx_kl"):
        assert np.isfinite(float(out.metrics[k])), k
    assert int(ts.env_steps) == 8 * 32
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["policy_loss"]))


def test_whole_episode_h0_semantics():
    """Packed rows start from the TRUE hidden at each episode's first step:
    zero for fresh episodes, the carried hidden for the continuation row."""
    from gymrl_tpu.algos.ppo_rnn import RNNRollout
    from gymrl_tpu.core.gae import compute_gae, standardize

    cfg = small_cfg(whole_episode_bptt=True, episode_rows_per_env=4,
                    num_envs=2, rollout_steps=8, seq_minibatch=8)
    trainer = PPORNNTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    # first iteration starts all-fresh: run one to advance the hidden
    ts, _ = trainer.train_iter(ts)
    assert float(jnp.abs(ts.hidden).sum()) >= 0.0  # carried hidden exists

    # collect a rollout manually and inspect the packed h0s
    _, _, _, _, _, roll, _ = trainer._collect(ts)
    adv, v_target = compute_gae(
        roll.reward, roll.value, roll.value, roll.terminated, roll.done,
        cfg.gamma, cfg.gae_lambda,
    )
    data, n, _pack_metrics = trainer._training_data(roll, standardize(adv), v_target)
    assert n == 2 * 4
    h0 = np.asarray(data["h0"])
    mask = np.asarray(data["mask"])
    done = np.asarray(roll.done)
    h_pre0 = np.asarray(roll.h_pre[0])
    R = cfg.episode_rows_per_env
    for b in range(2):
        # continuation row of column b carries ts.hidden (may be nonzero)
        np.testing.assert_allclose(h0[b * R], h_pre0[b], rtol=1e-6)
        # every later (fresh-episode) row starts from zero hidden
        n_eps = int(done[:, b].sum())
        for r in range(1, min(n_eps + 1, R)):
            if mask[b * R + r].sum() > 0:
                np.testing.assert_allclose(h0[b * R + r], 0.0, atol=1e-7)
