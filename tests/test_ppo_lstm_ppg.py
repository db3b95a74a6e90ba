"""ppo_lstm (recurrent full-tricks + RND) and PPG trainer tests."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.algos.ppg import PPGConfig, PPGTrainer
from gymrl_tpu.algos.ppo_lstm import PPOLSTMConfig, PPOLSTMTrainer, RNDPair


def lstm_cfg(**kw):
    base = dict(
        env_name="CartPole-v1", num_envs=8, rollout_steps=16, seq_len=4,
        seq_minibatch=16, num_epochs=2, mhc_dim=32, mhc_sk_it=5,
        rnn_hidden=64, rnd_embed=64, max_train_steps=100_000,
    )
    base.update(kw)
    return PPOLSTMConfig(**base)


def test_rnd_target_frozen():
    rnd = RNDPair(embed_dim=64)
    params = rnd.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))

    def loss(p, x):
        pred, targ = rnd.apply(p, x)
        return jnp.mean(jnp.square(pred - targ))

    g = jax.grad(loss)(params, jnp.ones((8, 4)))
    pred_norm = sum(
        float(jnp.linalg.norm(x))
        for x in jax.tree_util.tree_leaves(g["params"]["predictor"])
    )
    targ_norm = sum(
        float(jnp.linalg.norm(x))
        for x in jax.tree_util.tree_leaves(g["params"]["target"])
    )
    assert pred_norm > 0
    assert targ_norm == 0.0  # stop_gradient freezes the target


def test_rnd_reward_positive_and_shrinks():
    """Intrinsic reward is a positive MSE that the predictor can reduce."""
    rnd = RNDPair(embed_dim=64)
    params = rnd.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    x = jax.random.normal(jax.random.PRNGKey(1), (32, 4))
    pred, targ = rnd.apply(params, x)
    r0 = float(jnp.mean(jnp.square(pred - targ)))
    assert r0 > 0
    import optax

    tx = optax.adam(1e-3)
    opt = tx.init(params)

    def loss(p):
        pred, targ = rnd.apply(p, x)
        return jnp.mean(jnp.square(pred - targ))

    for _ in range(50):
        g = jax.grad(loss)(params)
        upd, opt = tx.update(g, opt, params)
        params = optax.apply_updates(params, upd)
    assert float(loss(params)) < r0  # familiarity reduces intrinsic reward


def test_lstm_train_iter_gru():
    trainer = PPOLSTMTrainer(lstm_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    for k in ["policy_loss", "value_loss", "entropy", "rnd_loss", "clip_frac",
              "erc_clip_frac", "lr", "ent_coef"]:
        assert np.isfinite(float(out.metrics[k])), k
    assert float(out.metrics["rnd_loss"]) > 0
    assert int(ts.env_steps) == 8 * 16


def test_lstm_train_iter_lstm_cell():
    trainer = PPOLSTMTrainer(lstm_cfg(rnn_cell="lstm"))
    ts = trainer.init(jax.random.PRNGKey(0))
    assert ts.hidden.shape == (8, 128)  # packed h|c
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["policy_loss"]))


def test_lstm_eval():
    trainer = PPOLSTMTrainer(lstm_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(1), 3)
    assert np.all(np.asarray(returns) >= 1)


def test_lstm_seq_forward_matches_stepwise_apply():
    """Hoisted unroll (mHC/RND/heads batched, URNN cell sequential — r5)
    equals the step-by-step full __call__ unroll."""
    trainer = PPOLSTMTrainer(lstm_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    mb, L = 3, 6
    obs = jax.random.normal(jax.random.PRNGKey(2),
                            (mb, L, trainer.venv.env.obs_dim))
    h0 = jnp.zeros((mb, trainer.net.packed_hidden), jnp.float32)

    logits_h, values_h, predict_h, target_h = trainer._seq_forward(ts.params, h0, obs)

    h = h0
    for t in range(L):
        h, lg, v, pr, tg = trainer.net.apply(ts.params, h, obs[:, t])
        np.testing.assert_allclose(np.asarray(logits_h[:, t]), np.asarray(lg), atol=1e-5)
        np.testing.assert_allclose(np.asarray(values_h[:, t]), np.asarray(v), atol=1e-5)
        np.testing.assert_allclose(np.asarray(predict_h[:, t]), np.asarray(pr), atol=1e-5)
        np.testing.assert_allclose(np.asarray(target_h[:, t]), np.asarray(tg), atol=1e-5)


def test_lstm_ppg_flat_optimizer_matches_pytree():
    """flat_optimizer across the rest of the recurrent family (ppo_lstm with
    RND+mHC, and PPG's two-phase loop): params match the pytree optimizer
    from the same seed to reduction-order noise."""
    ts_f = None
    for make in (
        lambda fo: PPOLSTMTrainer(lstm_cfg(flat_optimizer=fo)),
        lambda fo: PPGTrainer(PPGConfig(env_name="CartPole-v1", num_envs=4,
                                        rollout_steps=16, seq_len=8,
                                        seq_minibatch=8, num_epochs=2,
                                        aux_epochs=2, aux_every=1,
                                        flat_optimizer=fo)),
    ):
        tr_f, tr_t = make(True), make(False)
        ts_f = tr_f.init(jax.random.PRNGKey(13))
        ts_t = tr_t.init(jax.random.PRNGKey(13))
        for _ in range(2):
            ts_f, _ = tr_f.train_iter(ts_f)
            ts_t, _ = tr_t.train_iter(ts_t)
        for a, b in zip(jax.tree_util.tree_leaves(ts_f.params),
                        jax.tree_util.tree_leaves(ts_t.params)):
            np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_lstm_policy_step_carries_hidden():
    """Carry-through policy API on the LSTM family (VERDICT r4 #3): the
    packed (h, c) carry evolves, and PPG (PPORNNTrainer subclass) inherits
    the same surface through _apply_cell."""
    trainer = PPOLSTMTrainer(lstm_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    obs = jnp.ones((1, trainer.venv.env.obs_dim))
    key = jax.random.PRNGKey(1)
    c0 = trainer.policy_reset(1)
    assert c0.shape == (1, trainer.net.packed_hidden)
    c1, _ = trainer.policy_step(ts, c0, obs, key)
    c2, _ = trainer.policy_step(ts, c1, obs, key)
    assert not np.allclose(np.asarray(c1), np.asarray(c0))
    assert not np.allclose(np.asarray(c2), np.asarray(c1))

    ppg = PPGTrainer(PPGConfig(env_name="CartPole-v1", num_envs=4, rollout_steps=16))
    pts = ppg.init(jax.random.PRNGKey(0))
    pc0 = ppg.policy_reset(1)
    pc1, _ = ppg.policy_step(pts, pc0, obs, key)
    assert not np.allclose(np.asarray(pc1), np.asarray(pc0))


def test_ppo_lstm_learns_cartpole():
    """Bounded CI learning check for the LSTM trick stack (RND + value-clip +
    masked-ERC + stored-hidden chunks): must clearly beat random. The full
    LunarLander solve is recorded in SOLVE_r2.jsonl (avg100 203.9 @ 1.1M)."""
    cfg = lstm_cfg(num_envs=16, rollout_steps=64, seq_len=8, seq_minibatch=32,
                   num_epochs=4, mhc_dim=64, rnn_hidden=128,
                   max_train_steps=200_000)
    trainer = PPOLSTMTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(5))
    for _ in range(25):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(6), 6)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 100.0, f"ppo_lstm failed to learn: {mean_r}"


def test_ppg_learns_cartpole():
    """Bounded CI learning check for PPG WITH its aux phase active — the
    exact stack where trunk-distortion bugs hide (see PPGConfig docstring
    for the behavior-clone ablation evidence)."""
    cfg = PPGConfig(env_name="CartPole-v1", num_envs=16, rollout_steps=64,
                    seq_len=8, seq_minibatch=32, num_epochs=4, aux_epochs=6,
                    max_train_steps=200_000)
    trainer = PPGTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(7))
    for _ in range(25):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(8), 6)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 100.0, f"PPG failed to learn: {mean_r}"


def test_ppg_aux_head_and_phases():
    # canonical mode (defaults) with aux_every=1 so one iter runs both phases
    cfg = PPGConfig(env_name="CartPole-v1", num_envs=8, rollout_steps=16,
                    seq_len=4, seq_minibatch=16, num_epochs=2, aux_epochs=2,
                    aux_every=1)
    trainer = PPGTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    assert "aux_critic_fc" in ts.params["params"]
    ts, out = trainer.train_iter(ts)
    for k in ["policy_loss", "value_loss", "aux_value_loss", "clone_loss"]:
        assert np.isfinite(float(out.metrics[k])), k
    assert float(out.metrics["aux_value_loss"]) > 0  # aux phase actually ran


def test_ppg_reference_exact_mode():
    """clone_target='behavior' (ppg_rnn_lunarlander.py:372-393 semantics)
    stays available and runs; clone loss is MSE to the stored logp."""
    cfg = PPGConfig(env_name="CartPole-v1", num_envs=8, rollout_steps=16,
                    seq_len=4, seq_minibatch=16, num_epochs=2, aux_epochs=2,
                    clone_target="behavior", aux_every=1)
    trainer = PPGTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["clone_loss"]))
    assert float(out.metrics["aux_value_loss"]) > 0


def test_ppg_aux_every_skips_between_phases():
    """aux_every=N runs phase 2 only on every Nth iteration (fires on
    iterations N-1, 2N-1, ... so a fresh run still gets an early aux pass)."""
    cfg = PPGConfig(env_name="CartPole-v1", num_envs=8, rollout_steps=16,
                    seq_len=4, seq_minibatch=16, num_epochs=2, aux_epochs=2,
                    aux_every=2)
    trainer = PPGTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out0 = trainer.train_iter(ts)  # iter 0: skipped (fires at idx 1)
    ts, out1 = trainer.train_iter(ts)  # iter 1: runs
    assert float(out0.metrics["aux_value_loss"]) == 0.0
    assert float(out1.metrics["aux_value_loss"]) > 0.0
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(1), 3)
    assert np.all(np.asarray(returns) >= 1)
