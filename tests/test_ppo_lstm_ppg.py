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


def test_ppg_aux_head_and_phases():
    cfg = PPGConfig(env_name="CartPole-v1", num_envs=8, rollout_steps=16,
                    seq_len=4, seq_minibatch=16, num_epochs=2, aux_epochs=2)
    trainer = PPGTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    assert "aux_critic_fc" in ts.params["params"]
    ts, out = trainer.train_iter(ts)
    for k in ["policy_loss", "value_loss", "aux_value_loss", "clone_loss"]:
        assert np.isfinite(float(out.metrics[k])), k
    # clone loss starts small: phase-1 policy barely moved from old probs
    assert float(out.metrics["clone_loss"]) < 1.0
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(1), 3)
    assert np.all(np.asarray(returns) >= 1)
