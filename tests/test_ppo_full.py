"""Full-tricks PPO: mHC backbone numerics, ERC, clip-higher, annealing."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.algos.ppo_full import (
    PPOFullConfig,
    PPOFullTrainer,
    SiluRMSMLP,
    cov_drop_mask,
)
from gymrl_tpu.nn.mhc import MHCBackbone, MHCFuse, sinkhorn_knopp


def small_cfg(**kw):
    base = dict(
        env_name="CartPole-v1", num_envs=8, rollout_steps=16, minibatch_size=32,
        num_epochs=2, mhc_dim=32, mhc_sk_it=5, max_train_steps=100_000,
    )
    base.update(kw)
    return PPOFullConfig(**base)


def test_full_flat_optimizer_matches_pytree():
    """flat_optimizer on the full-tricks trainer (mHC + clip-cov + ERC):
    representation change only — params match the pytree optimizer from
    the same seed to reduction-order noise."""
    tr_f = PPOFullTrainer(small_cfg(flat_optimizer=True))
    tr_t = PPOFullTrainer(small_cfg())
    ts_f = tr_f.init(jax.random.PRNGKey(17))
    ts_t = tr_t.init(jax.random.PRNGKey(17))
    for _ in range(2):
        ts_f, _ = tr_f.train_iter(ts_f)
        ts_t, _ = tr_t.train_iter(ts_t)
    for a, b in zip(jax.tree_util.tree_leaves(ts_f.params),
                    jax.tree_util.tree_leaves(ts_t.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_sinkhorn_doubly_stochastic():
    A = jnp.exp(jax.random.normal(jax.random.PRNGKey(0), (8, 4, 4)))
    P, u, v = sinkhorn_knopp(A, 100)
    np.testing.assert_allclose(np.asarray(P.sum(-1)), 1.0, atol=1e-4)
    np.testing.assert_allclose(np.asarray(P.sum(-2)), 1.0, atol=1e-4)
    # P = diag(u) A diag(v)
    np.testing.assert_allclose(
        np.asarray(P), np.asarray(u[:, :, None] * A * v[:, None, :]), rtol=1e-5
    )


def test_mhc_fuse_identity_bias_at_init():
    """β init favors identity H_res: diagonal mass dominates at step 0."""
    fuse = MHCFuse(dim=16, rate=2, sk_iters=10)
    h = jax.random.normal(jax.random.PRNGKey(0), (4, 2, 16))
    params = fuse.init(jax.random.PRNGKey(1), h)
    H_pre, H_post, H_res = fuse.apply(params, h)
    assert H_pre.shape == (4, 2) and H_post.shape == (4, 2) and H_res.shape == (4, 2, 2)
    # sigmoid(≈0.01)≈0.5 ; 2·sigmoid(≈0.01)≈1.0
    np.testing.assert_allclose(np.asarray(H_pre), 0.5, atol=0.02)
    np.testing.assert_allclose(np.asarray(H_post), 1.0, atol=0.03)
    diag = np.asarray(H_res)[:, [0, 1], [0, 1]]
    assert np.all(diag > 0.8)  # identity-favoring after SK projection


def test_mhc_backbone_gradients_flow():
    bb = MHCBackbone(32, rate=2, num_layers=2, sk_iters=5)
    params = bb.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))

    def loss(p, x):
        return jnp.sum(bb.apply(p, x) ** 2)

    g = jax.grad(loss)(params, jnp.ones((4, 8)))
    norms = [float(jnp.linalg.norm(x)) for x in jax.tree_util.tree_leaves(g)]
    assert all(np.isfinite(norms))
    assert sum(norms) > 0  # gradients flow through the SK recover trick


def test_silu_rms_mlp_head_gain():
    mlp = SiluRMSMLP((64, 4), last_std=0.001)
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 8)))
    head = np.asarray(params["params"]["fc1"]["kernel"])
    assert np.abs(head).max() < 0.01  # tiny policy-head init


def test_train_iter_full_tricks():
    trainer = PPOFullTrainer(small_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    for k in ["policy_loss", "value_loss", "entropy", "approx_kl", "clip_frac",
              "erc_clip_frac", "lr", "ent_coef"]:
        assert np.isfinite(float(out.metrics[k])), k
    assert int(ts.env_steps) == 8 * 16
    # ERC keeps most samples on the first update (policy barely moved)
    assert float(out.metrics["erc_clip_frac"]) < 0.9


def test_ppo_full_learns_cartpole():
    """Bounded CI learning check for the full trick stack (ERC + dual-clip +
    clip-higher + mHC + anneal together): must clearly beat random. Full
    LunarLander solve is recorded in SOLVE_r2.jsonl (avg100 202.1 @ 1.08M)."""
    cfg = small_cfg(num_envs=16, rollout_steps=64, minibatch_size=256,
                    num_epochs=4, mhc_dim=64, max_train_steps=200_000)
    trainer = PPOFullTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(3))
    for _ in range(25):
        ts, _ = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(4), 6)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 100.0, f"full-tricks PPO failed to learn: {mean_r}"


def test_anneal_moves_lr_and_ent_coef():
    cfg = small_cfg(max_train_steps=8 * 16 * 4)
    trainer = PPOFullTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, o1 = trainer.train_iter(ts)
    ts, o2 = trainer.train_iter(ts)
    assert float(o2.metrics["lr"]) < float(o1.metrics["lr"])
    assert float(o2.metrics["ent_coef"]) < float(o1.metrics["ent_coef"])


def test_pscn_fallback_backbone():
    trainer = PPOFullTrainer(small_cfg(use_mhc=False))
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["policy_loss"]))


def test_cov_drop_mask_exact_count():
    """Reference drops exactly max(int(n_in_band·ratio), 1) samples via
    randperm over the in-band indices (ppo_full_lunarlander.py:608-616)."""
    covs = jnp.array([0.5, 2.0, 3.0, 4.0, 10.0, -1.0, 2.5, 3.5])  # 5 in (1, 5)
    for seed in range(5):
        keep = np.asarray(cov_drop_mask(jax.random.PRNGKey(seed), covs, 0.5, 1.0, 5.0))
        dropped = np.where(keep == 0.0)[0]
        assert len(dropped) == 2  # int(5·0.5) = 2
        assert set(dropped) <= {1, 2, 3, 6, 7}  # only in-band dropped
    # ratio so small int() floors to 0 → still drops 1 (the max(·,1) rule)
    keep = np.asarray(cov_drop_mask(jax.random.PRNGKey(0), covs, 0.01, 1.0, 5.0))
    assert (keep == 0.0).sum() == 1
    # nothing in band → nothing dropped (randperm(0)[:1] is empty in torch)
    keep = np.asarray(cov_drop_mask(jax.random.PRNGKey(0), covs, 0.5, 100.0, 200.0))
    assert (keep == 0.0).sum() == 0


def test_clip_cov_enabled_runs():
    trainer = PPOFullTrainer(small_cfg(clip_cov_ratio=0.2))
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["policy_loss"]))
