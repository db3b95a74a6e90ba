"""PPO trainer tests: fused train_iter correctness, learning, sharding."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
from gymrl_tpu.distributed.mesh import make_mesh


def small_cfg(**kw):
    base = dict(
        env_name="CartPole-v1", num_envs=8, rollout_steps=32, minibatch_size=64,
        num_epochs=4, solve_threshold=495.0,
    )
    base.update(kw)
    return PPOConfig(**base)


def test_rollout_bf16_runs_and_stays_close():
    """bf16 acting path: train_iter runs, metrics finite, and the stored
    behavior-logp differs from fp32 only by bf16 rounding (ratio at epoch 0
    stays inside the clip band, so learning semantics are preserved)."""
    ts32 = PPOTrainer(small_cfg()).init(jax.random.PRNGKey(0))
    tr16 = PPOTrainer(small_cfg(rollout_bf16=True))
    ts16 = tr16.init(jax.random.PRNGKey(0))
    _, _, _, roll32, _ = jax.jit(PPOTrainer(small_cfg())._collect)(ts32)
    _, _, _, roll16, _ = jax.jit(tr16._collect)(ts16)
    # same seed/params: identical actions until bf16 rounding flips a
    # sample; compare logp only where the trajectories agree (first step)
    a32, a16 = np.asarray(roll32.action[0]), np.asarray(roll16.action[0])
    same = a32 == a16
    assert same.any()
    lp32 = np.asarray(roll32.logp[0])[same]
    lp16 = np.asarray(roll16.logp[0])[same]
    np.testing.assert_allclose(lp16, lp32, atol=5e-2)
    ts16, out16 = tr16.train_iter(ts16)
    assert np.isfinite(float(out16.metrics["policy_loss"]))


def test_train_iter_shapes_and_metrics():
    trainer = PPOTrainer(small_cfg())
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert int(ts.env_steps) == 8 * 32
    for k in ["policy_loss", "value_loss", "entropy", "clip_frac", "approx_kl", "lr"]:
        assert np.isfinite(float(out.metrics[k])), k
    # entropy of a near-uniform 2-action policy starts near ln 2
    assert 0.5 < float(out.metrics["entropy"]) <= 0.70


def test_flat_optimizer_matches_pytree():
    """flat_optimizer is a representation change, not a numerics change:
    same seed, 3 train_iters, params must agree to reduction-order noise
    (ADVICE r4 — guards bench/solve numerics against silent drift)."""
    tr_flat = PPOTrainer(small_cfg(flat_optimizer=True))
    tr_tree = PPOTrainer(small_cfg())
    ts_f = tr_flat.init(jax.random.PRNGKey(7))
    ts_t = tr_tree.init(jax.random.PRNGKey(7))
    for _ in range(3):
        ts_f, _ = tr_flat.train_iter(ts_f)
        ts_t, _ = tr_tree.train_iter(ts_t)
    flat_leaves = jax.tree_util.tree_leaves(ts_f.params)
    tree_leaves = jax.tree_util.tree_leaves(ts_t.params)
    for a, b in zip(flat_leaves, tree_leaves):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sgd_unroll_matches_unroll1():
    """sgd_unroll is pure loop unrolling — params after 2 train_iters must
    match unroll=1 (same seed) exactly up to scheduling noise."""
    tr_u = PPOTrainer(small_cfg(sgd_unroll=4, rollout_unroll=4))
    tr_1 = PPOTrainer(small_cfg())
    ts_u = tr_u.init(jax.random.PRNGKey(3))
    ts_1 = tr_1.init(jax.random.PRNGKey(3))
    for _ in range(2):
        ts_u, _ = tr_u.train_iter(ts_u)
        ts_1, _ = tr_1.train_iter(ts_1)
    for a, b in zip(jax.tree_util.tree_leaves(ts_u.params),
                    jax.tree_util.tree_leaves(ts_1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_flat_optimizer_refuses_tp_mesh_at_construction():
    """The TP guard must fire in __init__, not only init() — a restored
    TrainState skips init() entirely (ADVICE r4)."""
    mesh = make_mesh(n_data=4, n_model=2)
    with pytest.raises(AssertionError, match="flat_optimizer"):
        PPOTrainer(small_cfg(flat_optimizer=True), mesh=mesh)


def test_lr_anneal_progresses():
    trainer = PPOTrainer(small_cfg(max_train_steps=2048))
    ts = trainer.init(jax.random.PRNGKey(0))
    _, out1 = trainer.train_iter(ts)
    ts2, _ = trainer.train_iter(ts)
    _, out3 = trainer.train_iter(ts2)
    assert float(out3.metrics["lr"]) < float(out1.metrics["lr"])


def test_update_count_matches_reference_cadence():
    """T·B/minibatch × epochs GRADIENT STEPS per iteration (ref semantics:
    ppo_lunarlander.py:261-272 — 10 epochs × 2048/64 minibatches). Counted
    from the Adam step counter of the actual jitted program, not config
    arithmetic."""
    import optax.tree_utils as otu

    def grad_steps(opt_state):
        counts = {int(v) for _, v in otu.tree_get_all_with_path(opt_state, "count")}
        assert len(counts) == 1  # every step counter in the chain agrees
        return counts.pop()

    cfg = small_cfg()
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    assert grad_steps(ts.opt_state) == 0
    ts, _ = trainer.train_iter(ts)
    applied = grad_steps(ts.opt_state)
    assert applied == cfg.num_epochs * cfg.num_minibatches == 4 * ((8 * 32) // 64)
    ts, _ = trainer.train_iter(ts)
    assert grad_steps(ts.opt_state) == 2 * applied


def test_ppo_learns_cartpole():
    cfg = small_cfg(num_envs=16, rollout_steps=64, num_epochs=4, minibatch_size=256,
                    max_train_steps=300_000)
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(1))
    for _ in range(30):  # ~30k env steps
        ts, out = trainer.train_iter(ts)
    returns, _ = trainer.eval_episodes(ts, jax.random.PRNGKey(3), 8)
    mean_r = float(np.mean(np.asarray(returns)))
    assert mean_r > 150.0, f"PPO failed to learn: eval return {mean_r}"


def test_ppo_sharded_mesh_runs():
    """Full train step jitted over an 8-device mesh executes and stays sharded."""
    mesh = make_mesh()  # 8 virtual CPU devices from conftest flags
    assert mesh.shape["data"] == 8
    cfg = small_cfg(num_envs=16, rollout_steps=16, minibatch_size=32, num_epochs=2)
    trainer = PPOTrainer(cfg, mesh=mesh)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, out = trainer.train_iter(ts)
    assert np.isfinite(float(out.metrics["policy_loss"]))
    assert int(ts.env_steps) == 16 * 16
    # env batch stays sharded over 'data': the leading axis must actually be
    # partitioned (not replicated) across the 8 data-parallel devices
    sh = ts.vec_state.obs.sharding
    assert not sh.is_fully_replicated
    assert "data" in str(sh.spec)
    # a second iter reuses the compiled program
    ts, _ = trainer.train_iter(ts)
    assert int(ts.env_steps) == 2 * 16 * 16


def test_obs_normalization_freeze_in_eval():
    cfg = small_cfg(normalize_obs=True)
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)
    assert float(ts.obs_rms.count) == cfg.batch_total
    # eval must not advance normalization stats
    before = float(ts.obs_rms.count)
    trainer.eval_episodes(ts, jax.random.PRNGKey(1), 2)
    assert float(ts.obs_rms.count) == before
