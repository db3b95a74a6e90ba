"""Orbax checkpoint round-trip: params, optimizer, norm stats, counters."""

import os
import tempfile

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.algos.dqn import DQNConfig, DQNTrainer
from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer
from gymrl_tpu.utils.checkpoint import restore_checkpoint, save_checkpoint


def test_ppo_roundtrip_restores_everything():
    cfg = PPOConfig(env_name="CartPole-v1", num_envs=4, rollout_steps=16,
                    minibatch_size=32, num_epochs=2, normalize_obs=True)
    trainer = PPOTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, ts)
        fresh = trainer.init(jax.random.PRNGKey(99))
        restored = restore_checkpoint(path, fresh)

    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    np.testing.assert_array_equal(np.asarray(ts.obs_rms.mean),
                                  np.asarray(restored.obs_rms.mean))
    assert int(restored.env_steps) == int(ts.env_steps)
    # training continues from the restored state
    restored2, out = trainer.train_iter(restored)
    assert int(restored2.env_steps) == int(ts.env_steps) + cfg.batch_total


def test_ppo_roundtrip_under_mesh_restores_shardings():
    """Save under a DP×TP mesh, restore into a fresh mesh-init trainer: every
    leaf must come back with its example sharding (not replicated on device
    0), and training must continue from the restored state."""
    from gymrl_tpu.distributed.mesh import make_mesh

    mesh = make_mesh(n_model=2)  # 4×2 DP×TP over the 8 virtual CPU devices
    cfg = PPOConfig(env_name="CartPole-v1", num_envs=8, rollout_steps=16,
                    minibatch_size=32, num_epochs=2)
    trainer = PPOTrainer(cfg, mesh=mesh)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, ts)
        fresh = trainer.init(jax.random.PRNGKey(7))
        restored = restore_checkpoint(path, fresh)

    # values round-trip bit-exact
    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # shardings match the fresh mesh layout leaf-for-leaf
    for f, r in zip(jax.tree_util.tree_leaves(fresh),
                    jax.tree_util.tree_leaves(restored)):
        assert r.sharding.is_equivalent_to(f.sharding, f.ndim), (
            f"{r.sharding} != {f.sharding}"
        )
    # the env batch is actually partitioned over 'data', not replicated
    assert not restored.vec_state.obs.sharding.is_fully_replicated
    # resumed training runs under the same compiled mesh program
    restored2, out = trainer.train_iter(restored)
    assert np.isfinite(float(out.metrics["policy_loss"]))
    assert int(restored2.env_steps) == int(ts.env_steps) + cfg.batch_total


def test_dqn_roundtrip_excludes_replay():
    """Replay contents are never checkpointed (reference semantics)."""
    cfg = DQNConfig(num_envs=4, steps_per_iter=8, updates_per_step=1,
                    memory_capacity=256)
    trainer = DQNTrainer(cfg)
    ts = trainer.init(jax.random.PRNGKey(0))
    ts, _ = trainer.train_iter(ts)
    assert int(ts.replay.size) > 0

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ckpt")
        save_checkpoint(path, ts)
        fresh = trainer.init(jax.random.PRNGKey(123))
        restored = restore_checkpoint(path, fresh)

    # replay resumes empty (fresh-init), everything else restored
    assert int(restored.replay.size) == 0
    for a, b in zip(jax.tree_util.tree_leaves(ts.params),
                    jax.tree_util.tree_leaves(restored.params)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    assert int(restored.episodes) == int(ts.episodes)
    restored2, _ = trainer.train_iter(restored)
    assert int(restored2.replay.size) > 0


def test_restore_across_flat_optimizer_flip_preserves_params():
    """A checkpoint written with the pytree optimizer must restore into a
    flat_optimizer trainer (and vice versa) WITHOUT silently restarting
    from scratch: params/normalization/counters survive, only the
    mismatched opt_state keeps its fresh value (r5 default-flip guard)."""
    cfg = dict(env_name="CartPole-v1", num_envs=4, rollout_steps=8,
               minibatch_size=8, num_epochs=1)
    tr_old = PPOTrainer(PPOConfig(**cfg))
    ts_old = tr_old.init(jax.random.PRNGKey(0))
    ts_old, _ = tr_old.train_iter(ts_old)

    with tempfile.TemporaryDirectory() as d:
        path = os.path.join(d, "ck")
        save_checkpoint(path, ts_old)

        tr_new = PPOTrainer(PPOConfig(**cfg, flat_optimizer=True))
        ts_new = tr_new.init(jax.random.PRNGKey(1))
        restored = restore_checkpoint(path, ts_new)

        for a, b in zip(jax.tree_util.tree_leaves(ts_old.params),
                        jax.tree_util.tree_leaves(restored.params)):
            np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
        assert int(restored.env_steps) == int(ts_old.env_steps)
        # opt_state stayed the flat fresh-init representation and training
        # continues from the restored params
        restored2, _ = tr_new.train_iter(restored)
        assert int(restored2.env_steps) > int(ts_old.env_steps)
