"""Pallas ops vs. jnp oracle (kernel run in interpret mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np

from gymrl_tpu.algos.ppo import ActorCritic
from gymrl_tpu.ops import fused_policy_forward, policy_forward_reference


def _make(n_actions=4, obs_dim=8, hidden=256, B=300):
    net = ActorCritic(n_actions=n_actions, hidden_dim=hidden)
    x = jax.random.normal(jax.random.PRNGKey(1), (B, obs_dim), jnp.float32)
    params = net.init(jax.random.PRNGKey(0), x)
    return net, params, x


def test_reference_matches_flax_apply():
    net, params, x = _make()
    logits_f, value_f = net.apply(params, x)
    logits_r, value_r = policy_forward_reference(params, x)
    np.testing.assert_allclose(np.asarray(logits_f), np.asarray(logits_r), atol=1e-6)
    np.testing.assert_allclose(np.asarray(value_f), np.asarray(value_r), atol=1e-6)


def test_kernel_matches_reference_interpret():
    # B=300 is deliberately not a multiple of block_b → exercises padding.
    net, params, x = _make(B=300)
    logits_r, value_r = policy_forward_reference(params, x)
    logits_k, value_k = fused_policy_forward(params, x, block_b=128, interpret=True)
    assert logits_k.shape == logits_r.shape and value_k.shape == value_r.shape
    np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(value_k), np.asarray(value_r),
                               atol=1e-5, rtol=1e-5)


def test_kernel_cartpole_shapes():
    net, params, x = _make(n_actions=2, obs_dim=4, B=256)
    logits_r, value_r = policy_forward_reference(params, x)
    logits_k, value_k = fused_policy_forward(params, x, block_b=256, interpret=True)
    np.testing.assert_allclose(np.asarray(logits_k), np.asarray(logits_r),
                               atol=1e-5, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(value_k), np.asarray(value_r),
                               atol=1e-5, rtol=1e-5)


def test_ppo_trainer_pallas_path_matches():
    """One full train_iter with the pallas rollout forward (interpret mode on
    CPU) must match the flax-apply path numerically."""
    from gymrl_tpu.algos.ppo import PPOConfig, PPOTrainer

    base = dict(env_name="CartPole-v1", num_envs=8, rollout_steps=8,
                minibatch_size=16, num_epochs=2, max_train_steps=64)
    t0 = PPOTrainer(PPOConfig(**base))
    t1 = PPOTrainer(PPOConfig(**base, use_pallas=True))
    ts0 = t0.init(jax.random.PRNGKey(0))
    ts1 = t1.init(jax.random.PRNGKey(0))
    ts0, out0 = t0.train_iter(ts0)
    ts1, out1 = t1.train_iter(ts1)
    for a, b in zip(jax.tree_util.tree_leaves(ts0.params),
                    jax.tree_util.tree_leaves(ts1.params)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5, rtol=1e-5)
