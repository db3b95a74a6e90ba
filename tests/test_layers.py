"""NN layer zoo tests: shapes, PSCN wiring, noisy-layer semantics."""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.nn.layers import (
    MLP,
    PSCN,
    Dense,
    MultiHeadAttention,
    NoisyDense,
    RMSNorm,
    positional_encoding,
)


def test_mlp_shapes_and_activation_params():
    mlp = MLP([64, 64, 8])
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((2, 10)))
    out = mlp.apply(params, jnp.ones((5, 10)))
    assert out.shape == (5, 8)
    # default PReLU adds per-layer slope params for hidden layers only
    names = jax.tree_util.tree_leaves_with_path(params)
    slope_keys = [p for p, _ in names if "negative_slope" in str(p)]
    assert len(slope_keys) == 2


def test_mlp_last_act_and_norm():
    mlp = MLP([32, 32], last_act=True, use_norm=True, activation="relu")
    params = mlp.init(jax.random.PRNGKey(0), jnp.zeros((1, 4)))
    out = mlp.apply(params, jnp.full((3, 4), -5.0))
    assert out.shape == (3, 32)
    assert np.all(np.asarray(out) >= 0)  # relu was applied after final layer


def test_noisy_dense_mu_only_in_eval():
    layer = NoisyDense(16)
    params = layer.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8)))
    x = jnp.ones((4, 8))
    # deterministic path: identical across calls
    out1 = layer.apply(params, x, deterministic=True)
    out2 = layer.apply(params, x, deterministic=True)
    np.testing.assert_array_equal(np.asarray(out1), np.asarray(out2))
    # noisy path: different keys → different outputs, same key → same output
    na = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    nb = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(2)})
    nc = layer.apply(params, x, rngs={"noise": jax.random.PRNGKey(1)})
    assert not np.allclose(np.asarray(na), np.asarray(nb))
    np.testing.assert_array_equal(np.asarray(na), np.asarray(nc))
    # noise is shared across the batch (factorized eps, one sample per call)
    assert not np.allclose(np.asarray(na), np.asarray(out1))


def test_noisy_dense_per_sample_rows_independent():
    layer = NoisyDense(16)
    params = layer.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 8)))
    x = jnp.ones((6, 8))  # identical rows
    out = layer.apply(params, x, per_sample=True, rngs={"noise": jax.random.PRNGKey(3)})
    # per-row noise ⇒ identical inputs map to DIFFERENT outputs per row
    assert not np.allclose(np.asarray(out[0]), np.asarray(out[1]))
    # factorized identity: with a single row the per-sample path draws the
    # exact same noise bits as the shared path (shape (1,n) vs (n,) produce
    # identical streams), so it must equal the materialized-weights output
    x1 = jnp.linspace(-1.0, 1.0, 8)[None, :]
    k = jax.random.PRNGKey(7)
    a = layer.apply(params, x1, per_sample=True, rngs={"noise": k})
    b = layer.apply(params, x1, rngs={"noise": k})
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_noisy_dense_sigma_init_magnitude():
    layer = NoisyDense(32, sigma_init=0.5)
    params = layer.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 64)))
    sig = np.asarray(params["params"]["kernel_sigma"])
    np.testing.assert_allclose(sig, 0.5 / np.sqrt(64))


def test_pscn_output_width_and_constraint():
    pscn = PSCN(output_dim=64, depth=4)
    params = pscn.init(jax.random.PRNGKey(0), jnp.zeros((2, 10)))
    out = pscn.apply(params, jnp.ones((3, 10)))
    assert out.shape == (3, 64)
    # depth-4 needs output_dim % 8 == 0 (reference utils/model.py:259-262)
    try:
        PSCN(output_dim=60, depth=4).init(jax.random.PRNGKey(0), jnp.zeros((1, 10)))
        raise RuntimeError("should have failed")
    except AssertionError:
        pass


def test_pscn_noisy_variant():
    pscn = PSCN(output_dim=32, depth=3, linear="noisy")
    params = pscn.init({"params": jax.random.PRNGKey(0)}, jnp.zeros((1, 6)))
    a = pscn.apply(params, jnp.ones((2, 6)), rngs={"noise": jax.random.PRNGKey(1)})
    b = pscn.apply(params, jnp.ones((2, 6)), deterministic=True)
    assert a.shape == b.shape == (2, 32)
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_rmsnorm():
    norm = RMSNorm()
    params = norm.init(jax.random.PRNGKey(0), jnp.zeros((1, 16)))
    x = jnp.asarray(np.random.default_rng(0).normal(size=(4, 16)) * 10, jnp.float32)
    out = np.asarray(norm.apply(params, x))
    rms = np.sqrt((out**2).mean(-1))
    np.testing.assert_allclose(rms, 1.0, rtol=1e-4)  # unit scale at init


def test_positional_encoding_table():
    pe = np.asarray(positional_encoding(50, 16))
    assert pe.shape == (50, 16)
    np.testing.assert_allclose(pe[0, 0::2], 0.0, atol=1e-7)  # sin(0)
    np.testing.assert_allclose(pe[0, 1::2], 1.0, atol=1e-7)  # cos(0)


def test_multihead_attention_shapes():
    mha = MultiHeadAttention(embed_size=32, num_heads=4)
    x = jnp.ones((2, 7, 32))
    params = mha.init(jax.random.PRNGKey(0), x, x, x)
    out = mha.apply(params, x, x, x)
    assert out.shape == (2, 7, 32)
