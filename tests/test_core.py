"""Unit tests for core numerics: running normalization, GAE, schedules.

Oracle style: independent numpy re-implementations of the reference
semantics (SURVEY.md §2.1), hand-rolled here, compared element-wise.
"""

import numpy as np
import jax
import jax.numpy as jnp

from gymrl_tpu.core import (
    compute_gae,
    compute_gae_dual_lambda,
    exp_epsilon_decay,
    linear_anneal,
    normalize_obs,
    ref_lr_decay,
    reward_scaler_init,
    reward_scaler_reset,
    reward_scaler_step,
    rms_init,
    rms_update,
    rms_update_batch,
)
from gymrl_tpu.core.gae import standardize


class RefRunningMeanStd:
    """Numpy oracle of reference utils/normalization.py:4-22 (incl. n==1 quirk)."""

    def __init__(self, shape):
        self.n = 0
        self.mean = np.zeros(shape)
        self.S = np.zeros(shape)
        self.std = np.sqrt(self.S)

    def update(self, x):
        x = np.asarray(x, np.float64)
        self.n += 1
        if self.n == 1:
            self.mean = x.copy()
            self.std = x.copy()
        else:
            old_mean = self.mean.copy()
            self.mean = old_mean + (x - old_mean) / self.n
            self.S = self.S + (x - old_mean) * (x - self.mean)
            self.std = np.sqrt(self.S / self.n)


def test_rms_single_sample_matches_reference_quirk(rng):
    rms = rms_init((3,))
    ref = RefRunningMeanStd((3,))
    for _ in range(10):
        x = rng.normal(size=3).astype(np.float32)
        rms = rms_update(rms, jnp.asarray(x))
        ref.update(x)
        np.testing.assert_allclose(rms.mean, ref.mean, rtol=1e-5)
        np.testing.assert_allclose(rms.std, ref.std, rtol=1e-5)


def test_rms_batch_converges_to_population_stats(rng):
    rms = rms_init((4,))
    data = rng.normal(loc=2.0, scale=3.0, size=(50, 32, 4)).astype(np.float32)
    for batch in data:
        rms = rms_update_batch(rms, jnp.asarray(batch))
    flat = data.reshape(-1, 4)
    np.testing.assert_allclose(rms.mean, flat.mean(0), rtol=1e-3)
    np.testing.assert_allclose(rms.std, flat.std(0), rtol=1e-3)
    np.testing.assert_allclose(rms.count, flat.shape[0])


def test_normalize_obs():
    rms = rms_init((2,))._replace(
        mean=jnp.array([1.0, -1.0]), std=jnp.array([2.0, 4.0])
    )
    out = normalize_obs(rms, jnp.array([3.0, 3.0]))
    np.testing.assert_allclose(out, [(3 - 1) / (2 + 1e-8), (3 + 1) / (4 + 1e-8)], rtol=1e-6)


def test_reward_scaler_divide_only_semantics(rng):
    """R = γR + r accumulates per instance; output is r/(std(R)+eps), uncentered."""
    scaler = reward_scaler_init(num_envs=8, gamma=0.9)
    R_ref = np.zeros(8)
    all_R = []
    for _ in range(30):
        r = rng.normal(size=8).astype(np.float32)
        R_ref = 0.9 * R_ref + r
        all_R.append(R_ref.copy())
        scaler, scaled = reward_scaler_step(scaler, jnp.asarray(r))
        flat = np.concatenate(all_R)
        np.testing.assert_allclose(scaler.ret, R_ref, rtol=1e-4)
        np.testing.assert_allclose(scaled, r / (flat.std() + 1e-8), rtol=2e-3)
    done = np.zeros(8, bool)
    done[::2] = True
    scaler = reward_scaler_reset(scaler, jnp.asarray(done))
    assert np.all(np.asarray(scaler.ret)[::2] == 0.0)
    assert np.all(np.asarray(scaler.ret)[1::2] != 0.0)


def _ref_gae(rewards, values, next_values, dw, done, gamma, lam):
    """Reverse Python loop — reference utils/buffer.py:20-35 semantics."""
    T = len(rewards)
    adv = np.zeros(T)
    gae = 0.0
    for t in reversed(range(T)):
        delta = rewards[t] + gamma * next_values[t] * (1 - dw[t]) - values[t]
        gae = delta + gamma * lam * (1 - done[t]) * gae
        adv[t] = gae
    return adv, adv + values


def test_gae_matches_reverse_loop(rng):
    T = 64
    r = rng.normal(size=T)
    v = rng.normal(size=T)
    nv = rng.normal(size=T)
    dw = (rng.random(T) < 0.1).astype(np.float64)
    done = np.clip(dw + (rng.random(T) < 0.05), 0, 1)
    adv_ref, vt_ref = _ref_gae(r, v, nv, dw, done, 0.99, 0.95)
    adv, vt = compute_gae(
        jnp.asarray(r, jnp.float32), jnp.asarray(v, jnp.float32),
        jnp.asarray(nv, jnp.float32), jnp.asarray(dw, jnp.float32),
        jnp.asarray(done, jnp.float32), 0.99, 0.95,
    )
    np.testing.assert_allclose(adv, adv_ref, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(vt, vt_ref, rtol=1e-4, atol=1e-5)


def test_gae_batched(rng):
    """Trailing batch dims carry through the scan unchanged."""
    T, B = 32, 5
    r = rng.normal(size=(T, B)).astype(np.float32)
    v = rng.normal(size=(T, B)).astype(np.float32)
    nv = rng.normal(size=(T, B)).astype(np.float32)
    dw = (rng.random((T, B)) < 0.1).astype(np.float32)
    done = dw.copy()
    adv, _ = compute_gae(*map(jnp.asarray, (r, v, nv, dw, done)), 0.99, 0.95)
    for b in range(B):
        adv_ref, _ = _ref_gae(r[:, b], v[:, b], nv[:, b], dw[:, b], done[:, b], 0.99, 0.95)
        np.testing.assert_allclose(adv[:, b], adv_ref, rtol=1e-4, atol=1e-5)


def test_dual_lambda_gae(rng):
    T = 40
    r = rng.normal(size=T).astype(np.float32)
    v = rng.normal(size=T).astype(np.float32)
    nv = rng.normal(size=T).astype(np.float32)
    dw = np.zeros(T, np.float32)
    done = np.zeros(T, np.float32)
    adv_a, returns = compute_gae_dual_lambda(
        *map(jnp.asarray, (r, v, nv, dw, done)), 0.99, 0.9, 0.95
    )
    ref_a, _ = _ref_gae(r, v, nv, dw, done, 0.99, 0.9)
    ref_c, ref_ret = _ref_gae(r, v, nv, dw, done, 0.99, 0.95)
    np.testing.assert_allclose(adv_a, ref_a, rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(returns, ref_ret, rtol=1e-4, atol=1e-5)


def test_standardize(rng):
    x = jnp.asarray(rng.normal(size=100).astype(np.float32)) * 5 + 3
    out = standardize(x)
    assert abs(float(jnp.mean(out))) < 1e-5
    assert abs(float(jnp.std(out)) - 1.0) < 1e-3


def test_schedules():
    # ε decay: matches ref formula at a few points
    eps = exp_epsilon_decay(0, 0.95, 0.01, 800.0)
    np.testing.assert_allclose(eps, 0.95, rtol=1e-6)
    eps = exp_epsilon_decay(800, 0.95, 0.01, 800.0)
    np.testing.assert_allclose(eps, 0.01 + 0.94 * np.exp(-1.0), rtol=1e-5)
    # linear anneal hits endpoints and clips
    np.testing.assert_allclose(linear_anneal(0, 100, 3e-4), 3e-4)
    np.testing.assert_allclose(linear_anneal(100, 100, 3e-4), 0.0, atol=1e-12)
    np.testing.assert_allclose(linear_anneal(200, 100, 3e-4), 0.0, atol=1e-12)
    np.testing.assert_allclose(linear_anneal(50, 100, 1.0, final_frac=0.1), 0.55)
    # rainbow lr decay
    np.testing.assert_allclose(ref_lr_decay(0, 100, 1e-3), 1e-3)
    np.testing.assert_allclose(ref_lr_decay(100, 100, 1e-3), 1e-4, rtol=1e-6)


def test_pack_fields_roundtrip(rng):
    """pack_fields/unpack_fields: exact roundtrip for f32 + i32 leaves of
    mixed trailing shapes (the recurrent trainers' packed epoch shuffle)."""
    import jax
    from gymrl_tpu.algos.base import pack_fields, unpack_fields

    n = 16
    data = {
        "obs": jax.random.normal(jax.random.PRNGKey(0), (n, 8, 5)),
        "action": jax.random.randint(jax.random.PRNGKey(1), (n, 8), 0, 4),
        "logp": jax.random.normal(jax.random.PRNGKey(2), (n, 8)),
        "h0": jax.random.normal(jax.random.PRNGKey(3), (n, 7)),
    }
    packed, spec = pack_fields(data)
    assert packed.shape == (n, 8 * 5 + 8 + 8 + 7)
    out = unpack_fields(packed, spec)
    for k in data:
        assert out[k].dtype == data[k].dtype, k
        np.testing.assert_array_equal(np.asarray(out[k]), np.asarray(data[k]))

    # permutation-then-unpack == unpack-then-permutation (shuffle equivalence)
    perm = jax.random.permutation(jax.random.PRNGKey(4), n)
    out_p = unpack_fields(packed[perm], spec)
    np.testing.assert_array_equal(np.asarray(out_p["action"]),
                                  np.asarray(data["action"][perm]))
