"""Core layer zoo: Dense/NoisyDense, MLP, PSCN, RMSNorm, attention, PE.

Capability parity with reference utils/model.py (§2.1 of SURVEY.md):
  * ``MLP`` — dims list, PReLU default activation, optional LayerNorm,
    pluggable linear class enabling all-noisy MLPs (utils/model.py:26-52).
  * ``NoisyDense`` — NoisyNet factorized-Gaussian layer. The reference
    resamples ε inside every training forward and uses μ only in eval
    (utils/model.py:74-84); here the noise comes from an explicit 'noise'
    RNG collection: pass `rngs={'noise': key}` to resample (training), omit
    it for μ-only determinism (eval). ``scale_noise = sign(x)·√|x|``
    (utils/model.py:94-97); σ init 0.5/√fan (utils/model.py:87-93).
  * ``PSCN`` — split-half-emit-half deep stack (utils/model.py:256-286).
  * ``RMSNorm`` — used by the full-tricks PPO (ppo_full_lunarlander.py:273).
  * ``PositionalEncoding`` / ``MultiHeadAttention`` — present-for-parity
    modules (dead code in the reference too, utils/model.py:189-251).

TPU notes: all layers are shape-static, batch-friendly and dtype-polymorphic;
matmuls sit on the MXU via XLA. Widths in the reference zoo (256/512) are
already MXU-friendly multiples of 128 at bf16.
"""

from __future__ import annotations

from typing import Any, Callable, Sequence

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from gymrl_tpu.nn import initializers as gl_init


class PReLU(nn.Module):
    """PReLU with torch's default slope init (0.25), one shared parameter."""

    negative_slope_init: float = 0.25

    @nn.compact
    def __call__(self, x):
        slope = self.param(
            "negative_slope",
            lambda key: jnp.asarray(self.negative_slope_init, jnp.float32),
        )
        return jnp.where(x >= 0, x, slope.astype(x.dtype) * x)


class Dense(nn.Module):
    """nn.Linear equivalent with the reference's default init scheme."""

    features: int
    kernel_init: Callable = gl_init.kaiming_uniform()
    bias_init: Callable = jax.nn.initializers.zeros
    use_bias: bool = True

    @nn.compact
    def __call__(self, x, *, deterministic: bool = True, per_sample: bool = False):
        kernel = self.param("kernel", self.kernel_init, (x.shape[-1], self.features))
        y = x @ kernel.astype(x.dtype)
        if self.use_bias:
            bias = self.param("bias", self.bias_init, (self.features,))
            y = y + bias.astype(x.dtype)
        return y


def _scale_noise(x: jax.Array) -> jax.Array:
    """f(ε) = sign(ε)·√|ε| — reference utils/model.py:94-97."""
    return jnp.sign(x) * jnp.sqrt(jnp.abs(x))


class NoisyDense(nn.Module):
    """Factorized-Gaussian NoisyNet linear layer.

    Training: pass a 'noise' rng → ε resampled once per call, shared across
    the batch (same cadence as the reference's per-forward reset_noise).
    Eval: no 'noise' rng / deterministic=True → μ-only.

    ``per_sample=True`` draws an independent (ε_in, ε_out) PER ROW of the
    batch via the factorized identity
    ``y_i = x_i@μ + ((x_i∘ε_in_i)@σ)∘ε_out_i + b_μ + b_σ∘ε_out_i`` — two
    plain matmuls, no per-row weight materialization. This is the
    vectorized equivalent of the reference's independent per-env-step noise
    draws (utils/model.py:74-84 resamples every forward of its single env);
    with B lockstep envs sharing one draw, exploration is perfectly
    correlated across the fleet, which stalls NoisyNet-driven exploration.
    """

    features: int
    sigma_init: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False, per_sample: bool = False):
        in_features = x.shape[-1]
        mu_range = 1.0 / np.sqrt(in_features)
        w_mu = self.param("kernel_mu", gl_init.uniform_range(mu_range), (in_features, self.features))
        w_sigma = self.param(
            "kernel_sigma",
            gl_init.constant(self.sigma_init / np.sqrt(in_features)),
            (in_features, self.features),
        )
        b_mu = self.param("bias_mu", gl_init.uniform_range(mu_range), (self.features,))
        b_sigma = self.param(
            "bias_sigma",
            gl_init.constant(self.sigma_init / np.sqrt(self.features)),
            (self.features,),
        )

        use_noise = (not deterministic) and self.has_rng("noise")
        if not use_noise:
            return x @ w_mu.astype(x.dtype) + b_mu.astype(x.dtype)
        key = self.make_rng("noise")
        k_in, k_out = jax.random.split(key)
        if per_sample:
            rows = x.shape[:-1]  # independent ε per batch row
            eps_in = _scale_noise(jax.random.normal(k_in, (*rows, in_features)))
            eps_out = _scale_noise(jax.random.normal(k_out, (*rows, self.features)))
            y = x @ w_mu.astype(x.dtype)
            y = y + ((x * eps_in) @ w_sigma.astype(x.dtype)) * eps_out
            return y + b_mu.astype(x.dtype) + b_sigma.astype(x.dtype) * eps_out
        eps_in = _scale_noise(jax.random.normal(k_in, (in_features,)))
        eps_out = _scale_noise(jax.random.normal(k_out, (self.features,)))
        w = w_mu + w_sigma * (eps_in[:, None] * eps_out[None, :])
        b = b_mu + b_sigma * eps_out
        return x @ w.astype(x.dtype) + b.astype(x.dtype)


class MLP(nn.Module):
    """Configurable stack: Linear(+LayerNorm)(+activation) per hidden layer.

    ``dims`` excludes the input dim (inferred from x); mirrors the reference
    dim_list[1:]. ``linear='noisy'`` swaps every layer for NoisyDense.
    """

    dims: Sequence[int]
    last_act: bool = False
    use_norm: bool = False
    linear: str = "dense"  # "dense" | "noisy"
    kernel_init: Callable = gl_init.kaiming_uniform()
    activation: str = "prelu"  # "prelu" | "relu" | "tanh" | "silu"

    def _act(self, i: int):
        if self.activation == "prelu":
            return PReLU(name=f"act_{i}")
        return {"relu": nn.relu, "tanh": jnp.tanh, "silu": nn.silu}[self.activation]

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False, per_sample: bool = False):
        n = len(self.dims)
        assert n >= 1, "dims can't be empty"
        for i, feat in enumerate(self.dims):
            if self.linear == "noisy":
                x = NoisyDense(feat, name=f"layer_{i}")(
                    x, deterministic=deterministic, per_sample=per_sample
                )
            else:
                x = Dense(feat, kernel_init=self.kernel_init, name=f"layer_{i}")(x)
            is_last = i == n - 1
            if (not is_last) or self.last_act:
                if self.use_norm:
                    x = nn.LayerNorm(name=f"norm_{i}")(x)
                act = self._act(i)
                x = act(x) if isinstance(act, nn.Module) else act(x)
        return x


class PSCN(nn.Module):
    """Parallel Split Concatenate Network (reference utils/model.py:256-286).

    depth-d stack; layer i maps to width output_dim/2^i with trailing
    activation; output of each non-final layer splits in half — first half
    is emitted, second half feeds the next layer; concat(all parts) is the
    output (width == output_dim).
    """

    output_dim: int
    depth: int = 4
    linear: str = "dense"

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False, per_sample: bool = False):
        min_dim = 2 ** (self.depth - 1)
        assert self.depth >= 1, "depth must be at least 1"
        assert self.output_dim % min_dim == 0, (
            f"output_dim must be divisible by {min_dim} for depth {self.depth}"
        )
        parts = []
        out_dim = self.output_dim
        for i in range(self.depth):
            x = MLP([out_dim], last_act=True, linear=self.linear, name=f"mlp_{i}")(
                x, deterministic=deterministic, per_sample=per_sample
            )
            if i < self.depth - 1:
                half = out_dim // 2
                parts.append(x[..., :half])
                x = x[..., half:]
                out_dim = half
            else:
                parts.append(x)
        return jnp.concatenate(parts, axis=-1)


class RMSNorm(nn.Module):
    """RMS normalization (reference ppo_full_lunarlander.py:273-284)."""

    eps: float = 1e-8

    @nn.compact
    def __call__(self, x):
        scale = self.param("scale", jax.nn.initializers.ones, (x.shape[-1],))
        x32 = x.astype(jnp.float32)
        rms = jax.lax.rsqrt(jnp.mean(jnp.square(x32), axis=-1, keepdims=True) + self.eps)
        return (x32 * rms).astype(x.dtype) * scale.astype(x.dtype)


class DSConv(nn.Module):
    """Depthwise-separable conv (parity with utils/model.py:112-122)."""

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)

    @nn.compact
    def __call__(self, x):
        in_ch = x.shape[-1]
        x = nn.Conv(
            in_ch, self.kernel_size, self.strides, padding="VALID",
            feature_group_count=in_ch, name="depthwise",
        )(x)
        return nn.Conv(self.features, (1, 1), name="pointwise")(x)


class NoisyConv2d(nn.Module):
    """Noisy convolution layer — parity with utils/model.py:126-184 (dead
    code in the reference's algorithms, kept for inventory completeness).

    Factorized noise over (in·kh·kw) × out, resampled per call via the
    'noise' rng collection like NoisyDense; μ-only when deterministic.
    """

    features: int
    kernel_size: tuple[int, int] = (3, 3)
    strides: tuple[int, int] = (1, 1)
    sigma_init: float = 0.5

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False):
        in_ch = x.shape[-1]
        kh, kw = self.kernel_size
        fan_in = in_ch * kh * kw
        mu_range = 1.0 / np.sqrt(fan_in)
        w_mu = self.param("kernel_mu", gl_init.uniform_range(mu_range),
                          (kh, kw, in_ch, self.features))
        w_sigma = self.param("kernel_sigma", gl_init.constant(self.sigma_init / np.sqrt(fan_in)),
                             (kh, kw, in_ch, self.features))
        b_mu = self.param("bias_mu", gl_init.uniform_range(mu_range), (self.features,))
        b_sigma = self.param("bias_sigma", gl_init.constant(self.sigma_init / np.sqrt(self.features)),
                             (self.features,))

        use_noise = (not deterministic) and self.has_rng("noise")
        if use_noise:
            key = self.make_rng("noise")
            k_in, k_out = jax.random.split(key)
            eps_in = _scale_noise(jax.random.normal(k_in, (fan_in,))).reshape(kh, kw, in_ch, 1)
            eps_out = _scale_noise(jax.random.normal(k_out, (self.features,)))
            w = w_mu + w_sigma * (eps_in * eps_out[None, None, None, :])
            b = b_mu + b_sigma * eps_out
        else:
            w, b = w_mu, b_mu
        y = jax.lax.conv_general_dilated(
            x, w.astype(x.dtype), window_strides=self.strides, padding="VALID",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
        )
        return y + b.astype(y.dtype)


class ConvEncoder(nn.Module):
    """Conv trunk for pixel observations: [.., H, W, C] → [.., features].

    The TPU-side counterpart of the reference's image path (AtariPreprocessing
    + PyTorchFrame feeding a torch conv net, utils/runner.py:57-66): NHWC
    convolutions (flax/XLA's TPU-native layout — no CHW transpose), strided
    Nature-DQN-style downsampling, flatten, Dense to ``features``.
    Leading batch dims are arbitrary (flax Conv vectorizes over them after a
    reshape), so the same module serves [B, H, W, C] and [T, B, H, W, C].
    """

    features: int = 256
    channels: Sequence[int] = (16, 32, 32)
    kernels: Sequence[int] = (8, 4, 3)
    strides: Sequence[int] = (4, 2, 1)

    @nn.compact
    def __call__(self, x, *, deterministic: bool = False, per_sample: bool = False):
        lead = x.shape[:-3]
        x = x.reshape((-1,) + x.shape[-3:])
        for i, (ch, k, s) in enumerate(zip(self.channels, self.kernels, self.strides)):
            x = nn.Conv(ch, (k, k), (s, s), padding="VALID", name=f"conv_{i}")(x)
            x = nn.relu(x)
        x = x.reshape(x.shape[0], -1)
        x = Dense(self.features, name="proj")(x)
        x = nn.relu(x)
        return x.reshape(lead + (self.features,))


def positional_encoding(seq_len: int, d_model: int) -> jax.Array:
    """Sinusoidal PE table [seq_len, d_model] (utils/model.py:189-211)."""
    position = np.arange(seq_len)[:, None].astype(np.float32)
    div_term = np.exp(np.arange(0, d_model, 2).astype(np.float32) * (-np.log(10000.0) / d_model))
    pe = np.zeros((seq_len, d_model), np.float32)
    pe[:, 0::2] = np.sin(position * div_term)
    pe[:, 1::2] = np.cos(position * div_term)
    return jnp.asarray(pe)


class MultiHeadAttention(nn.Module):
    """Einsum MHA, parity with the reference's (unused) module
    (utils/model.py:215-251). Per-head shared projections of head_dim."""

    embed_size: int
    num_heads: int

    @nn.compact
    def __call__(self, values, keys, query, mask=None):
        assert self.embed_size % self.num_heads == 0
        head_dim = self.embed_size // self.num_heads
        B, vlen, klen, qlen = query.shape[0], values.shape[1], keys.shape[1], query.shape[1]

        values = values.reshape(B, vlen, self.num_heads, head_dim)
        keys = keys.reshape(B, klen, self.num_heads, head_dim)
        query = query.reshape(B, qlen, self.num_heads, head_dim)

        values = Dense(head_dim, use_bias=False, name="values")(values)
        keys = Dense(head_dim, use_bias=False, name="keys")(keys)
        queries = Dense(head_dim, use_bias=False, name="queries")(query)

        energy = jnp.einsum("nqhd,nkhd->nhqk", queries, keys)
        if mask is not None:
            energy = jnp.where(mask == 0, -1e20, energy)
        attention = jax.nn.softmax(energy / np.sqrt(head_dim), axis=3)
        out = jnp.einsum("nhql,nlhd->nqhd", attention, values).reshape(B, qlen, self.embed_size)
        return Dense(self.embed_size, name="fc_out")(out)
