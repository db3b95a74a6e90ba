"""mHC — manifold hyper-connections backbone (full-tricks PPO feature #9).

Reference: algorithms/ppo_full_lunarlander.py:76-267. A multi-branch
residual backbone where each fuse layer derives, per sample, three dynamic
mixing maps from the flattened branch state:

  * ``H_pre``  — sigmoid weights that pool the N branches into one vector,
  * ``H_post`` — 2·sigmoid weights that broadcast the transformed vector
    back out to the branches,
  * ``H_res``  — an N×N inter-branch mixing matrix projected onto the
    Birkhoff polytope (doubly-stochastic) by Sinkhorn-Knopp, with the
    scaling vectors computed under stop_gradient and re-applied
    differentiably (the reference's U/V "recover" trick, :170-177).

Identity-favoring β init (+2 diag / −2 off-diag on the H_res logits)
prevents branch collapse at initialization (:129-139). Weight matrix w is
zero-init and α = 0.01 so the maps start at their β-defined defaults.

TPU notes (SURVEY.md §7.3 item 6): the Sinkhorn loop is a `fori_loop` of
batched matvecs kept in float32; N = rate is tiny (2), so the whole fuse
is a handful of small fused VPU ops around the [B, N·D] @ [N·D, N²+2N]
projection matmul.
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
import flax.linen as nn

from gymrl_tpu.nn.layers import RMSNorm


def sinkhorn_knopp(A: jax.Array, iters: int, eps: float = 1e-8):
    """Project batched non-negative [B, n, n] onto doubly-stochastic matrices.

    Returns (P, u, v) with P = diag(u) A diag(v)
    (reference sinkhorn_knopp_batched, ppo_full_lunarlander.py:76-103).
    """
    A = A.astype(jnp.float32)
    b, n, _ = A.shape
    u0 = jnp.ones((b, n), jnp.float32)
    v0 = jnp.ones((b, n), jnp.float32)

    def body(_, uv):
        u, v = uv
        u = 1.0 / (jnp.einsum("bij,bj->bi", A, v) + eps)
        v = 1.0 / (jnp.einsum("bji,bj->bi", A, u) + eps)
        return u, v

    u, v = jax.lax.fori_loop(0, iters, body, (u0, v0))
    P = u[:, :, None] * A * v[:, None, :]
    return P, u, v


class MHCFuse(nn.Module):
    """One fuse layer: state [B, N, D] → (H_pre [B,N], H_post [B,N], H_res [B,N,N])."""

    dim: int
    rate: int
    sk_iters: int = 10

    @nn.compact
    def __call__(self, h):
        n, d = self.rate, self.dim
        nc, n2 = n * d, n * n

        w = self.param("w", jax.nn.initializers.zeros, (nc, n2 + 2 * n))
        alpha = self.param("alpha", lambda k: jnp.full((3,), 0.01, jnp.float32))

        def beta_init(_key):
            beta = np.zeros(n2 + 2 * n, np.float32)
            beta[: 2 * n] = 0.01
            res = np.full((n, n), -2.0, np.float32)
            np.fill_diagonal(res, 2.0)
            beta[2 * n:] = res.reshape(-1)
            return jnp.asarray(beta)

        beta = self.param("beta", beta_init)
        # "RMSNorm fused trick": learnable elementwise scale + explicit 1/r
        norm_weight = self.param("norm_weight", jax.nn.initializers.ones, (nc,))

        b = h.shape[0]
        h_flat = h.reshape(b, nc)
        h_vec = norm_weight * h_flat
        H = h_vec @ w
        r = jnp.linalg.norm(h_flat.astype(jnp.float32), axis=-1, keepdims=True) / np.sqrt(nc)
        r_ = 1.0 / (r + 1e-6)

        H_pre = jax.nn.sigmoid(r_ * H[:, :n] * alpha[0] + beta[:n])
        H_post = 2.0 * jax.nn.sigmoid(r_ * H[:, n:2 * n] * alpha[1] + beta[n:2 * n])
        H_res_logits = (r_ * H[:, 2 * n:] * alpha[2] + beta[2 * n:]).reshape(b, n, n)
        A = jnp.exp(H_res_logits)
        # Sinkhorn scalings under stop_gradient, re-applied differentiably
        _, u, v = sinkhorn_knopp(A, self.sk_iters)
        u = jax.lax.stop_gradient(u)
        v = jax.lax.stop_gradient(v)
        H_res = u[:, :, None] * A * v[:, None, :]
        return H_pre, H_post, H_res


class MHCBlock(nn.Module):
    """Two rounds of fuse → Linear → SiLU → depth-connect (ref :197-229)."""

    dim: int
    rate: int
    sk_iters: int = 10

    @nn.compact
    def __call__(self, h):
        for i in range(2):
            H_pre, H_post, H_res = MHCFuse(
                self.dim, self.rate, self.sk_iters, name=f"mhc{i + 1}"
            )(h)
            h_pre = jnp.einsum("bn,bnd->bd", H_pre, h)  # pool branches
            h_res = jnp.einsum("bnm,bmd->bnd", H_res, h)  # inter-branch mix
            h_out = nn.silu(nn.Dense(self.dim, name=f"linear{i + 1}")(h_pre))
            h = H_post[:, :, None] * h_out[:, None, :] + h_res  # broadcast back
        return h


class MHCBackbone(nn.Module):
    """input proj → repeat to `rate` branches → blocks → branch-sum → RMSNorm
    (ref :232-267)."""

    output_dim: int
    rate: int = 2
    num_layers: int = 2
    sk_iters: int = 10

    @nn.compact
    def __call__(self, x):
        h = nn.Dense(self.output_dim, name="input_proj")(x)
        h = jnp.repeat(h[:, None, :], self.rate, axis=1)  # [B, N, D]
        for i in range(self.num_layers):
            h = MHCBlock(self.output_dim, self.rate, self.sk_iters, name=f"block_{i}")(h)
        h = jnp.sum(h, axis=1)
        return RMSNorm(eps=1e-6, name="final_norm")(h)
