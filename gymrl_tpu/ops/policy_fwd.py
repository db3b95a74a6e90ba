"""Fused actor-critic forward as a single Pallas TPU kernel.

The PPO rollout (reference: algorithms/ppo_lunarlander.py:198-231 collects
with batch-1 host inference; here it is a vmapped on-device scan) calls the
shared-trunk ActorCritic once per env step on a [B, obs] batch. Under plain
XLA each Dense layer is a separate HLO whose [B, hidden] intermediate round
trips through HBM between matmuls. This kernel runs the whole head-to-toe
forward — trunk(2×Dense+tanh) → actor branch → critic branch — inside one
`pallas_call`, keeping every intermediate in VMEM and the weights resident
across batch tiles, so HBM traffic drops to: read x once, write logits and
value once.

Weight layout matches `gymrl_tpu.algos.ppo.ActorCritic` exactly:
  W0[obs,H] b0[H] W1[H,H] b1[H]            — shared trunk
  Wa[H,H]  ba[H]  Wla[H,A] bla[A]          — actor branch + head
  Wc[H,H]  bc[H]  Wvc[H,1] bvc[1]          — critic branch + head

All matmuls accumulate in fp32 on the MXU (`preferred_element_type`).
`policy_forward_reference` is the jnp oracle; tests compare the kernel in
interpret mode against it (the kernel itself is backend-agnostic under
interpret=True, compiled only on TPU).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _unpack(params):
    """Flatten the flax ActorCritic param tree into the 12-tensor tuple."""
    p = params["params"]
    return (
        p["shared_0"]["kernel"], p["shared_0"]["bias"],
        p["shared_1"]["kernel"], p["shared_1"]["bias"],
        p["actor_0"]["kernel"], p["actor_0"]["bias"],
        p["actor_head"]["kernel"], p["actor_head"]["bias"],
        p["critic_0"]["kernel"], p["critic_0"]["bias"],
        p["critic_head"]["kernel"], p["critic_head"]["bias"],
    )


def policy_forward_reference(params, x):
    """jnp oracle — must match ActorCritic.apply bit-for-bit in structure."""
    W0, b0, W1, b1, Wa, ba, Wla, bla, Wc, bc, Wvc, bvc = _unpack(params)
    h = jnp.tanh(x @ W0 + b0)
    h = jnp.tanh(h @ W1 + b1)
    a = jnp.tanh(h @ Wa + ba)
    logits = a @ Wla + bla
    c = jnp.tanh(h @ Wc + bc)
    value = (c @ Wvc + bvc).squeeze(-1)
    return logits, value


def _kernel(x_ref, W0, b0, W1, b1, Wa, ba, Wla, bla, Wc, bc, Wvc, bvc,
            logits_ref, value_ref):
    f32 = jnp.float32
    x = x_ref[:]
    h = jnp.tanh(jnp.dot(x, W0[:], preferred_element_type=f32) + b0[:])
    h = jnp.tanh(jnp.dot(h, W1[:], preferred_element_type=f32) + b1[:])
    a = jnp.tanh(jnp.dot(h, Wa[:], preferred_element_type=f32) + ba[:])
    logits_ref[:] = jnp.dot(a, Wla[:], preferred_element_type=f32) + bla[:]
    c = jnp.tanh(jnp.dot(h, Wc[:], preferred_element_type=f32) + bc[:])
    value_ref[:] = jnp.dot(c, Wvc[:], preferred_element_type=f32) + bvc[:]


@functools.partial(jax.jit, static_argnames=("block_b", "interpret"))
def fused_policy_forward(params, x, *, block_b: int = 1024, interpret=None):
    """Fused ActorCritic forward. Returns (logits[B,A], value[B]).

    Inference-only (no VJP) — used on the rollout path where no gradients
    flow; the SGD update keeps the flax apply so autodiff is untouched.
    interpret=None auto-selects: compiled on TPU, interpreter elsewhere
    (so the op stays correct in CPU tests).
    """
    if interpret is None:
        interpret = jax.default_backend() != "tpu"
    tensors = _unpack(params)
    B, obs_dim = x.shape
    n_actions = tensors[7].shape[0]
    # Biases as [1, D] rows so VMEM blocks stay 2D (TPU tiling).
    tensors = tuple(t[None, :] if t.ndim == 1 else t for t in tensors)

    block_b = min(block_b, B)
    pad = (-B) % block_b
    if pad:
        x = jnp.pad(x, ((0, pad), (0, 0)))
    grid = (x.shape[0] // block_b,)

    weight_spec = pl.BlockSpec(memory_space=pltpu.VMEM)  # full, resident
    logits, value = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[pl.BlockSpec((block_b, obs_dim), lambda i: (i, 0),
                               memory_space=pltpu.VMEM)]
        + [weight_spec] * 12,
        out_specs=(
            pl.BlockSpec((block_b, n_actions), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((block_b, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((x.shape[0], n_actions), jnp.float32),
            jax.ShapeDtypeStruct((x.shape[0], 1), jnp.float32),
        ),
        interpret=interpret,
    )(x, *tensors)
    if pad:
        logits, value = logits[:B], value[:B]
    return logits, value.squeeze(-1)
