"""Weight initializers matching the reference's `initialize_weights`.

Reference utils/model.py:9-22: kaiming-uniform (default, leaky_relu
nonlinearity), xavier-uniform, orthogonal with gain √2; biases zero. Some
scripts use per-layer orthogonal with custom gains (e.g. policy head gain
0.01 in algorithms/ppo_lunarlander.py:63-118) — those are passed explicitly.

These produce the same *distributions* as the torch initializers (exact
bit-parity is neither possible nor needed; curve parity is statistical).
"""

from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp
from jax.nn.initializers import Initializer


def kaiming_uniform(nonlinearity: str = "leaky_relu", a: float = 0.01) -> Initializer:
    """torch.nn.init.kaiming_uniform_ equivalent for [in, out] kernels.

    torch computes fan_in over the weight's [out, in] layout; flax kernels
    are [in, out] so fan_in = shape[0]. gain = sqrt(2/(1+a²)) for leaky_relu.
    """

    def init(key, shape, dtype=jnp.float32):
        fan_in = shape[0] if len(shape) >= 1 else 1
        if nonlinearity == "relu":
            gain = np.sqrt(2.0)
        elif nonlinearity == "leaky_relu":
            gain = np.sqrt(2.0 / (1.0 + a * a))
        else:
            gain = 1.0
        bound = gain * np.sqrt(3.0 / fan_in)
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def orthogonal(gain: float = float(np.sqrt(2.0))) -> Initializer:
    return jax.nn.initializers.orthogonal(scale=gain)


def xavier_uniform() -> Initializer:
    return jax.nn.initializers.glorot_uniform()


def uniform_range(bound: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jax.random.uniform(key, shape, dtype, -bound, bound)

    return init


def constant(value: float) -> Initializer:
    def init(key, shape, dtype=jnp.float32):
        return jnp.full(shape, value, dtype)

    return init


INITS = {
    "kaiming": kaiming_uniform(),
    "xavier": xavier_uniform(),
    "orthogonal": orthogonal(),
}
