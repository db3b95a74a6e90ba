"""Test harness config: run everything on a virtual 8-device CPU mesh.

Must set the XLA flags before jax initializes (first import), so this
lives at the top of conftest. Multi-chip sharding tests use the 8 virtual
devices; the driver separately validates `__graft_entry__.dryrun_multichip`.
"""

import os

# Force CPU: the ambient session may point JAX at a TPU (JAX_PLATFORMS=axon),
# and the env var alone does not reliably win against it — set the jax config
# explicitly too. Unit tests always run on the virtual 8-device CPU mesh.
os.environ["JAX_PLATFORMS"] = "cpu"
flags = os.environ.get("XLA_FLAGS", "")
if "host_platform_device_count" not in flags:
    os.environ["XLA_FLAGS"] = (flags + " --xla_force_host_platform_device_count=8").strip()

import jax

jax.config.update("jax_platforms", "cpu")

import numpy as np
import pytest


@pytest.fixture
def rng():
    return np.random.default_rng(0)
