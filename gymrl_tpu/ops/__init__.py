"""Pallas TPU kernels for hot ops.

Each op has a reference jnp implementation (used on CPU and as the
correctness oracle) and a Pallas TPU kernel. `fused_policy_forward`
dispatches on the backend; tests run the kernel in interpret mode.
"""

from gymrl_tpu.ops.policy_fwd import fused_policy_forward, policy_forward_reference

__all__ = ["fused_policy_forward", "policy_forward_reference"]
