"""Run a benchmark script pinned to CPU, regardless of the ambient platform.

    python benchmarks/run_cpu.py benchmarks/ablate_ppg.py [args ...]

The ambient session may point JAX at a TPU relay (JAX_PLATFORMS=axon) that
can wedge; the env var alone does not override it — jax.config.update is
required before any device use (see CLAUDE.md "Environment gotchas").
"""

import os
import runpy
import sys

os.environ["JAX_PLATFORMS"] = "cpu"
import jax  # noqa: E402

jax.config.update("jax_platforms", "cpu")

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
script = sys.argv[1]
sys.argv = sys.argv[1:]
runpy.run_path(script, run_name="__main__")
