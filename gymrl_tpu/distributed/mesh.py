"""Device mesh + sharding helpers — the framework's distributed backend.

The reference has NO distributed code (SURVEY.md §2.4); these are the new
first-class subsystems. Design per the scaling-book recipe: build a Mesh,
annotate shardings on the env-batch ("data") axis, let XLA insert the
collectives (gradient reductions ride ICI as psum; no NCCL/MPI analogue
is needed — XLA collectives ARE the comms backend, SURVEY.md §5.8).

Axes:
  * ``data``  — environment-batch / gradient data parallelism. The env
    batch axis of every rollout pytree is sharded here; parameter
    gradients reduce over it automatically when jit sees sharded batch +
    replicated params.
  * ``model`` — reserved tensor-parallel axis (size 1 by default). The
    reference's widest net is ~512 units so TP is never profitable, but
    the mesh carries the axis so TP becomes a config change, not a
    rewrite (SURVEY.md §2.4 table).

Multi-host: call ``jax.distributed.initialize()`` before ``make_mesh``;
``jax.devices()`` then spans hosts and the same code scales out (DCN
between slices, ICI within).
"""

from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def initialize_multihost(coordinator_address: str | None = None,
                         num_processes: int | None = None,
                         process_id: int | None = None) -> int:
    """Bootstrap the multi-host process group (SURVEY.md §5.8).

    On TPU pods the arguments auto-detect from the environment; explicit
    values support CPU/GPU multi-process testing. Returns the process index.
    Call once before `make_mesh` — afterwards `jax.devices()` spans all
    hosts and the same sharded program scales out.
    """
    kwargs = {}
    if coordinator_address is not None:
        kwargs = dict(coordinator_address=coordinator_address,
                      num_processes=num_processes, process_id=process_id)
    jax.distributed.initialize(**kwargs)
    return jax.process_index()


def make_mesh(n_data: int | None = None, n_model: int = 1, devices=None) -> Mesh:
    """Build a ('data', 'model') mesh over the available devices."""
    devices = devices if devices is not None else jax.devices()
    if n_data is None:
        n_data = len(devices) // n_model
    assert n_data * n_model <= len(devices), (
        f"need {n_data}x{n_model} devices, have {len(devices)}"
    )
    grid = np.asarray(devices[: n_data * n_model]).reshape(n_data, n_model)
    return Mesh(grid, ("data", "model"))


def batch_sharding(mesh: Mesh, batch_axis: int = 0) -> NamedSharding:
    """Sharding for arrays whose ``batch_axis`` is the env-batch dimension."""
    spec = [None] * (batch_axis + 1)
    spec[batch_axis] = "data"
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def train_state_shardings(mesh: Mesh, ts):
    """Sharding pytree for a TrainState (DQN family, continuous, recurrent).

    DP design: the env batch (every rank≥1 leaf of ``vec_state``) shards on
    'data'; params/targets/opt-state/replay replicate. The replay ring AND
    the PER sum-tree stay replicated deliberately — a per-shard tree would
    turn global prioritized sampling into locally-prioritized sampling
    (each device over-samples its own high-priority transitions), changing
    the reference's semantics; replicated, the tree costs O(capacity) HBM
    (a few MB at these scales) and sampling stays exact. Data parallelism
    in the learner comes from re-sharding the *sampled* minibatch onto
    'data' (see ``constrain_batch``): XLA then partitions the loss and
    psums the gradients into the replicated params automatically.

    Recurrent trainer states (ppo_rnn / ppo_lstm / ppg) carry two more
    per-env leaves, recognized by field name:
      * ``hidden`` [B, rnn]            — RNN carry, batch on 'data'
      * ``reward_scaler.ret`` [B]      — per-env discounted return R
        (its RunningMeanStd over R is scalar-shaped and replicates,
        exactly like the reference's single shared std,
        utils/normalization.py:38-52)
    """
    rep = replicated(mesh)
    bsh = batch_sharding(mesh, 0)
    sh = jax.tree_util.tree_map(lambda _: rep, ts)
    sh = sh._replace(
        vec_state=jax.tree_util.tree_map(
            lambda x: bsh if jax.numpy.ndim(x) >= 1 else rep, ts.vec_state
        )
    )
    if getattr(ts, "window", None) is not None:
        # n-step fold window is [n, B, ...] — env batch on axis 1
        wsh = batch_sharding(mesh, 1)
        sh = sh._replace(
            window=jax.tree_util.tree_map(lambda _: wsh, ts.window)
        )
    if getattr(ts, "hidden", None) is not None:
        sh = sh._replace(hidden=bsh)
    if getattr(ts, "reward_scaler", None) is not None:
        sh = sh._replace(
            reward_scaler=jax.tree_util.tree_map(
                lambda x: bsh if jax.numpy.ndim(x) >= 1 else rep,
                ts.reward_scaler,
            )
        )
    return sh


def constrain_batch(tree, mesh: Mesh | None, batch_axis: int = 0):
    """`with_sharding_constraint` every rank>batch_axis leaf onto 'data'.

    Applied to sampled replay minibatches inside the jitted update so the
    gradient computation runs data-parallel even though the buffer itself
    is replicated. No-op without a mesh.
    """
    if mesh is None:
        return tree
    bsh = batch_sharding(mesh, batch_axis)
    return jax.tree_util.tree_map(
        lambda x: (
            jax.lax.with_sharding_constraint(x, bsh)
            if jax.numpy.ndim(x) > batch_axis
            else x
        ),
        tree,
    )


def shard_pytree_batch(tree, mesh: Mesh, batch_ndim_from: int = 0):
    """Place every leaf with its ``batch_ndim_from``-th axis sharded on 'data'.

    Leaves whose rank is too small (scalars like step counters) replicate.
    """

    def place(x):
        if x.ndim > batch_ndim_from:
            return jax.device_put(x, batch_sharding(mesh, batch_ndim_from))
        return jax.device_put(x, replicated(mesh))

    return jax.tree_util.tree_map(place, tree)
