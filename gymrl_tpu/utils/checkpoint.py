"""Checkpoint / resume via Orbax.

Parity with the reference's two mechanisms (SURVEY.md §5.4): the
``ModelLoader`` reflection mixin saving every state_dict-bearing attribute
(utils/model.py:330-366, path ./checkpoints/{algo}_{env}.pth) and the
per-script dicts that also pickle normalization stats. Here the entire
``TrainState`` pytree (params, target params, optimizer state, running
normalization stats, RNG key, step counters) is one Orbax checkpoint, so
restore puts training AND eval-time normalization back exactly. Replay
buffer contents are intentionally excluded, matching the reference (buffers
are never checkpointed) — `save_checkpoint` prunes any leaf under a field
named ``replay``.
"""

from __future__ import annotations

import os
from typing import Any

import jax
import numpy as np
import orbax.checkpoint as ocp


def checkpoint_path(algo: str, env_name: str, root: str = "./checkpoints") -> str:
    """./checkpoints/{algo}_{env} — reference utils/model.py:332 layout."""
    return os.path.abspath(os.path.join(root, f"{algo}_{env_name}"))


def _strip_replay(ts: Any) -> Any:
    """Replace replay-buffer storage with None (never checkpointed)."""
    if hasattr(ts, "_replace") and hasattr(ts, "replay"):
        return ts._replace(replay=None)
    return ts


def save_checkpoint(path: str, ts: Any, step: int | None = None) -> str:
    ts = _strip_replay(ts)
    path = os.path.abspath(path)
    os.makedirs(os.path.dirname(path), exist_ok=True)
    with ocp.PyTreeCheckpointer() as ckptr:
        ckptr.save(path, jax.device_get(ts), force=True)
    return path


def _graft_by_name(example: Any, raw: Any) -> Any:
    """Rebuild ``example``'s pytree structure from a RAW (item-less) Orbax
    restore. NamedTuples come back as plain dicts keyed by FIELD NAME, so
    leaves must be matched by name — flattened order differs (dict keys
    sort alphabetically; NamedTuple fields don't). Raises KeyError/TypeError
    on any structural mismatch (handled per-field by the caller)."""
    if example is None:
        return None
    if hasattr(example, "_fields"):  # NamedTuple → dict on disk
        return type(example)(
            **{f: _graft_by_name(getattr(example, f), raw[f]) for f in example._fields}
        )
    if isinstance(example, dict):
        return {k: _graft_by_name(example[k], raw[k]) for k in example}
    if isinstance(example, (list, tuple)):
        if len(raw) != len(example):
            raise KeyError("sequence length mismatch")
        vals = [_graft_by_name(e, raw[i]) for i, e in enumerate(example)]
        return type(example)(vals) if isinstance(example, list) else tuple(vals)
    if isinstance(raw, (dict, list, tuple)):  # leaf expected, subtree found
        raise KeyError("structure mismatch at leaf")
    return raw


def restore_checkpoint(path: str, example_ts: Any) -> Any:
    """Restore into the structure AND sharding layout of ``example_ts``
    (fresh-init TrainState).

    Fields pruned at save time (replay) keep their fresh-init value, mirroring
    the reference's behavior of resuming with an empty buffer. Every restored
    leaf is placed with `device_put` onto its example leaf's sharding, so a
    trainer initialized under a mesh resumes with params/opt-state/env-batch
    partitioned exactly as training left them (a bare `jnp.asarray` here
    would land everything replicated on device 0 and silently break DP/TP
    resume).

    Optimizer-representation drift (r5): if the on-disk opt_state structure
    does not match the example's — e.g. a checkpoint written before the
    flat_optimizer default flip, or with the flag toggled — the restore does
    NOT fail over to training from scratch. Instead every field that still
    matches (params, normalization stats, env state, counters, RNG) is
    grafted by name from a raw restore and only the mismatched fields keep
    their fresh-init value (Adam moments rebuild within a few hundred
    steps), with a loud per-field warning.
    """
    import logging

    stripped = _strip_replay(example_ts)
    path = os.path.abspath(path)
    with ocp.PyTreeCheckpointer() as ckptr:
        try:
            restored = ckptr.restore(path, item=jax.device_get(stripped))
        except ValueError:
            if not hasattr(stripped, "_fields"):
                raise
            raw = ckptr.restore(path)  # dict keyed by NamedTuple field names
            fields = {}
            for f in stripped._fields:
                ex_field = getattr(stripped, f)
                try:
                    fields[f] = _graft_by_name(ex_field, raw[f])
                except (KeyError, TypeError, IndexError):
                    logging.getLogger("gymrl").warning(
                        f"checkpoint field '{f}' has an incompatible structure "
                        f"(e.g. flat_optimizer changed since it was written); "
                        f"keeping the fresh-init value for '{f}' and restoring "
                        f"the rest"
                    )
                    fields[f] = ex_field
            restored = type(stripped)(**fields)
    if hasattr(example_ts, "_replace") and hasattr(example_ts, "replay"):
        restored = restored._replace(replay=example_ts.replay)

    def _place(example_leaf, leaf):
        sharding = getattr(example_leaf, "sharding", None)
        if leaf is example_leaf:  # passed-through fresh field (replay)
            return leaf
        if sharding is not None:
            return jax.device_put(jax.numpy.asarray(leaf), sharding)
        return jax.numpy.asarray(leaf)

    return jax.tree_util.tree_map(_place, example_ts, restored)
