"""Session state checkpoint/resume.

The reference never serializes KV-cache state (SURVEY.md §5 — crash recovery
is per-question JSON dumps only).  Here the whole streaming session state
(StreamKV pytree + counters + vision/pruner state) round-trips through a
single .npz, enabling stream resumption after preemption — a production
requirement the reference lacks.
"""

from __future__ import annotations

import io
from typing import Any

import numpy as np
import jax
import jax.numpy as jnp


def _flatten(tree) -> dict:
    leaves, treedef = jax.tree.flatten(tree)
    return {"treedef": treedef,
            "leaves": [np.asarray(leaf) for leaf in leaves]}


def save_session_state(session, path: str):
    state = {
        "kvs": session.kvs,
        "chunk_idx": getattr(session, "chunk_idx", 0),
        "blocks_host": getattr(session, "_blocks_host", 0),
        "vstate": getattr(session, "_vstate", ()),
        "pstate": getattr(session, "_pstate", ()),
    }
    leaves, treedef = jax.tree.flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrs["__treedef__"] = np.frombuffer(
        str(treedef).encode(), dtype=np.uint8)
    np.savez_compressed(path, **arrs)
    return path


def load_session_state(session, path: str):
    """Restore state saved by save_session_state into the session.

    The session must be built with the same configs (shapes must match —
    validated leaf by leaf)."""
    data = np.load(path, allow_pickle=False)
    state = {
        "kvs": session.kvs,
        "chunk_idx": getattr(session, "chunk_idx", 0),
        "blocks_host": getattr(session, "_blocks_host", 0),
        "vstate": getattr(session, "_vstate", ()),
        "pstate": getattr(session, "_pstate", ()),
    }
    leaves, treedef = jax.tree.flatten(state)
    new_leaves = []
    for i, old in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        old_arr = np.asarray(old)
        assert arr.shape == old_arr.shape, (
            f"leaf {i}: saved {arr.shape} vs session {old_arr.shape} — "
            "configs must match")
        if isinstance(old, jax.Array):
            new_leaves.append(jnp.asarray(arr, old.dtype))
        else:
            new_leaves.append(type(old)(arr) if arr.shape == () else arr)
    state = jax.tree.unflatten(treedef, new_leaves)
    session.kvs = state["kvs"]
    session.chunk_idx = int(state["chunk_idx"])
    if hasattr(session, "_blocks_host"):
        session._blocks_host = int(state["blocks_host"])
        session._vstate = state["vstate"]
        session._pstate = state["pstate"]
    return session
