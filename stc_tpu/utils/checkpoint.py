"""Session state checkpoint/resume.

The reference never serializes KV-cache state (SURVEY.md §5 — crash recovery
is per-question JSON dumps only).  Here the whole streaming session state
(StreamKV pytree + counters + vision/pruner state) round-trips through a
single .npz, enabling stream resumption after preemption — a production
requirement the reference lacks.
"""

from __future__ import annotations

import numpy as np
import jax
import jax.numpy as jnp


def _session_state(session):
    return {
        "kvs": session.kvs,
        "chunk_idx": getattr(session, "chunk_idx", 0),
        "total_blocks": getattr(session, "_total_blocks", 0),
        "evicted_pages": getattr(session, "_evicted_pages", 0),
        "vstate": getattr(session, "_vstate", ()),
        "pstate": getattr(session, "_pstate", ()),
    }


def save_session_state(session, path: str):
    state = _session_state(session)
    leaves, treedef = jax.tree.flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    hs = getattr(session, "host_store", None)
    if hs is not None and hs.total_pages:
        for i, (hk, hv) in enumerate(zip(hs.k_chunks, hs.v_chunks)):
            arrs[f"host_k_{i}"] = hk
            arrs[f"host_v_{i}"] = hv
        for i, (ks, vs) in enumerate(zip(hs.k_scales, hs.v_scales)):
            arrs[f"host_ks_{i}"] = ks
            arrs[f"host_vs_{i}"] = vs
    np.savez_compressed(path, **arrs)
    return path


def load_session_state(session, path: str):
    """Restore state saved by save_session_state into the session.

    The session must be built with the same configs (shapes must match —
    validated leaf by leaf)."""
    data = np.load(path, allow_pickle=False)
    state = _session_state(session)
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
    session._total_blocks = int(state["total_blocks"])
    session._evicted_pages = int(state["evicted_pages"])
    if hasattr(session, "_vstate"):
        session._vstate = state["vstate"]
        session._pstate = state["pstate"]
    i = 0
    while f"host_k_{i}" in data:
        session.host_store.append(
            data[f"host_k_{i}"], data[f"host_v_{i}"],
            data[f"host_ks_{i}"] if f"host_ks_{i}" in data else None,
            data[f"host_vs_{i}"] if f"host_vs_{i}" in data else None)
        i += 1
    return session
