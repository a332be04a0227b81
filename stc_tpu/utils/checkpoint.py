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
        # ragged/serving-era per-stream counters: a ragged session restored
        # without them would come back uniform (silent per-stream corruption)
        "stream_blocks": np.asarray(getattr(
            session, "_stream_blocks", np.zeros(session.batch, np.int64))),
        "ragged": int(getattr(session, "_ragged", False)),
        "init_len": int(getattr(session, "_init_len", 0)),
        # per-slot cacher schedule counters (VLM sessions)
        "slot_chunk": np.asarray(getattr(
            session, "_slot_chunk", np.zeros(session.batch, np.int64))),
        # speculative-draft history (zero-width when off)
        "qa_hist": np.asarray(getattr(
            session, "_qa_hist", np.zeros((session.batch, 0), np.int32))),
        "qa_hist_len": np.asarray(getattr(
            session, "_qa_hist_len", np.zeros(session.batch, np.int32))),
        "vstate": getattr(session, "_vstate", ()),
        "pstate": getattr(session, "_pstate", ()),
    }


_FMT = 3  # bump when _session_state's leaf set changes


def save_session_state(session, path: str):
    state = _session_state(session)
    leaves, treedef = jax.tree.flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrs["fmt"] = np.asarray(_FMT)
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
    fmt = int(data["fmt"]) if "fmt" in data else 1
    assert fmt == _FMT, (
        f"checkpoint format v{fmt} != current v{_FMT}: this file was saved "
        "by a different stc_tpu version (the leaf layout changed); re-save "
        "the session with this version")
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
    if getattr(session, "_kvs_fmt", None) is not None:
        # layout-committed sessions: restore the store into the committed
        # formats (a default-layout restore would recompile every kv jit
        # and un-alias their donations)
        session.kvs = jax.device_put(session.kvs, session._kvs_fmt)
    session.chunk_idx = int(state["chunk_idx"])
    session._total_blocks = int(state["total_blocks"])
    session._evicted_pages = int(state["evicted_pages"])
    session._stream_blocks = np.asarray(state["stream_blocks"],
                                        np.int64).copy()
    session._ragged = bool(int(state["ragged"]))
    session._init_len = int(state["init_len"])
    if hasattr(session, "_slot_chunk"):
        session._slot_chunk = np.asarray(state["slot_chunk"],
                                         np.int64).copy()
    session._qa_hist = np.asarray(state["qa_hist"], np.int32).copy()
    session._qa_hist_len = np.asarray(state["qa_hist_len"],
                                      np.int32).copy()
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


# ---------------------------------------------------------------------------
# Per-stream (slot) checkpoint: stream migration between serving sessions
# ---------------------------------------------------------------------------

def _stream_state(session, slot: int):
    """One slot's live state as a host pytree (kvs leaves are (L, B, ...)
    stacked; the batch axis is 1)."""
    assert session._evicted_pages == 0, (
        "per-stream extract with host-evicted pages is not supported: the "
        "host tier's page ring is shared across streams (same restriction "
        "as reset_streams)")
    state = {"kvs": jax.tree.map(lambda x: np.asarray(x[:, slot]),
                                 session.kvs)}
    vision = getattr(session, "vision", None)
    if vision is not None:
        state["vstate"], state["pstate"] = vision.extract_stream(
            session._vstate, session._pstate, slot)
    return state


def save_stream_state(session, slot: int, path: str):
    """Checkpoint ONE stream slot of a (batched) serving session — the
    migration half of continuous batching: drain a finished host's stream to
    disk and restore it into any free slot of another session built with the
    same configs.  The reference cannot express this (its per-stream state is
    a whole process).  Counters ride along; the shared init prompt does not
    (both sessions encode it at build time)."""
    state = _stream_state(session, slot)
    leaves, _ = jax.tree.flatten(state)
    arrs = {f"leaf_{i}": np.asarray(x) for i, x in enumerate(leaves)}
    arrs["fmt"] = np.asarray(_FMT)
    arrs["blocks"] = np.asarray(
        int(session._stream_blocks[slot]) if session._ragged
        else session._total_blocks)
    arrs["init_len"] = np.asarray(session._init_len)
    arrs["slot_chunk"] = np.asarray(
        int(getattr(session, "_slot_chunk", np.zeros(session.batch))[slot]))
    arrs["qa_hist"] = np.asarray(session._qa_hist[slot])
    arrs["qa_hist_len"] = np.asarray(int(session._qa_hist_len[slot]))
    np.savez_compressed(path, **arrs)
    return path


def load_stream_state(session, slot: int, path: str):
    """Restore a stream saved by save_stream_state into `slot` (typically a
    recycled slot — ServingEngine.retire/admit).  The other slots' streams
    are untouched; on a VLM session the migrated stream carries its own
    cacher-schedule counter (per-slot schedules)."""
    data = np.load(path, allow_pickle=False)
    fmt = int(data["fmt"]) if "fmt" in data else 1
    assert fmt == _FMT, (
        f"stream blob format v{fmt} != current v{_FMT}; re-save with this "
        "stc_tpu version")
    assert int(data["init_len"]) == session._init_len, (
        "init prompt length mismatch: the migrated stream was encoded with "
        f"n_init={int(data['init_len'])}, this session has "
        f"{session._init_len} (init prompts must match across hosts)")
    assert session._evicted_pages == 0, (
        "per-stream restore into a session with host-evicted pages is not "
        "supported (shared host page ring)")
    state = _stream_state(session, slot)
    leaves, treedef = jax.tree.flatten(state)
    n_saved = sum(1 for k in data.files if k.startswith("leaf_"))
    assert n_saved == len(leaves), (
        f"stream blob has {n_saved} leaves, session expects {len(leaves)} "
        "(VLM and bare sessions are not interchangeable)")
    new_leaves = []
    for i, old in enumerate(leaves):
        arr = data[f"leaf_{i}"]
        assert arr.shape == np.asarray(old).shape, (
            f"leaf {i}: saved {arr.shape} vs session "
            f"{np.asarray(old).shape} — configs must match")
        new_leaves.append(arr)
    state = jax.tree.unflatten(treedef, new_leaves)
    session.kvs = jax.tree.map(
        lambda cur, new: cur.at[:, slot].set(jnp.asarray(new, cur.dtype)),
        session.kvs, state["kvs"])
    if getattr(session, "_kvs_fmt", None) is not None:
        # the un-jitted scatter above lands in default layouts; put the
        # store back into the session's committed formats
        session.kvs = jax.device_put(session.kvs, session._kvs_fmt)
    vision = getattr(session, "vision", None)
    if vision is not None:
        session._vstate, session._pstate = vision.restore_stream(
            session._vstate, session._pstate, slot,
            state["vstate"], state["pstate"])
        session._slot_chunk[slot] = int(data["slot_chunk"])
    hist = np.asarray(data["qa_hist"], np.int32)
    assert hist.shape == session._qa_hist[slot].shape, (
        f"spec_history_tokens mismatch: blob {hist.shape} vs session "
        f"{session._qa_hist[slot].shape}")
    session._qa_hist[slot] = hist
    session._qa_hist_len[slot] = int(data["qa_hist_len"])
    session._ensure_ragged()
    session._stream_blocks[slot] = int(data["blocks"])
    session._total_blocks = int(session._stream_blocks.max())
    return session
