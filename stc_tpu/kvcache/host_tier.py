"""Host-memory KV tier — unbounded streams at O(1) device memory.

TPU-native equivalent of the reference's CPU offload
(kv_cache_manager.py MemoryUnit/CudaCache + GLOBAL_STREAM loads): when the
device page store fills, the oldest pages are pulled to host RAM and the
device store is compacted (page_offset advances).  Representative keys stay
on device for the FULL history (they are ~1/60th of the page bytes) PROVIDED
ReKVConfig.max_rep_blocks is sized to the stream length — the session raises
before a stream outgrows rep_cap, so retrieval provably scores every block
ever seen.  Questions whose top-k hits host-resident pages are answered by
the session's speculative-prefetch QA (runtime/session.py _qa_hosttier): each
round is ONE dispatch serving pages from both tiers, and missing pages are
staged between rounds (host callbacks inside jit hang on this platform —
PLATFORM_NOTES.md — so per-layer io_callback fetches are not an option).
"""

from __future__ import annotations

import functools
from typing import List, Tuple

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.kvcache.state import StreamKV


class HostBlockStore:
    """Per-model host store of evicted pages, stacked over layers.

    Chunks are (L, B, Hkv, E, S, D) numpy arrays in eviction order; absolute
    page p lives in chunk p // E at offset p % E (all evictions use the same
    static E).
    """

    def __init__(self):
        self.k_chunks: List[np.ndarray] = []
        self.v_chunks: List[np.ndarray] = []
        self.pages_per_chunk: int = 0
        self.total_pages: int = 0
        self.fetch_count: int = 0  # pages served (observability/tests)

    def append(self, k: np.ndarray, v: np.ndarray):
        E = k.shape[3]
        if self.pages_per_chunk == 0:
            self.pages_per_chunk = E
        assert E == self.pages_per_chunk
        self.k_chunks.append(np.asarray(k))
        self.v_chunks.append(np.asarray(v))
        self.total_pages += E

    def fetch(self, layer: int, batch: int, abs_pages) -> Tuple[np.ndarray,
                                                                np.ndarray]:
        """abs_pages: iterable of absolute page indices (< total_pages).
        Returns (n, Hkv, S, D) k and v."""
        ks, vs = [], []
        E = self.pages_per_chunk
        abs_pages = list(abs_pages)
        self.fetch_count += len(abs_pages)
        for p in abs_pages:
            c, o = divmod(int(p), E)
            ks.append(self.k_chunks[c][layer, batch, :, o])
            vs.append(self.v_chunks[c][layer, batch, :, o])
        return np.stack(ks), np.stack(vs)

    def nbytes(self) -> int:
        return sum(a.nbytes for a in self.k_chunks + self.v_chunks)


@functools.partial(jax.jit, static_argnames=("n_evict",), donate_argnums=(0,))
def evict_pages(kvs: StreamKV, n_evict: int):
    """Split off the oldest n_evict device pages (stacked-over-layers state).

    Returns (evicted_k, evicted_v, new_kvs) — evicted arrays are
    (L, B, Hkv, n_evict, S, D); the device store shifts left in place and
    page_offset advances.
    """
    ev_k = kvs.block_k[:, :, :, :n_evict]
    ev_v = kvs.block_v[:, :, :, :n_evict]
    shift_k = jnp.concatenate(
        [kvs.block_k[:, :, :, n_evict:], jnp.zeros_like(ev_k)], axis=3)
    shift_v = jnp.concatenate(
        [kvs.block_v[:, :, :, n_evict:], jnp.zeros_like(ev_v)], axis=3)
    new = kvs._replace(block_k=shift_k, block_v=shift_v,
                       page_offset=kvs.page_offset + n_evict)
    return ev_k, ev_v, new
