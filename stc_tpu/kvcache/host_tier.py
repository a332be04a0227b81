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


def _unpack_int4_np(p: np.ndarray) -> np.ndarray:
    """uint8 packed nibbles (..., Dp) -> float32 values (..., 2*Dp) —
    numpy mirror of engine._unpack_int4 (split-plane order: low nibbles are
    dims [0, Dp), high nibbles dims [Dp, 2*Dp))."""
    p32 = p.astype(np.int32)
    lo = p32 & 0x0F
    hi = (p32 >> 4) & 0x0F
    lo = np.where(lo > 7, lo - 16, lo)
    hi = np.where(hi > 7, hi - 16, hi)
    return np.concatenate([lo, hi], axis=-1).astype(np.float32)


class HostBlockStore:
    """Per-model host store of evicted pages, stacked over layers.

    Chunks are (L, B, Hkv, E, S, D) numpy arrays in eviction order; absolute
    page p lives in chunk p // E at offset p % E (all evictions use the same
    static E).  With host-tier int8 compression (ReKVConfig.host_kv_quant),
    chunks are int8 with per-(layer, b, head, page, dim) fp32 scales — half
    the host RAM and half the bytes on every host<->device crossing.
    """

    def __init__(self):
        self.k_chunks: List[np.ndarray] = []
        self.v_chunks: List[np.ndarray] = []
        self.k_scales: List[np.ndarray] = []  # (L, B, Hkv, E, D), int8 mode
        self.v_scales: List[np.ndarray] = []
        self.pages_per_chunk: int = 0
        self.total_pages: int = 0
        self.fetch_count: int = 0  # pages served (observability/tests)

    @property
    def quantized(self) -> bool:
        return bool(self.k_scales)

    def append(self, k: np.ndarray, v: np.ndarray, k_scale=None, v_scale=None):
        E = k.shape[3]
        if self.pages_per_chunk == 0:
            self.pages_per_chunk = E
        assert E == self.pages_per_chunk
        assert (k_scale is None) == (v_scale is None)
        assert not self.total_pages or self.quantized == (k_scale is not None)
        self.k_chunks.append(np.asarray(k))
        self.v_chunks.append(np.asarray(v))
        if k_scale is not None:
            self.k_scales.append(np.asarray(k_scale))
            self.v_scales.append(np.asarray(v_scale))
        self.total_pages += E

    def fetch_raw(self, layer: int, batch: int, abs_pages):
        """Pages in STORED form: (k, v, k_scale, v_scale), scales None when
        the store is unquantized.  Use for host->device staging so int8
        pages cross the link compressed (dequant on device)."""
        ks, vs, kss, vss = [], [], [], []
        E = self.pages_per_chunk
        abs_pages = list(abs_pages)
        self.fetch_count += len(abs_pages)
        for p in abs_pages:
            c, o = divmod(int(p), E)
            ks.append(self.k_chunks[c][layer, batch, :, o])
            vs.append(self.v_chunks[c][layer, batch, :, o])
            if self.quantized:
                kss.append(self.k_scales[c][layer, batch, :, o])
                vss.append(self.v_scales[c][layer, batch, :, o])
        if not self.quantized:
            return np.stack(ks), np.stack(vs), None, None
        return (np.stack(ks), np.stack(vs), np.stack(kss), np.stack(vss))

    def fetch(self, layer: int, batch: int, abs_pages) -> Tuple[np.ndarray,
                                                                np.ndarray]:
        """abs_pages: iterable of absolute page indices (< total_pages).
        Returns (n, Hkv, S, D) k and v, dequantized host-side if needed."""
        k, v, ks, vs = self.fetch_raw(layer, batch, abs_pages)
        if ks is None:
            return k, v
        if k.dtype == np.uint8:  # packed int4 (kv_quant='int4' store)
            k, v = _unpack_int4_np(k), _unpack_int4_np(v)
        return (k.astype(np.float32) * ks[:, :, None, :],
                v.astype(np.float32) * vs[:, :, None, :])

    def nbytes(self) -> int:
        return sum(a.nbytes for a in self.k_chunks + self.v_chunks
                   + self.k_scales + self.v_scales)


@functools.partial(jax.jit, static_argnames=("n_evict",), donate_argnums=(0,))
def evict_pages(kvs: StreamKV, n_evict: int):
    """Split off the oldest n_evict device pages (stacked-over-layers state).

    Returns (evicted_k, evicted_v, ev_k_scale, ev_v_scale, new_kvs) —
    evicted arrays are (L, B, Hkv, n_evict, S, D); scales are None-shaped
    (zero page axis) unless the store is int8-quantized (kv_quant), in
    which case the evicted pages are ALREADY int8 + scales and the D2H
    copy is half-size with no extra quantization pass.  The device store
    shifts left in place and page_offset advances.
    """
    ev_k = kvs.block_k[:, :, :, :n_evict]
    ev_v = kvs.block_v[:, :, :, :n_evict]
    quant = kvs.block_k_scale.shape[3] > 0
    ev_ks = kvs.block_k_scale[:, :, :, :n_evict] if quant else None
    ev_vs = kvs.block_v_scale[:, :, :, :n_evict] if quant else None
    shift_k = jnp.concatenate(
        [kvs.block_k[:, :, :, n_evict:], jnp.zeros_like(ev_k)], axis=3)
    shift_v = jnp.concatenate(
        [kvs.block_v[:, :, :, n_evict:], jnp.zeros_like(ev_v)], axis=3)
    sh_ks, sh_vs = kvs.block_k_scale, kvs.block_v_scale
    if quant:
        sh_ks = jnp.concatenate(
            [sh_ks[:, :, :, n_evict:], jnp.zeros_like(ev_ks)], axis=3)
        sh_vs = jnp.concatenate(
            [sh_vs[:, :, :, n_evict:], jnp.zeros_like(ev_vs)], axis=3)
    # keep masks shift with their pages; vacated slots reset to all-ones
    # (fresh pages must attend fully until their own compression writes)
    shift_keep = jnp.concatenate(
        [kvs.page_keep[:, :, n_evict:],
         jnp.ones_like(kvs.page_keep[:, :, :n_evict])], axis=2)
    new = kvs._replace(block_k=shift_k, block_v=shift_v,
                       block_k_scale=sh_ks, block_v_scale=sh_vs,
                       page_keep=shift_keep,
                       page_offset=kvs.page_offset + n_evict)
    return ev_k, ev_v, ev_ks, ev_vs, new


@jax.jit
def quantize_pages(k: jax.Array, v: jax.Array):
    """Symmetric int8 quantization of evicted pages ON DEVICE (so the D2H
    transfer is already compressed): per-(..., page, dim) absmax scales over
    the S token rows.  k/v: (L, B, Hkv, E, S, D) -> (q int8, scale f32
    (L, B, Hkv, E, D)) each."""
    def one(x):
        a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=4)      # (...,E,D)
        scale = jnp.maximum(a, 1e-8) / 127.0
        q = jnp.round(x.astype(jnp.float32) / scale[..., None, :])
        return jnp.clip(q, -127, 127).astype(jnp.int8), scale
    kq, ks = one(k)
    vq, vs = one(v)
    return kq, ks, vq, vs


@jax.jit
def quantize_pages_int4(k: jax.Array, v: jax.Array):
    """Symmetric int4 quantization of evicted pages ON DEVICE: quarter-size
    D2H transfers and host RAM (packed split-plane nibbles, engine
    _pack_int4 layout, so the staging dispatch's _unpack_int4 serves both
    the int4 device store and this host tier).  k/v: (L, B, Hkv, E, S, D)
    -> (uint8 packed (..., S, D//2), scale f32 (L, B, Hkv, E, D)) each."""
    from stc_tpu.kvcache.engine import _pack_int4

    def one(x):
        a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=4)      # (...,E,D)
        scale = jnp.maximum(a, 1e-8) / 7.0
        q = jnp.round(x.astype(jnp.float32) / scale[..., None, :])
        q = jnp.clip(q, -7, 7).astype(jnp.int8)
        return _pack_int4(q), scale
    kq, ks = one(k)
    vq, vs = one(v)
    return kq, ks, vq, vs
