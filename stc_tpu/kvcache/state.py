"""Fixed-capacity streaming KV-cache state (pytrees).

TPU-native re-architecture of the reference ContextManager's mutable state
(model/attention/kv_cache_manager.py:441-658).  Every dynamic structure in the
reference becomes a static-shape array + integer cursor — and, unlike the
reference (which keeps separate copies for the local window, the remainder,
and the CPU block store), ONE paged store serves both roles:

  reference                          here
  ---------------------------------  ------------------------------------------
  local_k/v (growing concat + trim)  the last ceil(n_local/S)+1 pages of the
                                     block store, gathered by page index
  init_k/v (lazy fill from stream)   eager capture of first n_init tokens
  global_blocks (CPU MemoryUnits)    HBM page ring (B, max_blocks, Hkv, S, D)
  block_k (VectorTensor, doubling)   rep-key array (B, max_blocks, Hkv, D)
  cached_blocks LRU dict + CudaCache not needed: pages live in HBM, gathered by
                                     index; host offload is a later tier
  global_remainder                   not needed: every non-init append is
                                     exactly one page (exc_block_size ==
                                     block_size in every reference config)

Pages are written with one row-granular update per append (no elementwise
scatter), and the store wraps modulo max_blocks: pages older than the
capacity are evicted exactly like the reference's LRU offload, except
eviction is by age (retrieval masks evicted indices).

Keys are stored UNROTATED everywhere (as in the reference): RoPE is applied at
attention time with bounded window-relative positions, and retrieved blocks
get fresh contiguous positions — the position-agnostic retrieval trick
(reference rope.py:89-104, kv_cache_manager.py:637-639).

All leaves carry a leading batch dim B (stream batch); model code stacks one
StreamKV per decoder layer along a leading L axis and drives them with
lax.scan.
"""

from __future__ import annotations

from typing import NamedTuple

import jax


class StreamKV(NamedTuple):
    """Per-layer streaming KV state for one batch of streams."""

    # init tokens (always-resident, unrotated)
    init_k: jax.Array     # (B, Hkv, n_init, D)
    init_v: jax.Array     # (B, Hkv, n_init, D)

    # append-only paged store; device slot = absolute page - page_offset
    # (page_offset > 0 once old pages were evicted to the host tier)
    block_k: jax.Array    # (B, Hkv, max_blocks, S, D) unrotated;
                          # int8 when ReKVConfig.kv_quant == 'int8'
    block_v: jax.Array    # (B, Hkv, max_blocks, S, D)
    # per-(page, head, dim) fp32 dequant scales (absmax/127 over the S token
    # rows); zero-width page axis when kv_quant == 'none'
    block_k_scale: jax.Array  # (B, Hkv, max_blocks | 0, D) f32
    block_v_scale: jax.Array  # (B, Hkv, max_blocks | 0, D) f32
    block_rep: jax.Array  # (B, rep_cap, Hkv, D) mean key per ABSOLUTE block
                          # (always full precision: scoring stays exact)
    # per-page token keep mask for WINDOW attention (all-ones unless
    # ReKVConfig.window_kv_compression is on; pages stay full for retrieval
    # — reference select_top_half_kv compresses only local_k/v)
    page_keep: jax.Array  # (B, max_blocks, S) bool
    num_blocks: jax.Array  # (B,) int32 — total blocks ever appended
    page_offset: jax.Array  # (B,) int32 — absolute index of device slot 0

    length: jax.Array     # (B,) int32 — total stream tokens appended


class DecodeKV(NamedTuple):
    """Per-layer question-answering KV cache (retrieved prefix + prompt + decode).

    Unlike StreamKV, keys here ARE stored rotated, at the RoPE angle of their
    slot index: slots are the contiguous fake positions that the reference
    assigns to [retrieved blocks | prompt | generated tokens]
    (model/attention/rekv_attention.py:388-426), so relative distances are
    consistent across decode steps and nothing needs re-rotation.
    """

    k: jax.Array       # (B, Hkv, decode_cap, D) rotated at slot position
    v: jax.Array       # (B, Hkv, decode_cap, D)
    cursor: jax.Array  # (B,) int32 — number of valid tokens
