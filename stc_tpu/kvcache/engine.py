"""Jitted streaming KV-cache engine (paged, scatter-free).

Pure-function equivalents of the reference ContextManager's methods
(model/attention/kv_cache_manager.py):

  reference method                    here
  ----------------------------------  --------------------------------------
  append (:2248) + _append (:2059)    append_stream  (attention + state update)
  _append_global (:2122)              page write inside append_stream
  get_global_hidden_and_mask (:1545)  init_active gating inside append_stream
  _calc_block_topk (:1414)            retrieve_blocks (static-topk + validity)
  get_retrieved_kv (:773)             retrieve_blocks (gather from page ring)
  QA sliding-window path              decode_write / decode_attend
    (rekv_attention.py:369-426)

Performance notes (TPU):
- every write is page/row-granular (scatter window dims = whole KV rows);
  there are NO elementwise scatters in the hot path;
- the local window is not a separate buffer: it is the last
  ceil(n_local/S)+1 pages of the append-only store — a CONTIGUOUS range read
  with a dynamic_slice (XLA gathers run ~10x slower than slices here);
- RoPE cos/sin tables are identical across decoder layers, so the model
  computes them once per step (make_rope_cache) and passes them through the
  layer scan;
- window size is bucketed to the actual stream length by the session
  (win_pages), so early-stream attention never pays capacity cost.
"""

from __future__ import annotations

import functools
from typing import NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.state import StreamKV, DecodeKV
from stc_tpu.ops.attention import multi_stage_attention, AttnStage
from stc_tpu.ops.rope import apply_rope, rope_cos_sin

NEG_INF = float("-inf")


def n_window_pages(cfg: ReKVConfig) -> int:
    # ceil(n_local/S) + exc pages cover the sliding window incl. the pages
    # being appended; rounded up to the Pallas kernel's pages-per-tile so the
    # window length tiles evenly (extra pages sit left of the window and are
    # masked by distance)
    w0 = -(-cfg.n_local // cfg.block_size) + cfg.exc_block_size // cfg.block_size
    return -(-w0 // 8) * 8


def init_stream_kv(cfg: ReKVConfig, batch: int, n_kv_heads: int, head_dim: int,
                   dtype=jnp.bfloat16) -> StreamKV:
    B, H, D = batch, n_kv_heads, head_dim
    S = cfg.block_size
    Nb = cfg.max_blocks
    assert Nb >= n_window_pages(cfg), (
        f"max_blocks={Nb} must cover the local window "
        f"({n_window_pages(cfg)} pages)")
    z = functools.partial(jnp.zeros, dtype=dtype)
    quant = cfg.kv_quant != "none"
    if cfg.kv_quant == "int4":
        assert D % 2 == 0, D
        page_dt, Dp = jnp.uint8, D // 2   # two nibbles per byte
    elif cfg.kv_quant == "int8":
        page_dt, Dp = jnp.int8, D
    else:
        page_dt, Dp = dtype, D
    n_scale = Nb if quant else 0
    return StreamKV(
        init_k=z((B, H, cfg.n_init, D)),
        init_v=z((B, H, cfg.n_init, D)),
        block_k=jnp.zeros((B, H, Nb, S, Dp), page_dt),
        block_v=jnp.zeros((B, H, Nb, S, Dp), page_dt),
        block_k_scale=jnp.zeros((B, H, n_scale, D), jnp.float32),
        block_v_scale=jnp.zeros((B, H, n_scale, D), jnp.float32),
        block_rep=z((B, cfg.rep_cap, H, D)),
        page_keep=jnp.ones((B, Nb, S), dtype=bool),
        num_blocks=jnp.zeros((B,), dtype=jnp.int32),
        page_offset=jnp.zeros((B,), dtype=jnp.int32),
        length=jnp.zeros((B,), dtype=jnp.int32),
    )


def init_decode_kv(cfg: ReKVConfig, batch: int, n_kv_heads: int, head_dim: int,
                   dtype=jnp.bfloat16) -> DecodeKV:
    B, H, D = batch, n_kv_heads, head_dim
    return DecodeKV(
        k=jnp.zeros((B, H, cfg.decode_cap, D), dtype=dtype),
        v=jnp.zeros((B, H, cfg.decode_cap, D), dtype=dtype),
        cursor=jnp.zeros((B,), dtype=jnp.int32),
    )


def reset_streams(kv: StreamKV, reset: jax.Array, init_len,
                  batch_axis: int = 0) -> StreamKV:
    """Recycle stream slots for continuous serving: where `reset[b]` is True,
    return slot b to its just-after-init-prompt state while the other slots'
    streams continue untouched (the admission/retirement half of continuous
    batching — the reference tears down a whole process per stream,
    model/abstract_rekv.py one-session-per-process).

    Counters go to zero, rep keys and page keep masks go fresh; the init
    tokens are KEPT (serving slots share one init/system prompt, and init_k/v
    are written identically for every slot by the init append).  Page DATA is
    deliberately left stale: every consumer gates reads by num_blocks /
    window positions (retrieval masks indices >= num_blocks, the window mask
    is position-derived), and new appends overwrite slots from zero — so a
    recycled slot is answer-identical to a fresh session without rewriting
    the multi-GB page store.

    init_len: stream length to reset to — n_init if the init prompt was
    encoded, else 0.  batch_axis: 0 for a per-layer StreamKV, 1 for the
    L-stacked session state.
    """
    B = reset.shape[0]

    def bmask(x):
        shape = [1] * x.ndim
        shape[batch_axis] = B
        return reset.reshape(shape)

    return kv._replace(
        block_rep=jnp.where(bmask(kv.block_rep),
                            jnp.zeros((), kv.block_rep.dtype), kv.block_rep),
        page_keep=jnp.where(bmask(kv.page_keep), True, kv.page_keep),
        num_blocks=jnp.where(reset, 0, kv.num_blocks),
        page_offset=jnp.where(reset, 0, kv.page_offset),
        length=jnp.where(reset, jnp.asarray(init_len, kv.length.dtype),
                         kv.length),
    )


# ---------------------------------------------------------------------------
# RoPE cache (shared across decoder layers within one step)
# ---------------------------------------------------------------------------

class RopeCache(NamedTuple):
    cos_q: jax.Array       # (T, D)
    sin_q: jax.Array
    cos_one: jax.Array     # (D,) one-angle for init-stage queries
    sin_one: jax.Array
    cos_init: jax.Array    # (B, n_init, D) init keys at window-relative pos
    sin_init: jax.Array
    cos_win: jax.Array     # (B, W, S, D) window-page keys
    sin_win: jax.Array
    win_pages: jax.Array   # (B, W) absolute page indices of the window
    win_start: jax.Array   # (B,) first window page (contiguous slice start)
    win_slots: jax.Array   # (B, W) store slots (== pages; append-only)
    win_pos: jax.Array     # (B, W, S) absolute token positions
    local_mask: jax.Array  # (B, 1, T, W, S)
    init_local_mask: jax.Array  # (B, 1, T, n_init)
    init_active: jax.Array      # (B,)
    # pallas paged-kernel extras: rope tables for the tile-aligned page COVER
    cos_cover: jax.Array   # (B, Lc, D)
    sin_cover: jax.Array
    start_tile: jax.Array  # (B,) first aligned store tile of the cover


def make_rope_cache(length: jax.Array, num_blocks: jax.Array, T: int,
                    cfg: ReKVConfig, head_dim: int,
                    rope_base: float, n_pages: int | None = None,
                    page_offset: jax.Array | None = None) -> RopeCache:
    """Everything position-dependent for one streaming append of T tokens.

    length/num_blocks: (B,) state BEFORE the append.  The current block is
    included in the window (it is written before attention).

    n_pages: optional static window-size bucket (< n_window_pages) — correct
    whenever the stream holds at most n_pages pages; the session picks the
    bucket from its host-side chunk counter so early-stream attention scales
    with the ACTUAL stream length instead of the window capacity.
    """
    B = length.shape[0]
    S = cfg.block_size
    W = n_pages if n_pages is not None else n_window_pages(cfg)
    Nb = cfg.max_blocks

    rel_q = cfg.n_local + jnp.arange(T, dtype=jnp.int32)
    cos_q, sin_q = rope_cos_sin(rel_q, head_dim, rope_base)
    one = jnp.asarray(cfg.n_local - 1, jnp.int32)
    cos_one, sin_one = rope_cos_sin(one, head_dim, rope_base)

    L = length  # (B,)
    tok_pos = L[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # (B, T)

    # init keys under the LOCAL stage sit at their true positions 0..n_init-1
    init_pos = jnp.arange(cfg.n_init, dtype=jnp.int32)[None, :]     # (1, n_init)
    rel_init = jnp.clip(init_pos - L[:, None] + cfg.n_local, 0,
                        cfg.rope_max_pos - 1)
    cos_init, sin_init = rope_cos_sin(rel_init, head_dim, rope_base)
    d_init = tok_pos[:, :, None] - init_pos[:, None, :]             # (B, T, nI)
    init_local_mask = ((d_init >= 0) & (d_init < cfg.n_local)
                       & (init_pos[:, None, :] < L[:, None, None]))[:, None]

    # window pages: the last W pages including the n_new pages being appended
    # (n_new = T/S; reference exc_block_size semantics — one attention call
    # covers the whole exc chunk).  The store is append-only, so the window
    # is one CONTIGUOUS page range starting at win_start — readable with a
    # dynamic_slice (XLA gathers run at ~1/10th of copy bandwidth on TPU;
    # slices run at full speed).
    n_new = T // S
    total = num_blocks[:, None] + n_new
    offset = (jnp.zeros_like(num_blocks) if page_offset is None
              else page_offset)
    # device-local slice start; pages are ABSOLUTE indices (positions depend
    # on them); the session guarantees the window is never evicted
    win_start = jnp.clip(num_blocks + n_new - offset - W, 0, Nb - W)  # (B,)
    pages = (offset + win_start)[:, None] \
        + jnp.arange(W, dtype=jnp.int32)[None, :]
    pvalid = pages < total
    slots = pages - offset[:, None]
    win_pos = (cfg.n_init + pages[:, :, None] * S
               + jnp.arange(S, dtype=jnp.int32)[None, None, :])     # (B, W, S)
    rel_win = jnp.clip(win_pos - L[:, None, None] + cfg.n_local, 0,
                       cfg.rope_max_pos - 1)
    cos_win, sin_win = rope_cos_sin(rel_win, head_dim, rope_base)
    d_win = tok_pos[:, :, None, None] - win_pos[:, None, :, :]      # (B,T,W,S)
    local_mask = ((d_win >= 0) & (d_win < cfg.n_local)
                  & pvalid[:, None, :, None])[:, None]              # (B,1,T,W,S)

    init_active = (L + T) > cfg.n_local

    # tile-aligned page cover for the pallas paged kernel (computed lazily by
    # XLA: dead-code-eliminated when the jnp backend is used)
    from stc_tpu.ops.stream_attention import pages_per_tile
    ppt = pages_per_tile(S)
    n_read = W // ppt + 1
    start_tile = win_start // ppt                                # (B,)
    # cover pages are ABSOLUTE (positions depend on them); the kernel's
    # BlockSpec indexes by the LOCAL start_tile, but rope tables and masks
    # must account for host-evicted pages (page_offset)
    cover_pages = (offset[:, None] + start_tile[:, None] * ppt
                   + jnp.arange(n_read * ppt, dtype=jnp.int32)[None, :])
    cover_pos = (cfg.n_init + cover_pages[:, :, None] * S
                 + jnp.arange(S, dtype=jnp.int32)[None, None, :])
    rel_cover = jnp.clip(cover_pos - L[:, None, None] + cfg.n_local, 0,
                         cfg.rope_max_pos - 1)
    cos_cover, sin_cover = rope_cos_sin(rel_cover, head_dim, rope_base)
    Lc = n_read * ppt * S
    cos_cover = cos_cover.reshape(B, Lc, head_dim)
    sin_cover = sin_cover.reshape(B, Lc, head_dim)

    return RopeCache(cos_q, sin_q, cos_one, sin_one, cos_init, sin_init,
                     cos_win, sin_win, pages, win_start, slots, win_pos,
                     local_mask, init_local_mask, init_active, cos_cover,
                     sin_cover, start_tile)


def _quantize_page(x: jax.Array):
    """(B, Hkv, n, S, D) -> (int8 pages, f32 scales (B, Hkv, n, D)).
    Symmetric absmax over the S token rows — the host tier's scheme
    (host_tier.quantize_pages), applied at device page-write time."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=3)
    scale = jnp.maximum(a, 1e-8) / 127.0
    q = jnp.round(x.astype(jnp.float32) / scale[:, :, :, None, :])
    return jnp.clip(q, -127, 127).astype(jnp.int8), scale


def _quantize_page_int4(x: jax.Array):
    """(B, Hkv, n, S, D) -> (uint8 packed nibbles (..., S, D//2), f32 scales
    (B, Hkv, n, D)).  Symmetric absmax over the S token rows onto [-7, 7];
    SPLIT-PLANE packing: byte j holds dims j (low nibble) and j + D/2 (high
    nibble) as two's-complement nibbles — unpack is a lane-friendly concat
    (no interleave), which the Pallas kernel does in VMEM."""
    a = jnp.max(jnp.abs(x.astype(jnp.float32)), axis=3)
    scale = jnp.maximum(a, 1e-8) / 7.0
    q = jnp.round(x.astype(jnp.float32) / scale[:, :, :, None, :])
    q = jnp.clip(q, -7, 7).astype(jnp.int8)
    return _pack_int4(q), scale


def _pack_int4(q: jax.Array) -> jax.Array:
    """int8 nibble values (..., D) in [-8, 7] -> uint8 packed (..., D//2):
    byte j = (q[..., j] & 0xF) | (q[..., j + D/2] << 4)."""
    Dh = q.shape[-1] // 2
    u = q.astype(jnp.uint8)  # two's complement
    return (u[..., :Dh] & 0x0F) | (u[..., Dh:] << 4)


def _unpack_int4(p: jax.Array) -> jax.Array:
    """uint8 packed (..., Dp) -> f32 nibble values (..., 2*Dp), split-plane
    order (low nibbles are dims [0, Dp), high nibbles dims [Dp, 2*Dp))."""
    p32 = p.astype(jnp.int32)
    lo = p32 & 0x0F
    hi = (p32 >> 4) & 0x0F
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _dequant_pages(pages: jax.Array, scales: jax.Array, dtype) -> jax.Array:
    """(..., n, S, D or D//2-packed) int8/uint8 x (..., n, D) -> dtype."""
    if pages.dtype == jnp.uint8:
        pages = _unpack_int4(pages)
    return (pages.astype(jnp.float32)
            * scales[..., :, None, :]).astype(dtype)


def _rot(x: jax.Array, cos: jax.Array, sin: jax.Array) -> jax.Array:
    """Apply precomputed rope tables; cos/sin broadcast against x."""
    x1, x2 = jnp.split(x.astype(jnp.float32), 2, axis=-1)
    rot = jnp.concatenate([-x2, x1], axis=-1)
    return (x.astype(jnp.float32) * cos + rot * sin).astype(x.dtype)


# ---------------------------------------------------------------------------
# Streaming append (encode path)
# ---------------------------------------------------------------------------

def append_stream(
    kv: StreamKV,
    q: jax.Array,   # (B, Hq, T, D) unrotated
    k: jax.Array,   # (B, Hkv, T, D) unrotated
    v: jax.Array,   # (B, Hkv, T, D)
    cfg: ReKVConfig,
    *,
    is_init: bool,
    rope_base: float = 10000.0,
    rope_cache: Optional[RopeCache] = None,
    backend: str = "jnp",   # 'jnp' | 'pallas' | 'pallas_interpret'
    win_pages: int | None = None,  # static window bucket (see make_rope_cache)
    active: Optional[jax.Array] = None,  # (B,) bool: ragged ingest mask
) -> Tuple[jax.Array, StreamKV]:
    """One streaming append of T tokens; returns (attn_out, new_state).

    active: optional per-stream mask for RAGGED multi-stream ingest (streams
    ticking at different rates batched into ONE dispatch — the serving shape
    the reference's one-session-per-process model cannot express).  Inactive
    streams' state is bit-identical afterwards (counters gated; page/rep
    writes select the existing content back), and their attention outputs
    are garbage the caller must ignore.  Per-stream masks/positions already
    come from per-stream counters, so active streams are unaffected.

    Semantics mirror ContextManager.append for a single exc block:
      stage 1: q attends [init tokens + window pages] with the causal
               sliding-window mask (0 <= dist < n_local), window-relative
               RoPE on both sides (reference _append);
      stage 2: one-angle-rotated q attends the UNROTATED init tokens with a
               full mask, active only once the stream has outgrown the local
               window — replicating the reference's deferred init fill
               (get_global_hidden_and_mask), including its early-phase
               local/init double-count quirk.

    If `is_init`, the T tokens are captured into init_k/v and attention is
    plain causal self-attention (no blocks exist yet; statically simplified).
    Otherwise T must equal cfg.block_size and the tokens are written as one
    page with its representative mean key (reference _append_global).
    """
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    S = cfg.block_size

    if is_init:
        assert T == cfg.n_init, (T, cfg.n_init)
        rel = cfg.n_local + jnp.arange(T, dtype=jnp.int32)
        q_rot = apply_rope(q, rel, rope_base)
        k_rot = apply_rope(k, rel, rope_base)
        dist = jnp.arange(T)[:, None] - jnp.arange(T)[None, :]
        mask = (dist >= 0) & (dist < cfg.n_local)
        o = multi_stage_attention(q_rot, [AttnStage(k_rot, v, mask[None, None])])
        return o, kv._replace(init_k=k, init_v=v, length=kv.length + T)

    assert T % S == 0, (T, S)
    n_new = T // S
    assert n_new <= cfg.exc_block_size // S, (
        f"append of {n_new} pages exceeds exc_block_size="
        f"{cfg.exc_block_size} (the window cover is sized for it)")
    compress_window = cfg.window_kv_compression == "select_top_half"
    assert not (compress_window and backend.startswith("pallas")), (
        "window_kv_compression needs the jnp encode backend (the paged "
        "Pallas kernel does not read page keep masks)")
    rc = rope_cache if rope_cache is not None else make_rope_cache(
        kv.length, kv.num_blocks, T, cfg, D, rope_base, n_pages=win_pages,
        page_offset=kv.page_offset)

    # ---- page write (before attention: queries must see themselves) ----
    # the store is append-only: slot == absolute block index - page_offset,
    # so the local window is a CONTIGUOUS range of pages (kernel reads it
    # with plain blocked pipelining).  One append may carry several pages
    # (reference exc_block_size semantics: kv_cache_manager.append processes
    # the input in exc chunks; here the whole exc chunk is ONE attention
    # call and ONE contiguous page-range write).  Streams longer than
    # max_blocks pages need the host-offload tier.
    k_pages = k.reshape(B, Hkv, n_new, S, D)
    v_pages = v.reshape(B, Hkv, n_new, S, D)
    slot = jnp.clip(kv.num_blocks - kv.page_offset, 0, cfg.max_blocks - n_new)

    def _wr(store_b, pages_b, start):
        return jax.lax.dynamic_update_slice_in_dim(store_b, pages_b, start,
                                                   axis=1)

    def _masked(write_fn, store, new, start, axis):
        """Write `new` at per-stream slots, but for INACTIVE streams select
        the store's existing content back (ragged ingest: an idle stream's
        state must stay bit-identical even when its store is full and the
        clipped slot would land on live pages).  `axis` indexes the BATCHED
        arrays; the vmapped per-stream slice uses axis-1."""
        if active is None:
            return jax.vmap(write_fn)(store, new, start)

        def _rd(store_b, start_b):
            return jax.lax.dynamic_slice_in_dim(store_b, start_b,
                                                new.shape[axis], axis=axis - 1)

        cur = jax.vmap(_rd)(store, start)
        am = active.reshape((B,) + (1,) * (new.ndim - 1))
        return jax.vmap(write_fn)(store, jnp.where(am, new, cur), start)

    quant = cfg.kv_quant != "none"
    if quant:
        # quantize on write: per-(page, head, dim) absmax scales over the S
        # token rows (the host tier's scheme, on device).  The attention /
        # gather consumers dequantize; rep keys below use the EXACT keys.
        # int4 packs two nibbles per byte (quarter the page bytes; 4x the
        # retrievable history at equal HBM).
        qfn = _quantize_page_int4 if cfg.kv_quant == "int4" else _quantize_page
        k_q, k_sc = qfn(k_pages)
        v_q, v_sc = qfn(v_pages)
        block_k = _masked(_wr, kv.block_k, k_q, slot, 2)
        block_v = _masked(_wr, kv.block_v, v_q, slot, 2)
        block_k_scale = _masked(_wr, kv.block_k_scale, k_sc, slot, 2)
        block_v_scale = _masked(_wr, kv.block_v_scale, v_sc, slot, 2)
    else:
        # round into the store's declared dtype (state_dtype): a body
        # computing in f32 over a bf16 store must narrow at the boundary
        block_k = _masked(_wr, kv.block_k,
                          k_pages.astype(kv.block_k.dtype), slot, 2)
        block_v = _masked(_wr, kv.block_v,
                          v_pages.astype(kv.block_v.dtype), slot, 2)
        block_k_scale = kv.block_k_scale
        block_v_scale = kv.block_v_scale
    # one representative mean key per page (reference _append_global)
    rep = jnp.mean(k_pages.astype(jnp.float32), axis=3)     # (B, Hkv, n, D)
    rep = rep.transpose(0, 2, 1, 3).astype(kv.block_rep.dtype)
    # rep slots are ABSOLUTE; the session raises before rep_cap overflows
    # (the clip only guards the jit from OOB writes)
    rep_start = jnp.clip(kv.num_blocks, 0, cfg.rep_cap - n_new)

    def _wr_rep(store_b, rep_b, start):
        return jax.lax.dynamic_update_slice_in_dim(store_b, rep_b, start,
                                                   axis=0)

    block_rep = _masked(_wr_rep, kv.block_rep, rep, rep_start, 1)
    if active is None:
        num_blocks = kv.num_blocks + n_new
        new_length = kv.length + T
    else:
        act = active.astype(jnp.int32)
        num_blocks = kv.num_blocks + n_new * act
        new_length = kv.length + T * act

    # ---- rotations (tables shared across layers via rope_cache) ----
    q_rot = _rot(q, rc.cos_q, rc.sin_q)
    q_one = _rot(q, rc.cos_one, rc.sin_one)
    k_init_rot = _rot(kv.init_k, rc.cos_init[:, None], rc.sin_init[:, None])

    if backend.startswith("pallas"):
        # paged path: the kernel streams the window's contiguous page tiles
        # straight from the HBM store via a scalar-driven BlockSpec index map
        # — no XLA gather, no materialized window copy.  With kv_quant the
        # tiles cross HBM->VMEM as int8 (half the window-read bandwidth) or
        # packed int4 (quarter) and unpack/dequantize inside the kernel.
        from stc_tpu.ops.stream_attention import stream_attention
        scalars = jnp.stack([
            kv.length,
            rc.start_tile,
            num_blocks,                  # total pages incl. the one written
            rc.init_active.astype(jnp.int32),
            kv.page_offset,              # host-evicted pages (abs = local+off)
        ], axis=1).astype(jnp.int32)
        o = stream_attention(
            q_rot, q_one, block_k, block_v, rc.cos_cover, rc.sin_cover,
            k_init_rot, kv.init_v, kv.init_k, scalars,
            k_scales=block_k_scale if quant else None,
            v_scales=block_v_scale if quant else None,
            T=T, n_local=cfg.n_local, n_init=cfg.n_init,
            interpret=(backend == "pallas_interpret"))
    else:
        # slice the contiguous window pages (includes the page just written):
        # (B, Hkv, W, S, D); vmapped dynamic_slice over the batch
        W = rc.win_pages.shape[1]

        def _win(bk, start):
            return jax.lax.dynamic_slice_in_dim(bk, start, W, axis=1)

        win_k = jax.vmap(_win)(block_k, rc.win_start)
        win_v = jax.vmap(_win)(block_v, rc.win_start)
        if quant:
            win_ks = jax.vmap(_win)(block_k_scale, rc.win_start)
            win_vs = jax.vmap(_win)(block_v_scale, rc.win_start)
            win_k = _dequant_pages(win_k, win_ks, q.dtype)
            win_v = _dequant_pages(win_v, win_vs, q.dtype)
        k_win_rot = _rot(win_k, rc.cos_win[:, None], rc.sin_win[:, None])
        local_mask = rc.local_mask
        if compress_window:
            # mask window tokens dropped by earlier appends' compression;
            # the pages written THIS call still carry all-ones keep rows, so
            # the current chunk attends itself at full resolution — the
            # reference order too (attention first, compress after, :2300)
            def _wk(keep_b, start):
                return jax.lax.dynamic_slice_in_dim(
                    keep_b, start, local_mask.shape[3], axis=0)

            win_keep = jax.vmap(_wk)(kv.page_keep, rc.win_start)
            local_mask = local_mask & win_keep[:, None, None]
        # joint softmax over [init-local | window | init-one-angle]
        o = _stream_attention(q_rot, q_one, k_init_rot, kv.init_v,
                              rc.init_local_mask, k_win_rot, win_v,
                              local_mask, kv.init_k, kv.init_v,
                              rc.init_active)

    page_keep = kv.page_keep
    if compress_window:
        # reference select_top_half_kv hook (kv_cache_manager.py:2315-2321):
        # per just-appended page keep the ceil(S/2) tokens whose attention
        # OUTPUTS have the largest head/dim mean; future windows mask the
        # rest (per-page granularity — the reference's per-exc-chunk
        # granularity coincides when exc_block_size == block_size, which
        # holds in every reference config)
        keep_n = -(-S // 2)
        score = o.astype(jnp.float32).mean(axis=(1, 3)).reshape(B, n_new, S)
        _, top = jax.lax.top_k(score, keep_n)             # (B, n_new, keep_n)
        new_keep = jnp.any(
            jax.nn.one_hot(top, S, dtype=jnp.bool_), axis=2)  # (B, n_new, S)

        def _wr_keep(keep_b, rows, start):
            return jax.lax.dynamic_update_slice_in_dim(keep_b, rows, start,
                                                       axis=0)

        page_keep = _masked(_wr_keep, page_keep, new_keep, slot, 1)

    new_kv = kv._replace(block_k=block_k, block_v=block_v,
                         block_k_scale=block_k_scale,
                         block_v_scale=block_v_scale,
                         block_rep=block_rep, page_keep=page_keep,
                         num_blocks=num_blocks,
                         length=new_length)
    return o, new_kv


def _stream_attention(q_rot, q_one, k_init, v_init, m_init,
                      k_win, v_win, m_win, k_init_raw, v_init_raw,
                      init_active):
    """Three-group joint softmax.

    q_rot/q_one: (B, Hq, T, D); k_init: (B, Hkv, nI, D);
    k_win: (B, Hkv, W, S, D); m_win: (B, 1, T, W, S); m_init: (B, 1, T, nI).
    Group 3 attends the UNROTATED init keys with one-angle queries, gated by
    init_active (B,).
    """
    B, Hq, T, D = q_rot.shape
    Hkv = k_init.shape[1]
    G = Hq // Hkv
    W, S = k_win.shape[2], k_win.shape[3]
    nI = k_init.shape[2]
    scale = 1.0 / (D ** 0.5)

    f32 = jnp.float32

    def q_g(qx):
        return qx.reshape(B, Hkv, G, T, D)

    # fold the two window-rotated groups into ONE key buffer (this platform
    # taxes each fused op ~40-90us, so fewer/larger ops win):
    #   [init-local (nI) | window (W*S) | init-far (nI)]
    # the far group uses the one-angle query, all others the window query.
    k_all = jnp.concatenate(
        [k_init, k_win.reshape(B, Hkv, W * S, D), k_init_raw], axis=2)
    v_all = jnp.concatenate(
        [v_init, v_win.reshape(B, Hkv, W * S, D), v_init_raw], axis=2)

    # matmuls stay in the input dtype (bf16 on TPU) with fp32 accumulation —
    # no materialized fp32 copies of K/V
    lg = jnp.einsum("bhgqd,bhkd->bhgqk", q_g(q_rot), k_all,
                    preferred_element_type=f32).reshape(B, Hq, T, -1)
    lg_far = jnp.einsum("bhgqd,bhkd->bhgqk", q_g(q_one), k_init_raw,
                        preferred_element_type=f32).reshape(B, Hq, T, nI)
    lg = lg.at[..., nI + W * S:].set(lg_far)

    m_far = jnp.broadcast_to(init_active[:, None, None, None], (B, 1, T, nI))
    mask = jnp.concatenate(
        [m_init, jnp.broadcast_to(m_win, (B, 1, T, W, S)
                                  ).reshape(B, 1, T, W * S), m_far], axis=-1)
    logits = jnp.where(mask, lg * scale, NEG_INF)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m)
    denom = jnp.maximum(jnp.sum(p, axis=-1, keepdims=True), 1e-38)
    # post-softmax mask-fill is unnecessary: masked logits are -inf, so their
    # probabilities are exactly 0 (the all-masked-row case is guarded by the
    # finite-m clamp above, and every row has at least its own token)
    p = (p / denom).astype(q_rot.dtype)

    out = jnp.einsum("bhgqk,bhkd->bhgqd",
                     p.reshape(B, Hkv, G, T, -1), v_all,
                     preferred_element_type=f32)
    return out.reshape(B, Hq, T, D).astype(q_rot.dtype)


# ---------------------------------------------------------------------------
# Retrieval (question time)
# ---------------------------------------------------------------------------

def retrieve_blocks(kv: StreamKV, q: jax.Array, cfg: ReKVConfig,
                    q_valid: jax.Array | None = None,
                    block_indices: jax.Array | None = None):
    """Query-conditioned top-k block retrieval.

    q: (B, Hq, Lq, D) UNROTATED question queries (the reference scores with
    raw global_q, rekv_attention.py:330-331).  q_valid: optional (B, Lq) bool
    marking real question tokens (padding excluded from the mean query).

    Implements _calc_block_topk (kv_cache_manager.py:1414-1540) with static
    shapes: mean query vector · per-block mean keys (GQA-grouped, equal to the
    reference's expanded flat dot), chunk-grouped top-k, ascending index sort,
    and a validity mask replacing the reference's dynamic index filtering.
    Ring-evicted blocks (absolute idx < num_blocks - max_blocks) are masked.

    block_indices: optional (B, topk) int32 precomputed external retrieval
    (reference set_retrieved_block_indices, kv_cache_manager.py:668-672);
    entries < 0 or >= num_blocks are masked.

    Returns (ret_k, ret_v, token_valid, valid_len):
      ret_k/ret_v: (B, Hkv, R, D) with R = n_init + topk*block_size —
                   [init tokens | gathered blocks, valid-first] UNROTATED;
      token_valid: (B, R) bool;
      valid_len:   (B,) int32 — number of valid tokens (contiguous prefix).
    """
    B = q.shape[0]
    Nb = cfg.max_blocks

    if block_indices is not None:
        abs_idx = jnp.asarray(block_indices, jnp.int32)
        assert abs_idx.shape == (B, cfg.topk), abs_idx.shape
        exists = (abs_idx >= 0) & (abs_idx < kv.num_blocks[:, None])
    else:
        abs_idx, exists = score_blocks(kv, q, cfg, q_valid)

    # only device-resident pages can be gathered here; host-evicted pages
    # are served by the session's layerwise QA path (runtime/session.py)
    resident = exists & (abs_idx >= kv.page_offset[:, None])
    # keep resident blocks first (ascending), non-resident/invalid last, so
    # the valid region stays a contiguous prefix of the decode cache
    order_key = jnp.where(resident, abs_idx, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(order_key, axis=1)
    abs_sorted = jnp.take_along_axis(abs_idx, order, axis=1)
    sel_valid = jnp.take_along_axis(resident, order, axis=1)
    block_slot_safe = jnp.clip(abs_sorted - kv.page_offset[:, None], 0,
                               Nb - 1)
    return _gather_retrieved(kv, cfg, block_slot_safe, sel_valid)


def score_block_logits(kv: StreamKV, q: jax.Array, cfg: ReKVConfig,
                       q_valid: jax.Array | None = None):
    """Raw rep-key relevance logits for every rep slot.

    Returns (logits (B, Rc), blk_valid (B, Rc), q_mean (B, Hq, D)) — the
    mean question query's dot product with each block's representative key
    (GQA-grouped, equal to the reference's expanded flat dot).  Shared by
    the default top-k scorer and the host-side ablation scorers
    (aks/dpc_knn/l2norm)."""
    B, Hq, Lq, D = q.shape
    Hkv = kv.block_rep.shape[2]
    G = Hq // Hkv
    Rc = kv.block_rep.shape[1]
    if q_valid is None:
        q_mean = jnp.mean(q.astype(jnp.float32), axis=2)      # (B, Hq, D)
    else:
        w = q_valid.astype(jnp.float32)[:, None, :, None]     # (B, 1, Lq, 1)
        q_mean = (q.astype(jnp.float32) * w).sum(axis=2) / jnp.maximum(
            w.sum(axis=2), 1.0)
    q_grp = q_mean.reshape(B, Hkv, G, D).sum(axis=2)          # (B, Hkv, D)
    logits = jnp.einsum("bnhd,bhd->bn", kv.block_rep.astype(jnp.float32),
                        q_grp)                                # (B, Rc)
    slot_ids = jnp.arange(Rc, dtype=jnp.int32)[None, :]
    blk_valid = slot_ids < kv.num_blocks[:, None]
    return logits, blk_valid, q_mean


def score_blocks(kv: StreamKV, q: jax.Array, cfg: ReKVConfig,
                 q_valid: jax.Array | None = None):
    """Top-k block scoring over the FULL rep history (reference
    _calc_block_topk): returns (abs_idx (B, topk) ascending, exists (B, topk))
    where exists marks selections backed by real blocks (device or host)."""
    B = q.shape[0]
    Rc = kv.block_rep.shape[1]
    cs = cfg.chunk_size
    k_chunks = cfg.topk // cs
    assert Rc % cs == 0

    logits, blk_valid, _ = score_block_logits(kv, q, cfg, q_valid)

    # chunk-grouped masked mean (reference remainder-chunk semantics)
    lg = jnp.where(blk_valid, logits, 0.0).reshape(B, Rc // cs, cs)
    cnt = blk_valid.reshape(B, Rc // cs, cs).sum(axis=-1)
    chunk_score = jnp.where(cnt > 0, lg.sum(axis=-1) / jnp.maximum(cnt, 1),
                            -jnp.inf)                          # (B, Rc/cs)

    _, chunk_idx = jax.lax.top_k(chunk_score, k_chunks)        # (B, k_chunks)
    chunk_valid = jnp.take_along_axis(cnt > 0, chunk_idx, axis=1)
    sort_key = jnp.where(chunk_valid, chunk_idx, Rc // cs + 1)
    chunk_idx = jnp.sort(sort_key, axis=1)
    abs_idx = (chunk_idx[:, :, None] * cs
               + jnp.arange(cs, dtype=jnp.int32)[None, None, :]
               ).reshape(B, cfg.topk)                          # (B, topk)
    exists = abs_idx < kv.num_blocks[:, None]
    return abs_idx, exists


def retrieve_blocks_hosttier(kv: StreamKV, q: jax.Array, cfg: ReKVConfig,
                             q_valid: jax.Array | None,
                             hp_k: jax.Array, hp_v: jax.Array,
                             hp_ids: jax.Array,
                             block_indices: jax.Array | None = None):
    """retrieve_blocks with a prefetched host-page table.

    Serves retrieved pages from BOTH tiers inside one dispatch: device-resident
    pages come from the paged store, host-evicted pages from the prefetched
    table (hp_k/hp_v: (B, Hkv, M, S, D); hp_ids: (B, M) absolute page ids in
    ARBITRARY order — the session appends columns incrementally — padded with
    int32 max).  Selected pages present in neither tier are reported in
    `missing` so the session can fetch them and re-dispatch — the
    speculative-prefetch loop converges to EXACT reference semantics because a
    run whose every selection was served is self-consistent (layer l's hidden
    states, and hence layer l+1's scores, match the unconstrained forward).

    Returns (ret_k, ret_v, token_valid, valid_len, abs_idx, exists, missing).
    """
    B = q.shape[0]
    Nb = cfg.max_blocks

    if block_indices is not None:
        abs_idx = jnp.asarray(block_indices, jnp.int32)
        exists = (abs_idx >= 0) & (abs_idx < kv.num_blocks[:, None])
    else:
        abs_idx, exists = score_blocks(kv, q, cfg, q_valid)

    resident = abs_idx >= kv.page_offset[:, None]
    # unsorted-table lookup: equality match (topk x M is tiny)
    eq = hp_ids[:, None, :] == abs_idx[:, :, None]             # (B, topk, M)
    found = jnp.any(eq, axis=-1) & ~resident
    pos_c = jnp.argmax(eq, axis=-1).astype(jnp.int32)          # (B, topk)
    served = exists & (resident | found)
    missing = exists & ~resident & ~found

    # served pages first in ascending absolute order (reference block order)
    order_key = jnp.where(served, abs_idx, jnp.iinfo(jnp.int32).max)
    order = jnp.argsort(order_key, axis=1)
    abs_s = jnp.take_along_axis(abs_idx, order, axis=1)
    sel_valid = jnp.take_along_axis(served, order, axis=1)
    res_s = jnp.take_along_axis(resident, order, axis=1)
    pos_s = jnp.take_along_axis(pos_c, order, axis=1)

    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    slot_dev = jnp.clip(abs_s - kv.page_offset[:, None], 0, Nb - 1)
    gk_dev = kv.block_k[bidx, :, slot_dev]      # (B, topk, Hkv, S, D)
    gv_dev = kv.block_v[bidx, :, slot_dev]
    if cfg.kv_quant != "none":
        dt = kv.init_k.dtype
        gk_dev = _dequant_gathered(gk_dev, kv.block_k_scale, bidx, slot_dev,
                                   dt)
        gv_dev = _dequant_gathered(gv_dev, kv.block_v_scale, bidx, slot_dev,
                                   dt)
    gk_host = hp_k[bidx, :, pos_s]
    gv_host = hp_v[bidx, :, pos_s]
    m = res_s[:, :, None, None, None]
    gk = jnp.where(m, gk_dev, gk_host)
    gv = jnp.where(m, gv_dev, gv_host)
    ret_k, ret_v, tok_valid, valid_len = _pack_retrieved(kv, cfg, gk, gv,
                                                         sel_valid)
    return ret_k, ret_v, tok_valid, valid_len, abs_idx, exists, missing


def _dequant_gathered(gp, scales, bidx, slot, dtype):
    """Dequantize gathered pages: gp (B, topk, Hkv, S, D) int8 (or packed
    int4 uint8 with D//2 bytes), scales (B, Hkv, Nb, D) gathered at the
    same slots."""
    if gp.dtype == jnp.uint8:
        gp = _unpack_int4(gp)
    sc = scales.transpose(0, 2, 1, 3)[bidx, slot]   # (B, topk, Hkv, D)
    return (gp.astype(jnp.float32) * sc[:, :, :, None, :]).astype(dtype)


def _gather_retrieved(kv: StreamKV, cfg: ReKVConfig, block_slot_safe,
                      sel_valid):
    B = block_slot_safe.shape[0]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    gk = kv.block_k[bidx, :, block_slot_safe]   # (B, topk, Hkv, S, D)
    gv = kv.block_v[bidx, :, block_slot_safe]
    if cfg.kv_quant != "none":
        dt = kv.init_k.dtype
        gk = _dequant_gathered(gk, kv.block_k_scale, bidx, block_slot_safe,
                               dt)
        gv = _dequant_gathered(gv, kv.block_v_scale, bidx, block_slot_safe,
                               dt)
    return _pack_retrieved(kv, cfg, gk, gv, sel_valid)


def _pack_retrieved(kv: StreamKV, cfg: ReKVConfig, gk, gv, sel_valid):
    """Pack gathered (B, topk, Hkv, S, D) pages behind the init tokens."""
    B, _, Hkv, S, D = gk.shape
    # pack to (B, Hkv, topk*S, D), tokens in block order
    gk = gk.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, cfg.topk * S, D)
    gv = gv.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, cfg.topk * S, D)

    ret_k = jnp.concatenate([kv.init_k, gk], axis=2)
    ret_v = jnp.concatenate([kv.init_v, gv], axis=2)
    tok_valid = jnp.concatenate(
        [jnp.ones((B, cfg.n_init), dtype=bool),
         jnp.repeat(sel_valid, S, axis=1)], axis=1)            # (B, R)
    valid_len = cfg.n_init + sel_valid.sum(axis=1) * S         # (B,)
    return ret_k, ret_v, tok_valid, valid_len


def compress_retrieved(kv: StreamKV, cfg: ReKVConfig, ret_k, ret_v,
                       valid_len):
    """Retrieved-KV compression (reference PRUNE_RETIREVED_KV hook,
    rekv_attention.py:338-347): keep half of each retrieved block's tokens
    by the configured filter_tokens_* strategy, scored against the mean of
    ALL rep keys seen (origin_block_k mean in the reference).

    ret_k/ret_v: (B, Hkv, R, D) with R = n_init + topk*S; returns
    (ck, cv, new_valid_len) with R2 = n_init + topk*(S//2).  Kept indices
    preserve block order, so the valid region stays a contiguous prefix.
    """
    from stc_tpu.compress.scoring import filter_tokens
    strategy = cfg.retrieved_kv_compression
    B, Hkv, R, D = ret_k.shape
    S = cfg.block_size
    keep = cfg.retrieved_keep_per_block
    nI = cfg.n_init

    # memory mean over the full rep history (masked by real blocks)
    blk = jnp.arange(kv.block_rep.shape[1])[None, :] < kv.num_blocks[:, None]
    w = blk.astype(jnp.float32)[:, :, None, None]
    mem = (kv.block_rep.astype(jnp.float32) * w).sum(axis=1) / jnp.maximum(
        w.sum(axis=1), 1.0)                                   # (B, Hkv, D)
    mem_flat = mem.reshape(B, Hkv * D)

    toks = ret_k[:, :, nI:].transpose(0, 2, 1, 3).reshape(B, R - nI, Hkv * D)

    if strategy == "filter_tokens_random":
        key = jax.random.fold_in(jax.random.key(0), kv.length[0])
        keys = jax.random.split(key, B)
        idx = jax.vmap(lambda t, m, k: filter_tokens(strategy, t, m, S, k)
                       )(toks, mem_flat, keys)
    else:
        idx = jax.vmap(lambda t, m: filter_tokens(strategy, t, m, S)
                       )(toks, mem_flat)                      # (B, topk*keep)
    idx = jnp.sort(idx, axis=1)

    bidx = jnp.arange(B)[:, None]
    gk = ret_k[:, :, nI:][bidx, :, idx]   # (B, topk*keep, Hkv, D)
    gv = ret_v[:, :, nI:][bidx, :, idx]
    gk = gk.transpose(0, 2, 1, 3)
    gv = gv.transpose(0, 2, 1, 3)
    ck = jnp.concatenate([ret_k[:, :, :nI], gk], axis=2)
    cv = jnp.concatenate([ret_v[:, :, :nI], gv], axis=2)
    new_valid = nI + (valid_len - nI) // S * keep
    return ck, cv, new_valid


# ---------------------------------------------------------------------------
# QA decode cache (retrieved prefix + prompt + generated tokens)
# ---------------------------------------------------------------------------

def decode_write(dkv: DecodeKV, k: jax.Array, v: jax.Array,
                 n_tokens, *, rope_base: float = 10000.0,
                 at_start: bool = False, raw_rows: int = 0) -> DecodeKV:
    """Write T tokens at the cursor; keys are rotated at their slot position.

    k/v: (B, Hkv, T, D) unrotated.  n_tokens: (B,) true count (<= T); padded
    tail tokens are written past the advanced cursor and get overwritten later.
    If at_start, the write begins at slot 0 and the cursor is RESET to
    n_tokens (used to install the retrieved prefix).

    raw_rows: slots below this index store keys UNROTATED (decode_attend's
    complement-window init stage scores the raw init keys exactly as the
    reference does, rekv_attention.py:408 — inverse-rotating an
    already-rounded bf16 key would double-round).  Pass n_init at the
    at_start prefix install when decode_cap > n_local; decode_attend then
    rotates those rows on the fly for its window stage.
    """
    B, Hkv, T, D = k.shape
    C = dkv.k.shape[2]
    start = jnp.zeros((B,), jnp.int32) if at_start else dkv.cursor
    slot = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # (B, T)
    slot = jnp.minimum(slot, C - 1)
    k_rot = apply_rope(k, slot[:, None, :], rope_base)
    if raw_rows:
        keep_raw = (slot < raw_rows)[:, None, :, None]               # (B,1,T,1)
        k_rot = jnp.where(keep_raw, k, k_rot)

    # row-granular write: advanced indices on (batch, slot) dims, KV rows as
    # scatter window (dims Hkv, D) — no elementwise scatter
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # round into the cache dtype explicitly: mixed-dtype sessions (f32
    # params over a bf16 cache) would otherwise scatter f32 into bf16 —
    # a FutureWarning today, an error in future jax releases
    nk = dkv.k.at[bidx, :, slot].set(
        k_rot.transpose(0, 2, 1, 3).astype(dkv.k.dtype))
    nv = dkv.v.at[bidx, :, slot].set(
        v.transpose(0, 2, 1, 3).astype(dkv.v.dtype))
    n_tokens = jnp.asarray(n_tokens, jnp.int32)
    n_tokens = jnp.broadcast_to(n_tokens, (B,))
    cursor = (jnp.zeros((B,), jnp.int32) if at_start else dkv.cursor) + n_tokens
    return DecodeKV(k=nk, v=nv, cursor=cursor)


def decode_attend(q: jax.Array, q_slots: jax.Array, dkv: DecodeKV,
                  cfg: ReKVConfig, *, rope_base: float = 10000.0) -> jax.Array:
    """Sliding-window attention of fresh queries over the decode cache.

    q: (B, Hq, T, D) unrotated; q_slots: (B, T) slot positions of the queries
    (their keys must already be written via decode_write, so dist==0 sees
    self).  CONTRACT: q_slots must be affine, q_slots[:, t] == q_slots[:, 0]
    + t — true at every call site (prompt prefill, retrieval forward, token
    decode all append contiguously); the pallas backend relies on it and
    reads only q_slots[:, 0], so a non-affine call would be silently wrong
    under 'pallas' while the jnp branch would honor it.

    Mirrors the QA sliding-window path (rekv_attention.py:364-426) INCLUDING
    the len_k > n_local branch: when the decode cache can outgrow the local
    window (decode_cap > n_local — large topk, small n_local, or long
    decodes), queries whose window has slid past the init tokens still
    attend them through the complement-window init stage (dist >= n_local,
    one-angle queries on the UNROTATED init keys — reference
    rekv_attention.py:401-426).  The stage is compiled in only when
    decode_cap > n_local (static), so standard configs pay nothing; it
    forces the jnp backend (the flash decode kernel has no init stage).
    """
    B, Hq, T, D = q.shape
    C = dkv.k.shape[2]
    q_rot = apply_rope(q, q_slots[:, None, :], rope_base)
    init_stage = cfg.decode_cap > cfg.n_local
    if cfg.decode_attn_backend.startswith("pallas") and not init_stage:
        # fused flash kernel; query slots are affine (start + t) at every
        # call site (prompt prefill, retrieval forward, token decode)
        from stc_tpu.ops.decode_attention import decode_attention
        return decode_attention(
            q_rot, dkv.k, dkv.v, q_slots[:, 0], dkv.cursor,
            n_local=cfg.n_local,
            interpret=(cfg.decode_attn_backend == "pallas_interpret"))
    slot_pos = jnp.arange(C, dtype=jnp.int32)[None, :]               # (1, C)
    dist = q_slots[:, :, None] - slot_pos[:, None, :]                # (B, T, C)
    mask = (dist >= 0) & (dist < cfg.n_local)
    mask = mask & (slot_pos < dkv.cursor[:, None])[:, None, :]       # valid slots
    k_win = dkv.k
    if init_stage:
        nI = cfg.n_init
        init_pos = jnp.arange(nI, dtype=jnp.int32)
        # slots 0..n_init-1 hold the RAW init keys (decode_write raw_rows):
        # the init stage scores them exactly as the reference does
        # (rekv_attention.py:408 uses never-rotated init_h_k); the window
        # stage rotates them on the fly here (nI rows, negligible)
        cos_i, sin_i = rope_cos_sin(init_pos, D, rope_base)
        k_win = jnp.concatenate(
            [_rot(dkv.k[:, :, :nI], cos_i, sin_i), dkv.k[:, :, nI:]], axis=2)
    stages = [AttnStage(k_win, dkv.v, mask[:, None, :, :])]
    if init_stage:
        k_init = dkv.k[:, :, :nI]
        one = jnp.asarray(cfg.n_local - 1, jnp.int32)
        cos1, sin1 = rope_cos_sin(one, D, rope_base)
        q_one = _rot(q, cos1, sin1)
        d_init = q_slots[:, :, None] - init_pos[None, None, :]       # (B,T,nI)
        m2 = (d_init >= cfg.n_local) \
            & (init_pos[None, None, :] < dkv.cursor[:, None, None])
        stages.append(AttnStage(k_init, dkv.v[:, :, :nI],
                                m2[:, None, :, :], q=q_one))
    return multi_stage_attention(q_rot, stages)
