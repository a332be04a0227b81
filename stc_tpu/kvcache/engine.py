"""Jitted streaming KV-cache engine.

Pure-function equivalents of the reference ContextManager's methods
(model/attention/kv_cache_manager.py):

  reference method                    here
  ----------------------------------  --------------------------------------
  append (:2248) + _append (:2059)    append_stream  (attention + state update)
  _append_global (:2122)              block carving inside append_stream
  get_global_hidden_and_mask (:1545)  init_active gating inside append_stream
  _calc_block_topk (:1414)            retrieve_blocks (static-topk + validity)
  get_retrieved_kv (:773)             retrieve_blocks (gather from HBM store)
  QA sliding-window path              decode_write / decode_attend
    (rekv_attention.py:369-426)

Everything is static-shape; validity is expressed with masks, never with
dynamic lengths.
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.state import StreamKV, DecodeKV
from stc_tpu.ops.attention import AttnStage, multi_stage_attention
from stc_tpu.ops.rope import apply_rope, apply_rope_one_angle


def init_stream_kv(cfg: ReKVConfig, batch: int, n_kv_heads: int, head_dim: int,
                   dtype=jnp.bfloat16) -> StreamKV:
    B, H, D = batch, n_kv_heads, head_dim
    C = cfg.local_cap
    S = cfg.block_size
    Nb = cfg.max_blocks
    z = functools.partial(jnp.zeros, dtype=dtype)
    return StreamKV(
        local_k=z((B, H, C, D)),
        local_v=z((B, H, C, D)),
        local_pos=jnp.full((B, C), -1, dtype=jnp.int32),
        init_k=z((B, H, cfg.n_init, D)),
        init_v=z((B, H, cfg.n_init, D)),
        block_k=z((B, Nb, H, S, D)),
        block_v=z((B, Nb, H, S, D)),
        block_rep=z((B, Nb, H, D)),
        num_blocks=jnp.zeros((B,), dtype=jnp.int32),
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
) -> Tuple[jax.Array, StreamKV]:
    """One streaming append of T tokens; returns (attn_out, new_state).

    Semantics mirror ContextManager.append for a single exc block:
      stage 1: q attends the local ring with causal sliding-window mask
               (0 <= dist < n_local), window-relative RoPE on both sides
               (reference _append, kv_cache_manager.py:2059-2120);
      stage 2: one-angle-rotated q attends the UNROTATED init tokens with a
               full mask, active only once the stream has outgrown the local
               window — replicating the reference's deferred init fill
               (get_global_hidden_and_mask, kv_cache_manager.py:1545-1616),
               including its early-phase local/init double-count quirk.

    If `is_init`, the T tokens are captured into init_k/v (they are the init
    prompt; the reference lazily copies exactly these tokens later) and no
    block is carved.  Otherwise T must equal cfg.block_size and the tokens
    are carved into one global block with its representative mean key
    (reference _append_global, kv_cache_manager.py:2122-2189).
    """
    B, Hq, T, D = q.shape
    Hkv = k.shape[1]
    C = cfg.local_cap
    assert T <= cfg.exc_block_size or is_init
    if not is_init:
        assert T == cfg.block_size, (T, cfg.block_size)

    length = kv.length  # (B,)
    tok_pos = length[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # (B, T)

    # ---- ring write (before attention: queries must see themselves) ----
    slots = tok_pos % C  # (B, T)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # scatter along the slot axis; k/v are (B, Hkv, T, D) -> write per (b, t)
    local_k = kv.local_k.at[bidx[..., None, None],
                            jnp.arange(Hkv)[None, :, None, None],
                            slots[:, None, :, None],
                            jnp.arange(D)[None, None, None, :]].set(
        k.transpose(0, 1, 2, 3))
    local_v = kv.local_v.at[bidx[..., None, None],
                            jnp.arange(Hkv)[None, :, None, None],
                            slots[:, None, :, None],
                            jnp.arange(D)[None, None, None, :]].set(v)
    local_pos = kv.local_pos.at[bidx, slots].set(tok_pos)

    # ---- stage 1: local sliding-window attention over the ring ----
    # window-relative positions: first query sits at rel n_local
    # (bounded like the reference rope table, kv_cache_manager.py:637-639)
    rel_q = cfg.n_local + jnp.arange(T, dtype=jnp.int32)  # (T,)
    q_rot = apply_rope(q, rel_q, rope_base)
    rel_k = local_pos - length[:, None] + cfg.n_local  # (B, C)
    rel_k_safe = jnp.clip(rel_k, 0, cfg.rope_max_pos - 1)
    k_ring_rot = apply_rope(local_k, rel_k_safe[:, None, :], rope_base)

    dist = tok_pos[:, :, None] - local_pos[:, None, :]  # (B, T, C)
    local_mask = (dist >= 0) & (dist < cfg.n_local) & (local_pos[:, None, :] >= 0)
    local_mask = local_mask[:, None, :, :]  # (B, 1, T, C)

    # ---- stage 2: init attention (one-angle q, unrotated init keys) ----
    q_one = apply_rope_one_angle(q, cfg.n_local, rope_base)
    init_active = (length + T) > cfg.n_local  # (B,) — reference fill trigger
    init_mask = jnp.broadcast_to(
        init_active[:, None, None, None], (B, 1, T, cfg.n_init)
    )

    # joint softmax over both stages — mirrors the two Attn.append calls with
    # one shared online-softmax accumulator in the reference kernel.
    if cfg.n_init == 0:
        o = multi_stage_attention(
            q_rot, [AttnStage(k_ring_rot, local_v, local_mask)])
    else:
        # stage-dependent q rotation: local stage uses window RoPE, init stage
        # uses the one-angle rotation
        o = _two_q_multi_stage(
            q_rot, q_one,
            k_ring_rot, local_v, local_mask,
            kv.init_k, kv.init_v, init_mask,
        )

    # ---- state update: init capture or block carving ----
    init_k, init_v = kv.init_k, kv.init_v
    block_k, block_v, block_rep = kv.block_k, kv.block_v, kv.block_rep
    num_blocks = kv.num_blocks

    if is_init:
        # capture the first n_init stream tokens (= the init prompt)
        assert T == cfg.n_init, (T, cfg.n_init)
        init_k = k
        init_v = v
    else:
        widx = jnp.minimum(num_blocks, cfg.max_blocks - 1)  # (B,)
        block_k = block_k.at[bidx[:, 0], widx].set(k)  # block slot is (Hkv, S, D)
        block_v = block_v.at[bidx[:, 0], widx].set(v)
        rep = jnp.mean(k.astype(jnp.float32), axis=2).astype(kv.block_rep.dtype)
        block_rep = block_rep.at[bidx[:, 0], widx].set(rep)
        num_blocks = jnp.minimum(num_blocks + 1, cfg.max_blocks)

    new_kv = StreamKV(
        local_k=local_k, local_v=local_v, local_pos=local_pos,
        init_k=init_k, init_v=init_v,
        block_k=block_k, block_v=block_v, block_rep=block_rep,
        num_blocks=num_blocks,
        length=length + T,
    )
    return o, new_kv


def _two_q_multi_stage(q_a, q_b, k_a, v_a, mask_a, k_b, v_b, mask_b):
    """Joint softmax over two stages with DIFFERENT query rotations.

    The reference applies window RoPE to the local-stage query and one-angle
    RoPE to the init-stage query while both feed one online softmax
    (_append, kv_cache_manager.py:2084-2113).  multi_stage_attention takes a
    single q, so we inline the same math here.
    """
    B, Hq, T, D = q_a.shape
    scale = 1.0 / (D ** 0.5)

    def _logits(qx, kx, mx):
        Hkv = kx.shape[1]
        G = Hq // Hkv
        qg = qx.reshape(B, Hkv, G, T, D)
        lg = jnp.einsum("bhgqd,bhkd->bhgqk", qg.astype(jnp.float32),
                        kx.astype(jnp.float32),
                        preferred_element_type=jnp.float32)
        lg = lg.reshape(B, Hq, T, kx.shape[2])
        return jnp.where(mx, lg * scale, float("-inf"))

    la = _logits(q_a, k_a, mask_a)
    lb = _logits(q_b, k_b, mask_b)
    logits = jnp.concatenate([la, lb], axis=-1)
    m = jnp.max(logits, axis=-1, keepdims=True)
    m = jnp.where(jnp.isfinite(m), m, 0.0)
    p = jnp.exp(logits - m)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    p = p / denom

    out = jnp.zeros((B, Hq, T, D), dtype=jnp.float32)
    off = 0
    for (vx, mx) in ((v_a, mask_a), (v_b, mask_b)):
        Lk = vx.shape[2]
        Hkv = vx.shape[1]
        G = Hq // Hkv
        ps = jnp.where(mx, p[..., off:off + Lk], 0.0)
        pg = ps.reshape(B, Hkv, G, T, Lk)
        out = out + jnp.einsum("bhgqk,bhkd->bhgqd", pg,
                               vx.astype(jnp.float32),
                               preferred_element_type=jnp.float32
                               ).reshape(B, Hq, T, D)
        off += Lk
    return out.astype(q_a.dtype)


# ---------------------------------------------------------------------------
# Retrieval (question time)
# ---------------------------------------------------------------------------

def retrieve_blocks(kv: StreamKV, q: jax.Array, cfg: ReKVConfig,
                    q_valid: jax.Array | None = None):
    """Query-conditioned top-k block retrieval.

    q: (B, Hq, Lq, D) UNROTATED question queries (the reference scores with
    raw global_q, rekv_attention.py:330-331).  q_valid: optional (B, Lq) bool
    marking real question tokens (padding excluded from the mean query).

    Implements _calc_block_topk (kv_cache_manager.py:1414-1540) with static
    shapes: mean query vector · per-block mean keys (GQA-grouped, equal to the
    reference's expanded flat dot), chunk-grouped top-k, ascending index sort,
    and a validity mask replacing the reference's dynamic index filtering.

    Returns (ret_k, ret_v, token_valid, valid_len):
      ret_k/ret_v: (B, Hkv, R, D) with R = n_init + topk*block_size —
                   [init tokens | gathered blocks, valid-first] UNROTATED;
      token_valid: (B, R) bool;
      valid_len:   (B,) int32 — number of valid tokens (contiguous prefix).
    """
    B, Hq, Lq, D = q.shape
    Hkv = kv.block_rep.shape[2]
    G = Hq // Hkv
    S = cfg.block_size
    Nb = cfg.max_blocks
    cs = cfg.chunk_size
    k_chunks = cfg.topk // cs
    assert Nb % cs == 0

    # mean question query, grouped to kv heads (== reference's expanded dot)
    if q_valid is None:
        q_mean = jnp.mean(q.astype(jnp.float32), axis=2)      # (B, Hq, D)
    else:
        w = q_valid.astype(jnp.float32)[:, None, :, None]     # (B, 1, Lq, 1)
        q_mean = (q.astype(jnp.float32) * w).sum(axis=2) / jnp.maximum(
            w.sum(axis=2), 1.0)
    q_grp = q_mean.reshape(B, Hkv, G, D).sum(axis=2)          # (B, Hkv, D)
    logits = jnp.einsum("bnhd,bhd->bn", kv.block_rep.astype(jnp.float32),
                        q_grp)                                # (B, Nb)

    blk_valid = jnp.arange(Nb)[None, :] < kv.num_blocks[:, None]  # (B, Nb)

    # chunk-grouped masked mean (reference remainder-chunk semantics)
    lg = jnp.where(blk_valid, logits, 0.0).reshape(B, Nb // cs, cs)
    cnt = blk_valid.reshape(B, Nb // cs, cs).sum(axis=-1)
    chunk_score = jnp.where(cnt > 0, lg.sum(axis=-1) / jnp.maximum(cnt, 1),
                            -jnp.inf)                          # (B, Nb/cs)

    _, chunk_idx = jax.lax.top_k(chunk_score, k_chunks)        # (B, k_chunks)
    # push invalid chunks to the end, sort valid ascending (reference sorts)
    chunk_valid = jnp.take_along_axis(cnt > 0, chunk_idx, axis=1)
    sort_key = jnp.where(chunk_valid, chunk_idx, Nb // cs + 1)
    chunk_idx = jnp.sort(sort_key, axis=1)
    block_idx = (chunk_idx[:, :, None] * cs
                 + jnp.arange(cs, dtype=jnp.int32)[None, None, :]
                 ).reshape(B, cfg.topk)                        # (B, topk)
    sel_valid = block_idx < kv.num_blocks[:, None]             # (B, topk)
    block_idx_safe = jnp.clip(block_idx, 0, Nb - 1)

    gk = jnp.take_along_axis(
        kv.block_k, block_idx_safe[:, :, None, None, None], axis=1
    )  # (B, topk, Hkv, S, D)
    gv = jnp.take_along_axis(
        kv.block_v, block_idx_safe[:, :, None, None, None], axis=1
    )

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


# ---------------------------------------------------------------------------
# QA decode cache (retrieved prefix + prompt + generated tokens)
# ---------------------------------------------------------------------------

def decode_write(dkv: DecodeKV, k: jax.Array, v: jax.Array,
                 n_tokens, *, rope_base: float = 10000.0,
                 at_start: bool = False) -> DecodeKV:
    """Write T tokens at the cursor; keys are rotated at their slot position.

    k/v: (B, Hkv, T, D) unrotated.  n_tokens: (B,) true count (<= T); padded
    tail tokens are written past the advanced cursor and get overwritten later.
    If at_start, the write begins at slot 0 and the cursor is RESET to
    n_tokens (used to install the retrieved prefix).
    """
    B, Hkv, T, D = k.shape
    C = dkv.k.shape[2]
    start = jnp.zeros((B,), jnp.int32) if at_start else dkv.cursor
    slot = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]  # (B, T)
    slot = jnp.minimum(slot, C - 1)
    k_rot = apply_rope(k, slot[:, None, :], rope_base)

    bidx = jnp.arange(B)[:, None]
    nk = dkv.k.at[bidx[..., None, None],
                  jnp.arange(Hkv)[None, :, None, None],
                  slot[:, None, :, None],
                  jnp.arange(D)[None, None, None, :]].set(k_rot)
    nv = dkv.v.at[bidx[..., None, None],
                  jnp.arange(Hkv)[None, :, None, None],
                  slot[:, None, :, None],
                  jnp.arange(D)[None, None, None, :]].set(v)
    n_tokens = jnp.asarray(n_tokens, jnp.int32)
    n_tokens = jnp.broadcast_to(n_tokens, (B,))
    cursor = (jnp.zeros((B,), jnp.int32) if at_start else dkv.cursor) + n_tokens
    return DecodeKV(k=nk, v=nv, cursor=cursor)


def decode_attend(q: jax.Array, q_slots: jax.Array, dkv: DecodeKV,
                  cfg: ReKVConfig, *, rope_base: float = 10000.0) -> jax.Array:
    """Sliding-window attention of fresh queries over the decode cache.

    q: (B, Hq, T, D) unrotated; q_slots: (B, T) slot positions of the queries
    (their keys must already be written via decode_write, so dist==0 sees
    self).  Mirrors the QA sliding-window path (rekv_attention.py:388-426);
    the complement-window init stage is empty whenever the cache never exceeds
    n_local, which holds for every supported config (decode_cap <= n_local is
    asserted at session build time).
    """
    B, Hq, T, D = q.shape
    C = dkv.k.shape[2]
    q_rot = apply_rope(q, q_slots[:, None, :], rope_base)
    slot_pos = jnp.arange(C, dtype=jnp.int32)[None, :]               # (1, C)
    dist = q_slots[:, :, None] - slot_pos[:, None, :]                # (B, T, C)
    mask = (dist >= 0) & (dist < cfg.n_local)
    mask = mask & (slot_pos < dkv.cursor[:, None])[:, None, :]       # valid slots
    mask = mask[:, None, :, :]
    return multi_stage_attention(q_rot, [AttnStage(dkv.k, dkv.v, mask)])
