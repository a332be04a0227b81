"""Pallas fused decode/QA-path attention + per-key attention-mass scores.

Completes the kernel parity with the reference's Triton implementation
(model/attention/dot_production_attention/triton_impl.py): the reference's
one kernel serves the encode path AND the QA/decode sliding-window path
(:404-487 _forward with sliding_window), and has a per-key score variant
(:233-402 _score_kernel / get_score) that accumulates the unnormalized
post-softmax probability mass each KEY receives across all queries.  Here the
encode path is ops/stream_attention.py (paged); this module covers the
decode-cache path:

  decode_attention — flash attention of T fresh queries over the per-question
      decode cache (B, Hkv, C, D).  Keys are stored ALREADY rotated at their
      slot angle (kvcache/state.py DecodeKV), so the kernel does no RoPE at
      all; the mask is affine (slot windows), so nothing mask-shaped touches
      HBM; KV tiles stream with tile-level skip outside the live
      [start - n_local + 1, min(start + T, cursor)) slot range.
  decode_score — per-key attention mass sum_q exp(s_qk * scale - m_q), masked
      by the same sliding window (reference get_score semantics: reuses the
      row maxima m from the attention forward, no normalization by l).

Both take queries at (B, Hq, T, D) with GQA folded into the query rows of
each kv-head program, like the encode kernel.  Query slots must be affine
(slot_t = start + t) — true for every decode_attend call site (prompt
prefill, retrieval forward, token decode).

On this relayed platform each pallas_call costs ~1.1 ms fixed
(PLATFORM_NOTES.md), so the jnp path stays the session default; the kernel
is selected with ReKVConfig.decode_attn_backend='pallas' (re-tune on real
hardware).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANES = 128


def _round_up(x, m):
    return -(-x // m) * m


def _attn_kernel(scal_ref,                 # (B, 2) int32 [start, cursor]
                 q_ref,                    # (1, 1, GT, D)
                 k_ref, v_ref,             # (1, 1, tile, D)
                 o_ref,                    # (1, 1, GT, D)
                 m_out_ref,                # (1, 1, GT, LANES) f32
                 m_scr, l_scr, acc_scr,
                 *, Tp, n_local, tile, n_tiles, scale):
    b = pl.program_id(0)
    t = pl.program_id(2)
    start = scal_ref[b, 0]
    cursor = scal_ref[b, 1]
    GT = q_ref.shape[2]

    @pl.when(t == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    # live slot range across all query rows: (start - n_local, start + Tp - 1]
    live = ((t * tile < cursor)
            & (t * tile <= start + Tp - 1)
            & ((t + 1) * tile > start - n_local + 1))

    @pl.when(live)
    def _tile():
        row_tok = jax.lax.broadcasted_iota(jnp.int32, (GT, tile), 0) % Tp
        q_slot = start + row_tok
        col = jax.lax.broadcasted_iota(jnp.int32, (GT, tile), 1)
        slot = t * tile + col
        dist = q_slot - slot
        mask = (dist >= 0) & (dist < n_local) & (slot < cursor)

        k = k_ref[0, 0, 0].astype(jnp.bfloat16)
        q = q_ref[0, 0].astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        s = jnp.where(mask, s * scale, NEG)
        m_prev = m_scr[...]
        l_prev = l_scr[...]
        m_cur = jnp.max(s, axis=1, keepdims=True)
        m_next = jnp.maximum(m_prev, m_cur)
        alpha = jnp.exp(m_prev[:, :1] - m_next[:, :1])
        p = jnp.exp(s - m_next[:, :1])
        p = jnp.where(mask, p, 0.0)
        l_next = alpha * l_prev + jnp.sum(p, axis=1, keepdims=True)
        m_scr[...] = m_next
        l_scr[...] = jnp.broadcast_to(l_next, l_scr.shape)
        acc_scr[...] = acc_scr[...] * alpha + jax.lax.dot(
            p.astype(v_ref.dtype), v_ref[0, 0, 0],
            preferred_element_type=jnp.float32)

    @pl.when(t == n_tiles - 1)
    def _epilogue():
        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).astype(o_ref.dtype)
        m_out_ref[0, 0] = m_scr[...]


@functools.partial(jax.jit, static_argnames=("n_local", "interpret",
                                             "return_m"))
def decode_attention(q_rot: jax.Array, k: jax.Array, v: jax.Array,
                     start: jax.Array, cursor: jax.Array, *,
                     n_local: int, interpret: bool = False,
                     return_m: bool = False):
    """Flash sliding-window attention over the decode cache.

    q_rot: (B, Hq, T, D) queries rotated at slots start..start+T-1;
    k/v: (B, Hkv, C, D) rotated decode cache; start/cursor: (B,) int32.
    Returns (B, Hq, T, D), plus per-row maxima (B, Hq, T) when return_m
    (consumed by decode_score — reference get_score takes the forward's M).
    """
    B, Hq, T, D = q_rot.shape
    Hkv, C = k.shape[1], k.shape[2]
    G = Hq // Hkv
    Tp = _round_up(T, 8)
    GT = G * Tp
    tile = min(512, _round_up(C, LANES))
    Cp = _round_up(C, tile)
    n_tiles = Cp // tile

    q_p = jnp.pad(q_rot, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    q_p = q_p.reshape(B, Hkv, GT, D)
    if Cp != C:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
        v = jnp.pad(v, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    k_t = k.reshape(B, Hkv, n_tiles, tile, D)
    v_t = v.reshape(B, Hkv, n_tiles, tile, D)
    scalars = jnp.stack([start, cursor], axis=1).astype(jnp.int32)

    kern = functools.partial(_attn_kernel, Tp=Tp, n_local=n_local, tile=tile,
                             n_tiles=n_tiles, scale=1.0 / (D ** 0.5))
    out, m = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, GT, D), lambda b, h, t, s: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, tile, D),
                             lambda b, h, t, s: (b, h, t, 0, 0)),
                pl.BlockSpec((1, 1, 1, tile, D),
                             lambda b, h, t, s: (b, h, t, 0, 0)),
            ],
            out_specs=[
                pl.BlockSpec((1, 1, GT, D), lambda b, h, t, s: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, GT, LANES),
                             lambda b, h, t, s: (b, h, 0, 0)),
            ],
            scratch_shapes=[
                pltpu.VMEM((GT, LANES), jnp.float32),
                pltpu.VMEM((GT, LANES), jnp.float32),
                pltpu.VMEM((GT, D), jnp.float32),
            ],
        ),
        out_shape=[
            jax.ShapeDtypeStruct((B, Hkv, GT, D), q_rot.dtype),
            jax.ShapeDtypeStruct((B, Hkv, GT, LANES), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(scalars, q_p, k_t, v_t)

    o = out.reshape(B, Hkv, G, Tp, D)[:, :, :, :T].reshape(B, Hq, T, D)
    if not return_m:
        return o
    m_rows = m[..., 0].reshape(B, Hkv, G, Tp)[:, :, :, :T]
    return o, m_rows.reshape(B, Hq, T)


def _score_kernel(scal_ref, q_ref, k_ref, m_ref, o_ref,
                  *, Tp, T, n_local, tile, G, scale):
    b = pl.program_id(0)
    t = pl.program_id(2)
    start = scal_ref[b, 0]
    cursor = scal_ref[b, 1]
    GT = q_ref.shape[2]

    live = ((t * tile < cursor)
            & (t * tile <= start + Tp - 1)
            & ((t + 1) * tile > start - n_local + 1))

    row_tok = jax.lax.broadcasted_iota(jnp.int32, (GT, tile), 0) % Tp
    q_slot = start + row_tok
    col = jax.lax.broadcasted_iota(jnp.int32, (GT, tile), 1)
    slot = t * tile + col
    dist = q_slot - slot
    mask = ((dist >= 0) & (dist < n_local) & (slot < cursor)
            & (row_tok < T) & live)

    k = k_ref[0, 0, 0].astype(jnp.bfloat16)
    q = q_ref[0, 0].astype(jnp.bfloat16)
    s = jax.lax.dot_general(q, k, (((1,), (1,)), ((), ())),
                            preferred_element_type=jnp.float32)
    p = jnp.exp(s * scale - m_ref[0, 0][:, :1])
    p = jnp.where(mask, p, 0.0)
    # per-key mass: sum over this kv-head's G*T query rows, kept per q-head
    o_ref[0, 0] = p.reshape(G, Tp, tile).sum(axis=1)


@functools.partial(jax.jit, static_argnames=("n_local", "interpret"))
def decode_score(q_rot: jax.Array, k: jax.Array, m: jax.Array,
                 start: jax.Array, cursor: jax.Array, *,
                 n_local: int, interpret: bool = False) -> jax.Array:
    """Per-key attention mass over the decode cache (reference get_score,
    triton_impl.py:338-402): sum_q exp(s_qk * scale - m_q) with the sliding
    -window mask, NOT normalized by the softmax denominator.

    m: (B, Hq, T) row maxima from decode_attention(return_m=True).
    Returns (B, Hq, C) f32.
    """
    B, Hq, T, D = q_rot.shape
    Hkv, C = k.shape[1], k.shape[2]
    G = Hq // Hkv
    Tp = _round_up(T, 8)
    GT = G * Tp
    tile = min(512, _round_up(C, LANES))
    Cp = _round_up(C, tile)
    n_tiles = Cp // tile

    q_p = jnp.pad(q_rot, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
    q_p = q_p.reshape(B, Hkv, GT, D)
    if Cp != C:
        k = jnp.pad(k, ((0, 0), (0, 0), (0, Cp - C), (0, 0)))
    k_t = k.reshape(B, Hkv, n_tiles, tile, D)
    # row maxima laid out like the folded q rows, broadcast over lanes
    m_p = jnp.pad(m, ((0, 0), (0, 0), (0, Tp - T))).reshape(B, Hkv, GT)
    m_p = jnp.broadcast_to(m_p[..., None], (B, Hkv, GT, LANES))
    scalars = jnp.stack([start, cursor], axis=1).astype(jnp.int32)

    kern = functools.partial(_score_kernel, Tp=Tp, T=T, n_local=n_local,
                             tile=tile, G=G, scale=1.0 / (D ** 0.5))
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(B, Hkv, n_tiles),
            in_specs=[
                pl.BlockSpec((1, 1, GT, D), lambda b, h, t, s: (b, h, 0, 0)),
                pl.BlockSpec((1, 1, 1, tile, D),
                             lambda b, h, t, s: (b, h, t, 0, 0)),
                pl.BlockSpec((1, 1, GT, LANES),
                             lambda b, h, t, s: (b, h, 0, 0)),
            ],
            out_specs=pl.BlockSpec((1, 1, G, tile),
                                   lambda b, h, t, s: (b, h, 0, t)),
            scratch_shapes=[],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Cp), jnp.float32),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary")),
        interpret=interpret,
    )(scalars, q_p, k_t, m_p)
    return out[:, :, :, :C].reshape(B, Hq, C)


def decode_score_jnp(q_rot: jax.Array, k: jax.Array, m: jax.Array,
                     start: jax.Array, cursor: jax.Array, *,
                     n_local: int) -> jax.Array:
    """jnp reference of decode_score (tests + non-TPU backends)."""
    B, Hq, T, D = q_rot.shape
    Hkv, C = k.shape[1], k.shape[2]
    G = Hq // Hkv
    qg = q_rot.reshape(B, Hkv, G, T, D)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k,
                   preferred_element_type=jnp.float32)
    s = s.reshape(B, Hq, T, C) * (D ** -0.5)
    slot = jnp.arange(C, dtype=jnp.int32)[None, None, :]
    q_slot = (start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :])[:, :, None]
    dist = q_slot - slot
    mask = ((dist >= 0) & (dist < n_local)
            & (slot < cursor[:, None, None]))[:, None]
    p = jnp.where(mask, jnp.exp(s - m[..., None]), 0.0)
    return p.sum(axis=2)
