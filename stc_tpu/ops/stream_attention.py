"""Pallas fused paged streaming attention — the framework's #1 kernel.

TPU-native equivalent of the reference's Triton multi-stage flash attention
(model/attention/dot_production_attention/triton_impl.py:25-336) crossed with
its paged KV machinery (kv_cache_manager.py MemoryUnit/CudaCache):
one fused kernel computes the encode-path joint softmax over three KV groups

    [init tokens @ local window rope | window pages | init tokens @ one-angle]

with a single online-softmax accumulator carried across KV tiles in VMEM
(the Triton kernel's cross-call m/l/acc state becomes per-core scratch), and

- the window pages are read DIRECTLY from the append-only HBM page store via
  a scalar-prefetch-driven BlockSpec index map (the store is append-only, so
  the window is a contiguous page range — Pallas double-buffers the page
  tile loads automatically; the XLA gather this replaces ran at ~1/10th of
  copy bandwidth),
- RoPE fused into the K-tile consumption (cos/sin tables are precomputed once
  per step and shared by all layers; keys stay unrotated in HBM),
- masks computed from affine position arithmetic in-kernel (page p, offset o
  has position n_init + p*S + o) — nothing mask-shaped ever touches HBM,
- GQA folded into the q rows: each kv-head program processes G*T query rows.

Numerics follow the flash-attention playbook: fp32 m/l/acc, bf16 matmuls with
fp32 accumulation, masked probabilities zeroed post-exp.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

NEG = -1e30
LANES = 128
# max G*TQ query rows per grid step: bounds the fp32 (rows x tile) score
# block + m/l/acc scratch inside scoped VMEM (tests shrink it to force
# multi-tile coverage at small shapes)
QROWS_MAX = 2048


def _round_up(x, m):
    return -(-x // m) * m


def pages_per_tile(S: int) -> int:
    """Power-of-two pages per KV tile, keeping the tile near 512 keys.

    Must divide the (8-aligned) window page count from
    engine.n_window_pages."""
    return next((d for d in (8, 4, 2, 1) if d * S <= 512), 1)


def _rot_half(x):
    a, b = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-b, a], axis=-1)


def _unpack_nibbles(raw):
    """uint8 (rows, Dp) -> f32 (rows, 2*Dp), split-plane two's-complement
    nibbles (engine._pack_int4 layout: byte j = dims j | j+Dp<<4).  The
    concat is along lanes — no interleave, VMEM-friendly."""
    p32 = raw.astype(jnp.int32)
    lo = p32 & 0x0F
    hi = (p32 >> 4) & 0x0F
    lo = jnp.where(lo > 7, lo - 16, lo)
    hi = jnp.where(hi > 7, hi - 16, hi)
    return jnp.concatenate([lo, hi], axis=-1).astype(jnp.float32)


def _kernel(scal_ref,                       # (B, 5) int32 scalar prefetch
            q_rot_ref, q_one_ref,           # (1, 1, G, TQ, D) query tile
            k_pages_ref, v_pages_ref,       # (1, 1, ppt, S, D) window tile
            *rest,                          # [k/v scale tiles if quantized,]
                                            # cos, sin, k_init, v_init,
                                            # k_init_raw, o_ref, scratch
            TQ, n_local, n_init, ppt, S, n_tiles, scale, quantized=False,
            qbits=8):
    if quantized:
        (k_scale_ref, v_scale_ref, cos_ref, sin_ref, k_init_ref, v_init_ref,
         k_init_raw_ref, o_ref, m_scr, l_scr, acc_scr) = rest
    else:
        k_scale_ref = v_scale_ref = None
        (cos_ref, sin_ref, k_init_ref, v_init_ref, k_init_raw_ref, o_ref,
         m_scr, l_scr, acc_scr) = rest
    b = pl.program_id(0)
    qt_idx = pl.program_id(2)               # query tile (TQ tokens x G groups)
    t_idx = pl.program_id(3)

    L = scal_ref[b, 0]
    start_page = scal_ref[b, 1] * ppt   # LOCAL store page of the first tile
    total = scal_ref[b, 2]              # ABSOLUTE page count (incl. evicted)
    init_active = scal_ref[b, 3]
    offset = scal_ref[b, 4]             # host-evicted pages: abs = local + off

    G = q_rot_ref.shape[2]
    GT = G * TQ
    D = q_rot_ref.shape[4]
    tile = ppt * S
    q_off = L + qt_idx * TQ             # first query position of this tile

    @pl.when(t_idx == 0)
    def _init():
        m_scr[...] = jnp.full_like(m_scr, -jnp.inf)
        l_scr[...] = jnp.zeros_like(l_scr)
        acc_scr[...] = jnp.zeros_like(acc_scr)

    row_tok = jax.lax.broadcasted_iota(jnp.int32, (GT, tile), 0) % TQ
    q_pos = q_off + row_tok

    def online_update(s, mask, v):
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
            p.astype(v.dtype), v, preferred_element_type=jnp.float32)

    # ---- window tile: pages are consecutive, positions are affine ----
    # tile-level skip: a tile contributes only if it holds at least one
    # written page that falls inside the sliding window — early in a stream
    # most of the (capacity-sized) window is empty and whole tiles skip
    # (the flash-attention tile-skip trick applied to the streaming window)
    p0 = start_page + t_idx * ppt       # local store page of this tile
    abs_p0 = p0 + offset                # absolute page index (positions)
    pos_min = n_init + abs_p0 * S
    pos_max = n_init + (abs_p0 + ppt) * S - 1
    tile_live = ((abs_p0 < total)                     # at least one real page
                 & ((q_off + TQ - 1) - pos_min >= 0)  # not entirely future
                 & (q_off - pos_max < n_local))       # not entirely expired

    @pl.when(tile_live)
    def _window_tile():
        col = jax.lax.broadcasted_iota(jnp.int32, (GT, tile), 1)
        page_abs = abs_p0 + col // S
        pos = n_init + page_abs * S + col % S
        dist = q_pos - pos
        mask = (dist >= 0) & (dist < n_local) & (page_abs < total)

        Dk = k_pages_ref.shape[-1]  # D (bf16/int8) or D//2 (packed int4)
        k_raw = k_pages_ref[0, 0].reshape(tile, Dk)
        if quantized and qbits == 4:
            # packed-int4 tiles: quarter-width HBM read, nibble unpack +
            # dequant in VMEM (split-plane: unpack is a lane concat)
            k = _unpack_nibbles(k_raw)                       # (tile, D)
        else:
            k = k_raw.astype(jnp.float32)
        if quantized:
            # dequant in VMEM (per-page scales broadcast over the S rows)
            ks = k_scale_ref[0, 0, 0]                        # (ppt, D) f32
            k = k * jnp.broadcast_to(ks[:, None, :],
                                     (ppt, S, D)).reshape(tile, D)
        cos = cos_ref[0]
        sin = sin_ref[0]
        k_rot = (k * cos + _rot_half(k) * sin).astype(jnp.bfloat16)
        q = q_rot_ref[0, 0].reshape(GT, D).astype(jnp.bfloat16)
        s = jax.lax.dot_general(q, k_rot, (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32)
        Dv = v_pages_ref.shape[-1]
        v_raw = v_pages_ref[0, 0].reshape(tile, Dv)
        if quantized and qbits == 4:
            v_tile = _unpack_nibbles(v_raw)                  # (tile, D)
            vs = v_scale_ref[0, 0, 0]                        # (ppt, D) f32
            v_tile = (v_tile * jnp.broadcast_to(
                vs[:, None, :], (ppt, S, D)).reshape(tile, D)
                ).astype(jnp.bfloat16)
        elif quantized:
            vs = v_scale_ref[0, 0, 0]                        # (ppt, Dv) f32
            v_tile = (v_raw.astype(jnp.float32)
                      * jnp.broadcast_to(vs[:, None, :],
                                         (ppt, S, Dv)).reshape(tile, Dv)
                      ).astype(jnp.bfloat16)
        else:
            v_tile = v_raw
        online_update(s, mask, v_tile)

    # ---- epilogue on the last window tile: init stages + finalize ----
    @pl.when(t_idx == n_tiles - 1)
    def _epilogue():
        NI = k_init_ref.shape[2]
        jcol = jax.lax.broadcasted_iota(jnp.int32, (GT, NI), 1)
        q_pos_i = (q_off
                   + jax.lax.broadcasted_iota(jnp.int32, (GT, NI), 0) % TQ)

        # init tokens under the local window (true positions 0..n_init-1)
        d_i = q_pos_i - jcol
        mask_i = (d_i >= 0) & (d_i < n_local) & (jcol < n_init)
        k_i = k_init_ref[0, 0].astype(jnp.bfloat16)
        s_i = jax.lax.dot_general(
            q_rot_ref[0, 0].reshape(GT, D).astype(jnp.bfloat16), k_i,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        online_update(s_i, mask_i, v_init_ref[0, 0])

        # init tokens in the far field (one-angle queries, unrotated keys)
        mask_f = (jcol < n_init) & (init_active > 0)
        k_f = k_init_raw_ref[0, 0].astype(jnp.bfloat16)
        s_f = jax.lax.dot_general(
            q_one_ref[0, 0].reshape(GT, D).astype(jnp.bfloat16), k_f,
            (((1,), (1,)), ((), ())), preferred_element_type=jnp.float32)
        online_update(s_f, mask_f, v_init_ref[0, 0])

        l = l_scr[...][:, :1]
        l_inv = jnp.where(l == 0.0, 1.0, 1.0 / l)
        o_ref[0, 0] = (acc_scr[...] * l_inv).reshape(G, TQ, D).astype(
            o_ref.dtype)


@functools.partial(jax.jit, static_argnames=(
    "T", "n_local", "n_init", "interpret"))
def stream_attention(q_rot, q_one, block_k, block_v, cos_cover, sin_cover,
                     k_init_rot, v_init, k_init_raw, scalars,
                     k_scales=None, v_scales=None,
                     *, T: int, n_local: int, n_init: int,
                     interpret: bool = False):
    """Fused paged encode-path attention.

    q_rot/q_one: (B, Hq, T, D) pre-rotated queries.
    block_k/block_v: (B, Hkv, Nb, S, D) UNROTATED append-only page store;
      the kernel streams the window's contiguous page tiles directly from it.
      With kv_quant the store is int8 (or uint8 packed int4 nibbles with
      D//2 bytes) and k_scales/v_scales ((B, Hkv, Nb, D) f32) ride along —
      page tiles cross HBM->VMEM at half (quarter) width and
      unpack/dequantize in-kernel.
    cos_cover/sin_cover: (B, Lc, D) fp32 rope tables for the page COVER
      (n_read_tiles aligned tiles starting at scalars[:,1]*ppt).
    k_init_rot/v_init/k_init_raw: (B, Hkv, n_init, D).
    scalars: (B, 5) int32 [L, start_tile (LOCAL store tile), total_pages
      (ABSOLUTE incl. host-evicted), init_active, page_offset].
    Returns (B, Hq, T, D).
    """
    B, Hq, _, D = q_rot.shape
    Hkv = block_k.shape[1]
    Nb = block_k.shape[2]
    S = block_k.shape[3]
    G = Hq // Hkv
    dtype = q_rot.dtype
    assert T % S == 0, (T, S)  # exc appends carry T/S pages
    Dk = block_k.shape[-1]     # D, or D//2 for packed-int4 pages
    qbits = 4 if block_k.dtype == jnp.uint8 else 8
    if qbits == 4:
        assert Dk * 2 == D and k_scales is not None, (Dk, D)

    Tp = _round_up(T, 8)
    NI = _round_up(n_init, 8)
    ppt = pages_per_tile(S)
    tile = ppt * S
    assert Nb % ppt == 0, (Nb, ppt)
    Lc = cos_cover.shape[1]
    assert Lc % tile == 0, (Lc, tile)
    n_tiles = Lc // tile
    NT = Nb // ppt

    # query tiling: large exc appends (multi-frame chunks) split the G*Tp
    # query rows across grid steps so the fp32 (rows x tile) score block and
    # scratch stay inside scoped VMEM
    n_qt = 1
    while (G * (Tp // n_qt) > QROWS_MAX or Tp % n_qt != 0
           or (Tp // n_qt) % 8 != 0):
        n_qt += 1
    TQ = Tp // n_qt
    GTQ = G * TQ

    def pad_q(qx):
        qx = jnp.pad(qx, ((0, 0), (0, 0), (0, Tp - T), (0, 0)))
        return qx.reshape(B, Hkv, G, Tp, D)

    def pad_init(x):
        return jnp.pad(x, ((0, 0), (0, 0), (0, NI - n_init), (0, 0)))

    # page store viewed as aligned tiles: (B, Hkv, NT, tile==ppt*S, Dk)
    k_tiled = block_k.reshape(B, Hkv, NT, tile, Dk)
    v_tiled = block_v.reshape(B, Hkv, NT, tile, Dk)
    quantized = k_scales is not None
    if quantized:
        ks_tiled = k_scales.reshape(B, Hkv, NT, ppt, D)
        vs_tiled = v_scales.reshape(B, Hkv, NT, ppt, D)

    def page_map(b, h, qt, t, s):
        return (b, h, jnp.minimum(s[b, 1] + t, NT - 1), 0, 0)

    def q_map(b, h, qt, t, s):
        return (b, h, 0, qt, 0)

    def bh_map(b, h, qt, t, s):
        return (b, h, 0, 0)

    grid = (B, Hkv, n_qt, n_tiles)
    kern = functools.partial(
        _kernel, TQ=TQ, n_local=n_local, n_init=n_init, ppt=ppt, S=S,
        n_tiles=n_tiles, scale=1.0 / (D ** 0.5), quantized=quantized,
        qbits=qbits)

    scale_specs = ([pl.BlockSpec((1, 1, 1, ppt, D), page_map),
                    pl.BlockSpec((1, 1, 1, ppt, D), page_map)]
                   if quantized else [])
    scale_ops = (ks_tiled, vs_tiled) if quantized else ()
    out = pl.pallas_call(
        kern,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=grid,
            in_specs=[
                pl.BlockSpec((1, 1, G, TQ, D), q_map),
                pl.BlockSpec((1, 1, G, TQ, D), q_map),
                pl.BlockSpec((1, 1, 1, tile, Dk), page_map),
                pl.BlockSpec((1, 1, 1, tile, Dk), page_map),
                *scale_specs,
                pl.BlockSpec((1, tile, D), lambda b, h, qt, t, s: (b, t, 0)),
                pl.BlockSpec((1, tile, D), lambda b, h, qt, t, s: (b, t, 0)),
                pl.BlockSpec((1, 1, NI, D), bh_map),
                pl.BlockSpec((1, 1, NI, D), bh_map),
                pl.BlockSpec((1, 1, NI, D), bh_map),
            ],
            out_specs=pl.BlockSpec((1, 1, G, TQ, D), q_map),
            scratch_shapes=[
                pltpu.VMEM((GTQ, LANES), jnp.float32),
                pltpu.VMEM((GTQ, LANES), jnp.float32),
                pltpu.VMEM((GTQ, D), jnp.float32),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((B, Hkv, G, Tp, D), dtype),
        compiler_params=pltpu.CompilerParams(
            dimension_semantics=("parallel", "parallel", "arbitrary",
                                 "arbitrary")),
        interpret=interpret,
    )(scalars, pad_q(q_rot), pad_q(q_one), k_tiled, v_tiled, *scale_ops,
      cos_cover, sin_cover,
      pad_init(k_init_rot), pad_init(v_init), pad_init(k_init_raw))

    out = out[:, :, :, :T]
    return out.reshape(B, Hq, T, D)
