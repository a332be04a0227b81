"""Qwen2 decoder with streaming ReKV attention — functional JAX implementation.

TPU-native replacement for the reference's monkey-patched HF model
(model/patch.py + model/attention/rekv_attention.py): instead of rebinding
forwards at runtime, the streaming attention is a first-class layer and the
whole decoder is a `lax.scan` over stacked per-layer parameters and per-layer
StreamKV/DecodeKV states — one compiled layer body regardless of depth.

Three jit-able entry points mirror the reference call graph:
  encode_step       — streaming prefill of one exc block (ContextManager.append path)
  qa_retrieve_step  — question forward with per-layer top-k retrieval
                      (rekv_attention.py retrieval branch; question KV are NOT
                      kept, matching updata_kv_cache=False semantics)
  decode_step       — prompt prefill / token decode over the DecodeKV cache
                      (rekv_attention.py sliding-window branch)

Weights are plain pytrees (dict of arrays, layers stacked on axis 0) so the
HF->JAX converter in convert.py stays trivial and shardings can be attached
with jax.sharding.NamedSharding at load time.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.engine import (
    append_stream, decode_attend, decode_write, init_decode_kv,
    init_stream_kv, retrieve_blocks,
)
from stc_tpu.kvcache.state import DecodeKV, StreamKV


def _tree_index(tree, i):
    """Slice layer i out of a layer-stacked pytree (leaves (L, ...))."""
    return jax.tree.map(
        lambda x: jax.lax.dynamic_index_in_dim(x, i, 0, keepdims=False),
        tree)


def _tree_update(tree, upd, i):
    """Write layer i's update back into the layer-stacked pytree.

    The update is cast to the state leaf's dtype: the stacked state's dtype
    is declared at init (build_session's state_dtype) and a body computing
    in a wider dtype (f32 params over a bf16 store) must round back into
    the store, not silently widen it (the old xs->ys scan re-stacked the
    body outputs and so adopted the BODY's dtype — a store-dtype leak)."""
    return jax.tree.map(
        lambda s, u: jax.lax.dynamic_update_index_in_dim(
            s, u.astype(s.dtype) if hasattr(u, "astype") else u, i, 0),
        tree, upd)


def scan_layers(body, h, layer_params, rw_state, ro_states=(),
                unroll: bool = False):
    """lax.scan over the stacked layer axis with the layer STATE IN THE
    CARRY (read via dynamic-slice, written back via dynamic-update-slice)
    instead of the xs->ys formulation.

    Why: scanning state through xs and restacking the per-layer outputs as
    ys makes XLA materialize a SECOND full-size state buffer (plus copies —
    measured three full page-store copies per encode step, ~4.5 GB at 0.5b
    shapes, the dominant term in ROOFLINE.json's bytes_accessed).  With the
    state in the carry, the scan-carried buffer is updated in place on TPU
    (the standard KV-cache pattern), so a step's state traffic shrinks to
    one read + one write of the touched layer slice.

    body: (h, (lp, *ro_layer, rw_layer)) -> (h, rw_layer) — the exact
    signature the xs-style scans used, so the shared layer bodies
    (qa_retrieve_layer_body, decode_layer_body, and the pipeline-parallel
    stages) are unchanged.  ro_states: read-only layer-stacked trees
    (sliced per layer, never written).  Returns (h, rw_state).

    unroll=True emits the L layer bodies as straight-line HLO instead of a
    while loop (static python loop, static slicing).  Use when the scan
    shares a program with ANOTHER loop that touches the same stacked state:
    each while loop makes XLA's layout assignment pick one "loop layout"
    for everything in its carry/captures, and two loops can pick
    DIFFERENT layouts for the same store, materializing full-store
    relayout copies between them (the fused serve tick paid ~6 copies
    ~9 GB this way — see docs/serving.md).  Straight-line bodies read the
    store in whatever layout its producer chose, no copies.
    """
    L = jax.tree.leaves(layer_params)[0].shape[0]

    if unroll:
        for i in range(L):
            lp = jax.tree.map(lambda x: x[i], layer_params)
            ro_l = tuple(jax.tree.map(lambda x: x[i], t) for t in ro_states)
            rw_l = jax.tree.map(lambda x: x[i], rw_state)
            h, rw_l = body(h, (lp, *ro_l, rw_l))
            rw_state = jax.tree.map(
                lambda s, u: s.at[i].set(u.astype(s.dtype)
                                         if hasattr(u, "astype") else u),
                rw_state, rw_l)
        return h, rw_state

    def wrapped(carry, xs):
        h, rw = carry
        i, lp = xs
        ro_l = tuple(_tree_index(t, i) for t in ro_states)
        h, rw_l = body(h, (lp, *ro_l, _tree_index(rw, i)))
        return (h, _tree_update(rw, rw_l, i)), None

    (h, rw_state), _ = jax.lax.scan(
        wrapped, (h, rw_state),
        (jnp.arange(L, dtype=jnp.int32), layer_params))
    return h, rw_state


@dataclasses.dataclass(frozen=True)
class Qwen2Config:
    vocab_size: int = 151936
    hidden_size: int = 3584
    num_layers: int = 28
    num_heads: int = 28
    num_kv_heads: int = 4
    head_dim: int = 128
    intermediate_size: int = 18944
    rope_base: float = 1000000.0
    rms_eps: float = 1e-6
    tie_embeddings: bool = False
    qkv_bias: bool = True   # Qwen2 yes; Llama/Mistral no (zeros are a no-op)

    @classmethod
    def tiny(cls, vocab=256):
        """Small config for tests."""
        return cls(vocab_size=vocab, hidden_size=64, num_layers=2,
                   num_heads=4, num_kv_heads=2, head_dim=16,
                   intermediate_size=128, rope_base=10000.0,
                   tie_embeddings=False)


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(cfg: Qwen2Config, key, dtype=jnp.float32) -> Dict[str, Any]:
    """Random init (tests / benches). Real weights come from convert.py."""
    E, L = cfg.hidden_size, cfg.num_layers
    Hq, Hkv, D, F = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim, cfg.intermediate_size
    ks = jax.random.split(key, 12)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    params = {
        "embed": rnd(ks[0], (cfg.vocab_size, E)),
        "layers": {
            "ln1": jnp.ones((L, E), dtype),
            "ln2": jnp.ones((L, E), dtype),
            "wq": rnd(ks[1], (L, E, Hq * D)),
            "bq": jnp.zeros((L, Hq * D), dtype),
            "wk": rnd(ks[2], (L, E, Hkv * D)),
            "bk": jnp.zeros((L, Hkv * D), dtype),
            "wv": rnd(ks[3], (L, E, Hkv * D)),
            "bv": jnp.zeros((L, Hkv * D), dtype),
            "wo": rnd(ks[4], (L, Hq * D, E)),
            "w_gate": rnd(ks[5], (L, E, F)),
            "w_up": rnd(ks[6], (L, E, F)),
            "w_down": rnd(ks[7], (L, F, E)),
        },
        "norm_f": jnp.ones((E,), dtype),
        "lm_head": rnd(ks[8], (E, cfg.vocab_size)),
    }
    return params


def init_stream_state(cfg: Qwen2Config, rekv: ReKVConfig, batch: int,
                      dtype=jnp.bfloat16) -> StreamKV:
    """Per-layer StreamKV stacked on a leading layer axis."""
    one = init_stream_kv(rekv, batch, cfg.num_kv_heads, cfg.head_dim, dtype)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_layers,) + x.shape).copy(), one)


def init_decode_state(cfg: Qwen2Config, rekv: ReKVConfig, batch: int,
                      dtype=jnp.bfloat16) -> DecodeKV:
    one = init_decode_kv(rekv, batch, cfg.num_kv_heads, cfg.head_dim, dtype)
    return jax.tree.map(
        lambda x: jnp.broadcast_to(x, (cfg.num_layers,) + x.shape).copy(), one)


# ---------------------------------------------------------------------------
# Building blocks
# ---------------------------------------------------------------------------

def rms_norm(x: jax.Array, w: jax.Array, eps: float) -> jax.Array:
    xf = x.astype(jnp.float32)
    var = jnp.mean(xf * xf, axis=-1, keepdims=True)
    return (xf * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w


def _mm(h, lp, name):
    """h @ lp[name], serving int8 weight-only quantization transparently:
    quantize_params_int8 stores `<name>_q` (int8) + `<name>_s` (per-output
    -channel f32 scales); the int8->bf16 convert fuses into the matmul's
    operand read on TPU, so HBM traffic is the int8 bytes, and the scale is
    one row-vector multiply on the output.

    Sub-channel variant: `<name>_gs` ((..., in/G, out) f32) scales groups of
    G input rows.  The scale varies along the contraction dim, so it cannot
    move past the matmul — instead the dequant (convert + per-group row
    scale) fuses into the weight-operand read; HBM traffic stays the int8
    bytes + the small scale tensor, and the MXU still runs a single bf16
    matmul."""
    if name + "_gs" in lp:
        w, s = lp[name + "_q"], lp[name + "_gs"]
        Gn = s.shape[-2]
        shp = w.shape
        wi = w.reshape(shp[:-2] + (Gn, shp[-2] // Gn, shp[-1]))
        wd = (wi.astype(jnp.float32)
              * s[..., :, None, :]).astype(h.dtype).reshape(shp)
        return h @ wd
    if name + "_q" in lp:
        w = lp[name + "_q"]
        out = h @ w.astype(h.dtype)
        return out * lp[name + "_s"].astype(h.dtype)
    return h @ lp[name]


def _qkv(lp, h, cfg: Qwen2Config):
    B, T, E = h.shape
    Hq, Hkv, D = cfg.num_heads, cfg.num_kv_heads, cfg.head_dim
    if "wqkv" in lp or "wqkv_q" in lp:  # fused projection — one matmul
        qkv = _mm(h, lp, "wqkv") + lp["bqkv"]
        q, k, v = jnp.split(qkv, [Hq * D, (Hq + Hkv) * D], axis=-1)
    else:
        q = h @ lp["wq"] + lp["bq"]
        k = h @ lp["wk"] + lp["bk"]
        v = h @ lp["wv"] + lp["bv"]
    q = q.reshape(B, T, Hq, D).transpose(0, 2, 1, 3)
    k = k.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
    v = v.reshape(B, T, Hkv, D).transpose(0, 2, 1, 3)
    return q, k, v


def _proj_out(lp, o, cfg: Qwen2Config):
    B, Hq, T, D = o.shape
    return _mm(o.transpose(0, 2, 1, 3).reshape(B, T, Hq * D), lp, "wo")


def _mlp(lp, h, cfg: Qwen2Config):
    if "w_gateup" in lp or "w_gateup_q" in lp:  # fused — one matmul
        gu = _mm(h, lp, "w_gateup")
        g, u = jnp.split(gu, 2, axis=-1)
        return _mm(jax.nn.silu(g) * u, lp, "w_down")
    return (jax.nn.silu(h @ lp["w_gate"]) * (h @ lp["w_up"])) @ lp["w_down"]


def param_dtype(params):
    """Activation/compute dtype of a (possibly quantized) param tree."""
    return params["norm_f"].dtype


def quantize_params_int8(params, group_size: int = 0):
    """Weight-only int8 quantization: per-output-channel symmetric scales.

    Halves the LM's HBM footprint and weights-read floor vs bf16 (full-depth
    7B fits a 16 GB chip); the int8->bf16 convert fuses into the matmul
    operand read, so the MXU still runs bf16 x bf16 with fp32 accumulation
    (exact per-channel rescale applied to the output row vector).  The
    reference has no quantized path — this is a TPU-serving addition.
    Expects fused params (fuse_params); norms, biases, and the small
    projector stay in the input dtype.  Idempotent.

    group_size > 0 switches to SUB-CHANNEL scales: one f32 scale per
    (group of group_size input rows, output channel), stored as
    `<name>_gs` (..., in/G, out).  An outlier input channel then only
    coarsens the quantization grid of its own group instead of the whole
    column, recovering most of the per-channel logit drift for ~1/G extra
    scale bytes (G=128 divides every llava-ov contraction dim).  Dequant
    fuses into the weight-operand read (see _mm).

    Multi-chip: parallel/sharding.py maps the quantized names
    (*_q/*_s/*_gs) to the same tp PartitionSpecs as their bf16
    counterparts; sharded quantized serving is exercised by
    tests/test_sharding.py.
    """
    def q(w):
        # w: (..., in, out) -> int8 (..., in, out) + f32 scales (..., out)
        a = jnp.max(jnp.abs(w.astype(jnp.float32)), axis=-2, keepdims=True)
        s = jnp.maximum(a, 1e-8) / 127.0
        wq = jnp.round(w.astype(jnp.float32) / s).astype(jnp.int8)
        return wq, s.squeeze(-2)

    def qg(w):
        # w: (..., in, out) -> int8 + f32 scales (..., in/G, out)
        shp = w.shape
        assert shp[-2] % group_size == 0, (shp, group_size)
        wi = w.astype(jnp.float32).reshape(
            shp[:-2] + (shp[-2] // group_size, group_size, shp[-1]))
        a = jnp.max(jnp.abs(wi), axis=-2, keepdims=True)
        s = jnp.maximum(a, 1e-8) / 127.0
        wq = jnp.round(wi / s).astype(jnp.int8).reshape(shp)
        return wq, s.squeeze(-2)

    lp = dict(params["layers"])
    assert "wqkv" in lp or "wqkv_q" in lp, "quantize after fuse_params"
    if "wqkv_q" in lp:
        return params
    proj = qg if group_size else q
    skey = "_gs" if group_size else "_s"
    for name in ("wqkv", "wo", "w_gateup", "w_down"):
        lp[name + "_q"], lp[name + skey] = proj(lp[name])
        del lp[name]
    new = {**params, "layers": lp}
    # embedding rows: per-row scales, dequant after the gather
    e = params["embed"].astype(jnp.float32)
    a = jnp.maximum(jnp.max(jnp.abs(e), axis=-1, keepdims=True), 1e-8)
    new["embed_q"] = jnp.round(e / (a / 127.0)).astype(jnp.int8)
    new["embed_s"] = (a[:, 0] / 127.0)
    del new["embed"]
    new["lm_head_q"], new["lm_head" + skey] = proj(params["lm_head"])
    del new["lm_head"]
    return new


def fuse_params(params):
    """Precompute fused qkv / gate-up projection weights (fewer ops per
    layer — this platform taxes each fused op ~40-90us, PLATFORM_NOTES.md).
    Converters and tests keep the unfused layout; sessions fuse at build."""
    lp = dict(params["layers"])
    if "wqkv" in lp or "wqkv_q" in lp:
        return params  # already fused (and possibly quantized)
    lp["wqkv"] = jnp.concatenate([lp["wq"], lp["wk"], lp["wv"]], axis=-1)
    lp["bqkv"] = jnp.concatenate([lp["bq"], lp["bk"], lp["bv"]], axis=-1)
    lp["w_gateup"] = jnp.concatenate([lp["w_gate"], lp["w_up"]], axis=-1)
    for k in ("wq", "wk", "wv", "bq", "bk", "bv", "w_gate", "w_up"):
        del lp[k]
    return {**params, "layers": lp}


# ---------------------------------------------------------------------------
# Streaming encode (video / init-prompt prefill)
# ---------------------------------------------------------------------------

def encode_step(params, cfg: Qwen2Config, rekv: ReKVConfig,
                kvs: StreamKV, embeds: jax.Array, *, is_init: bool,
                attn_backend: str = "jnp",
                win_pages: int | None = None,
                active: jax.Array | None = None) -> Tuple[jax.Array,
                                                          StreamKV]:
    """One streaming append of T tokens through all layers.

    embeds: (B, T, E).  Returns (final hidden states, new stacked StreamKV).
    Mirrors Abstract_ReKV._encode_video_chunk's LM forward
    (abstract_rekv.py:38-43) with past_key_values == the streaming cache.
    active: optional (B,) bool RAGGED-ingest mask — inactive streams'
    cache state is untouched (see engine.append_stream).
    """
    rc = None
    if not is_init:
        # position tables/masks are identical for every layer — build once
        from stc_tpu.kvcache.engine import make_rope_cache
        rc = make_rope_cache(kvs.length[0], kvs.num_blocks[0],
                             embeds.shape[1], rekv, cfg.head_dim,
                             cfg.rope_base, n_pages=win_pages,
                             page_offset=kvs.page_offset[0])

    def body(h, xs):
        lp, kv = xs
        hn = rms_norm(h, lp["ln1"], cfg.rms_eps)
        q, k, v = _qkv(lp, hn, cfg)
        o, kv = append_stream(kv, q, k, v, rekv, is_init=is_init,
                              rope_base=cfg.rope_base, rope_cache=rc,
                              backend=attn_backend, active=active)
        h = h + _proj_out(lp, o, cfg)
        hn = rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + _mlp(lp, hn, cfg)
        return h, kv

    h, kvs = scan_layers(body, embeds, params["layers"], kvs)
    return h, kvs


# ---------------------------------------------------------------------------
# Question answering: retrieval forward + prompt prefill + decode
# ---------------------------------------------------------------------------

def _raw_rows(rekv: ReKVConfig) -> int:
    """Prefix rows decode_write stores UNROTATED: the init tokens, when the
    complement-window init stage can engage (decode_cap > n_local).  The
    stage then scores the raw init keys exactly as the reference does
    (rekv_attention.py:408) — inverse-rotating bf16-rounded keys would
    double-round.  Standard configs (decode_cap <= n_local) return 0 and
    compile the unchanged path."""
    return rekv.n_init if rekv.decode_cap > rekv.n_local else 0


def qa_retrieve_layer_body(cfg: Qwen2Config, rekv: ReKVConfig,
                           q_valid: jax.Array | None,
                           retrieved_indices: jax.Array | None, T: int):
    """The per-layer scan body of the retrieval forward — shared by
    qa_retrieve_step and the pipeline-parallel QA (parallel/pipeline.py),
    which runs it over each stage's LOCAL layer slice.
    (h, (layer_params, kv_l, dkv_l)) -> (h, dkv_l)."""
    def body(h, xs):
        lp, kv, dkv = xs
        hn = rms_norm(h, lp["ln1"], cfg.rms_eps)
        q, k, v = _qkv(lp, hn, cfg)
        ret_k, ret_v, _, valid_len = retrieve_blocks(
            kv, q, rekv, q_valid, block_indices=retrieved_indices)
        if rekv.retrieved_kv_compression != "none":
            from stc_tpu.kvcache.engine import compress_retrieved
            ret_k, ret_v, valid_len = compress_retrieved(
                kv, rekv, ret_k, ret_v, valid_len)
        dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                           rope_base=cfg.rope_base, raw_rows=_raw_rows(rekv))
        # write question KV for this forward only; cursor reset afterwards
        dkv_q = decode_write(dkv, k, v, T, rope_base=cfg.rope_base)
        q_slots = valid_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        o = decode_attend(q, q_slots, dkv_q, rekv, rope_base=cfg.rope_base)
        dkv = DecodeKV(k=dkv_q.k, v=dkv_q.v, cursor=valid_len)
        h = h + _proj_out(lp, o, cfg)
        hn = rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + _mlp(lp, hn, cfg)
        return h, dkv

    return body


def qa_retrieve_step(params, cfg: Qwen2Config, rekv: ReKVConfig,
                     kvs: StreamKV, dkvs: DecodeKV, embeds: jax.Array,
                     n_tokens: jax.Array | None = None,
                     retrieved_indices: jax.Array | None = None,
                     unroll_layers: bool = False) -> DecodeKV:
    """Question forward with per-layer retrieval; installs the retrieved
    prefix into the decode cache.

    The question's own KV participate in this forward's attention but are NOT
    kept in the cache, matching the reference's updata_kv_cache=False path
    (rekv_attention.py:363-386).  n_tokens: optional (B,) true question
    lengths when `embeds` is right-padded.
    """
    B, T, E = embeds.shape
    q_valid = None
    if n_tokens is not None:
        n_tokens = jnp.broadcast_to(jnp.asarray(n_tokens, jnp.int32), (B,))
        q_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < n_tokens[:, None]

    body = qa_retrieve_layer_body(cfg, rekv, q_valid, retrieved_indices, T)
    _, dkvs = scan_layers(body, embeds, params["layers"], dkvs,
                          ro_states=(kvs,), unroll=unroll_layers)
    return dkvs


def qa_retrieve_hosttier_step(params, cfg: Qwen2Config, rekv: ReKVConfig,
                              kvs: StreamKV, dkvs: DecodeKV,
                              embeds: jax.Array, n_tokens: jax.Array,
                              hp_k: jax.Array, hp_v: jax.Array,
                              hp_ids: jax.Array,
                              retrieved_indices: jax.Array | None = None):
    """Question forward with per-layer retrieval served from BOTH KV tiers.

    hp_k/hp_v: (L, B, Hkv, M, S, D) prefetched host pages per layer;
    hp_ids: (L, B, M) their ascending absolute ids (pad: int32 max).
    Same semantics as qa_retrieve_step once the speculative-prefetch loop
    converges (see engine.retrieve_blocks_hosttier).  Returns
    (dkvs, abs_idx (L, B, topk), exists, missing) — `missing` marks selected
    host pages absent from the table (the session fetches and re-dispatches).
    """
    from stc_tpu.kvcache.engine import retrieve_blocks_hosttier
    B, T, E = embeds.shape
    n_tokens = jnp.broadcast_to(jnp.asarray(n_tokens, jnp.int32), (B,))
    q_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < n_tokens[:, None]

    def body(h, xs):
        lp, kv, dkv, hk, hv, hi = xs
        hn = rms_norm(h, lp["ln1"], cfg.rms_eps)
        q, k, v = _qkv(lp, hn, cfg)
        ret_k, ret_v, _, valid_len, abs_idx, exists, missing = \
            retrieve_blocks_hosttier(kv, q, rekv, q_valid, hk, hv, hi,
                                     block_indices=retrieved_indices)
        if rekv.retrieved_kv_compression != "none":
            from stc_tpu.kvcache.engine import compress_retrieved
            ret_k, ret_v, valid_len = compress_retrieved(
                kv, rekv, ret_k, ret_v, valid_len)
        dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                           rope_base=cfg.rope_base, raw_rows=_raw_rows(rekv))
        dkv_q = decode_write(dkv, k, v, T, rope_base=cfg.rope_base)
        q_slots = valid_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        o = decode_attend(q, q_slots, dkv_q, rekv, rope_base=cfg.rope_base)
        dkv = DecodeKV(k=dkv_q.k, v=dkv_q.v, cursor=valid_len)
        h = h + _proj_out(lp, o, cfg)
        hn = rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + _mlp(lp, hn, cfg)
        return h, (dkv, abs_idx, exists, missing)

    # decode cache in the CARRY (in-place, see scan_layers); the small
    # per-layer index/flag arrays stay ys
    L = jax.tree.leaves(params["layers"])[0].shape[0]

    def wrapped(carry, xs):
        h, dkv_all = carry
        i, lp = xs
        kv_l, hk_l, hv_l, hi_l = (_tree_index(t, i)
                                  for t in (kvs, hp_k, hp_v, hp_ids))
        h, (dkv_l, abs_idx, exists, missing) = body(
            h, (lp, kv_l, _tree_index(dkv_all, i), hk_l, hv_l, hi_l))
        return (h, _tree_update(dkv_all, dkv_l, i)), (abs_idx, exists,
                                                      missing)

    (_, dkvs), (abs_idx, exists, missing) = jax.lax.scan(
        wrapped, (embeds, dkvs),
        (jnp.arange(L, dtype=jnp.int32), params["layers"]))
    return dkvs, abs_idx, exists, missing


def answer_question_hosttier(params, cfg: Qwen2Config, rekv: ReKVConfig,
                             kvs: StreamKV, q_ids: jax.Array,
                             q_len: jax.Array, p_ids: jax.Array,
                             p_len: jax.Array, stop_ids: jax.Array,
                             max_new_tokens: int, hp_kv, hp_ids,
                             retrieved_indices: jax.Array | None = None,
                             hist_ids=None, hist_len=None):
    """One-dispatch QA against the two-tier store: retrieval (device pages +
    prefetched host pages) + prompt prefill + greedy decode.  The prefill and
    decode stages are skipped (lax.cond) when any selected host page was
    missing from the table — the session fetches it and re-dispatches, so the
    wasted work per miss round is one question forward.

    hp_kv: (2, L, B, Hkv, M, S, D) — the session's device-resident prefetch
    table, stacked [k, v] so it rides in as ONE buffer (splitting outside jit
    would cost two extra dispatches on this platform).
    Returns (tokens, count, abs_idx (L, B, topk), missing).
    """
    B = q_ids.shape[0]
    dkvs = init_decode_state(cfg, rekv, B, kvs.init_k.dtype)
    dkvs, abs_idx, exists, missing = qa_retrieve_hosttier_step(
        params, cfg, rekv, kvs, dkvs, embed_tokens(params, q_ids),
        n_tokens=q_len, hp_k=hp_kv[0], hp_v=hp_kv[1], hp_ids=hp_ids,
        retrieved_indices=retrieved_indices)

    def answer(dkvs):
        logits, dkvs = decode_step(params, cfg, rekv, dkvs,
                                   embed_tokens(params, p_ids), p_len)
        last = jnp.take_along_axis(logits, (p_len - 1)[:, None, None],
                                   axis=1)[:, 0]
        ctx_ids = ctx_len = None
        if rekv.spec_decode_draft > 0:
            ctx_ids, ctx_len = build_spec_ctx(q_ids, q_len, p_ids, p_len,
                                              max_new_tokens, hist_ids,
                                              hist_len)
        tokens, count, _ = greedy_decode(params, cfg, rekv, dkvs, last,
                                         stop_ids, max_new_tokens,
                                         ctx_ids=ctx_ids, ctx_len=ctx_len)
        return tokens, count

    def skip(dkvs):
        return (jnp.zeros((B, max_new_tokens), jnp.int32),
                jnp.zeros((B,), jnp.int32))

    tokens, count = jax.lax.cond(jnp.any(missing), skip, answer, dkvs)
    return tokens, count, abs_idx, exists, missing


def decode_layer_body(cfg: Qwen2Config, rekv: ReKVConfig,
                      n_tokens: jax.Array, T: int):
    """The per-layer scan body of prompt prefill / token decode — shared by
    decode_step and the pipeline-parallel QA (parallel/pipeline.py).
    (h, (layer_params, dkv_l)) -> (h, dkv_l)."""
    def body(h, xs):
        lp, dkv = xs
        hn = rms_norm(h, lp["ln1"], cfg.rms_eps)
        q, k, v = _qkv(lp, hn, cfg)
        start = dkv.cursor
        dkv = decode_write(dkv, k, v, n_tokens, rope_base=cfg.rope_base)
        q_slots = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        o = decode_attend(q, q_slots, dkv, rekv, rope_base=cfg.rope_base)
        h = h + _proj_out(lp, o, cfg)
        hn = rms_norm(h, lp["ln2"], cfg.rms_eps)
        h = h + _mlp(lp, hn, cfg)
        return h, dkv

    return body


def decode_step(params, cfg: Qwen2Config, rekv: ReKVConfig,
                dkvs: DecodeKV, embeds: jax.Array, n_tokens: jax.Array
                ) -> Tuple[jax.Array, DecodeKV]:
    """Prompt prefill (T tokens, n_tokens (B,) valid) or 1-token decode.

    Returns (logits (B, T, V), new decode cache).  Sliding-window attention
    over the decode cache, reference rekv_attention.py:369-426.
    """
    B, T, E = embeds.shape
    n_tokens = jnp.broadcast_to(jnp.asarray(n_tokens, jnp.int32), (B,))

    body = decode_layer_body(cfg, rekv, n_tokens, T)
    h, dkvs = scan_layers(body, embeds, params["layers"], dkvs)
    h = rms_norm(h, params["norm_f"], cfg.rms_eps)
    logits = _lm_head(params, h)
    return logits, dkvs


def embed_tokens(params, ids: jax.Array) -> jax.Array:
    if "embed_q" in params:
        dt = param_dtype(params)
        rows = params["embed_q"][ids].astype(dt)
        return rows * params["embed_s"][ids][..., None].astype(dt)
    return params["embed"][ids]


def _lm_head(params, h: jax.Array) -> jax.Array:
    if "lm_head_gs" in params:
        w, s = params["lm_head_q"], params["lm_head_gs"]
        Gn, (E, V) = s.shape[0], w.shape
        wd = (w.reshape(Gn, E // Gn, V).astype(jnp.float32)
              * s[:, None, :]).astype(h.dtype).reshape(E, V)
        return h @ wd
    if "lm_head_q" in params:
        out = h @ params["lm_head_q"].astype(h.dtype)
        return out * params["lm_head_s"].astype(h.dtype)
    return h @ params["lm_head"]


def answer_question(params, cfg: Qwen2Config, rekv: ReKVConfig,
                    kvs: StreamKV, q_ids: jax.Array, q_len: jax.Array,
                    p_ids: jax.Array, p_len: jax.Array,
                    stop_ids: jax.Array, max_new_tokens: int,
                    hist_ids=None, hist_len=None,
                    unroll_retrieve: bool = False):
    """Whole QA in ONE dispatch: retrieval forward + prompt prefill + greedy
    decode (sequential host round trips cost ~30ms each on this platform).

    Returns (tokens (B, max_new_tokens), n_generated (B,)).
    """
    B = q_ids.shape[0]
    dkvs = init_decode_state(cfg, rekv, B, kvs.init_k.dtype)
    dkvs = qa_retrieve_step(params, cfg, rekv, kvs, dkvs,
                            embed_tokens(params, q_ids), n_tokens=q_len,
                            unroll_layers=unroll_retrieve)
    logits, dkvs = decode_step(params, cfg, rekv, dkvs,
                               embed_tokens(params, p_ids), p_len)
    last = jnp.take_along_axis(logits, (p_len - 1)[:, None, None],
                               axis=1)[:, 0]
    ctx_ids = ctx_len = None
    if rekv.spec_decode_draft > 0:
        ctx_ids, ctx_len = build_spec_ctx(q_ids, q_len, p_ids, p_len,
                                          max_new_tokens, hist_ids, hist_len)
    tokens, count, _ = greedy_decode(params, cfg, rekv, dkvs, last,
                                     stop_ids, max_new_tokens,
                                     ctx_ids=ctx_ids, ctx_len=ctx_len)
    return tokens, count


def serve_step(params, cfg: Qwen2Config, rekv: ReKVConfig, kvs: StreamKV,
               embeds: jax.Array, active: jax.Array, q_ids: jax.Array,
               q_len: jax.Array, p_ids: jax.Array, p_len: jax.Array,
               stop_ids: jax.Array, max_new_tokens: int,
               attn_backend: str = "jnp", win_pages: int | None = None,
               hist_ids=None, hist_len=None,
               unroll_retrieve: bool = True):
    """PHASE-HETEROGENEOUS serving tick in ONE dispatch: ragged-encode a
    chunk into the `active` streams, then answer per-stream questions over
    the post-encode state (retrieval + prefill + greedy decode).

    Streams may encode, answer, both (the answer sees this tick's chunk), or
    neither in the same dispatch — the continuous-batching shape the
    reference's one-session-per-process loop (abstract_rekv.py:38-87) cannot
    express.  Rows of streams without a real question are garbage the caller
    ignores; inactive streams' cache state is bit-identical (see
    engine.append_stream).  Returns (kvs, tokens, count).
    """
    _, kvs = encode_step(params, cfg, rekv, kvs, embeds, is_init=False,
                         attn_backend=attn_backend, win_pages=win_pages,
                         active=active)
    # the retrieval layer scan defaults to UNROLLED here: a second while
    # loop over the page store can make XLA assign it a different layout
    # than the encode loop's and pay full-store relayout copies
    # (docs/serving.md); the layout commit (runtime/session.py) removes
    # those copies either way — scripts/probe_serve_unroll.py measures
    # which formulation wins under committed layouts
    tokens, count = answer_question(params, cfg, rekv, kvs, q_ids, q_len,
                                    p_ids, p_len, stop_ids, max_new_tokens,
                                    hist_ids=hist_ids, hist_len=hist_len,
                                    unroll_retrieve=unroll_retrieve)
    return kvs, tokens, count


def qa_layer_logits(lp, cfg: Qwen2Config, rekv: ReKVConfig, kv_l: StreamKV,
                    h: jax.Array, n_tokens: jax.Array):
    """Layerwise-QA phase 1 for the ABLATION scorers: returns this layer's
    qkv plus raw rep-relevance logits and the mean question query, so the
    session can run a host-side selection strategy (aks/dpc_knn/l2norm —
    reference *_calc_block_topk) between dispatches."""
    from stc_tpu.kvcache.engine import score_block_logits
    B, T, E = h.shape
    q_valid = jnp.arange(T, dtype=jnp.int32)[None, :] < n_tokens[:, None]
    hn = rms_norm(h, lp["ln1"], cfg.rms_eps)
    q, k, v = _qkv(lp, hn, cfg)
    logits, blk_valid, q_mean = score_block_logits(kv_l, q, rekv, q_valid)
    return q, k, v, logits, blk_valid, q_mean


def qa_layer_attend(lp, cfg: Qwen2Config, rekv: ReKVConfig, kv_l: StreamKV,
                    h: jax.Array, q, k, v, abs_idx, exists, use_host,
                    host_k, host_v, n_tokens: jax.Array):
    """Layerwise-QA phase 2: retrieved attention for one layer with
    mixed-source blocks (device gather for resident pages, host-fetched
    arrays for evicted ones).  Returns (h_next, dkv_k, dkv_v, cursor)."""
    from stc_tpu.kvcache.engine import (_gather_retrieved, decode_attend,
                                        decode_write, init_decode_kv)
    B, T, E = h.shape
    Nb = rekv.max_blocks
    slot = jnp.clip(abs_idx - kv_l.page_offset[:, None], 0, Nb - 1)
    ret_k, ret_v, _, valid_len = _gather_retrieved(kv_l, rekv, slot, exists)
    # overlay host-fetched pages onto the gathered buffer
    S = rekv.block_size
    Hkv = host_k.shape[2]
    D = host_k.shape[-1]
    hk = host_k.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, rekv.topk * S, D)
    hv = host_v.transpose(0, 2, 1, 3, 4).reshape(B, Hkv, rekv.topk * S, D)
    m = jnp.repeat(use_host, S, axis=1)[:, None, :, None]
    ret_k = ret_k.at[:, :, rekv.n_init:].set(
        jnp.where(m, hk, ret_k[:, :, rekv.n_init:]))
    ret_v = ret_v.at[:, :, rekv.n_init:].set(
        jnp.where(m, hv, ret_v[:, :, rekv.n_init:]))
    if rekv.retrieved_kv_compression != "none":
        from stc_tpu.kvcache.engine import compress_retrieved
        ret_k, ret_v, valid_len = compress_retrieved(
            kv_l, rekv, ret_k, ret_v, valid_len)

    dkv = init_decode_kv(rekv, B, Hkv, D, dtype=kv_l.init_k.dtype)
    dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                       rope_base=cfg.rope_base, raw_rows=_raw_rows(rekv))
    dkv_q = decode_write(dkv, k, v, T, rope_base=cfg.rope_base)
    q_slots = valid_len[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
    o = decode_attend(q, q_slots, dkv_q, rekv, rope_base=cfg.rope_base)
    h = h + _proj_out(lp, o, cfg)
    hn = rms_norm(h, lp["ln2"], cfg.rms_eps)
    h = h + _mlp(lp, hn, cfg)
    return h, dkv_q.k, dkv_q.v, valid_len


def build_spec_ctx(q_ids, q_len, p_ids, p_len, max_new_tokens: int,
                   hist_ids=None, hist_len=None):
    """Compact [history | question | prompt] into one per-stream lookup
    buffer for prompt-lookup speculative decoding, with room for the
    generated tokens.  hist_ids (B, H): recent question+answer tokens from
    the session's earlier QAs (cross-question drafting — prior answers are
    high-acceptance material when phrasing repeats).  Returns
    (ctx (B, C) int32, ctx_len (B,))."""
    B, Tq = q_ids.shape
    Tp = p_ids.shape[1]
    H = 0 if hist_ids is None else hist_ids.shape[1]
    C = H + Tq + Tp + max_new_tokens + 2
    ctx = jnp.zeros((B, C), jnp.int32)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    base = jnp.zeros((B,), jnp.int32)
    if H:
        hist_len = jnp.asarray(hist_len, jnp.int32)
        jh = jnp.arange(H, dtype=jnp.int32)
        ctx = ctx.at[:, :H].set(jnp.where(jh[None, :] < hist_len[:, None],
                                          hist_ids, 0))
        base = hist_len
    jq = jnp.arange(Tq, dtype=jnp.int32)
    pos = base[:, None] + jq[None, :]
    ctx = ctx.at[bidx, pos].set(jnp.where(jq[None, :] < q_len[:, None],
                                          q_ids, 0))
    jp = jnp.arange(Tp, dtype=jnp.int32)
    pos = (base + q_len)[:, None] + jp[None, :]
    ctx = ctx.at[bidx, pos].set(jnp.where(jp[None, :] < p_len[:, None],
                                          p_ids, 0))
    return ctx, base + q_len + p_len


def _spec_draft(ctx: jax.Array, ctx_len: jax.Array, K: int, N: int):
    """Draft K tokens per stream by the longest-suffix n-gram match.

    Finds the most recent position whose trailing n-gram (up to N tokens)
    equals the committed suffix and proposes the K tokens that followed it
    (prompt-lookup decoding).  A bad draft is harmless: it is committed only
    if it equals the model's own greedy choice."""
    B, C = ctx.shape
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    # g[:, j] = the (j+1)-th-last committed token
    gpos = ctx_len[:, None] - 1 - jnp.arange(N, dtype=jnp.int32)[None, :]
    g = ctx[bidx, jnp.clip(gpos, 0, C - 1)]
    gvalid = gpos >= 0
    score = jnp.zeros((B, C), jnp.int32)
    run = jnp.ones((B, C), bool)
    for j in range(N):  # static, small
        shifted = jnp.pad(ctx, ((0, 0), (j, 0)))[:, :C]       # ctx[t - j]
        run = run & (shifted == g[:, j:j + 1]) & gvalid[:, j:j + 1]
        score = score + run.astype(jnp.int32)
    t = jnp.arange(C, dtype=jnp.int32)[None, :]
    # exclude the committed suffix itself and anything at/after the end
    score = jnp.where(t < ctx_len[:, None] - 1, score, 0)
    best = jnp.argmax(score * C + t, axis=1).astype(jnp.int32)  # recency ties
    has = jnp.take_along_axis(score, best[:, None], axis=1) > 0
    dpos = best[:, None] + 1 + jnp.arange(K, dtype=jnp.int32)[None, :]
    draft = ctx[bidx, jnp.clip(dpos, 0, C - 1)]
    return jnp.where(has & (dpos < C), draft, 0)


def lookahead_decode(params, cfg: Qwen2Config, rekv: ReKVConfig,
                     dkvs: DecodeKV, last_logits: jax.Array,
                     stop_ids: jax.Array, max_new_tokens: int,
                     ctx_ids: jax.Array, ctx_len: jax.Array
                     ) -> Tuple[jax.Array, jax.Array, DecodeKV]:
    """EXACT-greedy speculative decode via prompt lookup, one dispatch.

    Each while_loop round: commit the verified next token, draft K tokens by
    n-gram lookup over [question | prompt | generated] (ctx_ids/ctx_len from
    build_spec_ctx), then run ONE decode_step over all K+1 tokens and keep
    the longest draft prefix that equals the model's own greedy choices —
    so the output is bit-identical to greedy_decode, but one weight read
    (the per-round cost on a bandwidth-bound decode) can commit up to K+1
    tokens.  The cursor rewinds past rejected rows; stale rows are masked
    (decode_attend gates on cursor) and overwritten by the next round.

    Beyond reference: its decode is a strictly sequential per-token python
    loop (llava_onevision_rekv.py:105-143), whose anti-EOS-at-step-0 rule is
    preserved here.  Returns (tokens (B, max_new_tokens), n_generated (B,),
    dkvs).
    """
    B, V = last_logits.shape
    K = rekv.spec_decode_draft
    N = rekv.spec_decode_ngram
    C = ctx_ids.shape[1]
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]

    def is_stop(tok):
        return jnp.any(tok[:, None] == stop_ids[None, :], axis=1)

    def pick(logits, pos):
        _, top2 = jax.lax.top_k(logits, 2)
        tok = top2[:, 0]
        tok = jnp.where((pos == 0) & is_stop(tok), top2[:, 1], tok)
        return tok.astype(jnp.int32)

    def cond(state):
        it, pos, _, _, done, _, _, _ = state
        live = ~done & (pos < max_new_tokens)
        return (it < max_new_tokens) & jnp.any(live)

    def body(state):
        it, pos, logits, tokens, done, dkvs, ctx, cl = state
        tok0 = pick(logits, pos)
        # append tok0 to the lookup history so drafts condition on it
        slot = jnp.clip(cl, 0, C - 1)[:, None]
        cur = ctx[bidx, slot]
        ctx = ctx.at[bidx, slot].set(jnp.where(~done[:, None],
                                               tok0[:, None], cur))
        cl = cl + (~done).astype(jnp.int32)
        draft = _spec_draft(ctx, cl, K, N)
        seq = jnp.concatenate([tok0[:, None], draft], axis=1)   # (B, K+1)

        start = dkvs.cursor
        logits_all, dkvs = decode_step(params, cfg, rekv, dkvs,
                                       embed_tokens(params, seq),
                                       jnp.full((B,), K + 1, jnp.int32))
        y = jnp.argmax(logits_all, axis=-1).astype(jnp.int32)   # (B, K+1)
        acc = jnp.cumprod((draft == y[:, :K]).astype(jnp.int32), axis=1)
        n_draft = acc.sum(axis=1)                               # (B,)

        # record the committed run seq[0 .. n_draft], truncated at the
        # first stop token and at the decode budget (static K+1 unroll)
        committed = jnp.zeros((B,), jnp.int32)
        d = done
        for t in range(K + 1):
            tk = seq[:, t]
            can = (~d) & (t <= n_draft) & (pos + committed < max_new_tokens)
            wpos = jnp.clip(pos + committed, 0, max_new_tokens - 1)[:, None]
            old = tokens[bidx, wpos]
            tokens = tokens.at[bidx, wpos].set(
                jnp.where(can[:, None], tk[:, None], old))
            if t > 0:  # accepted drafts extend the lookup history too
                cslot = jnp.clip(cl, 0, C - 1)[:, None]
                cold = ctx[bidx, cslot]
                ctx = ctx.at[bidx, cslot].set(
                    jnp.where(can[:, None], tk[:, None], cold))
                cl = cl + can.astype(jnp.int32)
            committed = committed + can.astype(jnp.int32)
            d = d | (can & is_stop(tk))

        # next round's logits follow the LAST committed token; rewind the
        # cursor past the rejected rows (per-layer cursors move in lockstep)
        lidx = jnp.clip(committed - 1, 0, K)[:, None, None]
        logits_next = jnp.take_along_axis(logits_all, lidx, axis=1)[:, 0]
        dkvs = dkvs._replace(cursor=start + committed[None, :])
        return (it + 1, pos + committed, logits_next, tokens, d, dkvs,
                ctx, cl)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    state = (jnp.asarray(0, jnp.int32), jnp.zeros((B,), jnp.int32),
             last_logits, tokens0, jnp.zeros((B,), bool), dkvs,
             jnp.asarray(ctx_ids, jnp.int32),
             jnp.asarray(ctx_len, jnp.int32))
    _, pos, _, tokens, _, dkvs, _, _ = jax.lax.while_loop(cond, body, state)
    return tokens, pos, dkvs


def greedy_decode(params, cfg: Qwen2Config, rekv: ReKVConfig,
                  dkvs: DecodeKV, last_logits: jax.Array,
                  stop_ids: jax.Array, max_new_tokens: int,
                  ctx_ids: jax.Array | None = None,
                  ctx_len: jax.Array | None = None
                  ) -> Tuple[jax.Array, jax.Array, DecodeKV]:
    """On-device greedy decode loop (single dispatch for the whole answer).

    last_logits: (B, V) logits of the prompt's final position.
    stop_ids: (n_stop,) int32 (pad with -1).
    Replicates the reference loop (llava_onevision_rekv.py:105-143) including
    the anti-EOS-at-step-0 top-2 fallback.
    ctx_ids/ctx_len: optional lookup history (build_spec_ctx) — with
    ReKVConfig.spec_decode_draft > 0 the loop runs prompt-lookup speculative
    decoding instead (bit-identical output, fewer weight reads).
    Returns (tokens (B, max_new_tokens), n_generated (B,), dkvs).
    """
    if rekv.spec_decode_draft > 0 and ctx_ids is not None:
        return lookahead_decode(params, cfg, rekv, dkvs, last_logits,
                                stop_ids, max_new_tokens, ctx_ids, ctx_len)
    B = last_logits.shape[0]

    def is_stop(tok):
        return jnp.any(tok[:, None] == stop_ids[None, :], axis=1)

    def pick(logits, i):
        _, top2 = jax.lax.top_k(logits, 2)
        tok = top2[:, 0]
        # step 0: never emit a stop token first
        tok = jnp.where((i == 0) & is_stop(tok), top2[:, 1], tok)
        return tok.astype(jnp.int32)

    def cond(state):
        i, _, _, done, _, _ = state
        return (i < max_new_tokens) & ~jnp.all(done)

    def body(state):
        i, logits, tokens, done, count, dkvs = state
        tok = pick(logits, i)
        record = ~done
        tokens = tokens.at[:, i].set(jnp.where(record, tok, 0))
        count = count + record.astype(jnp.int32)
        done = done | is_stop(tok)
        emb = embed_tokens(params, tok[:, None])
        logits_next, dkvs = decode_step(params, cfg, rekv, dkvs, emb,
                                        jnp.ones((B,), jnp.int32))
        return (i + 1, logits_next[:, 0], tokens, done, count, dkvs)

    tokens0 = jnp.zeros((B, max_new_tokens), jnp.int32)
    state = (jnp.asarray(0, jnp.int32), last_logits, tokens0,
             jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32), dkvs)
    _, _, tokens, _, count, dkvs = jax.lax.while_loop(cond, body, state)
    return tokens, count, dkvs
