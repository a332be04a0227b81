"""SigLIP vision tower with fused STC-Cacher — functional JAX implementation.

Replaces the reference's monkey-patched HF SigLIP encoder
(model/custom_siglip.py:25-259).  The STC-Cacher is a first-class compiled
path instead of a runtime forward-rebind:

  full chunk  (chunk_idx % cache_interval == 0): standard ViT layer; the last
      frame's K, V, attention output and MLP output are saved as references
      (custom_siglip.py:51-113).
  cached chunk: K is recomputed for all tokens; per-token cosine similarity of
      fresh K vs reference K picks the `update_ratio` LEAST-similar tokens per
      frame; Q and V are computed only for those (a fixed-size gather — the
      reference's num_update = int(T*ratio) is already shape-static); V is
      scatter-updated into the reference V; attention runs with the selected
      queries against full K/V; attention and MLP outputs are scatter-updated
      into the reference outputs (custom_siglip.py:115-224).

Cacher state is a pytree stacked over layers, so the whole tower is one
lax.scan per chunk type.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class SiglipConfig:
    hidden_size: int = 1152
    num_layers: int = 26
    num_heads: int = 16
    intermediate_size: int = 4304
    image_size: int = 384
    patch_size: int = 14
    layer_norm_eps: float = 1e-6

    @property
    def head_dim(self) -> int:
        return self.hidden_size // self.num_heads

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_tokens(self) -> int:
        return self.grid * self.grid

    @classmethod
    def tiny(cls):
        return cls(hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, image_size=56, patch_size=14)


class CacherState(NamedTuple):
    """Per-layer reference activations of the previous full chunk's last frame.

    Leaves are (B, T, C); stacked over layers -> (L, B, T, C).
    """
    ref_k: jax.Array
    ref_v: jax.Array
    ref_attn: jax.Array
    ref_mlp: jax.Array


def init_cacher_state(cfg: SiglipConfig, batch: int,
                      dtype=jnp.float32) -> CacherState:
    # DISTINCT buffers per leaf: donated jits reject a state whose leaves
    # alias one array ("donate the same buffer twice")
    def z():
        return jnp.zeros((cfg.num_layers, batch, cfg.num_tokens,
                          cfg.hidden_size), dtype)

    return CacherState(ref_k=z(), ref_v=z(), ref_attn=z(), ref_mlp=z())


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(cfg: SiglipConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    C, L, F = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    P = cfg.patch_size
    ks = jax.random.split(key, 10)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "patch_w": rnd(ks[0], (3 * P * P, C)),
        "patch_b": jnp.zeros((C,), dtype),
        "pos_embed": rnd(ks[1], (cfg.num_tokens, C)),
        "layers": {
            "ln1_w": jnp.ones((L, C), dtype), "ln1_b": jnp.zeros((L, C), dtype),
            "wq": rnd(ks[2], (L, C, C)), "bq": jnp.zeros((L, C), dtype),
            "wk": rnd(ks[3], (L, C, C)), "bk": jnp.zeros((L, C), dtype),
            "wv": rnd(ks[4], (L, C, C)), "bv": jnp.zeros((L, C), dtype),
            "wo": rnd(ks[5], (L, C, C)), "bo": jnp.zeros((L, C), dtype),
            "ln2_w": jnp.ones((L, C), dtype), "ln2_b": jnp.zeros((L, C), dtype),
            "fc1": rnd(ks[6], (L, C, F)), "fc1_b": jnp.zeros((L, F), dtype),
            "fc2": rnd(ks[7], (L, F, C)), "fc2_b": jnp.zeros((L, C), dtype),
        },
        "post_ln_w": jnp.ones((C,), dtype),
        "post_ln_b": jnp.zeros((C,), dtype),
    }


def layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def patch_embed(params, pixels: jax.Array, cfg: SiglipConfig) -> jax.Array:
    """pixels: (B, 3, H, W) -> (B, T, C).  Equivalent to the HF Conv2d with
    stride=kernel=patch_size (patches are non-overlapping, so the conv is a
    reshape + matmul — MXU-friendly)."""
    B = pixels.shape[0]
    P, g = cfg.patch_size, cfg.grid
    # valid-padding conv: trailing pixels beyond grid*patch are discarded
    # (384 = 27*14 + 6 for so400m-patch14-384)
    pixels = pixels[:, :, : g * P, : g * P]
    x = pixels.reshape(B, 3, g, P, g, P)
    x = x.transpose(0, 2, 4, 1, 3, 5).reshape(B, g * g, 3 * P * P)
    return x @ params["patch_w"] + params["patch_b"] + params["pos_embed"]


def _attn_full(q, k, v, num_heads):
    """Plain bidirectional softmax attention; q/k/v: (B, Tq|Tk, C)."""
    B, Tq, C = q.shape
    Tk = k.shape[1]
    H = num_heads
    D = C // H
    qh = q.reshape(B, Tq, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(B, Tk, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(B, Tk, H, D).transpose(0, 2, 1, 3)
    # matmuls stay in the input dtype (bf16 rides the MXU fast path) with
    # fp32 accumulation; softmax in fp32
    logits = jnp.einsum("bhqd,bhkd->bhqk", qh, kh,
                        preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(logits, axis=-1).astype(q.dtype)
    o = jnp.einsum("bhqk,bhkd->bhqd", p, vh,
                   preferred_element_type=jnp.float32)
    return o.transpose(0, 2, 1, 3).reshape(B, Tq, C).astype(q.dtype)


def _layer_full(lp, h, cfg: SiglipConfig):
    """Standard SigLIP encoder layer; returns (h, refs-of-LAST-frame...).

    The 'last frame' is the last batch element of the chunk
    (custom_siglip.py:78-79 uses key_states[-1]); our chunk batching keeps
    frames on the batch axis, so refs are h[-1:]-shaped slices broadcast later.
    """
    eps = cfg.layer_norm_eps
    C = cfg.hidden_size
    hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)
    k_full = hn @ lp["wk"] + lp["bk"]
    # q and v ride ONE concatenated matmul (each output element is the same
    # dot product as in the separate matmuls — bit-identical — but the step
    # dispatches one op instead of two; this relay taxes every op 40-90us,
    # PLATFORM_NOTES.md).  k stays separate: the cached layer computes it
    # full-width on its own and the two paths must stay bit-comparable.
    qv = hn @ jnp.concatenate([lp["wq"], lp["wv"]], axis=1) + jnp.concatenate(
        [lp["bq"], lp["bv"]])
    q_full, v_full = qv[..., :C], qv[..., C:]
    attn = _attn_full(q_full, k_full, v_full, cfg.num_heads)
    attn = attn @ lp["wo"] + lp["bo"]
    h = h + attn
    hn2 = layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
    mlp = jax.nn.gelu(hn2 @ lp["fc1"] + lp["fc1_b"], approximate=True)
    mlp = mlp @ lp["fc2"] + lp["fc2_b"]
    h = h + mlp
    return h, (k_full, v_full, attn, mlp)


_KPROXY_R_CACHE: dict = {}


def _kproxy_matrix(C: int, rank: int, dtype) -> jax.Array:
    """Fixed Johnson-Lindenstrauss sketch (C, rank), N(0,1)/sqrt(rank)
    entries from a pinned seed: cosine similarity of the projected vectors
    approximates cosine of the originals within ~sqrt(log T / rank), which
    is all a top-k RANKING needs.  Cached per (C, rank, dtype) as a NUMPY
    array (never a jax value: building it under an active trace would cache
    a tracer — it closes over call sites as a jaxpr constant instead)."""
    import numpy as _np
    key = (C, rank, jnp.dtype(dtype).name)
    if key not in _KPROXY_R_CACHE:
        r = _np.random.default_rng(42).standard_normal((C, rank))
        _KPROXY_R_CACHE[key] = (r / _np.sqrt(rank)).astype(
            _np.float32).astype(jnp.dtype(dtype))  # ml_dtypes handles bf16
    return _KPROXY_R_CACHE[key]


def _layer_cached(lp, h, refs, num_update: int, cfg: SiglipConfig,
                  sim_source: str = "key", gather_impl: str = "auto",
                  k_proxy_rank: int = 0):
    """Selective-recompute layer (custom_siglip.py:115-224; the V-similarity
    variant of custom_siglip.py:260-447 gates on fresh-V-vs-reference-V
    instead).

    h: (F, T, C) current chunk frames; refs: per-layer reference activations
    (F_ref==1 broadcastable (1, T, C) slices).

    BANDWIDTH-SHAPED (round-4): the reference's selective path reads its
    refs once (custom_siglip.py:129-224); the first rebuild instead
    materialized three full-size (F, T, C) buffers per layer
    (broadcast-ref + scatter for V, attn out, and MLP out), so the cacher
    step touched MORE HBM than the full path despite 2.3x fewer FLOPs
    (round-3 ROOFLINE.json).  Now:
      - per-frame V is never materialized: attention against the scattered
        V decomposes into (probs @ shared-ref-V) + (gathered probs @
        (fresh-V - ref-V rows)) — the ref is read once at (T, C), the
        correction is (F, U, U)-small;
      - attn/MLP outputs merge into the residual stream as a broadcast add
        (streams the ref once) + a row-granular scatter of the recomputed
        tokens — bit-identical to scattering a full buffer first, without
        writing one.

    k_proxy_rank > 0 (key-sim only; BEYOND REFERENCE): the full fresh-K
    projection — the cached layer's single largest matmul, F*T*C*C — is
    replaced end to end:
      - staleness is RANKED on rank-r JL sketches of fresh vs reference K
        (the selection is a ranking, not a value computation: the exact and
        sketched cosines order clearly-changed tokens identically);
      - fresh K is projected only at the U selected rows;
      - attention logits decompose like V already does:
          q_sel @ K_scattered^T = q_sel @ ref_K^T (shared (T, C) ref, read
          once) + a (U x U) correction at the updated columns.
    Non-selected tokens attend through their REFERENCE keys, which the
    gating itself certifies as near-identical — the same approximation
    contract the cacher already applies to V/attn/MLP.  The default (0)
    keeps the reference-exact fresh-K path.
    """
    eps = cfg.layer_norm_eps
    ref_k, ref_v, ref_attn, ref_mlp = refs
    F_, T, C = h.shape
    H = cfg.num_heads
    D = C // H
    if gather_impl == "auto":
        # XLA gathers run ~20 GB/s on TPU while 0/1 matmuls ride the MXU
        # (PLATFORM_NOTES.md); both formulations are bit-equal (x*1 and
        # x+0 are exact in every dtype)
        gather_impl = "index" if jax.default_backend() == "cpu" else "onehot"
    onehot = gather_impl == "onehot"
    k_proxy = int(k_proxy_rank) if sim_source == "key" else 0

    hn = layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)

    def _cos(a, ref):
        af = a.astype(jnp.float32)
        rf = ref.astype(jnp.float32)
        return jnp.sum(af * rf, axis=-1) / (
            jnp.linalg.norm(af, axis=-1)
            * jnp.linalg.norm(rf, axis=-1) + 1e-8)

    if sim_source == "value":
        k_full = hn @ lp["wk"] + lp["bk"]                   # (F, T, C)
        v_fresh = hn @ lp["wv"] + lp["bv"]
        sim = _cos(v_fresh, ref_v)
    elif k_proxy:
        # rank-r sketch of fresh K without forming it: (wk @ R) is a
        # (C, r) matmul — ~C/r of the full projection's FLOPs
        R = _kproxy_matrix(C, k_proxy, h.dtype)
        wkr = lp["wk"] @ R
        bkr = lp["bk"] @ R
        # ref_k is a saved FULL projection (bias already inside); only the
        # fresh side needs the sketched bias added
        sim = _cos(hn @ wkr + bkr, ref_k @ R)
    else:
        k_full = hn @ lp["wk"] + lp["bk"]                   # (F, T, C)
        sim = _cos(k_full, ref_k)

    # least-similar tokens get recomputed
    _, upd_idx = jax.lax.top_k(-sim, num_update)            # (F, U)
    upd_idx = jnp.sort(upd_idx, axis=-1)
    frow = jnp.arange(F_, dtype=jnp.int32)[:, None]          # (F, 1)
    U = num_update

    if onehot:
        # (F, U, T) 0/1 selection matrix: every gather below becomes
        # G @ x and every scatter-merge becomes h + ref + G^T @ delta
        G = (upd_idx[:, :, None]
             == jnp.arange(T, dtype=jnp.int32)[None, None, :]).astype(h.dtype)

        def rows(x):           # (F, T, C) -> (F, U, C)
            return jnp.einsum("fut,ftc->fuc", G, x)

        def rows_shared(x):    # (T, C) -> (F, U, C)
            return jnp.einsum("fut,tc->fuc", G, x)

        upd_mask = jnp.einsum("fut->ft", G)[..., None]       # (F, T, 1) 0/1

        def merge(h, ref, vals):
            # updated rows become h_row + vals_row, the rest h + ref —
            # BIT-IDENTICAL to the index path's scatter-then-add: every
            # one-hot product is x*1 or x*0 and every cross-term adds an
            # exact zero, so the only roundings are the same h_row + vals
            # and h + ref adds the index path performs.  (An algebraically
            # equal h + (1-mask)*ref + G^T@vals form saves the rows(h)
            # gather but LOSES bit-identity under XLA fusion at full layer
            # scale — measured on CPU f32, data-dependent; keep this form.)
            upd = jnp.einsum("fut,fuc->ftc", G, rows(h) + vals)
            return (1.0 - upd_mask) * (h + ref) + upd
    else:
        def rows(x):
            return x[frow, upd_idx]

        def rows_shared(x):
            return x[upd_idx]

        def merge(h, ref, vals):
            h_rows = rows(h)
            h = h + ref
            return _scatter_tokens(h, upd_idx, h_rows + vals)

    toks = rows(hn)                                          # (F, U, C)

    if sim_source == "value":
        # the V-sim variant attends against the fully fresh V
        q_sel = toks @ lp["wq"] + lp["bq"]
        attn_sel = _attn_full(q_sel, k_full, v_fresh, cfg.num_heads)
    else:
        # attention with the updated-V decomposition: softmax probs once,
        # then  probs @ V_scattered
        #     = probs @ ref_V  +  probs[:, upd] @ (V_fresh - ref_V)[upd]
        # q/v (and, on the k-proxy path, k) of the selected rows ride ONE
        # concatenated matmul: per-element dot products are identical to
        # the separate matmuls, and the step dispatches one op instead of
        # two/three (this relay taxes every op 40-90us, PLATFORM_NOTES.md)
        names = ("wq", "wv", "wk") if k_proxy else ("wq", "wv")
        proj = toks @ jnp.concatenate(
            [lp[w] for w in names], axis=1) + jnp.concatenate(
            [lp["b" + w[1]] for w in names])
        q_sel, v_sel = proj[..., :C], proj[..., C:2 * C]     # (F, U, C)
        qh = q_sel.reshape(F_, U, H, D).transpose(0, 2, 1, 3)
        if k_proxy:
            # logits against K_scattered without forming fresh K:
            #   q_sel @ K_scattered^T = q_sel @ ref_K^T
            #                         + q_sel @ (K_sel - ref_K[upd])^T at
            #                           the updated columns
            # (the K twin of the V decomposition below; ref read once at
            # (T, C), fresh K projected at the U selected rows only)
            k_sel = proj[..., 2 * C:]                        # (F, U, C)
            rkh = ref_k[0].reshape(T, H, D)
            logits = jnp.einsum("fhud,thd->fhut", qh, rkh,
                                preferred_element_type=jnp.float32)
            dk = (k_sel - rows_shared(ref_k[0])).reshape(F_, U, H, D)
            corr = jnp.einsum("fhud,fwhd->fhuw", qh,
                              dk.astype(qh.dtype),
                              preferred_element_type=jnp.float32)
            if onehot:
                logits = logits + jnp.einsum(
                    "fhuw,fwt->fhut", corr, G.astype(jnp.float32))
            else:
                logits = jax.vmap(
                    lambda b, c, i: b.at[:, :, i].add(c)
                )(logits, corr, upd_idx)
            logits = logits * (D ** -0.5)
        else:
            kh = k_full.reshape(F_, T, H, D).transpose(0, 2, 1, 3)
            logits = jnp.einsum("fhud,fhtd->fhut", qh, kh,
                                preferred_element_type=jnp.float32
                                ) * (D ** -0.5)
        p = jax.nn.softmax(logits, axis=-1).astype(q_sel.dtype)
        rvh = ref_v[0].reshape(T, H, D)                      # shared ref, (T,H,D)
        o = jnp.einsum("fhut,thd->fhud", p, rvh,
                       preferred_element_type=jnp.float32)
        # correction at the updated columns only
        if onehot:
            p_sel = jnp.einsum("fhut,fwt->fhuw", p, G)       # (F, H, U, U)
        else:
            p_sel = jnp.take_along_axis(
                p, upd_idx[:, None, None, :], axis=3)        # (F, H, U, U)
        dv = (v_sel - rows_shared(ref_v[0])).reshape(F_, U, H, D)
        o = o + jnp.einsum("fhuw,fwhd->fhud", p_sel,
                           dv.astype(p_sel.dtype),
                           preferred_element_type=jnp.float32)
        attn_sel = o.transpose(0, 2, 1, 3).reshape(F_, U, C).astype(h.dtype)

    attn_sel = attn_sel @ lp["wo"] + lp["bo"]               # (F, U, C)
    # residual merge without materializing a full scattered buffer: rows
    # outside upd_idx take h + ref (one streaming pass over the ref), rows
    # inside take the recomputed h_row + attn_sel (merge() — index scatter
    # or bit-equal one-hot masked select)
    h = merge(h, ref_attn, attn_sel)

    hn2 = layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
    toks2 = rows(hn2)
    mlp_sel = jax.nn.gelu(toks2 @ lp["fc1"] + lp["fc1_b"], approximate=True)
    mlp_sel = mlp_sel @ lp["fc2"] + lp["fc2_b"]
    h = merge(h, ref_mlp, mlp_sel)
    return h


def _scatter_tokens(base: jax.Array, idx: jax.Array, vals: jax.Array):
    """base: (F, T, C); idx: (F, U); vals: (F, U, C) -> base with rows set.

    Row-granular scatter: advanced indices only on (frame, token) dims, the
    channel dim stays a scatter window (fast path on TPU)."""
    F_ = base.shape[0]
    f = jnp.arange(F_, dtype=jnp.int32)[:, None]
    return base.at[f, idx].set(vals)


# ---------------------------------------------------------------------------
# Tower forward (full / cached chunk)
# ---------------------------------------------------------------------------

def encode_full(params, cfg: SiglipConfig, pixels: jax.Array,
                cacher: CacherState, n_streams: int = 1
                ) -> Tuple[jax.Array, CacherState]:
    """Full-compute chunk: returns (features (B*F, T, C) of the last encoder
    layer, refreshed cacher state).  Frames ride the batch axis; with
    n_streams > 1 the leading axis is stream-major (B*F) and each stream's
    LAST frame becomes its reference."""
    h = patch_embed(params, pixels, cfg)
    T, C = cfg.num_tokens, cfg.hidden_size

    def body(h, lp):
        h, (k, v, a, m) = _layer_full(lp, h, cfg)
        # save the LAST frame per stream as the reference
        def last(x):
            return x.reshape(n_streams, -1, T, C)[:, -1]
        return h, (last(k), last(v), last(a), last(m))

    h, refs = jax.lax.scan(body, h, params["layers"])
    new_cacher = CacherState(ref_k=refs[0], ref_v=refs[1],
                             ref_attn=refs[2], ref_mlp=refs[3])
    return h, new_cacher


def encode_cached(params, cfg: SiglipConfig, pixels: jax.Array,
                  cacher: CacherState, update_ratio: float,
                  sim_source: str = "key", n_streams: int = 1,
                  gather_impl: str = "auto",
                  k_proxy_rank: int = 0) -> jax.Array:
    """Selective-recompute chunk: returns features; cacher unchanged.

    With n_streams > 1, frames are stream-major on the leading axis and each
    stream gates against ITS OWN reference frame (vmapped over streams)."""
    num_update = max(1, min(int(cfg.num_tokens * update_ratio),
                            cfg.num_tokens))
    h = patch_embed(params, pixels, cfg)
    BF, T, C = h.shape

    def body(h, xs):
        lp, rk, rv, ra, rm = xs
        if n_streams == 1:
            h = _layer_cached(lp, h, (rk, rv, ra, rm), num_update, cfg,
                              sim_source, gather_impl, k_proxy_rank)
        else:
            hb = h.reshape(n_streams, BF // n_streams, T, C)
            h = jax.vmap(
                lambda hs, a, b, c, d: _layer_cached(
                    lp, hs, (a[None], b[None], c[None], d[None]),
                    num_update, cfg, sim_source, gather_impl, k_proxy_rank)
            )(hb, rk, rv, ra, rm).reshape(BF, T, C)
        return h, None

    h, _ = jax.lax.scan(body, h, (params["layers"], cacher.ref_k,
                                  cacher.ref_v, cacher.ref_attn,
                                  cacher.ref_mlp))
    return h
