"""CLIP vision tower with the token-level MLP-skip cacher — functional JAX.

Tower: standard CLIP ViT (class token, pre-layernorm, quick-gelu MLP),
matching HF CLIPVisionModel so openai/clip-vit-large-patch14-336 checkpoints
convert directly (LongVA's tower, reference
model/longva/model/multimodal_encoder/clip_encoder.py).

Cacher: TPU-native re-implementation of the reference's second, independent
cacher (TokenLevelCacheCLIPEncoderLayer,
model/longva/.../custom_clip.py:52-266):
  even chunks: full layer; the last frame's pre-LN2 residual and MLP output
      are saved as references;
  odd chunks: LN1 + attention run fully; the SKIP_TOKEN_RATIO most-similar
      tokens (cosine of pre-LN2 residual vs reference) SKIP LN2+MLP and reuse
      the reference MLP output; only the rest are computed (fixed-size
      gather/scatter — num_compute = T - int(T*ratio) is shape-static).
Per-layer skip ratios come from a LayerRatioAllocator (uniform or
linear-increasing, custom_clip.py:21-49); skip statistics are accumulated in
the cacher state (get_cache_stats equivalent).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Dict, List, NamedTuple, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class CLIPConfig:
    hidden_size: int = 1024
    num_layers: int = 24
    num_heads: int = 16
    intermediate_size: int = 4096
    image_size: int = 336
    patch_size: int = 14
    layer_norm_eps: float = 1e-5

    @property
    def grid(self) -> int:
        return self.image_size // self.patch_size

    @property
    def num_patches(self) -> int:
        return self.grid * self.grid

    @property
    def num_tokens(self) -> int:
        return self.num_patches + 1  # CLS

    @classmethod
    def tiny(cls):
        return cls(hidden_size=32, num_layers=2, num_heads=4,
                   intermediate_size=64, image_size=56, patch_size=14)


def layer_ratios(num_layers: int, target_ratio: float,
                 strategy: str = "uniform") -> List[float]:
    """Reference LayerRatioAllocator (custom_clip.py:32-44)."""
    if strategy == "uniform":
        return [target_ratio] * num_layers
    ratios = [target_ratio * (0.2 + 1.6 * (i / max(num_layers - 1, 1)))
              for i in range(num_layers)]
    avg = sum(ratios) / len(ratios)
    return [r * (target_ratio / avg) for r in ratios] if avg > 0 else ratios


class ClipCacherState(NamedTuple):
    """Per-layer references, stacked over layers: (L, B, T, C) — one
    reference (each stream's last chunk frame) per stream.  The skip
    statistics are PER STREAM so ragged/mixed ticks and slot recycling
    account each stream exactly."""
    ref_pre_ln2: jax.Array
    ref_mlp_post: jax.Array
    has_ref: jax.Array          # (L,) bool — reference captured yet?
    tokens_processed: jax.Array  # (B,) int32
    tokens_skipped: jax.Array    # (B,) int32


def init_clip_cacher(cfg: CLIPConfig, dtype=jnp.float32,
                     batch: int = 1) -> ClipCacherState:
    # distinct buffers per leaf (donated jits reject aliased donors)
    def z():
        return jnp.zeros((cfg.num_layers, batch, cfg.num_tokens,
                          cfg.hidden_size), dtype)

    return ClipCacherState(
        ref_pre_ln2=z(), ref_mlp_post=z(),
        has_ref=jnp.zeros((cfg.num_layers,), bool),
        tokens_processed=jnp.zeros((batch,), jnp.int32),
        tokens_skipped=jnp.zeros((batch,), jnp.int32))


class ClipStreamsMixin:
    """Per-stream state plumbing for the CLIP-tower pipelines (LongVA,
    Video-LLaVA): ragged select and slot extract/restore over the
    (L, B, T, C) cacher reference leaves; has_ref/counters stay global."""

    def select_streams(self, vstate, pstate, old_vstate, old_pstate, mask):
        m = mask.reshape(1, -1, 1, 1)
        return vstate._replace(
            ref_pre_ln2=jnp.where(m, vstate.ref_pre_ln2,
                                  old_vstate.ref_pre_ln2),
            ref_mlp_post=jnp.where(m, vstate.ref_mlp_post,
                                   old_vstate.ref_mlp_post),
            tokens_processed=jnp.where(mask, vstate.tokens_processed,
                                       old_vstate.tokens_processed),
            tokens_skipped=jnp.where(mask, vstate.tokens_skipped,
                                     old_vstate.tokens_skipped)), pstate

    def extract_stream(self, vstate, pstate, slot: int):
        import numpy as np
        return ({"ref_pre_ln2": np.asarray(vstate.ref_pre_ln2[:, slot]),
                 "ref_mlp_post": np.asarray(vstate.ref_mlp_post[:, slot]),
                 "tokens_processed": np.asarray(
                     vstate.tokens_processed[slot]),
                 "tokens_skipped": np.asarray(vstate.tokens_skipped[slot])},
                ())

    def restore_stream(self, vstate, pstate, slot: int, v_blob, p_blob):
        return vstate._replace(
            ref_pre_ln2=vstate.ref_pre_ln2.at[:, slot].set(
                jnp.asarray(v_blob["ref_pre_ln2"],
                            vstate.ref_pre_ln2.dtype)),
            ref_mlp_post=vstate.ref_mlp_post.at[:, slot].set(
                jnp.asarray(v_blob["ref_mlp_post"],
                            vstate.ref_mlp_post.dtype)),
            tokens_processed=vstate.tokens_processed.at[slot].set(
                jnp.asarray(v_blob["tokens_processed"], jnp.int32)),
            tokens_skipped=vstate.tokens_skipped.at[slot].set(
                jnp.asarray(v_blob["tokens_skipped"], jnp.int32))), pstate


def cache_stats(state: ClipCacherState) -> Dict[str, float]:
    proc = int(state.tokens_processed.sum())
    skip = int(state.tokens_skipped.sum())
    return {"total_tokens_processed": proc,
            "total_tokens_skipped": skip,
            "actual_skip_ratio": skip / max(proc, 1)}


# ---------------------------------------------------------------------------
# Parameters
# ---------------------------------------------------------------------------

def init_params(cfg: CLIPConfig, key, dtype=jnp.float32) -> Dict[str, Any]:
    C, L, F = cfg.hidden_size, cfg.num_layers, cfg.intermediate_size
    P = cfg.patch_size
    ks = jax.random.split(key, 10)
    s = 0.02

    def rnd(k, shape):
        return (jax.random.normal(k, shape) * s).astype(dtype)

    return {
        "class_embed": rnd(ks[0], (C,)),
        "patch_w": rnd(ks[1], (3 * P * P, C)),  # conv has no bias in CLIP
        "pos_embed": rnd(ks[2], (cfg.num_tokens, C)),
        "pre_ln_w": jnp.ones((C,), dtype), "pre_ln_b": jnp.zeros((C,), dtype),
        "layers": {
            "ln1_w": jnp.ones((L, C), dtype), "ln1_b": jnp.zeros((L, C), dtype),
            "wq": rnd(ks[3], (L, C, C)), "bq": jnp.zeros((L, C), dtype),
            "wk": rnd(ks[4], (L, C, C)), "bk": jnp.zeros((L, C), dtype),
            "wv": rnd(ks[5], (L, C, C)), "bv": jnp.zeros((L, C), dtype),
            "wo": rnd(ks[6], (L, C, C)), "bo": jnp.zeros((L, C), dtype),
            "ln2_w": jnp.ones((L, C), dtype), "ln2_b": jnp.zeros((L, C), dtype),
            "fc1": rnd(ks[7], (L, C, F)), "fc1_b": jnp.zeros((L, F), dtype),
            "fc2": rnd(ks[8], (L, F, C)), "fc2_b": jnp.zeros((L, C), dtype),
        },
        "post_ln_w": jnp.ones((C,), dtype),
        "post_ln_b": jnp.zeros((C,), dtype),
    }


def _layer_norm(x, w, b, eps):
    xf = x.astype(jnp.float32)
    mu = xf.mean(axis=-1, keepdims=True)
    var = ((xf - mu) ** 2).mean(axis=-1, keepdims=True)
    return ((xf - mu) * jax.lax.rsqrt(var + eps)).astype(x.dtype) * w + b


def quick_gelu(x):
    return x * jax.nn.sigmoid(1.702 * x)


def embed(params, pixels: jax.Array, cfg: CLIPConfig) -> jax.Array:
    """pixels (F, 3, H, W) -> (F, 1+P, C) with CLS + positions + pre-LN."""
    F_ = pixels.shape[0]
    P, g = cfg.patch_size, cfg.grid
    x = pixels[:, :, : g * P, : g * P]
    x = x.reshape(F_, 3, g, P, g, P).transpose(0, 2, 4, 1, 3, 5)
    x = x.reshape(F_, g * g, 3 * P * P) @ params["patch_w"]
    cls = jnp.broadcast_to(params["class_embed"],
                           (F_, 1, cfg.hidden_size)).astype(x.dtype)
    x = jnp.concatenate([cls, x], axis=1) + params["pos_embed"]
    return _layer_norm(x, params["pre_ln_w"], params["pre_ln_b"],
                       cfg.layer_norm_eps)


def _attn(lp, hn, cfg: CLIPConfig):
    F_, T, C = hn.shape
    H = cfg.num_heads
    D = C // H
    q = (hn @ lp["wq"] + lp["bq"]).reshape(F_, T, H, D).transpose(0, 2, 1, 3)
    k = (hn @ lp["wk"] + lp["bk"]).reshape(F_, T, H, D).transpose(0, 2, 1, 3)
    v = (hn @ lp["wv"] + lp["bv"]).reshape(F_, T, H, D).transpose(0, 2, 1, 3)
    # input-dtype matmuls (bf16 on the MXU) with fp32 accumulation/softmax
    lg = jnp.einsum("fhqd,fhkd->fhqk", q, k,
                    preferred_element_type=jnp.float32) * (D ** -0.5)
    p = jax.nn.softmax(lg, axis=-1).astype(hn.dtype)
    o = jnp.einsum("fhqk,fhkd->fhqd", p, v,
                   preferred_element_type=jnp.float32)
    o = o.transpose(0, 2, 1, 3).reshape(F_, T, C).astype(hn.dtype)
    return o @ lp["wo"] + lp["bo"]


def _mlp(lp, x):
    return quick_gelu(x @ lp["fc1"] + lp["fc1_b"]) @ lp["fc2"] + lp["fc2_b"]


# ---------------------------------------------------------------------------
# Tower forward: full chunk / MLP-skip chunk
# ---------------------------------------------------------------------------

def encode_full(params, cfg: CLIPConfig, pixels: jax.Array,
                cacher: ClipCacherState, *, feature_layer: int = -2,
                n_streams: int = 1) -> Tuple[jax.Array, ClipCacherState]:
    """Full-compute chunk, refreshing cacher references.

    Returns hidden states of encoder layer `feature_layer` (HF hidden_states
    indexing: -2 == output of the second-to-last layer) and new state.
    With n_streams > 1 the frame axis is STREAM-MAJOR (B*F) and each
    stream's reference is its own chunk's last frame.
    """
    h = embed(params, pixels, cfg)
    eps = cfg.layer_norm_eps
    F_, T, C = h.shape
    B = n_streams
    n_out = cfg.num_layers + feature_layer + 1 if feature_layer < 0 \
        else feature_layer

    def body(carry, lp):
        h, taken, out = carry
        hn = _layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)
        h = h + _attn(lp, hn, cfg)
        residual2 = h
        hn2 = _layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
        mlp_out = _mlp(lp, hn2)
        h = residual2 + mlp_out
        taken = taken + 1
        out = jnp.where(taken == n_out, h, out)
        # per-stream reference: each stream's last frame of the chunk
        refs = (residual2.reshape(B, F_ // B, T, C)[:, -1],
                mlp_out.reshape(B, F_ // B, T, C)[:, -1])
        return (h, taken, out), refs

    (h, _, out), refs = jax.lax.scan(
        body, (h, jnp.zeros((), jnp.int32), jnp.zeros_like(h)),
        params["layers"])
    new_cacher = cacher._replace(
        ref_pre_ln2=refs[0], ref_mlp_post=refs[1],
        has_ref=jnp.ones_like(cacher.has_ref),
        tokens_processed=cacher.tokens_processed + (F_ // B) * T)
    return out, new_cacher


def encode_cached(params, cfg: CLIPConfig, pixels: jax.Array,
                  cacher: ClipCacherState, skip_ratio: float,
                  *, feature_layer: int = -2,
                  ratio_strategy: str = "uniform", n_streams: int = 1
                  ) -> Tuple[jax.Array, ClipCacherState]:
    """MLP-skip chunk: full attention; LN2+MLP only for the least-similar
    tokens, the rest reuse the reference MLP output.  With n_streams > 1
    the frame axis is stream-major and each frame compares against ITS
    stream's reference."""
    h = embed(params, pixels, cfg)
    eps = cfg.layer_norm_eps
    F_, T, C = h.shape
    Fs = F_ // n_streams  # frames per stream
    ratios = layer_ratios(cfg.num_layers, skip_ratio, ratio_strategy)
    n_out = cfg.num_layers + feature_layer + 1 if feature_layer < 0 \
        else feature_layer

    # static per-layer compute counts
    n_skips = [int(max(0, min(T, int(T * r)))) for r in ratios]
    # lax.scan needs uniform shapes; group layers by compute count only when
    # uniform — otherwise run a python loop over layers (L is small)
    out = jnp.zeros_like(h)
    taken = 0
    skipped = jnp.zeros((), jnp.int32)
    lp_all = params["layers"]
    for li in range(cfg.num_layers):
        lp = {k: v[li] for k, v in lp_all.items()}
        hn = _layer_norm(h, lp["ln1_w"], lp["ln1_b"], eps)
        h = h + _attn(lp, hn, cfg)
        residual2 = h

        n_skip = n_skips[li]
        n_comp = T - n_skip
        # each frame compares against ITS stream's reference (stream-major
        # rows: frame row r belongs to stream r // Fs)
        ref_pre = jnp.repeat(cacher.ref_pre_ln2[li], Fs, axis=0)  # (F, T, C)
        ref_mlp = jnp.repeat(cacher.ref_mlp_post[li], Fs, axis=0)
        if n_skip == 0:
            hn2 = _layer_norm(h, lp["ln2_w"], lp["ln2_b"], eps)
            h = residual2 + _mlp(lp, hn2)
        else:
            r2 = residual2.astype(jnp.float32)
            rf = ref_pre.astype(jnp.float32)
            sim = (r2 * rf).sum(-1) / (
                jnp.linalg.norm(r2, axis=-1)
                * jnp.linalg.norm(rf, axis=-1) + 1e-8)       # (F, T)
            # compute the LEAST similar n_comp tokens
            _, comp_idx = jax.lax.top_k(-sim, n_comp)
            comp_idx = jnp.sort(comp_idx, axis=-1)
            frow = jnp.arange(F_)[:, None]
            toks = h[frow, comp_idx]                          # (F, K, C)
            toks = _layer_norm(toks, lp["ln2_w"], lp["ln2_b"], eps)
            toks = _mlp(lp, toks)
            mlp_full = ref_mlp.astype(h.dtype)
            mlp_full = mlp_full.at[frow, comp_idx].set(toks)
            h = residual2 + mlp_full
            skipped = skipped + Fs * n_skip  # per stream (uniform n_skip)
        taken += 1
        if taken == n_out:
            out = h
    new_cacher = cacher._replace(
        tokens_processed=cacher.tokens_processed + Fs * T,
        tokens_skipped=cacher.tokens_skipped + skipped)
    return out, new_cacher
