"""Retrieval / token scoring library.

TPU-native re-implementations of the reference's alternative scorers used by
the ablation retrieval paths (SURVEY.md component #14):

- adaptive_keyframe_sampling  (model/attention/aks.py:6-121) — recursive
  split until the top scores separate from the mean; host-side numpy (runs
  once per question on a tiny score vector, like the reference).
- dpc_knn_select              (model/attention/dpc_knn.py:8-109) — density-
  peak clustering with KNN density; vectorized jnp (the reference's
  sequential delta loop becomes a masked min over higher-density points).
- frame_change_indices        (model/attention/mae_cosine_sim.py:5-96) —
  smoothed 1-cos of consecutive frame features vs a dynamic threshold.
- attention_mass_scores       (model/attention/sparse_loading.py:106-137) —
  per-key attention mass of retrieved image keys under the question queries.
- kept_token_indices          (sparse_loading.py:146-190) — per-frame top-k
  keep by ratio.
- filter_tokens_*             (model/attention/rekv_attention.py:54-263) —
  the retrieved-KV compression strategies, dispatched by name.
"""

from __future__ import annotations

from typing import List, Sequence

import numpy as np
import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# Adaptive keyframe sampling (AKS)
# ---------------------------------------------------------------------------

def adaptive_keyframe_sampling(scores: np.ndarray, max_frames: int = 64,
                               t1: float = 0.8, t2: float = -100.0,
                               max_depth: int = 5) -> List[List[int]]:
    """scores: (B, n_frames).  Returns per-batch sorted selected indices."""
    scores = np.asarray(scores, np.float64)
    out = []
    for row in scores:
        lo, hi = row.min(), row.max()
        norm = (row - lo) / (hi - lo) if hi != lo else row
        sel = _aks_recurse(list(norm), list(range(len(row))), max_frames,
                           t1, t2, max_depth, 0)
        if len(sel) > max_frames:
            sel = sorted(sel, key=lambda i: -row[i])[:max_frames]
        out.append(sorted(sel))
    return out


def _aks_recurse(scores, indices, target, t1, t2, max_depth, depth):
    if target <= 0:
        return []
    if len(scores) <= target or depth >= max_depth:
        return indices
    mean = sum(scores) / len(scores)
    std = (sum((s - mean) ** 2 for s in scores) / len(scores)) ** 0.5
    top_n = min(target, len(scores))
    top_pos = sorted(range(len(scores)), key=lambda i: -scores[i])[:top_n]
    top_mean = sum(scores[i] for i in top_pos) / top_n
    if top_mean - mean > t1 and std > t2:
        return [indices[i] for i in top_pos]
    mid = len(scores) // 2
    left_target = int(target * mid / len(scores))
    return (_aks_recurse(scores[:mid], indices[:mid], left_target, t1, t2,
                         max_depth, depth + 1)
            + _aks_recurse(scores[mid:], indices[mid:], target - left_target,
                           t1, t2, max_depth, depth + 1))


# ---------------------------------------------------------------------------
# DPC-KNN
# ---------------------------------------------------------------------------

def dpc_knn_select(x: jax.Array, k: int, n_keep: int) -> jax.Array:
    """x: (N, C).  Returns indices of the n_keep density-peak tokens.

    rho = -mean distance to k nearest neighbours; delta = min distance to any
    higher-density token (max distance for the density peak);
    gamma = norm(rho) * norm(delta); keep top-gamma.
    """
    N = x.shape[0]
    xf = x.astype(jnp.float32)
    d2 = jnp.sum((xf[:, None, :] - xf[None, :, :]) ** 2, axis=-1)
    dist = jnp.sqrt(jnp.maximum(d2, 0.0))
    knn = jnp.sort(dist, axis=1)[:, 1:k + 1]
    rho = -knn.mean(axis=1)

    higher = rho[None, :] > rho[:, None]                     # (N, N)
    delta = jnp.min(jnp.where(higher, dist, jnp.inf), axis=1)
    # density peak: delta = max distance to anything
    peak = jnp.argmax(rho)
    delta = delta.at[peak].set(dist[peak].max())

    def norm01(v):
        return (v - v.min()) / (v.max() - v.min() + 1e-8)

    gamma = norm01(rho) * norm01(jnp.where(jnp.isfinite(delta), delta, 0.0))
    _, idx = jax.lax.top_k(gamma, n_keep)
    return idx


# ---------------------------------------------------------------------------
# Frame-change detection (MAE cosine)
# ---------------------------------------------------------------------------

def frame_change_scores(feats: jax.Array, moving_avg_window: int = 5):
    """feats: (B, T, C).  Returns smoothed change scores (B, T-1)."""
    a = feats[:, :-1].astype(jnp.float32)
    b = feats[:, 1:].astype(jnp.float32)
    cos = jnp.sum(a * b, -1) / jnp.maximum(
        jnp.linalg.norm(a, axis=-1) * jnp.linalg.norm(b, axis=-1), 1e-8)
    change = 1.0 - cos                                       # (B, T-1)
    if change.shape[1] < moving_avg_window:
        return change
    kernel = jnp.ones((moving_avg_window,)) / moving_avg_window
    pad = (moving_avg_window - 1) // 2
    sm = jax.vmap(lambda r: jnp.convolve(r, kernel, mode="full")
                  [pad:pad + r.shape[0]])(change)
    return sm


def frame_change_indices(feats: jax.Array, moving_avg_window: int = 5,
                         threshold_factor: float = 2.0) -> List[np.ndarray]:
    """Sudden-change frame indices per batch row (host-side result)."""
    sm = np.asarray(frame_change_scores(feats, moving_avg_window))
    out = []
    for row in sm:
        thr = row.mean() + threshold_factor * row.std(ddof=1)
        out.append(np.where(row > thr)[0] + 1)
    return out


# ---------------------------------------------------------------------------
# Attention-mass token scoring + per-frame keeps
# ---------------------------------------------------------------------------

def attention_mass_scores(q: jax.Array, k: jax.Array) -> jax.Array:
    """q: (B, Hq, Lq, D); k: (B, Hkv, Lk, D) GQA-grouped.
    Returns (Lk,) mean attention mass per key (batch 0), reference
    compute_image_attention_scores."""
    B, Hq, Lq, D = q.shape
    Hkv = k.shape[1]
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, Lq, D).astype(jnp.float32)
    lg = jnp.einsum("bhgqd,bhkd->bhgqk", qg, k.astype(jnp.float32))
    lg = lg.reshape(B, Hq, Lq, -1) * (D ** -0.5)
    p = jax.nn.softmax(lg, axis=-1)
    return p[0].mean(axis=0).mean(axis=0)


def kept_token_indices(token_scores: jax.Array, keep_ratios: Sequence[float],
                       token_per_frame: int) -> jax.Array:
    """Per-frame top-k keep by ratio; returns sorted global indices."""
    n_frames = len(keep_ratios)
    outs = []
    for f in range(n_frames):
        seg = token_scores[f * token_per_frame:(f + 1) * token_per_frame]
        keep = max(1, int(token_per_frame * keep_ratios[f]))
        _, idx = jax.lax.top_k(seg, keep)
        outs.append(idx + f * token_per_frame)
    return jnp.concatenate(outs)


# ---------------------------------------------------------------------------
# Selectable block-retrieval strategies (reference aks/dpc_knn/l2norm
# *_calc_block_topk, kv_cache_manager.py:934-1412) — host-side per question,
# operating on the per-layer rep keys + question mean query
# ---------------------------------------------------------------------------

def chunked_topk(scores: np.ndarray, topk: int, chunk_size: int):
    """Reference chunk-grouped top-k with remainder chunk + overflow filter
    (kv_cache_manager.py:1029-1059).  scores: (n,).  Returns sorted indices."""
    n = scores.shape[0]
    if n <= topk:
        return list(range(n))
    rem = n % chunk_size
    main = scores[: n - rem].reshape(-1, chunk_size).mean(axis=-1)
    if rem > 0:
        main = np.concatenate([main, [scores[n - rem:].mean()]])
    top = np.sort(np.argsort(-main, kind="stable")[: topk // chunk_size])
    idx = (top[:, None] * chunk_size + np.arange(chunk_size)[None, :]
           ).reshape(-1)
    return [int(i) for i in idx if i < n]


def select_blocks(strategy: str, logits: np.ndarray, reps: np.ndarray,
                  q_mean: np.ndarray, topk: int, chunk_size: int):
    """Alternative block retrieval.  logits: (n,) rep.q dot scores;
    reps: (n, C) flat rep vectors; q_mean: (C,).  Returns sorted indices.

    - 'aks':     cosine scores -> adaptive keyframe sampling (reference
                 aks_calc_block_topk: t1=0.8, t2=-100, max_depth=5).
    - 'dpc_knn': density-peak clustering of the rep vectors (k=20).
    - 'l2norm':  rep L2 norms as the score, chunk-grouped top-k
                 (query-independent, reference l2norm_calc_block_topk).
    """
    n = logits.shape[0]
    if n <= topk:
        return list(range(n))
    if strategy == "mean_dot":
        # default scorer (host-side replica of engine.score_blocks) — used
        # when the layerwise path is driven directly for observability
        return chunked_topk(logits, topk, chunk_size)
    if strategy == "aks":
        denom = (np.linalg.norm(reps, axis=-1) * np.linalg.norm(q_mean)
                 + 1e-8)
        cos = logits / denom
        sel = adaptive_keyframe_sampling(cos[None], max_frames=topk)[0]
        return sorted(sel)
    if strategy == "dpc_knn":
        idx = dpc_knn_select(jnp.asarray(reps), k=min(20, n - 1),
                             n_keep=min(topk, n))
        return sorted(int(i) for i in np.asarray(idx))
    if strategy == "l2norm":
        return chunked_topk(np.linalg.norm(reps, axis=-1), topk, chunk_size)
    raise ValueError(f"unknown retrieval scorer: {strategy}")


# ---------------------------------------------------------------------------
# Retrieved-KV compression strategies (filter_tokens_* family)
# ---------------------------------------------------------------------------

def _per_frame_bottom_half(metric: jax.Array, token_per_frame: int,
                           largest: bool = False) -> jax.Array:
    """metric: (T,) -> indices keeping half of each frame by metric."""
    n_frames = metric.shape[0] // token_per_frame
    keep = token_per_frame // 2
    m = metric[:n_frames * token_per_frame].reshape(n_frames, token_per_frame)
    vals = m if largest else -m
    _, idx = jax.lax.top_k(vals, keep)                       # (F, keep)
    off = (jnp.arange(n_frames) * token_per_frame)[:, None]
    return (idx + off).reshape(-1)


def filter_tokens(strategy: str, video_tokens: jax.Array,
                  memory_mean: jax.Array, token_per_frame: int,
                  key=None) -> jax.Array:
    """video_tokens: (T, C); memory_mean: (C,).  Returns kept indices.

    Strategies mirror reference rekv_attention.py:54-263 (percentile is
    approximated by its top-half-smallest equivalent under static shapes).
    """
    x = video_tokens.astype(jnp.float32)
    m = memory_mean.astype(jnp.float32)
    cos = jnp.sum(x * m, -1) / jnp.maximum(
        jnp.linalg.norm(x, axis=-1) * jnp.linalg.norm(m), 1e-8)
    if strategy in ("filter_tokens_simple", "filter_tokens_percentile"):
        return _per_frame_bottom_half(cos, token_per_frame)
    if strategy == "filter_tokens_top_half":
        return _per_frame_bottom_half(cos, token_per_frame, largest=True)
    if strategy == "filter_tokens_magnitude":
        return _per_frame_bottom_half(jnp.linalg.norm(x, axis=-1),
                                      token_per_frame)
    if strategy == "filter_tokens_euclidean_distance":
        return _per_frame_bottom_half(jnp.linalg.norm(x - m, axis=-1),
                                      token_per_frame)
    if strategy == "filter_tokens_inverse_cosine":
        return _per_frame_bottom_half(1.0 / (jnp.abs(cos) + 1e-8),
                                      token_per_frame)
    if strategy == "filter_tokens_random":
        assert key is not None
        n_frames = x.shape[0] // token_per_frame
        keep = token_per_frame // 2
        idx = jax.vmap(lambda k: jax.random.permutation(
            k, token_per_frame)[:keep])(jax.random.split(key, n_frames))
        off = (jnp.arange(n_frames) * token_per_frame)[:, None]
        return (idx + off).reshape(-1)
    raise ValueError(f"Invalid processor_type: {strategy}")
