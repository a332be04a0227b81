"""Competitor token-reduction baselines (the reference's experiment graveyard).

TPU-native ports of the self-contained algorithms under
model/experiment/ — used as ablation baselines against the STC-Pruner:

- ToMe bipartite soft matching (tome.py:1-120): alternate tokens into A/B
  sets, match each A to its most-similar B, merge the top-r pairs by
  size-weighted averaging.  Static shapes: output keeps num_tokens slots
  with a keep-mask (merged-away tokens are masked), which is how the
  streaming engine consumes reduced token sets anyway.
- DBDPC-style density clustering reduction (DBDPC.py): select density-peak
  exemplars via DPC-KNN and assign every token to its nearest exemplar,
  merging by mean.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp

from stc_tpu.compress.scoring import dpc_knn_select


def tome_merge(metric: jax.Array, x: jax.Array, sizes: jax.Array, r: int
               ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Bipartite soft matching + component merge.

    metric: (N, Dm) similarity features (normalized outside if desired);
    x: (N, D) tokens to merge; sizes: (N,) token weights.
    Returns (merged_x (N, D), new_sizes (N,), keep_mask (N,)) — kept slots
    hold the size-weighted component means; merged-away slots are masked.
    """
    N = metric.shape[0]
    assert N % 2 == 0, "pad to even token count"
    A = jnp.arange(0, N, 2)
    B = jnp.arange(1, N, 2)
    sim = metric[A].astype(jnp.float32) @ metric[B].astype(jnp.float32).T
    best_B = jnp.argmax(sim, axis=-1)            # (N/2,)
    best_val = jnp.max(sim, axis=-1)
    r = min(r, N // 2)
    _, top_a = jax.lax.top_k(best_val, r)        # A rows to merge

    labels = jnp.arange(N)
    a_idx = A[top_a]
    b_idx = B[best_B[top_a]]
    labels = labels.at[a_idx].set(b_idx)         # A joins its B component

    # size-weighted merge by label (labels are either self or a B index,
    # so one scatter-add settles all components: depth-1 label graph)
    w = sizes.astype(jnp.float32)
    wsum = jnp.zeros((N,), jnp.float32).at[labels].add(w)
    xsum = jnp.zeros_like(x, shape=(N, x.shape[1])).astype(jnp.float32)
    xsum = xsum.at[labels].add(x.astype(jnp.float32) * w[:, None])
    keep = wsum > 0
    merged = xsum / jnp.maximum(wsum, 1e-8)[:, None]
    return merged.astype(x.dtype), wsum.astype(sizes.dtype), keep


def sttm_merge(frame_tokens: jax.Array, token_budget: int,
               similarity_threshold: float = 0.85) -> jax.Array:
    """Quadtree-flavoured spatial token merging with a fixed budget
    (reference experiment/sttm.py, static-shape formulation).

    frame_tokens: (H*W, C) single-frame tokens on a square grid.
    Spatially homogeneous 2x2 cells (children cosine-similar to their mean
    above the threshold) are represented by their mean; the budget is met by
    keeping the `token_budget` LEAST-mergeable tokens at full resolution and
    the coarsest summaries elsewhere.  Returns (token_budget, C).
    """
    N, C = frame_tokens.shape
    H = int(N ** 0.5)
    assert H * H == N, "square token grid expected"
    x = frame_tokens.astype(jnp.float32).reshape(H, W := H, C)

    # one pyramid level: 2x2 cell means + per-token similarity to cell mean
    h2 = H // 2
    cells = x[: h2 * 2, : h2 * 2].reshape(h2, 2, h2, 2, C)
    mean = cells.mean(axis=(1, 3), keepdims=True)
    sim = (cells * mean).sum(-1) / jnp.maximum(
        jnp.linalg.norm(cells, axis=-1) * jnp.linalg.norm(mean, axis=-1),
        1e-8)
    cell_min_sim = sim.min(axis=(1, 3))               # (h2, h2)
    # per-token mergeability = its cell's cohesion (high = safe to merge)
    merge_score = jnp.repeat(jnp.repeat(cell_min_sim, 2, 0), 2, 1)
    merge_score = jnp.pad(merge_score, ((0, H - h2 * 2), (0, H - h2 * 2)),
                          constant_values=-1.0).reshape(-1)

    # keep the least-mergeable tokens; replace the rest with their cell mean
    _, keep_idx = jax.lax.top_k(-merge_score, token_budget)
    keep_idx = jnp.sort(keep_idx)
    means_full = jnp.repeat(jnp.repeat(mean[:, 0, :, 0], 2, 0), 2, 1)
    means_full = jnp.pad(means_full,
                         ((0, H - h2 * 2), (0, H - h2 * 2), (0, 0)))
    merged = jnp.where((merge_score >= similarity_threshold)[:, None],
                       means_full.reshape(-1, C), x.reshape(-1, C))
    return merged[keep_idx].astype(frame_tokens.dtype)


def kmeans_select(x: jax.Array, n_clusters: int, iters: int = 10,
                  key=None) -> Tuple[jax.Array, jax.Array]:
    """k-means token reduction (reference experiment/k-means.py):
    returns (centroids (n_clusters, C), assignment (N,))."""
    N, C = x.shape
    xf = x.astype(jnp.float32)
    if key is None:
        key = jax.random.key(0)
    init_idx = jax.random.choice(key, N, (n_clusters,), replace=False)
    cent = xf[init_idx]

    def step(cent, _):
        d2 = jnp.sum((xf[:, None] - cent[None]) ** 2, axis=-1)
        assign = jnp.argmin(d2, axis=1)
        s = jnp.zeros_like(cent).at[assign].add(xf)
        cnt = jnp.zeros((n_clusters,), jnp.float32).at[assign].add(1.0)
        cent = jnp.where(cnt[:, None] > 0, s / jnp.maximum(cnt, 1.0)[:, None],
                         cent)
        return cent, None

    cent, _ = jax.lax.scan(step, cent, None, length=iters)
    d2 = jnp.sum((xf[:, None] - cent[None]) ** 2, axis=-1)
    return cent.astype(x.dtype), jnp.argmin(d2, axis=1)


def dbdpc_reduce(x: jax.Array, n_keep: int, k: int = 5
                 ) -> Tuple[jax.Array, jax.Array]:
    """Density-based clustering reduction: pick n_keep density peaks with
    DPC-KNN, assign every token to its nearest peak, return cluster means.

    x: (N, D).  Returns (reduced (n_keep, D), exemplar indices (n_keep,)).
    """
    idx = dpc_knn_select(x, k=k, n_keep=n_keep)
    centers = x[idx].astype(jnp.float32)         # (n_keep, D)
    xf = x.astype(jnp.float32)
    d2 = jnp.sum((xf[:, None, :] - centers[None, :, :]) ** 2, axis=-1)
    assign = jnp.argmin(d2, axis=1)              # (N,)
    csum = jnp.zeros_like(centers).at[assign].add(xf)
    cnt = jnp.zeros((n_keep,), jnp.float32).at[assign].add(1.0)
    return (csum / jnp.maximum(cnt, 1.0)[:, None]).astype(x.dtype), idx


def select_top_half_kv(local_k: jax.Array, local_v: jax.Array,
                       attn_outputs: jax.Array, token_per_frame: int
                       ) -> Tuple[jax.Array, jax.Array, jax.Array]:
    """Local-window KV compression experiment (reference USE_KV_COMPRESSION
    hook inside ContextManager.append, kv_cache_manager.py:2315-2321, math
    at select_top_half_kv :2190-2247): for each newly-appended frame, keep
    the ceil(half) of its tokens whose ATTENTION OUTPUTS have the largest
    head/dim mean, and splice them over the window tail.

    local_k/local_v: (B, Hkv, T, D) window tail holding F = T//token_per_frame
    whole frames; attn_outputs: (B, Hq, T, D) this append's attention outputs.
    Returns (k_kept, v_kept, kept_idx) with T' = F * ceil(token_per_frame/2);
    kept_idx (B, T') are indices into the input tail (frame-major, the
    reference's torch.topk order — NOT re-sorted within a frame).
    """
    B, Hkv, T, D = local_k.shape
    S = token_per_frame
    F = T // S
    keep = -(-S // 2)
    # token saliency: mean over heads and dims of the attention output
    # (reference token_score = attn.mean(dim=(1, 3)))
    score = attn_outputs.astype(jnp.float32).mean(axis=(1, 3))    # (B, T)
    score_f = score.reshape(B, F, S)
    _, top = jax.lax.top_k(score_f, keep)                         # (B, F, keep)
    kept_idx = (top + (jnp.arange(F, dtype=jnp.int32) * S)[None, :, None]
                ).reshape(B, F * keep)
    bidx = jnp.arange(B, dtype=jnp.int32)[:, None]
    k_kept = local_k[bidx, :, kept_idx].transpose(0, 2, 1, 3)
    v_kept = local_v[bidx, :, kept_idx].transpose(0, 2, 1, 3)
    return k_kept, v_kept, kept_idx
