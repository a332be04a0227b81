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


def _adaptive_pool2(x: jax.Array) -> jax.Array:
    """(H, W, C) -> (ceil(H/2), ceil(W/2), C) average pooling with torch
    adaptive_avg_pool2d bin boundaries (reference sttm.py:92-98; for even
    sizes identical to avg_pool2d k=2 s=2, :78-79)."""
    def pool_axis(a, axis):
        n = a.shape[axis]
        out = -(-n // 2)
        parts = []
        for i in range(out):
            lo, hi = (i * n) // out, -(-((i + 1) * n) // out)
            parts.append(jnp.take(a, jnp.arange(lo, hi), axis=axis
                                  ).mean(axis=axis, keepdims=True))
        return jnp.concatenate(parts, axis=axis)

    return pool_axis(pool_axis(x, 0), 1)


def sttm_pyramid(frame: jax.Array) -> list:
    """Coarse-to-fine feature pyramid (reference build_feature_pyramid,
    sttm.py:56-89): repeated 2x average pooling until the coarsest level is
    <= 2 on a side.  frame: (H, W, C)."""
    pyr = [frame]
    while pyr[0].shape[0] > 2:
        pyr.insert(0, _adaptive_pool2(pyr[0]))
    return pyr


def sttm_quadtree_candidates(frame: jax.Array,
                             similarity_threshold: float = 0.85):
    """Full multi-level quadtree evaluation (reference
    evaluate_quadtree_node, sttm.py:147-245) in static-shape form.

    The recursion becomes per-level masks: a node is REACHED iff every
    ancestor failed the merge test; a reached node whose <=4 children are
    cosine-similar to it on average above the threshold is a MERGED
    candidate (score = avg similarity, area = #children); reached
    finest-level nodes are leaf candidates (score 1.0, area 1).  Candidates
    partition the grid by construction.

    Returns per-level lists (same length as the pyramid):
      tokens[l]: (h_l, w_l, C), cand[l]: (h_l, w_l) bool,
      score[l], area[l], reached[l].
    """
    pyr = sttm_pyramid(frame.astype(jnp.float32))
    n = len(pyr)
    sims, areas_m = [], []
    for lvl in range(n - 1):
        parent, child = pyr[lvl], pyr[lvl + 1]
        h, w, C = parent.shape
        hn, wn = child.shape[:2]
        s_sum = jnp.zeros((h, w), jnp.float32)
        s_cnt = jnp.zeros((h, w), jnp.float32)
        pn = parent / jnp.maximum(jnp.linalg.norm(parent, axis=-1,
                                                  keepdims=True), 1e-8)
        cn = child / jnp.maximum(jnp.linalg.norm(child, axis=-1,
                                                 keepdims=True), 1e-8)
        for dy in range(2):
            for dx in range(2):
                cy = jnp.arange(h) * 2 + dy
                cx = jnp.arange(w) * 2 + dx
                valid = (cy[:, None] < hn) & (cx[None, :] < wn)
                cs = cn[jnp.minimum(cy, hn - 1)][:, jnp.minimum(cx, wn - 1)]
                s = (pn * cs).sum(-1)
                s_sum = s_sum + jnp.where(valid, s, 0.0)
                s_cnt = s_cnt + valid
        sims.append(s_sum / jnp.maximum(s_cnt, 1.0))
        areas_m.append(s_cnt)

    reached = [jnp.ones(pyr[0].shape[:2], bool)]
    for lvl in range(n - 1):
        merged = sims[lvl] >= similarity_threshold
        hn, wn = pyr[lvl + 1].shape[:2]
        parent_open = (reached[lvl] & ~merged)
        ys = jnp.arange(hn) // 2
        xs = jnp.arange(wn) // 2
        reached.append(parent_open[ys][:, xs])
    cand, score, area = [], [], []
    for lvl in range(n):
        if lvl < n - 1:
            merged = sims[lvl] >= similarity_threshold
            cand.append(reached[lvl] & merged)
            score.append(sims[lvl])
            area.append(areas_m[lvl])
        else:
            cand.append(reached[lvl])
            score.append(jnp.ones(pyr[lvl].shape[:2], jnp.float32))
            area.append(jnp.ones(pyr[lvl].shape[:2], jnp.float32))
    return pyr, cand, score, area, reached


def sttm_merge(frame_tokens: jax.Array, token_budget: int,
               similarity_threshold: float = 0.85):
    """Multi-level quadtree spatial token merging with a budget (reference
    experiment/sttm.py:6-313 spatial_token_merging_with_budget, one frame).

    frame_tokens: (H*W, C) tokens on a square grid.  Builds the full
    coarse-to-fine pyramid, runs the quadtree merge test at every level, and
    selects candidates under the budget by priority = score * area
    (reference select_tokens_by_budget:269-275).  Below budget, ALL
    candidates are returned (reference :263-267, the well-defined regime);
    above budget we take the top-budget priorities directly — candidates
    are disjoint by construction, so the reference's greedy non-overlap
    scan admits them in the same priority order (its region bookkeeping
    also computes scale factors from len(candidate_nodes) instead of the
    pyramid depth, :290, which makes that branch infeasible to execute —
    a reference defect not reproduced).

    Returns (tokens (budget, C), positions (budget, 3) = (y, x, level),
    valid (budget,)); slots past the candidate count are masked invalid.
    """
    N, C = frame_tokens.shape
    H = int(N ** 0.5)
    assert H * H == N, "square token grid expected"
    x = frame_tokens.reshape(H, H, C)
    pyr, cand, score, area, _ = sttm_quadtree_candidates(
        x, similarity_threshold)

    toks, prios, poss = [], [], []
    for lvl, p in enumerate(pyr):
        h, w, _ = p.shape
        toks.append(p.reshape(h * w, C))
        prio = jnp.where(cand[lvl], score[lvl] * area[lvl], -jnp.inf)
        prios.append(prio.reshape(-1))
        yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
        poss.append(jnp.stack(
            [yy.reshape(-1), xx.reshape(-1),
             jnp.full((h * w,), lvl, jnp.int32)], axis=1))
    all_t = jnp.concatenate(toks, axis=0)
    all_p = jnp.concatenate(prios, axis=0)
    all_pos = jnp.concatenate(poss, axis=0)

    budget = min(token_budget, all_t.shape[0])
    vals, idx = jax.lax.top_k(all_p, budget)
    out_t = all_t[idx].astype(frame_tokens.dtype)
    out_pos = all_pos[idx].astype(jnp.int32)
    return out_t, out_pos, jnp.isfinite(vals)


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
