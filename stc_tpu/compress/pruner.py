"""STC-Pruner — post-projector spatiotemporal-saliency token pruning.

TPU-native re-implementation of reference model/prune.py:99-145:

  1. channel selection: keep the 50% LOWEST-variance channels of the chunk
     (select_feature_channel, prune.py:109-113; variance over all tokens,
     unbiased=False);
  2. running memory mean over per-chunk means (_update_memory, prune.py:103);
  3. multi-bandwidth Gaussian-RBF similarity of each (L2-normalized) token to
     the frame mean / memory mean (ScoreCalculator, prune.py:23-57; alphas
     2^-3..2^1; video score computed but unused in the combination);
  4. per-frame keep of the token_per_frame LOWEST combined scores, indices
     sorted ascending (prune.py:131-138).

Everything is static-shape: channel count, frames-per-chunk, and
token_per_frame are compile-time constants; the reference's python loops
become batched top-k + gathers.  The mutable history list becomes a
(sum, count) running-mean pytree.
"""

from __future__ import annotations

from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp

ALPHAS = tuple(2.0 ** k for k in range(-3, 2))


class PrunerState(NamedTuple):
    mean_sum: jax.Array  # (B, C_sel) sum of per-chunk means (selected chans)
    count: jax.Array     # (B,) number of chunks seen


def init_pruner_state(batch: int, n_selected_channels: int,
                      dtype=jnp.float32) -> PrunerState:
    return PrunerState(
        mean_sum=jnp.zeros((batch, n_selected_channels), dtype),
        count=jnp.zeros((batch,), jnp.int32),
    )


def _gaussian_similarity(feat: jax.Array, target: jax.Array) -> jax.Array:
    """sum_a exp(-||f - t||^2 / (2a)) — reference prune.py:23-34."""
    d2 = jnp.sum((feat - target) ** 2, axis=-1)
    return sum(jnp.exp(-d2 / (2.0 * a)) for a in ALPHAS)


def _l2norm(x, axis=-1, eps=1e-12):
    return x / jnp.maximum(jnp.linalg.norm(x, axis=axis, keepdims=True), eps)


def stc_prune(
    features: jax.Array,       # (B, F, Tin, C) post-projector frame features
    state: PrunerState,
    keep_per_frame: int,
    channel_keep_ratio: float = 0.5,
) -> Tuple[jax.Array, jax.Array, PrunerState]:
    """Returns (pruned (B, F, keep, C), kept_idx (B, F, keep), new_state)."""
    B, F, Tin, C = features.shape
    k_ch = int(C * channel_keep_ratio)
    f32 = features.astype(jnp.float32)

    # 1. lowest-variance channel selection over all tokens of the chunk
    flat = f32.reshape(B, F * Tin, C)
    var = jnp.var(flat, axis=1)                          # (B, C)
    _, ch_idx = jax.lax.top_k(-var, k_ch)                # lowest-variance k_ch
    sel = jnp.take_along_axis(flat, ch_idx[:, None, :], axis=2)  # (B, FT, k_ch)
    sel = sel.reshape(B, F, Tin, k_ch)

    # 2. running memory mean over chunk means (on selected channels)
    chunk_mean = sel.reshape(B, F * Tin, k_ch).mean(axis=1)      # (B, k_ch)
    mean_sum = state.mean_sum + chunk_mean
    count = state.count + 1
    memory_mean = mean_sum / count[:, None].astype(jnp.float32)  # (B, k_ch)

    # 3. scores on L2-normalized features
    feat_n = _l2norm(sel)                                 # (B, F, Tin, k_ch)
    frame_mean = feat_n.mean(axis=2, keepdims=True)       # (B, F, 1, k_ch)
    frame_score = _gaussian_similarity(feat_n, frame_mean)
    mem_n = _l2norm(memory_mean)[:, None, None, :]        # (B, 1, 1, k_ch)
    memory_score = _gaussian_similarity(feat_n, mem_n)
    combined = memory_score + frame_score                 # (B, F, Tin)

    # 4. keep the LOWEST-scoring keep_per_frame tokens per frame, sorted
    _, idx = jax.lax.top_k(-combined, keep_per_frame)     # (B, F, keep)
    idx = jnp.sort(idx, axis=-1)
    pruned = jnp.take_along_axis(features, idx[..., None], axis=2)
    return pruned, idx, PrunerState(mean_sum=mean_sum, count=count)


def map_indices_flat(idx: jax.Array, tokens_per_frame: int) -> jax.Array:
    """(B, F, keep) per-frame indices -> (B, F*keep) flat-chunk indices
    (reference IndexMapper._map_flat, prune.py:76-80)."""
    B, F, K = idx.shape
    off = (jnp.arange(F, dtype=idx.dtype) * tokens_per_frame)[None, :, None]
    return (idx + off).reshape(B, F * K)


def map_indices_grid(idx: jax.Array, grid: int = 13) -> jax.Array:
    """Grid-with-newline-token mapping for llava_vid (prune.py:83-97).

    Each frame's raw layout is grid x (grid+1): grid*grid feature tokens plus
    one newline token ending each row; kept feature indices map into that
    layout and every row's newline token is always kept.
    Returns (B, F*(keep+grid)) indices into the raw per-chunk layout.
    """
    B, F, K = idx.shape
    W = grid
    Wn = grid + 1
    rows = idx // W
    cols = idx % W
    frame_start = (jnp.arange(F, dtype=idx.dtype) * (grid * Wn))[None, :, None]
    feat = frame_start + rows * Wn + cols                 # (B, F, K)
    newline = frame_start + (jnp.arange(grid, dtype=idx.dtype) * Wn + W)[None, None, :]
    newline = jnp.broadcast_to(newline, (B, F, grid))
    return jnp.concatenate([feat, newline], axis=-1).reshape(B, F * (K + grid))
