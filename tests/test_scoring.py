"""Retrieval/token scoring library + external-retrieval path."""

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.compress.scoring import (
    adaptive_keyframe_sampling, attention_mass_scores, dpc_knn_select,
    filter_tokens, frame_change_indices, kept_token_indices,
)


def test_aks_selects_top_when_separated():
    # one clearly-relevant region -> direct top-k selection
    scores = np.zeros((1, 100))
    scores[0, 40:44] = 10.0
    sel = adaptive_keyframe_sampling(scores, max_frames=4, t1=0.8)[0]
    assert sel == [40, 41, 42, 43]


def test_aks_splits_when_uniform():
    # uniform scores never separate -> recursive split keeps coverage
    rng = np.random.default_rng(0)
    scores = rng.uniform(0.4, 0.6, size=(1, 64))
    sel = adaptive_keyframe_sampling(scores, max_frames=8, t1=0.8)[0]
    assert len(sel) <= 64 and sel == sorted(sel)
    # selection spans both halves
    assert any(i < 32 for i in sel) and any(i >= 32 for i in sel)


def _dpc_knn_oracle(x, k, n_keep):
    """Sequential reference semantics (dpc_knn.py:8-58) in numpy."""
    n = x.shape[0]
    dist = np.linalg.norm(x[:, None] - x[None, :], axis=-1)
    rho = -np.sort(dist, axis=1)[:, 1:k + 1].mean(axis=1)
    order = np.argsort(-rho)
    delta = np.full(n, np.inf)
    for i in range(1, n):
        cur = order[i]
        delta[cur] = dist[cur, order[:i]].min()
    delta[order[0]] = dist[order[0]].max()
    rho_n = (rho - rho.min()) / (rho.max() - rho.min() + 1e-8)
    delta_n = (delta - delta.min()) / (delta.max() - delta.min() + 1e-8)
    gamma = rho_n * delta_n
    return set(np.argsort(-gamma)[:n_keep])


def test_dpc_knn_matches_sequential_oracle():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(40, 8)).astype(np.float32)
    got = set(np.asarray(dpc_knn_select(jnp.asarray(x), k=5, n_keep=10)))
    want = _dpc_knn_oracle(x, 5, 10)
    # tie-free random data: selections should agree almost exactly
    assert len(got & want) >= 9


def test_frame_change_detection():
    rng = np.random.default_rng(2)
    base = rng.normal(size=(16,)).astype(np.float32)
    frames = np.stack([base + rng.normal(scale=0.01, size=16)
                       for _ in range(30)])
    frames[20] = -base  # abrupt change at frame 20
    frames[21] = -base + rng.normal(scale=0.01, size=16)
    idx = frame_change_indices(jnp.asarray(frames[None]),
                               moving_avg_window=3)[0]
    assert any(19 <= i <= 22 for i in idx)


def test_attention_mass_and_keep_ratios():
    rng = np.random.default_rng(3)
    q = jnp.asarray(rng.normal(size=(1, 4, 5, 8)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, 2, 12, 8)), jnp.float32)
    s = attention_mass_scores(q, k)
    assert s.shape == (12,)
    np.testing.assert_allclose(float(s.sum()), 1.0, rtol=1e-5)

    kept = kept_token_indices(s, [0.5, 1.0], token_per_frame=6)
    assert len(kept) == 3 + 6
    assert all(i < 6 for i in np.asarray(kept)[:3])


def test_filter_tokens_strategies():
    rng = np.random.default_rng(4)
    toks = jnp.asarray(rng.normal(size=(12, 8)), jnp.float32)
    mem = jnp.asarray(rng.normal(size=(8,)), jnp.float32)
    for strat in ("filter_tokens_simple", "filter_tokens_magnitude",
                  "filter_tokens_euclidean_distance",
                  "filter_tokens_inverse_cosine", "filter_tokens_top_half"):
        idx = np.asarray(filter_tokens(strat, toks, mem, token_per_frame=6))
        assert idx.shape == (6,)  # half of each of 2 frames
        assert (idx[:3] < 6).all() and (idx[3:] >= 6).all()
    idx = np.asarray(filter_tokens("filter_tokens_random", toks, mem, 6,
                                   key=jax.random.key(0)))
    assert idx.shape == (6,)

    # simple == lowest-cos half; verify against manual computation
    x = np.asarray(toks)
    m = np.asarray(mem)
    cos = (x @ m) / (np.linalg.norm(x, axis=1) * np.linalg.norm(m))
    want0 = set(np.argsort(cos[:6])[:3])
    got0 = set(np.asarray(filter_tokens("filter_tokens_simple", toks, mem,
                                        6))[:3])
    assert got0 == want0


def test_external_retrieval_indices():
    from stc_tpu.config import ReKVConfig
    from stc_tpu.kvcache.engine import append_stream, init_stream_kv, \
        retrieve_blocks
    cfg = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=8,
                     topk=4, max_blocks=64, max_prompt_tokens=16,
                     max_new_tokens=4)
    rng = np.random.default_rng(5)
    kv = init_stream_kv(cfg, 1, 2, 16, dtype=jnp.float32)
    qi = jnp.asarray(rng.normal(size=(1, 4, 4, 16)), jnp.float32)
    ki = jnp.asarray(rng.normal(size=(1, 2, 4, 16)), jnp.float32)
    _, kv = append_stream(kv, qi, ki, ki, cfg, is_init=True)
    for _ in range(6):
        q = jnp.asarray(rng.normal(size=(1, 4, 8, 16)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, 2, 8, 16)), jnp.float32)
        _, kv = append_stream(kv, q, k, k, cfg, is_init=False)

    ext = jnp.asarray([[1, 3, -1, 99]], jnp.int32)  # 2 valid, 2 masked
    q = jnp.asarray(rng.normal(size=(1, 4, 5, 16)), jnp.float32)
    ret_k, ret_v, tok_valid, valid_len = retrieve_blocks(
        kv, q, cfg, block_indices=ext)
    assert int(valid_len[0]) == cfg.n_init + 2 * cfg.block_size
    # first retrieved block == stored block 1
    blk1 = np.asarray(kv.block_k)[0, :, 1]          # (Hkv, S, D)
    got = np.asarray(ret_k)[0, :, cfg.n_init:cfg.n_init + cfg.block_size]
    np.testing.assert_allclose(got, blk1)
