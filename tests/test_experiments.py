"""ToMe / DBDPC token-reduction baselines."""

import numpy as np
import jax.numpy as jnp

from stc_tpu.compress.experiments import dbdpc_reduce, tome_merge


def test_tome_merges_most_similar_pairs():
    rng = np.random.default_rng(0)
    # 8 tokens; token 0 (A) nearly identical to token 1 (B)
    x = rng.normal(size=(8, 4)).astype(np.float32)
    x[0] = x[1] + 1e-3
    metric = x / np.linalg.norm(x, axis=1, keepdims=True)
    merged, sizes, keep = tome_merge(jnp.asarray(metric), jnp.asarray(x),
                                     jnp.ones(8), r=1)
    keep = np.asarray(keep)
    assert not keep[0] and keep[1]          # A merged into B
    assert keep.sum() == 7
    np.testing.assert_allclose(np.asarray(sizes)[1], 2.0)
    np.testing.assert_allclose(np.asarray(merged)[1],
                               (x[0] + x[1]) / 2, rtol=1e-5)


def test_tome_r_zero_keeps_all():
    rng = np.random.default_rng(1)
    x = rng.normal(size=(6, 4)).astype(np.float32)
    merged, sizes, keep = tome_merge(jnp.asarray(x), jnp.asarray(x),
                                     jnp.ones(6), r=0)
    assert np.asarray(keep).all()
    np.testing.assert_allclose(np.asarray(merged), x, rtol=1e-5)


def test_dbdpc_reduce_clusters():
    rng = np.random.default_rng(2)
    # two tight clusters -> 2 exemplars near the cluster means
    a = rng.normal(scale=0.05, size=(10, 3)) + np.array([5, 0, 0])
    b = rng.normal(scale=0.05, size=(10, 3)) - np.array([5, 0, 0])
    x = np.concatenate([a, b]).astype(np.float32)
    reduced, idx = dbdpc_reduce(jnp.asarray(x), n_keep=2, k=3)
    reduced = np.asarray(reduced)
    means = sorted(reduced[:, 0])
    assert means[0] < -4.5 and means[1] > 4.5


def _ref_sttm():
    """Load the reference's own sttm.py (self-contained torch module)."""
    import importlib.util
    import os
    path = "/root/reference/model/experiment/sttm.py"
    if not os.path.exists(path):
        return None
    spec = importlib.util.spec_from_file_location("ref_sttm", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


def _sttm_case(H, seed, homogeneous_cells=()):
    rng = np.random.default_rng(seed)
    x = rng.normal(size=(H, H, 8)).astype(np.float32)
    for (y, x0) in homogeneous_cells:  # make a 2x2 region near-identical
        base = x[y, x0]
        for dy in range(2):
            for dx in range(2):
                x[y + dy, x0 + dx] = base + rng.normal(scale=1e-4, size=8)
    return x


def _run_both(x, thr, budget):
    """Run the reference quadtree and ours on one frame; return position
    sets {(y, x, level)} and token maps for comparison."""
    import pytest
    import torch
    from stc_tpu.compress.experiments import sttm_merge
    ref = _ref_sttm()
    if ref is None:
        pytest.skip("reference tree not present")
    H = x.shape[0]
    pyr = ref.build_feature_pyramid(torch.from_numpy(x))
    ref_t, ref_pos = ref.quadtree_spatial_merge_with_budget(
        pyr, budget, thr, frame_idx=0)
    ref_map = {tuple(int(v) for v in p[1:].tolist()): t.numpy()
               for p, t in zip(ref_pos, ref_t)}
    # reference positions are (t, y, x, level) with level counted
    # coarse-first — same numbering as ours
    got_t, got_pos, got_valid = sttm_merge(jnp.asarray(x.reshape(-1, 8)),
                                           token_budget=budget,
                                           similarity_threshold=thr)
    got_map = {tuple(int(v) for v in p): np.asarray(t)
               for t, p, ok in zip(np.asarray(got_t), np.asarray(got_pos),
                                   np.asarray(got_valid)) if ok}
    return ref_map, got_map


def test_sttm_quadtree_matches_reference_even_grid():
    """Full multi-level quadtree parity vs the reference's own sttm.py
    (model/experiment/sttm.py:6-245) in the below-budget regime, where the
    reference's selection is well-defined (returns all candidates): same
    candidate set {(y,x,level)} and same merged token values.  8x8 grid ->
    3 pyramid levels."""
    x = _sttm_case(8, seed=3, homogeneous_cells=[(0, 0), (4, 2)])
    ref_map, got_map = _run_both(x, thr=0.9, budget=64)
    assert set(got_map) == set(ref_map)
    assert any(p[2] < 2 for p in got_map), "no multi-level merge happened"
    for p in ref_map:
        np.testing.assert_allclose(got_map[p], ref_map[p], rtol=1e-5,
                                   atol=1e-5)


def test_sttm_quadtree_matches_reference_odd_grid():
    """Odd grid sizes exercise the adaptive (ceil) pooling and the partial
    2x2 child neighborhoods at every level (7 -> 4 -> 2)."""
    x = _sttm_case(7, seed=5, homogeneous_cells=[(2, 2)])
    # low threshold so several coarse nodes merge despite random tokens
    ref_map, got_map = _run_both(x, thr=0.0, budget=49)
    assert set(got_map) == set(ref_map)
    for p in ref_map:
        np.testing.assert_allclose(got_map[p], ref_map[p], rtol=1e-5,
                                   atol=1e-5)


def test_sttm_budget_selection_properties():
    """Over budget: top-priority (score*area) candidates win; output is
    exactly `budget` tokens (the reference's greedy branch computes region
    scales from the candidate count, sttm.py:290 — infeasible to execute,
    documented deviation)."""
    from stc_tpu.compress.experiments import sttm_merge
    x = _sttm_case(8, seed=7, homogeneous_cells=[(0, 0)])
    t_all, p_all, v_all = sttm_merge(jnp.asarray(x.reshape(-1, 8)),
                                     token_budget=84, similarity_threshold=0.9)
    n_cand = int(np.asarray(v_all).sum())
    budget = n_cand - 3
    t, p, v = sttm_merge(jnp.asarray(x.reshape(-1, 8)), token_budget=budget,
                         similarity_threshold=0.9)
    assert np.asarray(v).all() and t.shape == (budget, 8)
    # merged (coarse) nodes have priority score*area ~= 4 > leaves' 1, so
    # every merged candidate survives the cut
    full = {tuple(int(i) for i in q) for q, ok
            in zip(np.asarray(p_all), np.asarray(v_all)) if ok and q[2] < 2}
    kept = {tuple(int(i) for i in q) for q in np.asarray(p)}
    assert full <= kept


def test_kmeans_select_two_clusters():
    from stc_tpu.compress.experiments import kmeans_select
    rng = np.random.default_rng(4)
    a = rng.normal(scale=0.05, size=(12, 3)) + np.array([4, 0, 0])
    b = rng.normal(scale=0.05, size=(12, 3)) - np.array([4, 0, 0])
    x = np.concatenate([a, b]).astype(np.float32)
    cent, assign = kmeans_select(jnp.asarray(x), 2, key=__import__("jax").random.key(1))
    cent = np.asarray(cent)
    assert sorted(np.round(cent[:, 0])) == [-4.0, 4.0]
    assign = np.asarray(assign)
    assert len(set(assign[:12])) == 1 and len(set(assign[12:])) == 1


def test_select_top_half_kv_matches_torch_reference_math():
    """Oracle for the USE_KV_COMPRESSION append hook
    (kv_cache_manager.py:2190-2247): per frame, keep ceil(S/2) tokens by the
    head/dim mean of the attention outputs, frame-major order."""
    import numpy as np
    import jax.numpy as jnp
    from stc_tpu.compress.experiments import select_top_half_kv
    rng = np.random.default_rng(0)
    B, Hkv, Hq, S, F, D = 2, 2, 4, 7, 3, 8
    T = F * S
    k = rng.normal(size=(B, Hkv, T, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, T, D)).astype(np.float32)
    o = rng.normal(size=(B, Hq, T, D)).astype(np.float32)

    k_kept, v_kept, idx = select_top_half_kv(
        jnp.asarray(k), jnp.asarray(v), jnp.asarray(o), S)
    keep = -(-S // 2)
    assert k_kept.shape == (B, Hkv, F * keep, D)

    # numpy replica of the torch code path
    for b in range(B):
        outs_k = []
        for f in range(F):
            seg = slice(f * S, (f + 1) * S)
            score = o[b, :, seg].mean(axis=(0, 2))          # (S,)
            top = np.argsort(-score, kind="stable")[:keep]  # torch.topk order
            outs_k.append(k[b, :, seg][:, top])
        want_k = np.concatenate(outs_k, axis=1)
        np.testing.assert_allclose(np.asarray(k_kept)[b], want_k,
                                   rtol=1e-5, atol=1e-5)
        assert np.all(np.asarray(idx)[b] // S == np.repeat(np.arange(F), keep))
