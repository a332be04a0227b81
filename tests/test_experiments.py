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


def test_sttm_merge_budget_and_homogeneity():
    from stc_tpu.compress.experiments import sttm_merge
    rng = np.random.default_rng(3)
    # 4x4 grid: top-left 2x2 cell identical tokens (mergeable), rest random
    x = rng.normal(size=(16, 8)).astype(np.float32)
    x[0] = x[1] = x[4] = x[5] = x[0]
    out = sttm_merge(jnp.asarray(x), token_budget=8)
    assert out.shape == (8, 8)
    # heterogeneous tokens survive at full resolution: every kept row is
    # either an original token or the homogeneous cell's mean
    kept = np.asarray(out)
    orig = {tuple(np.round(r, 4)) for r in x}
    cellmean = tuple(np.round(x[[0, 1, 4, 5]].mean(0), 4))
    for r in kept:
        t = tuple(np.round(r, 4))
        assert t in orig or t == cellmean


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
