"""Config-selectable ablation paths (VERDICT #6): alternative block-retrieval
scorers (aks / dpc_knn / l2norm) and retrieved-KV compression actually wired
into the engine + session (reference kv_cache_manager.py:934-1412 and
rekv_attention.py PRUNE_RETIREVED_KV)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.kvcache.engine import (append_stream, compress_retrieved,
                                    init_stream_kv, retrieve_blocks)
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession

HQ, HKV, D = 4, 2, 16

CFG = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=8,
                 topk=4, chunk_size=1, max_blocks=64,
                 max_prompt_tokens=16, max_new_tokens=8)


def build_kv(n_blocks, cfg=CFG, seed=0):
    rng = np.random.default_rng(seed)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(1, HQ, cfg.n_init, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, cfg.n_init, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, cfg.n_init, D)), jnp.float32)
    _, kv = append_stream(kv, q, k, v, cfg, is_init=True)
    for _ in range(n_blocks):
        q = jnp.asarray(rng.normal(size=(1, HQ, 8, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, HKV, 8, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, HKV, 8, D)), jnp.float32)
        _, kv = append_stream(kv, q, k, v, cfg, is_init=False)
    return kv, rng


# ---------------------------------------------------------------------------
# Retrieved-KV compression (engine level, vs numpy replica)
# ---------------------------------------------------------------------------

def test_compress_retrieved_matches_numpy_semantics():
    cfg = dataclasses.replace(
        CFG, retrieved_kv_compression="filter_tokens_simple")
    kv, rng = build_kv(12, cfg)
    q = jnp.asarray(rng.normal(size=(1, HQ, 6, D)), jnp.float32)
    ret_k, ret_v, _, valid_len = retrieve_blocks(kv, q, cfg)
    ck, cv, new_valid = compress_retrieved(kv, cfg, ret_k, ret_v, valid_len)

    S, nI = cfg.block_size, cfg.n_init
    assert ck.shape[2] == nI + cfg.topk * (S // 2)
    assert int(new_valid[0]) == nI + (int(valid_len[0]) - nI) // S * (S // 2)
    # init tokens untouched
    np.testing.assert_array_equal(np.asarray(ck[:, :, :nI]),
                                  np.asarray(ret_k[:, :, :nI]))

    # numpy replica of filter_tokens_simple (reference rekv_attention.py:54):
    # cosine of each retrieved key (flat over kv heads) vs the mean rep key,
    # keep the per-frame half with the SMALLEST similarity, order preserved
    n = int(kv.num_blocks[0])
    reps = np.asarray(kv.block_rep, np.float32)[0, :n]        # (n, Hkv, D)
    mem = reps.mean(axis=0).reshape(-1)                       # (Hkv*D,)
    toks = np.asarray(ret_k, np.float32)[0, :, nI:]           # (Hkv, R-nI, D)
    toks = toks.transpose(1, 0, 2).reshape(toks.shape[1], -1)
    cos = (toks @ mem) / np.maximum(
        np.linalg.norm(toks, axis=-1) * np.linalg.norm(mem), 1e-8)
    want = []
    for f in range(cfg.topk):
        seg = cos[f * S:(f + 1) * S]
        keep = np.sort(np.argsort(seg, kind="stable")[: S // 2]) + f * S
        want.extend(keep.tolist())
    got = np.asarray(ck, np.float32)[0, :, nI:]
    exp = np.asarray(ret_k, np.float32)[0, :, nI:][:, want]
    np.testing.assert_allclose(got, exp, rtol=0, atol=0)


def make_sess(rekv_kwargs, seed=0):
    mcfg = qw.Qwen2Config.tiny()
    kw = dict(n_init=6, n_local=256, block_size=8, exc_block_size=8,
              topk=4, chunk_size=1, max_blocks=64,
              max_prompt_tokens=64, max_new_tokens=8)
    kw.update(rekv_kwargs)
    rekv = ReKVConfig(**kw)
    params = qw.init_params(mcfg, jax.random.key(seed))
    sess = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            state_dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 20 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    return sess


def test_session_compression_changes_answers_and_runs_all_strategies():
    base = make_sess({})
    ans_base = base.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                       max_new_tokens=6)
    for strat in ("filter_tokens_simple", "filter_tokens_magnitude",
                  "filter_tokens_random", "filter_tokens_top_half"):
        sess = make_sess({"retrieved_kv_compression": strat})
        ans = sess.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                      max_new_tokens=6)
        assert len(ans) >= 1
    # the compressed cache must actually change the QA computation: compare
    # the retrieval-forward decode caches (half the retrieved tokens)
    sess = make_sess({"retrieved_kv_compression": "filter_tokens_simple"})
    qids = np.zeros((1, 8), np.int32)
    qids[0, :3] = [3, 4, 5]
    dkv_c = sess._qa_retrieve_layerwise(qids, 3)
    dkv_b = base._qa_retrieve_layerwise(qids, 3)
    S, nI = 8, 6
    assert (int(np.asarray(dkv_c.cursor)[0, 0]) - nI
            == (int(np.asarray(dkv_b.cursor)[0, 0]) - nI) // 2)


# ---------------------------------------------------------------------------
# Selectable retrieval scorers (session level)
# ---------------------------------------------------------------------------

@pytest.mark.parametrize("scorer", ["aks", "dpc_knn", "l2norm"])
def test_session_ablation_scorers_select_blocks(scorer):
    sess = make_sess({"retrieval_scorer": scorer})
    ans = sess.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                  max_new_tokens=4)
    assert len(ans) >= 1
    picked = sess.last_retrieved_indices
    assert picked is not None and len(picked) == 2  # per layer
    for idx in picked:
        assert 1 <= len(idx) <= 4
        assert idx == sorted(idx)
        assert all(0 <= i < 20 for i in idx)


def test_l2norm_scorer_matches_host_math():
    """l2norm is query-independent: selection must equal chunked top-k of
    the rep-key norms (reference l2norm_calc_block_topk)."""
    from stc_tpu.compress.scoring import chunked_topk
    sess = make_sess({"retrieval_scorer": "l2norm", "chunk_size": 2})
    sess.question_answering([3, 4], [3, 4, 5], [0], max_new_tokens=2)
    G = 2  # tiny config: 4 q heads / 2 kv heads
    for l, idx in enumerate(sess.last_retrieved_indices):
        reps = np.asarray(sess.kvs.block_rep, np.float32)[l, 0, :20]
        reps_flat = np.repeat(reps, G, axis=1).reshape(20, -1)
        want = chunked_topk(np.linalg.norm(reps_flat, axis=-1), 4, 2)
        assert idx == sorted(want), (l, idx, want)


def test_scorer_differs_from_mean_dot():
    s_dot = make_sess({})
    s_l2 = make_sess({"retrieval_scorer": "l2norm"})
    # force the layerwise path for mean_dot too (observability) by asking
    # through the host-tier-free layerwise API directly
    q = np.zeros((1, 8), np.int32)
    q[0, :2] = [3, 4]
    dk = s_dot._qa_retrieve_layerwise(q, 2)
    picked_dot = s_dot.last_retrieved_indices
    dk2 = s_l2._qa_retrieve_layerwise(q, 2)
    picked_l2 = s_l2.last_retrieved_indices
    assert picked_dot is not None and picked_l2 is not None
    # not required to differ per layer, but across layers the strategies
    # should not be identical on random data
    assert picked_dot != picked_l2


# ---------------------------------------------------------------------------
# Window KV compression (reference USE_KV_COMPRESSION / select_top_half_kv
# append hook) as a runtime knob
# ---------------------------------------------------------------------------

def test_window_kv_compression_engine_matches_library():
    """The engine's per-page keep mask must equal the oracle-tested library
    selection (compress.experiments.select_top_half_kv) on the same
    attention outputs."""
    from stc_tpu.compress.experiments import select_top_half_kv
    cfg = dataclasses.replace(CFG, window_kv_compression="select_top_half")
    kv, rng = build_kv(0, cfg)
    q = jnp.asarray(rng.normal(size=(1, HQ, 8, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, 8, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, 8, D)), jnp.float32)
    o, kv = append_stream(kv, q, k, v, cfg, is_init=False)
    keep = np.asarray(kv.page_keep)[0, 0]          # page 0's mask (S,)
    assert keep.sum() == -(-8 // 2)
    _, _, idx = select_top_half_kv(k, v, o[:, :, :8], 8)
    want = np.zeros(8, bool)
    want[np.asarray(idx)[0]] = True
    np.testing.assert_array_equal(keep, want)


def test_window_kv_compression_backend_fallback(monkeypatch):
    """Both pallas backends (compiled AND interpret) must downgrade to jnp
    when window compression is on — the paged kernel does not read page
    keep masks, and the engine asserts on the combination."""
    for backend in ("pallas", "pallas_interpret"):
        monkeypatch.setenv("STC_ATTN_BACKEND", backend)
        sess = make_sess({"window_kv_compression": "select_top_half"})
        assert sess.attn_backend == "jnp", (backend, sess.attn_backend)


def test_window_kv_compression_session_ablation():
    """Session-level knob: compressed-window sessions attend fewer window
    tokens (outputs diverge from the base session after the first
    compressed append) while pages and retrieval stay FULL-KV (reference
    compresses only local_k/v, kv_cache_manager.py:2190-2247)."""
    base = make_sess({})
    comp = make_sess({"window_kv_compression": "select_top_half"})

    # every appended page keeps exactly ceil(S/2) window tokens
    keep = np.asarray(comp.kvs.page_keep)[0, 0, :20]    # layer 0, 20 pages
    assert (keep.sum(axis=1) == 4).all()
    assert np.asarray(base.kvs.page_keep).all()

    # pages themselves stay full: layer-0 K depends only on the inputs,
    # so the two sessions' layer-0 pages are identical...
    np.testing.assert_allclose(np.asarray(comp.kvs.block_k)[0, :, :, :20],
                               np.asarray(base.kvs.block_k)[0, :, :, :20],
                               rtol=1e-5, atol=1e-5)
    # ...while deeper layers saw a compressed window -> different KV
    assert not np.allclose(np.asarray(comp.kvs.block_k)[1, :, :, :20],
                           np.asarray(base.kvs.block_k)[1, :, :, :20],
                           rtol=1e-4, atol=1e-4)

    # QA still runs end to end against full retrieved pages
    ans = comp.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                  max_new_tokens=4)
    assert len(ans) >= 1

    # checkpoint round-trips the keep masks
    import tempfile, os
    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    with tempfile.TemporaryDirectory() as td:
        p = os.path.join(td, "s.npz")
        save_session_state(comp, p)
        comp2 = make_sess({"window_kv_compression": "select_top_half"},
                          seed=0)
        load_session_state(comp2, p)
        np.testing.assert_array_equal(np.asarray(comp2.kvs.page_keep),
                                      np.asarray(comp.kvs.page_keep))
        ans2 = comp2.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                        max_new_tokens=4)
        assert ans2 == ans
