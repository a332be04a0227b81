"""Device-side int8 KV pages (ReKVConfig.kv_quant): the page store holds
int8 pages + per-(page, head, dim) scales; attention/gather consumers
dequantize; rep keys stay exact.  Beyond-reference serving feature (the
reference's pages are fp16 on GPU and CPU, kv_cache_manager.py:36-127)."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.kvcache.engine import (append_stream, init_stream_kv,
                                    retrieve_blocks, score_blocks)
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession

HQ, HKV, D = 4, 2, 16

CFG = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=8,
                 topk=4, chunk_size=1, max_blocks=64,
                 max_prompt_tokens=16, max_new_tokens=8)
CFG_Q = dataclasses.replace(CFG, kv_quant="int8")


def drive(cfg, n_appends=12, seed=0, backend="jnp"):
    rng = np.random.default_rng(seed)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    arrs = lambda h, t: jnp.asarray(rng.normal(size=(1, h, t, D)), jnp.float32)
    q, k, v = arrs(HQ, cfg.n_init), arrs(HKV, cfg.n_init), arrs(HKV, cfg.n_init)
    _, kv = append_stream(kv, q, k, v, cfg, is_init=True)
    outs = []
    for _ in range(n_appends):
        q, k, v = arrs(HQ, 8), arrs(HKV, 8), arrs(HKV, 8)
        o, kv = append_stream(kv, q, k, v, cfg, is_init=False,
                              backend=backend)
        outs.append(np.asarray(o))
    return kv, outs, rng


def test_int8_pages_store_layout_and_memory():
    kv_q, _, _ = drive(CFG_Q, 4)
    kv_f, _, _ = drive(CFG, 4)
    assert kv_q.block_k.dtype == jnp.int8
    assert kv_q.block_k_scale.shape == (1, HKV, CFG.max_blocks, D)
    assert kv_f.block_k_scale.shape[2] == 0
    # page bytes halve vs the f32 store's... 4x (f32->int8); scales add
    # 1/S of the f32 bytes
    assert kv_q.block_k.nbytes * 4 == kv_f.block_k.nbytes


def test_int8_roundtrip_error_bounded_and_scoring_exact():
    """Dequantized pages reproduce the exact pages within the symmetric
    absmax/127 bound, and retrieval SCORING is bit-identical (rep keys are
    built pre-quantization)."""
    kv_q, _, rng = drive(CFG_Q, 12, seed=1)
    kv_f, _, _ = drive(CFG, 12, seed=1)
    np.testing.assert_array_equal(np.asarray(kv_q.block_rep),
                                  np.asarray(kv_f.block_rep))
    for qi in range(4):
        q = jnp.asarray(rng.normal(size=(1, HQ, 5, D)), jnp.float32)
        iq, eq = score_blocks(kv_q, q, CFG_Q)
        if_, ef = score_blocks(kv_f, q, CFG)
        np.testing.assert_array_equal(np.asarray(iq), np.asarray(if_))

    deq = (np.asarray(kv_q.block_k[0], np.float32)
           * np.asarray(kv_q.block_k_scale)[0][:, :, None, :])
    true = np.asarray(kv_f.block_k)[0]          # (Hkv, Nb, S, D)
    bound = np.abs(true).max(axis=2, keepdims=True) / 254.0 + 1e-6
    assert np.all(np.abs(deq[:, :12] - true[:, :12]) <= bound[:, :12])


def test_int8_encode_attention_close_to_exact():
    """Window attention over int8 pages stays within quantization error of
    the full-precision path (same inputs, same masks)."""
    _, outs_q, _ = drive(CFG_Q, 10, seed=2)
    _, outs_f, _ = drive(CFG, 10, seed=2)
    for i, (a, b) in enumerate(zip(outs_q, outs_f)):
        np.testing.assert_allclose(a, b, rtol=0.1, atol=0.05,
                                   err_msg=f"append {i}")


def test_int8_retrieved_buffer_close_to_exact():
    kv_q, _, rng = drive(CFG_Q, 12, seed=3)
    kv_f, _, _ = drive(CFG, 12, seed=3)
    q = jnp.asarray(rng.normal(size=(1, HQ, 5, D)), jnp.float32)
    rk_q, rv_q, _, vl_q = retrieve_blocks(kv_q, q, CFG_Q)
    rk_f, rv_f, _, vl_f = retrieve_blocks(kv_f, q, CFG)
    assert int(vl_q[0]) == int(vl_f[0])
    n = int(vl_q[0])
    np.testing.assert_allclose(np.asarray(rk_q)[0, :, :n],
                               np.asarray(rk_f)[0, :, :n], rtol=0.05,
                               atol=0.03)
    np.testing.assert_allclose(np.asarray(rv_q)[0, :, :n],
                               np.asarray(rv_f)[0, :, :n], rtol=0.05,
                               atol=0.03)
    # init tokens are stored unquantized: exact
    np.testing.assert_array_equal(np.asarray(rk_q)[0, :, :CFG.n_init],
                                  np.asarray(rk_f)[0, :, :CFG.n_init])


def test_int8_pallas_kernel_matches_jnp_int8_path():
    """The paged kernel's in-VMEM dequantization (interpret mode) must match
    the XLA int8 path."""
    _, outs_pl, _ = drive(CFG_Q, 8, seed=4, backend="pallas_interpret")
    _, outs_jnp, _ = drive(CFG_Q, 8, seed=4, backend="jnp")
    for i, (a, b) in enumerate(zip(outs_pl, outs_jnp)):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2,
                                   err_msg=f"append {i}")


# ---------------------------------------------------------------------------
# Session level: eviction passes int8 pages straight through; QA serves both
# tiers; answers stay consistent
# ---------------------------------------------------------------------------

def make_sess(kv_quant, max_blocks=32, seed=5, batch=1):
    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=6, n_local=128, block_size=8, exc_block_size=8,
                      topk=4, chunk_size=1, max_blocks=max_blocks,
                      max_prompt_tokens=64, max_new_tokens=8,
                      kv_quant=kv_quant)
    params = qw.init_params(mcfg, jax.random.key(seed))
    return StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            batch=batch, state_dtype=jnp.float32), mcfg


def test_int8_session_hosttier_end_to_end(tmp_path):
    sess, mcfg = make_sess("int8")
    rng = np.random.default_rng(5)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    assert sess._evicted_pages > 0
    # eviction stored the device store's int8 pages + scales directly
    assert sess.host_store.quantized
    assert sess.host_store.k_chunks[0].dtype == np.int8

    fc0 = sess.host_store.fetch_count
    ans = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                  max_new_tokens=6)
    assert sess.host_store.fetch_count > fc0
    assert 1 <= len(ans) <= 6
    # determinism across the warm table
    ans2 = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                   max_new_tokens=6)
    assert ans == ans2

    # checkpoint round-trips the int8 store + scales
    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    save_session_state(sess, str(tmp_path / "q.npz"))
    sess2, _ = make_sess("int8")
    load_session_state(sess2, str(tmp_path / "q.npz"))
    assert sess2.kvs.block_k.dtype == jnp.int8
    ans3 = sess2.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                    max_new_tokens=6)
    assert ans3 == ans


def test_int8_session_answers_match_exact_session_mostly():
    """On random tiny models the int8-page session should usually pick the
    same retrieved blocks (scoring is exact) and often the same answers;
    assert scoring-identical retrieval in the layerwise observability
    path."""
    sess_q, mcfg = make_sess("int8", max_blocks=64, seed=6)
    sess_f, _ = make_sess("none", max_blocks=64, seed=6)
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(1, 20 * 8, mcfg.hidden_size)).astype(np.float32)
    for s in (sess_q, sess_f):
        s.encode_init_prompt(list(range(6)))
        s.encode_video_features(feats)
    qids = np.zeros((1, 8), np.int32)
    qids[0, :3] = [3, 4, 5]
    sess_q._qa_retrieve_layerwise(qids, 3)
    got = sess_q.last_retrieved_indices
    sess_f._qa_retrieve_layerwise(qids, 3)
    want = sess_f.last_retrieved_indices
    assert got == want


# ---------------------------------------------------------------------------
# int4 packed pages (kv_quant='int4'): quarter the page bytes, 4x history
# ---------------------------------------------------------------------------

CFG_Q4 = dataclasses.replace(CFG, kv_quant="int4")


def test_int4_pack_roundtrip_exact():
    """Nibble pack/unpack is lossless over the full [-7, 7] value range (and
    the numpy host-side unpack agrees with the jnp one)."""
    from stc_tpu.kvcache.engine import _pack_int4, _unpack_int4
    from stc_tpu.kvcache.host_tier import _unpack_int4_np
    vals = np.concatenate([np.arange(-7, 8, dtype=np.int8),
                           np.int8([0])])  # 16 values: even D
    q = jnp.asarray(np.stack([vals, vals[::-1]]).reshape(2, -1))
    packed = _pack_int4(q)
    assert packed.dtype == jnp.uint8 and packed.shape == (2, q.shape[1] // 2)
    back = np.asarray(_unpack_int4(packed))
    np.testing.assert_array_equal(back, np.asarray(q, np.float32))
    np.testing.assert_array_equal(_unpack_int4_np(np.asarray(packed)), back)


def test_int4_pages_store_layout_memory_and_scoring_exact():
    kv_q, _, rng = drive(CFG_Q4, 12, seed=1)
    kv_f, _, _ = drive(CFG, 12, seed=1)
    assert kv_q.block_k.dtype == jnp.uint8
    assert kv_q.block_k.shape[-1] == D // 2
    assert kv_q.block_k.nbytes * 8 == kv_f.block_k.nbytes
    # rep keys pre-quantization: retrieval scoring bit-identical
    np.testing.assert_array_equal(np.asarray(kv_q.block_rep),
                                  np.asarray(kv_f.block_rep))
    q = jnp.asarray(rng.normal(size=(1, HQ, 5, D)), jnp.float32)
    iq, _ = score_blocks(kv_q, q, CFG_Q4)
    if_, _ = score_blocks(kv_f, q, CFG)
    np.testing.assert_array_equal(np.asarray(iq), np.asarray(if_))


def test_int4_roundtrip_error_bounded():
    """Dequantized int4 pages reproduce the exact pages within the
    symmetric absmax/14 bound (15-level grid)."""
    from stc_tpu.kvcache.engine import _unpack_int4
    kv_q, _, _ = drive(CFG_Q4, 12, seed=2)
    kv_f, _, _ = drive(CFG, 12, seed=2)
    deq = (np.asarray(_unpack_int4(kv_q.block_k[0]))
           * np.asarray(kv_q.block_k_scale)[0][:, :, None, :])
    true = np.asarray(kv_f.block_k)[0]          # (Hkv, Nb, S, D)
    bound = np.abs(true).max(axis=2, keepdims=True) / 14.0 + 1e-6
    assert np.all(np.abs(deq[:, :12] - true[:, :12]) <= bound[:, :12])


def test_int4_encode_and_retrieval_close_to_exact():
    """Window attention + retrieved buffers over int4 pages stay within the
    coarser 15-level quantization error of the exact path."""
    kv_q, outs_q, rng = drive(CFG_Q4, 10, seed=3)
    kv_f, outs_f, _ = drive(CFG, 10, seed=3)
    for i, (a, b) in enumerate(zip(outs_q, outs_f)):
        np.testing.assert_allclose(a, b, rtol=0.3, atol=0.25,
                                   err_msg=f"append {i}")
    q = jnp.asarray(rng.normal(size=(1, HQ, 5, D)), jnp.float32)
    rk_q, rv_q, _, vl_q = retrieve_blocks(kv_q, q, CFG_Q4)
    rk_f, rv_f, _, vl_f = retrieve_blocks(kv_f, q, CFG)
    assert int(vl_q[0]) == int(vl_f[0])
    n = int(vl_q[0])
    np.testing.assert_allclose(np.asarray(rk_q)[0, :, :n],
                               np.asarray(rk_f)[0, :, :n], rtol=0.3,
                               atol=0.25)
    np.testing.assert_array_equal(np.asarray(rk_q)[0, :, :CFG.n_init],
                                  np.asarray(rk_f)[0, :, :CFG.n_init])


def test_int4_pallas_kernel_matches_jnp_int4_path():
    """The paged kernel's in-VMEM nibble unpack + dequant (interpret mode)
    must match the XLA int4 path bit for bit on the same quantized store."""
    _, outs_pl, _ = drive(CFG_Q4, 8, seed=4, backend="pallas_interpret")
    _, outs_jnp, _ = drive(CFG_Q4, 8, seed=4, backend="jnp")
    for i, (a, b) in enumerate(zip(outs_pl, outs_jnp)):
        np.testing.assert_allclose(a, b, rtol=2e-2, atol=2e-2,
                                   err_msg=f"append {i}")


def test_int4_session_hosttier_end_to_end(tmp_path):
    """Eviction ships packed int4 pages + scales; speculative-prefetch QA
    unpacks them in the scatter dispatch; checkpoint round-trips the packed
    store; answers are deterministic."""
    sess, mcfg = make_sess("int4")
    rng = np.random.default_rng(7)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    assert sess._evicted_pages > 0
    assert sess.host_store.quantized
    assert sess.host_store.k_chunks[0].dtype == np.uint8

    fc0 = sess.host_store.fetch_count
    ans = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                  max_new_tokens=6)
    assert sess.host_store.fetch_count > fc0
    assert 1 <= len(ans) <= 6
    ans2 = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                   max_new_tokens=6)
    assert ans == ans2

    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    save_session_state(sess, str(tmp_path / "q4.npz"))
    sess2, _ = make_sess("int4")
    load_session_state(sess2, str(tmp_path / "q4.npz"))
    assert sess2.kvs.block_k.dtype == jnp.uint8
    ans3 = sess2.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                    max_new_tokens=6)
    assert ans3 == ans

    # the layerwise observability path dequantizes host int4 pages too
    qids = np.zeros((1, 8), np.int32)
    qids[0, :3] = [3, 4, 5]
    sess._qa_retrieve_layerwise(qids, 3)
    assert sess.last_retrieved_indices is not None


def test_int4_quadruples_history_at_equal_hbm():
    """The capacity claim: at equal page-store bytes an int4 store holds
    ~4x the bf16 pages (scales amortize over S=60 rows)."""
    prod_q4 = dataclasses.replace(CFG_Q4, block_size=60, exc_block_size=60,
                                  n_local=1000, max_blocks=512)
    prod_f = dataclasses.replace(CFG, block_size=60, exc_block_size=60,
                                 n_local=1000, max_blocks=128)
    kv_q = init_stream_kv(prod_q4, 1, HKV, D, dtype=jnp.bfloat16)
    kv_f = init_stream_kv(prod_f, 1, HKV, D, dtype=jnp.bfloat16)
    q_bytes = (kv_q.block_k.nbytes + kv_q.block_k_scale.nbytes)
    f_bytes = kv_f.block_k.nbytes
    assert q_bytes <= 1.3 * f_bytes, (q_bytes, f_bytes)


def test_int8_doubles_history_at_equal_hbm():
    """The headline capacity claim: at equal page-store bytes an int8 store
    holds ~2x the bf16 pages (4x vs this test's f32 pages, minus scales)."""
    prod_q = dataclasses.replace(CFG_Q, block_size=60, exc_block_size=60,
                                 n_local=1000, max_blocks=256)
    prod_f = dataclasses.replace(CFG, block_size=60, exc_block_size=60,
                                 n_local=1000, max_blocks=128)
    kv_q = init_stream_kv(prod_q, 1, HKV, D, dtype=jnp.bfloat16)
    kv_f = init_stream_kv(prod_f, 1, HKV, D, dtype=jnp.bfloat16)
    q_bytes = (kv_q.block_k.nbytes + kv_q.block_k_scale.nbytes)
    f_bytes = kv_f.block_k.nbytes
    # 2x the pages in ~1.07x the bytes (f32 scales amortize over S=60 rows)
    assert q_bytes <= 1.1 * f_bytes, (q_bytes, f_bytes)
