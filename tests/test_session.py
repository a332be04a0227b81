"""End-to-end streaming session on a tiny random model."""

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig, SessionConfig, CacherConfig, PrunerConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession


def make_session(seed=0):
    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=6, n_local=512, block_size=8, exc_block_size=8,
                      topk=4, chunk_size=1, max_blocks=128,
                      max_prompt_tokens=64, max_new_tokens=16)
    scfg = SessionConfig(rekv=rekv)
    params = qw.init_params(mcfg, jax.random.key(seed))
    return StreamingSession(params, mcfg, scfg, state_dtype=jnp.float32), mcfg


def test_full_session_flow():
    sess, mcfg = make_session()
    rng = np.random.default_rng(0)

    sess.encode_init_prompt(list(range(6)))
    assert int(np.asarray(sess.kvs.length)[0, 0]) == 6

    feats = rng.normal(size=(1, 10 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 10

    out = sess.question_answering(
        question_ids=[5, 6, 7], prompt_ids=[5, 6, 7, 8, 9],
        stop_token_ids=[0], max_new_tokens=8)
    assert 1 <= len(out) <= 8
    # anti-EOS-at-step-0: first token is never a stop token
    assert out[0] != 0

    # deterministic given same state
    out2 = sess.question_answering(
        question_ids=[5, 6, 7], prompt_ids=[5, 6, 7, 8, 9],
        stop_token_ids=[0], max_new_tokens=8)
    assert out == out2


def test_session_stream_continues_after_qa():
    """QA must not disturb the streaming cache (ContextManager untouched)."""
    sess, mcfg = make_session(1)
    rng = np.random.default_rng(1)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 3 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    before = np.asarray(sess.kvs.length).copy()
    sess.question_answering([1, 2], [1, 2, 3], [0], max_new_tokens=4)
    np.testing.assert_array_equal(np.asarray(sess.kvs.length), before)
    # stream continues
    sess.encode_video_features(
        rng.normal(size=(1, 8, mcfg.hidden_size)).astype(np.float32))
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 4


def test_clear_cache_resets():
    sess, mcfg = make_session(2)
    rng = np.random.default_rng(2)
    sess.encode_init_prompt(list(range(6)))
    sess.encode_video_features(
        rng.normal(size=(1, 16, mcfg.hidden_size)).astype(np.float32))
    sess.clear_cache()
    assert int(np.asarray(sess.kvs.length).max()) == 0
    assert int(np.asarray(sess.kvs.num_blocks).max()) == 0


def test_multi_stream_session_batch4():
    """Engine-level multi-stream ingest: 4 independent streams in one session
    (SURVEY north-star config #5, engine side)."""
    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=6, n_local=512, block_size=8, exc_block_size=8,
                      topk=4, chunk_size=1, max_blocks=128,
                      max_prompt_tokens=64, max_new_tokens=16)
    params = qw.init_params(mcfg, jax.random.key(9))
    sess = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            batch=4, state_dtype=jnp.float32)
    rng = np.random.default_rng(9)
    sess.encode_init_prompt(list(range(6)))
    # different features per stream
    feats = rng.normal(size=(4, 5 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    assert list(np.asarray(sess.kvs.num_blocks)[0]) == [5, 5, 5, 5]

    out = sess.question_answering([5, 6, 7], [5, 6, 7, 8],
                                  stop_token_ids=[0], max_new_tokens=6)
    assert 1 <= len(out) <= 6
    # per-stream retrieval state is independent: stream KV for stream 0 and 1
    # hold different content
    bk = np.asarray(sess.kvs.block_k)
    assert not np.allclose(bk[0, 0], bk[0, 1])


def test_qa_with_no_video_frames():
    """Question at stream start (StreamingBench timestamp-0 edge): retrieval
    over zero blocks must degrade to init-tokens-only context."""
    sess, mcfg = make_session(3)
    sess.encode_init_prompt(list(range(6)))
    out = sess.question_answering([7, 8], [7, 8, 9], stop_token_ids=[0],
                                  max_new_tokens=4)
    assert 1 <= len(out) <= 4
    # and encoding zero frames is a no-op
    sess.encode_video_features(np.zeros((1, 0, mcfg.hidden_size), np.float32))
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 0


def test_layout_commit_machinery_end_to_end(monkeypatch, tmp_path):
    """STC_KV_LAYOUT=force exercises the page-store layout commit on CPU
    (on TPU it is on by default and removes the fused serve tick's 4
    full-store relayout copies — scripts/probe_serve_layout.out.json): the
    AUTO-layout probe compile, the committed device_put, pinned-output
    donating jits (encode/serve/evict/reset), and the checkpoint re-commit
    must all run and answer identically to an uncommitted session."""
    from stc_tpu.utils.checkpoint import (load_session_state,
                                          save_session_state)
    monkeypatch.setenv("STC_KV_LAYOUT", "force")
    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=8,
                      topk=4, chunk_size=1, max_blocks=24,
                      max_rep_blocks=128, max_prompt_tokens=16,
                      max_new_tokens=8, host_kv_quant="none")
    params = qw.init_params(mcfg, jax.random.key(0))
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(2, 30 * 8, mcfg.hidden_size)).astype(np.float32)

    # the commit is LAZY at the first fused serve tick: serve first, then
    # run the whole session lifecycle on the committed store
    s2 = StreamingSession(params, mcfg, SessionConfig(rekv=rekv), batch=2,
                          state_dtype=jnp.float32)
    assert s2._kvs_fmt is None
    s2.encode_init_prompt([1, 2, 3, 4])
    s2.encode_video_features(feats[:, :8 * 8])
    tok, cnt = s2.serve(feats[:, :8], None, [[5, 6], [6, 7]],
                        [[5, 6, 7], [6, 7, 8]], [0], max_new_tokens=2)
    assert s2.last_serve_fused and (np.asarray(cnt) >= 1).all()
    assert s2._kvs_fmt is not None   # committed at the first fused tick
    s2.reset_streams([1])

    # a committed session's full lifecycle (stream past capacity -> evict
    # -> QA) answers identically to an uncommitted one
    monkeypatch.setenv("STC_KV_LAYOUT", "off")
    ref = StreamingSession(params, mcfg, SessionConfig(rekv=rekv), batch=2,
                           state_dtype=jnp.float32)
    assert ref._kvs_fmt is None
    sess = s2
    sess.clear_cache()
    assert sess._kvs_fmt is not None  # commit survives clear_cache
    for s in (sess, ref):
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video_features(feats)   # past max_blocks -> evict_pages
        assert s._evicted_pages > 0
    a = sess.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4)
    b = ref.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4)
    assert a == b
    s2 = StreamingSession(params, mcfg, SessionConfig(rekv=rekv), batch=2,
                          state_dtype=jnp.float32)
    monkeypatch.setenv("STC_KV_LAYOUT", "force")
    s2.encode_init_prompt([1, 2, 3, 4])
    s2.encode_video_features(feats[:, :8 * 8])
    s2.serve(feats[:, :8], None, [[5, 6], [6, 7]],
             [[5, 6, 7], [6, 7, 8]], [0], max_new_tokens=2)

    # checkpoint round trip re-commits the restored store
    save_session_state(s2, str(tmp_path / "lc.npz"))
    s3 = StreamingSession(params, mcfg, SessionConfig(rekv=rekv), batch=2,
                          state_dtype=jnp.float32)
    load_session_state(s3, str(tmp_path / "lc.npz"))
    a2 = s2.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4)
    a3 = s3.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4)
    assert a2 == a3
