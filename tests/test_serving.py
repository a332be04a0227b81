"""Continuous-batching serving: per-stream questions, the fused
phase-heterogeneous serve tick, and the ServingEngine multiplexer.

Contract: every answer a multiplexed slot receives is identical to the
answer an INDEPENDENT single-stream session would give after encoding
exactly the chunks that slot had drained by that tick.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.serving import ServingEngine
from stc_tpu.runtime.session import StreamingSession

RC = ReKVConfig(n_init=4, n_local=128, block_size=8, exc_block_size=8,
                topk=4, chunk_size=1, max_blocks=64,
                max_prompt_tokens=16, max_new_tokens=8)
STOP = [0]

QUESTIONS = [([5, 6, 7], [5, 6, 7, 8]),
             ([9, 10], [9, 10, 11, 12, 13]),
             ([14, 15, 16, 17, 18], [14, 15])]


def _sess(params, mcfg, batch, rc=RC):
    s = StreamingSession(params, mcfg, SessionConfig(rekv=rc), batch=batch,
                         state_dtype=jnp.float32)
    s.encode_init_prompt(list(range(rc.n_init)))
    return s


def _setup(batch, rc=RC, seed=7):
    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(seed))
    return params, mcfg, _sess(params, mcfg, batch, rc)


def test_per_stream_questions_match_independent_sessions():
    """question_answering_batch: different questions (different lengths) per
    stream, one dispatch — each row equals a solo session's answer."""
    params, mcfg, s3 = _setup(3)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(1, 24, mcfg.hidden_size)).astype(np.float32)
    s3.encode_video_features(np.repeat(feats, 3, 0))
    got = s3.question_answering_batch([q for q, _ in QUESTIONS],
                                      [p for _, p in QUESTIONS], STOP,
                                      max_new_tokens=6)
    for b, (q, p) in enumerate(QUESTIONS):
        solo = _sess(params, mcfg, 1)
        solo.encode_video_features(feats)
        want = solo.question_answering(q, p, STOP, max_new_tokens=6)
        assert got[b] == want, (b, got[b], want)


def test_fused_serve_matches_sequential_dispatches():
    """One fused serve() tick (ragged encode + batched QA in one dispatch)
    equals encode_video_features + question_answering_batch, on answers AND
    on every KV state leaf."""
    params, mcfg, sa = _setup(2)
    _, _, sb = _setup(2)
    rng = np.random.default_rng(1)
    warm = rng.normal(size=(2, 16, mcfg.hidden_size)).astype(np.float32)
    sa.encode_video_features(warm)
    sb.encode_video_features(warm)
    chunk = rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32)
    active = [True, False]
    qs = [QUESTIONS[0][0], QUESTIONS[1][0]]
    ps = [QUESTIONS[0][1], QUESTIONS[1][1]]

    tok_a, cnt_a = sa.serve(chunk, active, qs, ps, STOP, max_new_tokens=6)
    assert sa.last_serve_fused

    sb.encode_video_features(chunk, active=active)
    got_b = sb.question_answering_batch(qs, ps, STOP, max_new_tokens=6)

    for b in range(2):
        assert [int(t) for t in tok_a[b, :cnt_a[b]]] == got_b[b], b
    for name in sa.kvs._fields:
        np.testing.assert_array_equal(np.asarray(getattr(sa.kvs, name)),
                                      np.asarray(getattr(sb.kvs, name)),
                                      err_msg=name)
    assert sa._stream_blocks.tolist() == sb._stream_blocks.tolist()


def test_serving_engine_multiplexes_uneven_streams():
    """3 slots ticking at different rates with interleaved questions: every
    answer equals an independent session that encoded exactly that slot's
    drained chunks."""
    params, mcfg, sess = _setup(3)
    eng = ServingEngine(sess, STOP, max_new_tokens=6)
    rng = np.random.default_rng(2)

    # slot 0: a chunk every tick; slot 1: every other tick; slot 2: one chunk
    chunks = {b: [] for b in range(3)}

    def feed(slot):
        c = rng.normal(size=(8, mcfg.hidden_size)).astype(np.float32)
        chunks[slot].append(c)
        eng.submit_chunk(slot, c)

    rids = {}
    expected_state = {}   # rid -> (slot, n_chunks_encoded_before_answer, q, p)
    for tick in range(4):
        feed(0)
        if tick % 2 == 0:
            feed(1)
        if tick == 1:
            feed(2)
        if tick == 2:
            q, p = QUESTIONS[0]
            rids[eng.submit_question(0, q, p)] = None
            expected_state[max(rids)] = (0, 3, q, p)   # 3 chunks: ticks 0-2
            q, p = QUESTIONS[1]
            rids[eng.submit_question(2, q, p)] = None
            expected_state[max(rids)] = (2, 1, q, p)
        if tick == 3:
            q, p = QUESTIONS[2]
            rids[eng.submit_question(1, q, p)] = None
            expected_state[max(rids)] = (1, 2, q, p)
        res = eng.step()
        for rid, r in res.items():
            rids[rid] = r

    res = eng.run()
    rids.update(res)
    assert all(v is not None for v in rids.values())
    assert eng.stats.answers == 3 and eng.stats.encode_chunks == 7
    assert eng.stats.fused_ticks >= 1   # tick 2 carries encode + questions

    for rid, (slot, n_chunks, q, p) in expected_state.items():
        solo = _sess(params, mcfg, 1)
        for c in chunks[slot][:n_chunks]:
            solo.encode_video_features(c[None])
        want = solo.question_answering(q, p, STOP, max_new_tokens=6)
        assert rids[rid]["tokens"] == want, (rid, slot)
        assert rids[rid]["slot"] == slot


def test_serving_engine_hosttier_fallback():
    """Uniform streams past device capacity: the engine's QA rides the
    speculative-prefetch host-tier path (per-stream q_len) and still matches
    a solo session."""
    # max_blocks=32: smallest store with eviction margins over the 24-page
    # window cover (n_local=128, S=8)
    rc = dataclasses.replace(RC, max_blocks=32)
    params, mcfg, sess = _setup(2, rc)
    eng = ServingEngine(sess, STOP, max_new_tokens=6)
    rng = np.random.default_rng(3)
    chunks = [rng.normal(size=(8, mcfg.hidden_size)).astype(np.float32)
              for _ in range(40)]
    for c in chunks:
        eng.submit_chunk(0, c)
        eng.submit_chunk(1, c)
    eng.run()
    assert sess._evicted_pages > 0
    q, p = QUESTIONS[1]
    rid = eng.submit_question(1, q, p)
    res = eng.run()
    assert not sess.last_serve_fused if hasattr(sess, "last_serve_fused") \
        else True

    solo = _sess(params, mcfg, 1, rc)
    for c in chunks:
        solo.encode_video_features(c[None])
    want = solo.question_answering(q, p, STOP, max_new_tokens=6)
    assert res[rid]["tokens"] == want


def test_serving_engine_vlm_pixels():
    """The engine multiplexes a VLMSession (pixel chunks): ragged pixel
    encode + batched QA; per-slot counters and answers come back."""
    from stc_tpu.config import CacherConfig, PrunerConfig
    from stc_tpu.models import llava_onevision as lo
    cfg = lo.LlavaOVConfig.tiny()
    tpf = 3
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=128, block_size=tpf,
                        exc_block_size=tpf, topk=4, max_blocks=64,
                        max_prompt_tokens=32, max_new_tokens=8),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="stc", token_per_frame=tpf),
    )
    params = lo.init_random_params(cfg, jax.random.key(11))
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                            batch=2)
    sess.encode_init_prompt([1, 2, 3, 4])
    eng = ServingEngine(sess, STOP, max_new_tokens=4)
    rng = np.random.default_rng(4)
    for tick in range(3):
        eng.submit_chunk(0, rng.uniform(0, 255, (1, 56, 56, 3)
                                        ).astype(np.uint8))
        if tick == 0:
            eng.submit_chunk(1, rng.uniform(0, 255, (1, 56, 56, 3)
                                            ).astype(np.uint8))
    rid = eng.submit_question(1, [7, 8, 9], [7, 8, 9, 10])
    res = eng.run()
    assert eng.stats.slot_chunks == [3, 1]
    assert res[rid]["slot"] == 1 and len(res[rid]["tokens"]) >= 1
    nb = np.asarray(sess.kvs.num_blocks)[0]
    assert nb.tolist() == [3, 1]


def test_fused_vlm_pixel_serve_matches_sequential_dispatches():
    """VLMSession.serve (vision tower + cacher/pruner + ragged encode +
    batched QA in ONE dispatch) equals encode_video + batched QA, on
    answers AND every KV/vision/pruner state leaf — across full, cached,
    and MIXED per-slot cacher ticks and ragged active masks."""
    from stc_tpu.config import CacherConfig, PrunerConfig
    from stc_tpu.models import llava_onevision as lo
    cfg = lo.LlavaOVConfig.tiny()
    tpf = 3

    def make():
        scfg = SessionConfig(
            rekv=ReKVConfig(n_init=4, n_local=128, block_size=tpf,
                            exc_block_size=tpf, topk=4, max_blocks=64,
                            max_prompt_tokens=16, max_new_tokens=8),
            cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                                cache_interval=2),
            pruner=PrunerConfig(strategy="stc", token_per_frame=tpf),
        )
        params = lo.init_random_params(cfg, jax.random.key(12))
        s = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                             batch=2)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    sa, sb = make(), make()
    rng = np.random.default_rng(8)
    warm = rng.uniform(0, 255, size=(2, 1, 56, 56, 3)).astype(np.uint8)
    sa.encode_video(warm)
    sb.encode_video(warm)
    qs = [[5, 6, 7], [9, 10]]
    ps = [[5, 6, 7, 8], [9, 10, 11]]
    # slot_chunk starts [1,1]: tick0 both-cached, tick1 ragged-full (only
    # slot 0 ticks), tick2 MIXED (slot 0 cached, slot 1 full)
    pattern = [[True, True], [True, False], [True, True]]
    for active in pattern:
        chunk = rng.uniform(0, 255, size=(2, 1, 56, 56, 3)).astype(np.uint8)
        tok_a, cnt_a = sa.serve(chunk, active, qs, ps, STOP,
                                max_new_tokens=4, asked=[True, True])
        assert sa.last_serve_fused
        sb.encode_video(chunk, active=active)
        got_b = sb.question_answering_batch(qs, ps, STOP, max_new_tokens=4)
        for b in range(2):
            assert [int(t) for t in tok_a[b, :cnt_a[b]]] == got_b[b], \
                (active, b)
    assert sa._slot_chunk.tolist() == sb._slot_chunk.tolist()
    for name in sa.kvs._fields:
        np.testing.assert_array_equal(np.asarray(getattr(sa.kvs, name)),
                                      np.asarray(getattr(sb.kvs, name)),
                                      err_msg=name)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), sa._vstate, sb._vstate)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a), np.asarray(b)), sa._pstate, sb._pstate)


# --------------------------------------------------------------------- #
# Measured-cost serve routing (_ServeRouter)
# --------------------------------------------------------------------- #

def test_serve_router_probe_schedule_and_decision():
    """'auto' probes fused-first (compile tick discarded), then unfused,
    then routes every later tick of that shape to the measured winner;
    ties prefer fused (one dispatch)."""
    from stc_tpu.runtime.session import _ServeRouter
    n_probe = 1 + _ServeRouter.N_TIME  # warm sample discarded + timed ones
    r = _ServeRouter("auto")
    key = ("feat", 8, 8, 8, 4)
    # fused arm: warm 50ms discarded, timed 5/3/4
    for t in (0.050, 0.005, 0.003, 0.004)[:n_probe]:
        assert r.plan(key) == "fused"
        r.record(key, True, t)
    # unfused arm: warm 40ms discarded, timed 4/2/5 -> unfused wins (2 < 3)
    for t in (0.040, 0.004, 0.002, 0.005)[:n_probe]:
        assert r.plan(key) == "unfused"
        r.record(key, False, t)
    assert r.plan(key) == "unfused"
    assert r.decisions[key] == "unfused"
    # decided keys ignore further samples
    r.record(key, True, 0.0001)
    assert r.plan(key) == "unfused"

    # a second shape probes independently; tie -> fused
    k2 = ("feat", 16, 8, 8, 4)
    for t in (0.1, 0.002, 0.002, 0.002)[:n_probe]:
        assert r.plan(k2) == "fused"
        r.record(k2, True, t)
    for t in (0.1, 0.002, 0.002, 0.002)[:n_probe]:
        assert r.plan(k2) == "unfused"
        r.record(k2, False, t)
    assert r.plan(k2) == "fused"

    # pinned modes never probe
    assert _ServeRouter("fused").plan(key) == "fused"
    assert _ServeRouter("unfused").plan(key) == "unfused"


def test_serve_router_in_session_routes_and_answers_identically():
    """A session under 'auto' routing: probe ticks follow the schedule,
    and every tick's answers equal the pinned-fused session's — routing
    changes latency, never answers."""
    from stc_tpu.runtime.session import _ServeRouter
    params, mcfg, sa = _setup(2)        # conftest pins fused
    _, _, sb = _setup(2)
    sb._serve_router = _ServeRouter("auto")
    rng = np.random.default_rng(4)
    qs = [QUESTIONS[0][0], QUESTIONS[1][0]]
    ps = [QUESTIONS[0][1], QUESTIONS[1][1]]
    n_probe = 1 + _ServeRouter.N_TIME
    expect_fused = [True] * n_probe + [False] * n_probe
    for i, want_fused in enumerate(expect_fused):
        chunk = rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32)
        tok_a, cnt_a = sa.serve(chunk, None, qs, ps, STOP, max_new_tokens=4)
        tok_b, cnt_b = sb.serve(chunk, None, qs, ps, STOP, max_new_tokens=4)
        assert sa.last_serve_fused and sb.last_serve_fused == want_fused, i
        np.testing.assert_array_equal(cnt_a, cnt_b)
        for b in range(2):
            np.testing.assert_array_equal(tok_a[b, :cnt_a[b]],
                                          tok_b[b, :cnt_b[b]])
    key = next(iter(sb._serve_router.decisions), None)
    assert key is None  # decision lands on the NEXT plan() call
    chunk = rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32)
    sb.serve(chunk, None, qs, ps, STOP, max_new_tokens=4)
    assert len(sb._serve_router.decisions) == 1
    (key, picked), = sb._serve_router.decisions.items()
    assert picked in ("fused", "unfused")
    assert sb.last_serve_fused == (picked == "fused")
