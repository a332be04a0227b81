"""Prompt-lookup speculative decoding: bit-exact greedy, fewer weight reads.

Contract: with ReKVConfig.spec_decode_draft > 0 every QA path produces
IDENTICAL token ids and counts to the plain greedy loop — speculation is a
pure latency optimization (a draft commits only when it equals the model's
own greedy choice).  The reference decodes strictly one token per python
loop step (llava_onevision_rekv.py:105-143).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession

RC = ReKVConfig(n_init=4, n_local=192, block_size=8, exc_block_size=8,
                topk=4, chunk_size=1, max_blocks=64,
                max_prompt_tokens=16, max_new_tokens=12)
SPEC = dataclasses.replace(RC, spec_decode_draft=4, spec_decode_ngram=3)
STOP = [0]
QUESTIONS = [([5, 6, 7], [5, 6, 7, 8]),
             ([9, 10], [9, 10, 11, 12, 13]),
             ([14, 15, 16, 17, 18], [14, 15])]


def _sess(params, mcfg, batch, rc):
    s = StreamingSession(params, mcfg, SessionConfig(rekv=rc), batch=batch,
                         state_dtype=jnp.float32)
    s.encode_init_prompt(list(range(rc.n_init)))
    return s


def _pair(batch, rc=RC, spec=SPEC, seed=7, n_chunks=4):
    """Two identical sessions (spec off / on) with the same stream state."""
    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(seed))
    rng = np.random.default_rng(seed)
    chunks = [rng.normal(size=(batch, 8, mcfg.hidden_size)).astype(np.float32)
              for _ in range(n_chunks)]
    ss = []
    for r in (rc, spec):
        s = _sess(params, mcfg, batch, r)
        for c in chunks:
            s.encode_video_features(c)
        ss.append(s)
    return ss[0], ss[1]


def test_spec_draft_ngram_lookup():
    """_spec_draft proposes the continuation of the longest (most recent)
    n-gram match of the committed suffix."""
    ctx = jnp.asarray([[9, 1, 2, 3, 7, 7, 1, 2, 3, 4, 5, 1, 2, 3, 0, 0]],
                      jnp.int32)
    # committed suffix ...1 2 3 at ctx_len=14; both t=3 and t=8 match the
    # full 3-gram; recency picks t=8 -> draft [4, 5, 1]
    d = qw._spec_draft(ctx, jnp.asarray([14], jnp.int32), K=3, N=3)
    assert d.tolist() == [[4, 5, 1]]
    # 1-gram-only history: suffix [3]; latest earlier 3 is at t=8
    d1 = qw._spec_draft(ctx, jnp.asarray([14], jnp.int32), K=2, N=1)
    assert d1.tolist() == [[4, 5]]
    # no match anywhere -> zero draft (harmless, rejected by verification)
    nom = jnp.asarray([[1, 2, 3, 4, 5, 6, 0, 0]], jnp.int32)
    d2 = qw._spec_draft(nom, jnp.asarray([6], jnp.int32), K=2, N=3)
    assert d2.tolist() == [[0, 0]]


def test_spec_matches_greedy_fused_path():
    """Fused one-dispatch QA: spec on == spec off for per-stream questions
    (including length-truncated answers — max_new_tokens hits first)."""
    off, on = _pair(3)
    qs = [q for q, _ in QUESTIONS]
    ps = [p for _, p in QUESTIONS]
    want = off.question_answering_batch(qs, ps, STOP, max_new_tokens=12)
    got = on.question_answering_batch(qs, ps, STOP, max_new_tokens=12)
    assert got == want
    # short budget: truncation must agree too
    want = off.question_answering_batch(qs, ps, STOP, max_new_tokens=3)
    got = on.question_answering_batch(qs, ps, STOP, max_new_tokens=3)
    assert got == want


def test_spec_matches_greedy_with_real_stops():
    """Stop tokens that actually fire: use the model's own greedy output
    tokens as the stop set so answers terminate early, and compare."""
    off, on = _pair(2, seed=11)
    q, p = QUESTIONS[0]
    base = off.question_answering(q, p, STOP, max_new_tokens=10)
    assert len(base) >= 3
    stops = [base[2]]  # the 3rd generated token stops the answer
    want = off.question_answering(q, p, stops, max_new_tokens=10)
    got = on.question_answering(q, p, stops, max_new_tokens=10)
    assert got == want and want[-1] == base[2] and len(want) == 3


def test_spec_matches_greedy_hosttier_path():
    """Two-tier (speculative-prefetch) QA with spec decode on top."""
    rc = dataclasses.replace(RC, max_blocks=40)
    spec = dataclasses.replace(SPEC, max_blocks=40)
    off, on = _pair(2, rc, spec, seed=3, n_chunks=48)
    assert off._evicted_pages > 0 and on._evicted_pages > 0
    q, p = QUESTIONS[1]
    want = off.question_answering_batch([q, q], [p, p], STOP,
                                        max_new_tokens=8)
    got = on.question_answering_batch([q, q], [p, p], STOP,
                                      max_new_tokens=8)
    assert got == want


def test_spec_matches_greedy_layerwise_and_ext_idx():
    """Ablation-scorer (layerwise) and external-indices paths."""
    rc = dataclasses.replace(RC, retrieval_scorer="aks")
    spec = dataclasses.replace(SPEC, retrieval_scorer="aks")
    off, on = _pair(2, rc, spec, seed=5)
    q, p = QUESTIONS[2]
    want = off.question_answering(q, p, STOP, max_new_tokens=8)
    got = on.question_answering(q, p, STOP, max_new_tokens=8)
    assert got == want

    off2, on2 = _pair(2, seed=6)
    want = off2.question_answering(q, p, STOP, max_new_tokens=8,
                                   retrieved_indices=[0, 2])
    got = on2.question_answering(q, p, STOP, max_new_tokens=8,
                                 retrieved_indices=[0, 2])
    assert got == want


def test_spec_in_fused_serve_tick():
    """The fused serve tick (encode + QA in one dispatch) decodes
    speculatively too, with identical answers."""
    off, on = _pair(2, seed=9)
    rng = np.random.default_rng(9)
    chunk = rng.normal(size=(2, 8, off.mcfg.hidden_size)).astype(np.float32)
    qs = [QUESTIONS[0][0], QUESTIONS[1][0]]
    ps = [QUESTIONS[0][1], QUESTIONS[1][1]]
    tok_off, cnt_off = off.serve(chunk, None, qs, ps, STOP, max_new_tokens=8)
    tok_on, cnt_on = on.serve(chunk, None, qs, ps, STOP, max_new_tokens=8)
    assert off.last_serve_fused and on.last_serve_fused
    np.testing.assert_array_equal(cnt_off, cnt_on)
    for b in range(2):
        np.testing.assert_array_equal(tok_off[b, :cnt_off[b]],
                                      tok_on[b, :cnt_on[b]])


def test_spec_matches_greedy_pallas_decode_backend():
    """Speculation under the fused Pallas decode kernel: the K+1-token
    verify step's q_slots are affine (start + t), satisfying the kernel's
    contract; answers must equal the jnp backend's with and without spec."""
    rc_p = dataclasses.replace(RC, decode_attn_backend="pallas_interpret")
    spec_p = dataclasses.replace(SPEC, decode_attn_backend="pallas_interpret")
    off, on = _pair(2, rc_p, spec_p, seed=13)
    ref, _ = _pair(2, RC, SPEC, seed=13)  # jnp-backend oracle
    q, p = QUESTIONS[0]
    want = ref.question_answering_batch([q, q], [p, p], STOP,
                                        max_new_tokens=8)
    got_off = off.question_answering_batch([q, q], [p, p], STOP,
                                           max_new_tokens=8)
    got_on = on.question_answering_batch([q, q], [p, p], STOP,
                                         max_new_tokens=8)
    assert got_on == got_off == want


def test_spec_history_matches_greedy_across_questions():
    """Cross-question draft history (spec_history_tokens): a session that
    drafts from its previous QAs still answers every question bit-identically
    to plain greedy — history is draft material, never output."""
    hist = dataclasses.replace(SPEC, spec_history_tokens=96)
    off, on = _pair(2, RC, hist, seed=17)
    for q, p in QUESTIONS + QUESTIONS[:2]:   # repeats: history gets hits
        want = off.question_answering_batch([q, q[::-1]], [p, p[::-1]],
                                            STOP, max_new_tokens=8)
        got = on.question_answering_batch([q, q[::-1]], [p, p[::-1]],
                                          STOP, max_new_tokens=8)
        assert got == want
    assert (on._qa_hist_len > 0).all()       # history actually recorded
    assert off._qa_hist.shape[1] == 0        # plain session keeps none


def test_spec_history_lifecycle():
    """History is per-stream: a recycled slot drops the previous tenant's
    QAs; serving ticks record only slots that really asked; migration
    carries the history with the stream."""
    import tempfile, os
    from stc_tpu.utils.checkpoint import (load_stream_state,
                                          save_stream_state)
    hist = dataclasses.replace(SPEC, spec_history_tokens=64)
    _, on = _pair(2, RC, hist, seed=19)
    q, p = QUESTIONS[0]
    on.question_answering_batch([q, q], [p, p], STOP, max_new_tokens=6)
    assert (on._qa_hist_len > 0).all()

    # serving-shaped call: only slot 0 asked; slot 1's history unchanged
    len1 = int(on._qa_hist_len[1])
    on.question_answering_batch([q, [0]], [p, [0]], STOP, max_new_tokens=6,
                                asked=[True, False])
    assert int(on._qa_hist_len[1]) == len1

    # migration carries the history; reset drops it
    path = os.path.join(tempfile.mkdtemp(), "s.npz")
    save_stream_state(on, 0, path)
    on.reset_streams([1])
    assert int(on._qa_hist_len[1]) == 0
    load_stream_state(on, 1, path)
    assert int(on._qa_hist_len[1]) == int(on._qa_hist_len[0])
    np.testing.assert_array_equal(on._qa_hist[1], on._qa_hist[0])


def test_spec_accepts_repetitive_continuations():
    """On a forced-repetition decode the lookahead loop converges in far
    fewer rounds than tokens: drive lookahead_decode directly against
    greedy_decode on a tiny model and compare outputs; then check the
    speculative path commits multi-token rounds by bounding the while_loop
    trip count via max_new_tokens congruence (identical output is the
    functional contract; acceptance is observable on TPU as latency)."""
    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(0))
    rc = dataclasses.replace(SPEC, max_new_tokens=16)
    B = 2
    dkvs = qw.init_decode_state(mcfg, rc, B, jnp.float32)
    # seed the decode cache with a prompt
    p_ids = jnp.asarray(np.tile(np.arange(1, 9, dtype=np.int32), (B, 1)))
    p_len = jnp.full((B,), 8, jnp.int32)
    logits, dkvs = qw.decode_step(params, mcfg, rc, dkvs,
                                  qw.embed_tokens(params, p_ids), p_len)
    last = logits[:, 7]
    stop = jnp.asarray([-1, -1, -1, -1], jnp.int32)

    t_ref, c_ref, _ = qw.greedy_decode(params, mcfg, rc, dkvs, last, stop,
                                       16)
    ctx, cl = qw.build_spec_ctx(p_ids, p_len, p_ids, p_len, 16)
    t_spec, c_spec, _ = qw.lookahead_decode(params, mcfg, rc, dkvs, last,
                                            stop, 16, ctx, cl)
    np.testing.assert_array_equal(np.asarray(c_ref), np.asarray(c_spec))
    np.testing.assert_array_equal(np.asarray(t_ref), np.asarray(t_spec))


def test_set_spec_decode_runtime_toggle():
    """set_spec_decode flips speculation on the LIVE session (stream state
    untouched): answers stay bit-identical through off->on->off, the fused
    serve tick rebuilds against the new schedule, and the draft-history
    ring resizes with the toggle (bench qa_7b_spec runs both arms on one
    session this way — two 7B sessions don't fit one chip)."""
    off, on = _pair(2, seed=23)
    q, p = QUESTIONS[0]
    want = off.question_answering_batch([q, q], [p, p], STOP,
                                        max_new_tokens=8)
    # spec session -> plain at runtime: identical answers, history dropped
    on.set_spec_decode(0)
    assert on.rekv.spec_decode_draft == 0 and on._qa_hist.shape[1] == 0
    got = on.question_answering_batch([q, q], [p, p], STOP, max_new_tokens=8)
    assert got == want
    # plain session -> spec at runtime (with history): still identical
    off.set_spec_decode(4, history_tokens=64)
    assert off._qa_hist.shape[1] == 64
    got = off.question_answering_batch([q, q], [p, p], STOP,
                                       max_new_tokens=8)
    assert got == want
    assert (off._qa_hist_len > 0).all()
    # fused serve tick after a toggle uses the new schedule
    rng = np.random.default_rng(23)
    chunk = rng.normal(size=(2, 8, off.mcfg.hidden_size)).astype(np.float32)
    tok_a, cnt_a = off.serve(chunk, None, [q, q], [p, p], STOP,
                             max_new_tokens=8)
    tok_b, cnt_b = on.serve(chunk, None, [q, q], [p, p], STOP,
                            max_new_tokens=8)
    assert off.last_serve_fused and on.last_serve_fused
    np.testing.assert_array_equal(cnt_a, cnt_b)
    for b in range(2):
        np.testing.assert_array_equal(tok_a[b, :cnt_a[b]],
                                      tok_b[b, :cnt_b[b]])


def test_spec_history_through_serving_engine():
    """Full engine scenario (multiplexed slots, fused ticks, churn) with
    speculation + cross-question history on: every answer bit-identical to
    the same scenario with speculation off."""
    from stc_tpu.runtime.serving import ServingEngine
    hist = dataclasses.replace(SPEC, spec_history_tokens=96)
    results = {}
    for name, rc in (("off", RC), ("on", hist)):
        mcfg = qw.Qwen2Config.tiny()
        params = qw.init_params(mcfg, jax.random.key(29))
        sess = _sess(params, mcfg, 2, rc)
        eng = ServingEngine(sess, STOP, max_new_tokens=6)
        rng = np.random.default_rng(29)
        rids = []
        res = {}
        for tick in range(6):
            c = rng.normal(size=(8, mcfg.hidden_size)).astype(np.float32)
            eng.submit_chunk(0, c)
            if tick % 2 == 0:
                eng.submit_chunk(1, c)
            if tick in (2, 4):
                q, p = QUESTIONS[tick % len(QUESTIONS)]
                rids.append(eng.submit_question(tick % 2, q, p))
            res.update(eng.step())
        eng.retire(1)
        slot = eng.admit()
        eng.submit_chunk(slot, rng.normal(
            size=(8, mcfg.hidden_size)).astype(np.float32))
        q, p = QUESTIONS[0]
        rids.append(eng.submit_question(slot, q, p))
        res.update(eng.run())
        assert set(res) == set(rids)
        results[name] = sorted(
            (rid, tuple(v["tokens"])) for rid, v in res.items())
    assert results["on"] == results["off"]
