"""Stream slot recycling (retirement/admission) for continuous serving.

Contract: after session.reset_streams([b]) the slot b is answer-identical
to a FRESH session (same init prompt) for whatever it ingests next, while
every other slot's stream continues untouched.  The reference can only tear
down a whole process per stream (model/abstract_rekv.py one-session-per-
process); here a slot turns over inside a live batched session.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.serving import ServingEngine
from stc_tpu.runtime.session import StreamingSession

RC = ReKVConfig(n_init=4, n_local=128, block_size=8, exc_block_size=8,
                topk=4, chunk_size=1, max_blocks=64,
                max_prompt_tokens=16, max_new_tokens=8)
STOP = [0]
Q, P = [5, 6, 7], [5, 6, 7, 8]


def _sess(params, mcfg, batch, rc=RC):
    s = StreamingSession(params, mcfg, SessionConfig(rekv=rc), batch=batch,
                         state_dtype=jnp.float32)
    s.encode_init_prompt(list(range(rc.n_init)))
    return s


def _setup(batch, rc=RC, seed=7):
    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(seed))
    return params, mcfg, _sess(params, mcfg, batch, rc)


def _chunk(rng, mcfg, n=1):
    return rng.normal(size=(n, 8, mcfg.hidden_size)).astype(np.float32)


def test_recycled_slot_matches_fresh_session():
    """Retire slot 1 mid-stream, ingest a NEW video into it while slots 0/2
    keep streaming: slot 1 answers like a fresh session over only the new
    video; slots 0/2 answer like solo sessions over their full history."""
    params, mcfg, s3 = _setup(3)
    rng = np.random.default_rng(0)
    hist = [_chunk(rng, mcfg) for _ in range(4)]       # shared warmup history
    for c in hist:
        s3.encode_video_features(np.repeat(c, 3, 0))

    s3.reset_streams([1])
    assert s3._stream_blocks.tolist() == [4, 0, 4]

    tail = [_chunk(rng, mcfg) for _ in range(2)]       # slots 0/2 continue
    fresh = [_chunk(rng, mcfg) for _ in range(3)]      # slot 1's new video
    for i in range(3):
        row = [tail[i][0] if i < 2 else np.zeros_like(fresh[0][0]),
               fresh[i][0],
               tail[i][0] if i < 2 else np.zeros_like(fresh[0][0])]
        active = [i < 2, True, i < 2]
        s3.encode_video_features(np.stack(row), active=active)
    assert s3._stream_blocks.tolist() == [6, 3, 6]

    got = s3.question_answering_batch([Q] * 3, [P] * 3, STOP,
                                      max_new_tokens=6)

    solo_old = _sess(params, mcfg, 1)
    for c in hist + tail:
        solo_old.encode_video_features(c)
    want_old = solo_old.question_answering(Q, P, STOP, max_new_tokens=6)
    solo_new = _sess(params, mcfg, 1)
    for c in fresh:
        solo_new.encode_video_features(c)
    want_new = solo_new.question_answering(Q, P, STOP, max_new_tokens=6)

    assert got[0] == want_old
    assert got[2] == want_old
    assert got[1] == want_new


def test_reset_then_fused_serve_tick():
    """The fused serve tick keeps working across a reset: the recycled slot
    encodes + answers in the same one-dispatch tick as the live slots."""
    params, mcfg, s2 = _setup(2)
    rng = np.random.default_rng(1)
    for _ in range(3):
        s2.encode_video_features(np.repeat(_chunk(rng, mcfg), 2, 0))
    s2.reset_streams([0])

    chunk = _chunk(rng, mcfg, 2)
    tok, cnt = s2.serve(chunk, [True, True], [Q, Q], [P, P], STOP,
                        max_new_tokens=6)
    assert s2.last_serve_fused
    assert s2._stream_blocks.tolist() == [1, 4]

    solo = _sess(params, mcfg, 1)
    solo.encode_video_features(chunk[:1])
    want = solo.question_answering(Q, P, STOP, max_new_tokens=6)
    assert [int(t) for t in tok[0, :cnt[0]]] == want


def test_serving_engine_retire_admit():
    """Engine-level churn: retire a finished stream, admit a new one into
    the recycled slot, answers match a fresh solo session; queued work of
    the retired stream is dropped; submitting to a retired slot raises."""
    params, mcfg, sess = _setup(2)
    eng = ServingEngine(sess, STOP, max_new_tokens=6)
    rng = np.random.default_rng(2)
    for _ in range(3):
        c = _chunk(rng, mcfg)[0]
        eng.submit_chunk(0, c)
        eng.submit_chunk(1, c)
    eng.run()

    eng.submit_chunk(1, _chunk(rng, mcfg)[0])   # queued, then dropped
    eng.retire(1)
    assert eng.free_slots == 1 and eng.pending == 0
    with pytest.raises(AssertionError):
        eng.submit_chunk(1, _chunk(rng, mcfg)[0])
    with pytest.raises(AssertionError):
        eng.submit_question(1, Q, P)

    slot = eng.admit()
    assert slot == 1 and eng.free_slots == 0
    new_video = [_chunk(rng, mcfg)[0] for _ in range(2)]
    eng.submit_chunk(slot, new_video[0])
    eng.run()
    # second chunk + the question land in the same tick -> fused serve;
    # the answer sees both chunks of the new video
    eng.submit_chunk(slot, new_video[1])
    rid = eng.submit_question(slot, Q, P)
    fused_before = eng.stats.fused_ticks
    res = eng.run()
    assert eng.stats.fused_ticks == fused_before + 1
    assert eng.stats.streams_retired == 1 and eng.stats.streams_admitted == 1

    solo = _sess(params, mcfg, 1)
    for c in new_video:
        solo.encode_video_features(c[None])
    want = solo.question_answering(Q, P, STOP, max_new_tokens=6)
    assert res[rid]["tokens"] == want


def test_reset_refuses_host_tier():
    """Once pages were evicted to the host tier the per-slot ring cannot be
    unwound; reset_streams fails fast (same restriction as diverged-ragged
    eviction)."""
    rc = dataclasses.replace(RC, max_blocks=32)
    _, mcfg, sess = _setup(2, rc)
    rng = np.random.default_rng(3)
    for _ in range(40):
        sess.encode_video_features(np.repeat(_chunk(rng, mcfg), 2, 0))
    assert sess._evicted_pages > 0
    with pytest.raises(RuntimeError, match="host-evicted"):
        sess.reset_streams([0])


def test_reset_with_ablation_scorer():
    """The layerwise (host-side) scorers score only each stream's OWN rep
    history after a reset — a prior tenant's rep slots must not leak into
    the recycled slot's retrieval."""
    rc = dataclasses.replace(RC, retrieval_scorer="aks")
    params, mcfg, s2 = _setup(2, rc)
    rng = np.random.default_rng(4)
    hist = [_chunk(rng, mcfg) for _ in range(4)]
    for c in hist:
        s2.encode_video_features(np.repeat(c, 2, 0))
    s2.reset_streams([1])
    fresh = [_chunk(rng, mcfg) for _ in range(2)]
    for c in fresh:
        s2.encode_video_features(np.stack([np.zeros_like(c[0]), c[0]]),
                                 active=[False, True])

    got = s2.question_answering_batch([Q, Q], [P, P], STOP, max_new_tokens=6)

    solo = _sess(params, mcfg, 1, rc)
    for c in fresh:
        solo.encode_video_features(c)
    want = solo.question_answering(Q, P, STOP, max_new_tokens=6)
    assert got[1] == want


def test_reset_streams_vlm_pixels():
    """Pixel-path recycling: the recycled slot's cacher references, pruner
    memory, and per-slot chunk counter reset too — it answers like a fresh
    VLM session over only its new frames, while the live slot's stream
    continues BIT-IDENTICALLY to an unchurned session (per-slot cacher
    schedules; the mixed-path jit serves disagreeing ticks)."""
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

    def build(batch):
        s = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                             batch=batch)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 255, (6, 1, 56, 56, 3)).astype(np.uint8)

    def feed(s):
        for i in range(3):
            s.encode_video(np.stack([frames[i], frames[i]]))

    s2 = build(2)
    feed(s2)
    s2.reset_streams([1])
    assert s2._slot_chunk.tolist() == [3, 0]
    for i in range(3, 5):
        s2.encode_video(np.stack([frames[i], frames[i + 1]]))
    assert np.asarray(s2.kvs.num_blocks)[0].tolist() == [5, 2]
    assert s2._slot_chunk.tolist() == [5, 2]

    got = s2.question_answering_batch([Q, Q], [P, P], STOP, max_new_tokens=4)

    # recycled slot == fresh session over only its new frames
    solo = build(1)
    for i in (4, 5):
        solo.encode_video(frames[i][None])
    want = solo.question_answering(Q, P, STOP, max_new_tokens=4)
    assert got[1] == want

    # live slot == unchurned twin (same frames, no reset ever)
    twin = build(2)
    feed(twin)
    for i in range(3, 5):
        twin.encode_video(np.stack([frames[i], frames[i + 1]]))
    want_live = twin.question_answering_batch([Q, Q], [P, P], STOP,
                                              max_new_tokens=4)[0]
    assert got[0] == want_live
