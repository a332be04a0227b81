"""Ragged multi-stream ingest: per-stream `active` masks batch streams
ticking at DIFFERENT rates into one dispatch (continuous-batching-style
serving — the reference's one-session-per-process DP cannot express this).

Contract: an inactive stream's state (KV pages, counters, rep keys, cacher
references, pruner memory) stays bit-identical through a masked dispatch,
and active streams compute exactly what an independent session would.
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.kvcache.engine import append_stream, init_stream_kv
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession

HQ, HKV, D = 4, 2, 16
CFG = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=8,
                 topk=4, chunk_size=1, max_blocks=16,
                 max_prompt_tokens=16, max_new_tokens=8)

# per-step activity pattern: (stream0, stream1)
PATTERN = [(True, True), (True, False), (False, True), (True, True),
           (False, True), (True, False), (True, True)]


def _arrs(rng, h, t):
    return jnp.asarray(rng.normal(size=(1, h, t, D)), jnp.float32)


def _init_kv(cfg, B, rng):
    kv = init_stream_kv(cfg, B, HKV, D, dtype=jnp.float32)
    q = jnp.concatenate([_arrs(rng, HQ, cfg.n_init)] * B, 0)
    k = jnp.concatenate([_arrs(rng, HKV, cfg.n_init)] * B, 0)
    v = jnp.concatenate([_arrs(rng, HKV, cfg.n_init)] * B, 0)
    _, kv = append_stream(kv, q, k, v, cfg, is_init=True)
    return kv


def test_engine_ragged_matches_independent_streams():
    """A B=2 ragged run equals two independent B=1 runs, bit for bit, on
    every state leaf — and active steps' attention outputs match too."""
    rng = np.random.default_rng(0)
    # per-step fresh data per stream
    data = [[(_arrs(rng, HQ, 8), _arrs(rng, HKV, 8), _arrs(rng, HKV, 8))
             for _ in PATTERN] for _ in range(2)]

    kv2 = _init_kv(CFG, 2, np.random.default_rng(42))
    kv1 = [_init_kv(CFG, 1, np.random.default_rng(42)) for _ in range(2)]

    outs2, outs1 = [], [[], []]
    for step, act in enumerate(PATTERN):
        q = jnp.concatenate([data[b][step][0] for b in range(2)], 0)
        k = jnp.concatenate([data[b][step][1] for b in range(2)], 0)
        v = jnp.concatenate([data[b][step][2] for b in range(2)], 0)
        o, kv2 = append_stream(kv2, q, k, v, CFG, is_init=False,
                               active=jnp.asarray(act))
        outs2.append(np.asarray(o))
        for b in range(2):
            if act[b]:
                ob, kv1[b] = append_stream(kv1[b], *data[b][step], CFG,
                                           is_init=False)
                outs1[b].append((step, np.asarray(ob)))

    for b in range(2):
        for name in kv2._fields:
            got = np.asarray(getattr(kv2, name))
            want = np.asarray(getattr(kv1[b], name))
            np.testing.assert_array_equal(
                got[b], want[0], err_msg=f"stream {b} leaf {name}")
        for step, ob in outs1[b]:
            np.testing.assert_allclose(outs2[step][b], ob[0], rtol=2e-5,
                                       atol=2e-5,
                                       err_msg=f"stream {b} step {step}")


def test_engine_inactive_full_stream_not_clobbered():
    """An inactive stream whose page ring is FULL keeps its pages intact
    (the clipped write slot lands on live pages; the masked write selects
    the existing content back)."""
    rng = np.random.default_rng(1)
    kv = _init_kv(CFG, 2, rng)
    for _ in range(CFG.max_blocks):  # fill both streams to capacity
        q = jnp.concatenate([_arrs(rng, HQ, 8)] * 2, 0)
        k = jnp.concatenate([_arrs(rng, HKV, 8)] * 2, 0)
        v = jnp.concatenate([_arrs(rng, HKV, 8)] * 2, 0)
        _, kv = append_stream(kv, q, k, v, CFG, is_init=False)
    assert int(kv.num_blocks[1]) == CFG.max_blocks
    before = np.asarray(kv.block_k[1]).copy()
    # one more masked step: only stream 0 ticks — stream 0 HAS no room
    # either, so use a config check-free engine call on stream 1 inactive
    # with stream 0 evicted... simplest: stream 0 inactive TOO would be a
    # no-op; instead tick stream 0 only after evicting its oldest page.
    from stc_tpu.kvcache.host_tier import evict_pages
    # evict via the stacked-layer API shape (L=1 view)
    stacked = jax.tree.map(lambda x: x[None], kv)
    ek, ev, eks, evs, stacked = evict_pages(stacked, 1)
    kv = jax.tree.map(lambda x: x[0], stacked)
    _, kv = append_stream(kv, q, k, v, CFG, is_init=False,
                          active=jnp.asarray([True, False]))
    # stream 1's surviving pages (post-shift) are untouched by the masked
    # write: recompute the expected shifted store
    want = np.concatenate([before[:, 1:], np.zeros_like(before[:, :1])],
                          axis=1)
    np.testing.assert_array_equal(np.asarray(kv.block_k[1]), want)
    assert int(kv.num_blocks[1]) == CFG.max_blocks  # counter unmoved


def _sess(batch, seed=7, max_blocks=64):
    mcfg = qw.Qwen2Config.tiny()
    rekv = dataclasses.replace(CFG, max_blocks=max_blocks, n_local=128)
    params = qw.init_params(mcfg, jax.random.key(seed))
    s = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                         batch=batch, state_dtype=jnp.float32)
    s.encode_init_prompt(list(range(CFG.n_init)))
    return s, mcfg


def test_session_ragged_answers_match_independent_sessions():
    s2, mcfg = _sess(2)
    singles = [_sess(1)[0] for _ in range(2)]
    rng = np.random.default_rng(3)
    chunks = [[rng.normal(size=(1, 8, mcfg.hidden_size)).astype(np.float32)
               for _ in PATTERN] for _ in range(2)]
    for step, act in enumerate(PATTERN):
        feats = np.concatenate([chunks[b][step] for b in range(2)], 0)
        s2.encode_video_features(feats, active=act)
        for b in range(2):
            if act[b]:
                singles[b].encode_video_features(chunks[b][step])
    assert s2._stream_blocks.tolist() == [
        sum(1 for a in PATTERN if a[b]) for b in range(2)]
    ans2 = s2.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                 max_new_tokens=6, all_streams=True)
    for b in range(2):
        want = singles[b].question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                             max_new_tokens=6)
        assert ans2[b] == want, (b, ans2[b], want)


def test_session_ragged_plus_eviction_raises():
    # max_blocks=32: the smallest store with eviction margins over the
    # 24-page window cover (n_local=128, S=8)
    s2, mcfg = _sess(2, max_blocks=32)
    rng = np.random.default_rng(4)
    feats = rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32)
    s2.encode_video_features(feats, active=[True, False])  # diverge
    with pytest.raises(RuntimeError, match="ragged"):
        for _ in range(40):  # until eviction would trigger
            s2.encode_video_features(feats)


def test_vlm_ragged_pixel_path_matches_independent_sessions():
    """Full pixel path (SigLIP + cacher + pruner + LM) with ragged masks:
    each stream's state and answers equal an independent session fed only
    its own active chunks."""
    from stc_tpu.models import llava_onevision as lo
    cfg = lo.LlavaOVConfig.tiny()
    tpf = 3

    def make(batch):
        scfg = SessionConfig(
            rekv=ReKVConfig(n_init=4, n_local=128, block_size=tpf,
                            exc_block_size=tpf, topk=4, max_blocks=64,
                            max_prompt_tokens=32, max_new_tokens=8),
            cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                                cache_interval=2),
            pruner=PrunerConfig(strategy="stc", token_per_frame=tpf),
        )
        params = lo.init_random_params(cfg, jax.random.key(9))
        s = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                             batch=batch)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    s2 = make(2)
    rng = np.random.default_rng(5)
    pattern = [(True, True), (True, False), (False, True), (True, True)]
    frames = [[rng.uniform(0, 255, size=(1, 1, 56, 56, 3)).astype(np.uint8)
               for _ in pattern] for _ in range(2)]
    for step, act in enumerate(pattern):
        fb = np.concatenate([frames[b][step] for b in range(2)], 0)
        s2.encode_video(fb, active=act)
    # cacher full/cached parity follows each slot's OWN chunk counter
    # (mixed-path dispatches when slots disagree), so per-stream answers
    # match independently-run sessions EXACTLY even on the pixel path
    for b in range(2):
        nb = sum(1 for a in pattern if a[b])
        assert int(np.asarray(s2.kvs.num_blocks)[0, b]) == nb
        assert int(s2._slot_chunk[b]) == nb
    ans = s2.question_answering([7, 8, 9], [7, 8, 9, 10], [0],
                                max_new_tokens=4, all_streams=True)
    for b in range(2):
        solo = make(1)
        for step, act in enumerate(pattern):
            if act[b]:
                solo.encode_video(frames[b][step])
        want = solo.question_answering([7, 8, 9], [7, 8, 9, 10], [0],
                                       max_new_tokens=4)
        assert ans[b] == want, (b, ans[b], want)


def test_vlm_ragged_cacher_state_isolated():
    """An inactive stream's cacher references and pruner memory are
    bit-identical through a masked dispatch (its garbage pixels must not
    pollute them)."""
    from stc_tpu.models import llava_onevision as lo
    cfg = lo.LlavaOVConfig.tiny()
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=128, block_size=3,
                        exc_block_size=3, topk=4, max_blocks=64,
                        max_prompt_tokens=32, max_new_tokens=8),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="stc", token_per_frame=3),
    )
    params = lo.init_random_params(cfg, jax.random.key(10))
    s = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32, batch=2)
    s.encode_init_prompt([1, 2, 3, 4])
    rng = np.random.default_rng(6)
    fb = rng.uniform(0, 255, size=(2, 1, 56, 56, 3)).astype(np.uint8)
    # two both-active chunks: chunk_idx -> 2, so the NEXT (masked) chunk
    # takes the FULL path, which rewrites cacher references
    s.encode_video(fb)
    s.encode_video(rng.uniform(0, 255, size=(2, 1, 56, 56, 3)
                               ).astype(np.uint8))
    assert s.chunk_idx == 2
    v_before = jax.tree.map(lambda x: np.asarray(x)[:, 1].copy(), s._vstate)
    p_before = jax.tree.map(lambda x: np.asarray(x)[1].copy(), s._pstate)
    fb2 = rng.uniform(0, 255, size=(2, 1, 56, 56, 3)).astype(np.uint8)
    s.encode_video(fb2, active=[True, False])
    # stream 0's refs DID change (full path ran for it)
    changed = jax.tree.leaves(jax.tree.map(
        lambda a: bool(np.any(np.asarray(a)[:, 0] != 0)), s._vstate))
    assert any(changed)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a)[:, 1], b), s._vstate, v_before)
    jax.tree.map(lambda a, b: np.testing.assert_array_equal(
        np.asarray(a)[1], b), s._pstate, p_before)
