"""Per-stream checkpoint: migrating one slot between serving sessions.

Contract: a stream saved from slot i of session A and restored into slot j
of session B (same configs/params, any batch) answers questions exactly as
it did in A, while B's other slots are untouched.  The reference's
per-stream state is a whole process — it has no migration story at all
(SURVEY.md §5: KV-cache state is never serialized).
"""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession
from stc_tpu.utils.checkpoint import (load_session_state, load_stream_state,
                                      save_session_state, save_stream_state)

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


def _setup(seed=7):
    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(seed))
    return params, mcfg


def test_stream_migration_between_sessions(tmp_path):
    """Slot 1 of a B=2 session migrates into slot 2 of a B=3 session and
    answers identically; the target's other slots keep their own streams."""
    params, mcfg = _setup()
    rng = np.random.default_rng(0)
    chunks_a = [rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32)
                for _ in range(4)]
    sa = _sess(params, mcfg, 2)
    for c in chunks_a:
        sa.encode_video_features(c)
    # diverge the source slot (ragged) so per-stream counters matter
    extra = rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32)
    sa.encode_video_features(extra, active=[False, True])
    want = sa.question_answering_batch([Q, Q], [P, P], STOP,
                                       max_new_tokens=6)[1]

    path = str(tmp_path / "stream.npz")
    save_stream_state(sa, 1, path)

    chunks_b = [rng.normal(size=(3, 8, mcfg.hidden_size)).astype(np.float32)
                for _ in range(3)]
    sb = _sess(params, mcfg, 3)
    for c in chunks_b:
        sb.encode_video_features(c)
    before = sb.question_answering_batch([Q] * 3, [P] * 3, STOP,
                                         max_new_tokens=6)
    load_stream_state(sb, 2, path)
    assert sb._stream_blocks.tolist() == [3, 3, 5]

    after = sb.question_answering_batch([Q] * 3, [P] * 3, STOP,
                                        max_new_tokens=6)
    assert after[2] == want          # the migrated stream answers as in A
    assert after[0] == before[0]     # other slots untouched
    assert after[1] == before[1]

    # the migrated stream keeps streaming in its new home
    grow = rng.normal(size=(3, 8, mcfg.hidden_size)).astype(np.float32)
    sb.encode_video_features(grow, active=[False, False, True])
    assert sb._stream_blocks.tolist() == [3, 3, 6]


def test_stream_migration_guards(tmp_path):
    """init-length and leaf-count mismatches fail fast."""
    params, mcfg = _setup()
    rng = np.random.default_rng(1)
    sa = _sess(params, mcfg, 2)
    sa.encode_video_features(
        rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32))
    path = str(tmp_path / "s.npz")
    save_stream_state(sa, 0, path)

    rc2 = dataclasses.replace(RC, n_init=8)
    sb = _sess(params, mcfg, 2, rc2)
    with pytest.raises(AssertionError, match="init prompt length"):
        load_stream_state(sb, 0, path)


def test_stream_migration_vlm(tmp_path):
    """Pixel-path migration: cacher references and pruner memory move with
    the stream; the target answers exactly as the source."""
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

    rng = np.random.default_rng(2)
    frames = rng.uniform(0, 255, (4, 1, 56, 56, 3)).astype(np.uint8)
    sa = build(2)
    for f in frames:
        sa.encode_video(np.stack([f, f]))
    want = sa.question_answering_batch([Q, Q], [P, P], STOP,
                                       max_new_tokens=4)[0]
    path = str(tmp_path / "vlm.npz")
    save_stream_state(sa, 0, path)

    sb = build(2)
    sb.encode_video(np.stack([frames[0], frames[0]]))
    load_stream_state(sb, 1, path)
    # the migrated stream carries its own cacher-schedule counter
    assert sb._slot_chunk.tolist() == [1, 4]
    got = sb.question_answering_batch([Q, Q], [P, P], STOP,
                                      max_new_tokens=4)[1]
    assert got == want

    # a bare-session blob cannot restore into a VLM session
    params2, mcfg2 = _setup()
    bare = _sess(params2, mcfg2, 2)
    bp = str(tmp_path / "bare.npz")
    save_stream_state(bare, 0, bp)
    with pytest.raises(AssertionError, match="leaves"):
        load_stream_state(sb, 0, bp)


def test_full_session_checkpoint_keeps_ragged_counters(tmp_path):
    """save/load_session_state round-trips the per-stream (ragged) counters
    — a ragged session must not come back uniform."""
    params, mcfg = _setup()
    rng = np.random.default_rng(3)
    s = _sess(params, mcfg, 2)
    for _ in range(2):
        s.encode_video_features(
            rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32))
    s.encode_video_features(
        rng.normal(size=(2, 8, mcfg.hidden_size)).astype(np.float32),
        active=[True, False])
    assert s._stream_blocks.tolist() == [3, 2]
    path = str(tmp_path / "full.npz")
    save_session_state(s, path)

    s2 = _sess(params, mcfg, 2)
    load_session_state(s2, path)
    assert s2._ragged and s2._stream_blocks.tolist() == [3, 2]
    assert s2._init_len == RC.n_init
    want = s.question_answering_batch([Q, Q], [P, P], STOP, max_new_tokens=6)
    got = s2.question_answering_batch([Q, Q], [P, P], STOP, max_new_tokens=6)
    assert got == want
