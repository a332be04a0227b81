"""Pallas decode/QA-path kernel: parity vs the jnp engine math, the score
variant vs its jnp reference, and session-level answer parity with the
backend flipped (reference: one Triton kernel serves the QA path too,
triton_impl.py:404-487; score variant :233-402)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.kvcache.engine import decode_attend
from stc_tpu.kvcache.state import DecodeKV
from stc_tpu.ops.decode_attention import (decode_attention, decode_score,
                                          decode_score_jnp)


def make_cache(B, Hkv, C, D, cursor, seed=0, dtype=jnp.float32):
    rng = np.random.default_rng(seed)
    k = rng.normal(size=(B, Hkv, C, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, C, D)).astype(np.float32)
    return DecodeKV(k=jnp.asarray(k, dtype), v=jnp.asarray(v, dtype),
                    cursor=jnp.asarray(cursor, jnp.int32))


@pytest.mark.parametrize("T,C,n_local,cursors", [
    (1, 128, 96, [40, 128]),
    (8, 256, 200, [30, 250]),
    (24, 640, 512, [100, 640]),
])
def test_decode_attention_matches_jnp_engine(T, C, n_local, cursors):
    B, Hq, Hkv, D = 2, 4, 2, 16
    cfg_jnp = ReKVConfig(n_init=4, n_local=n_local, block_size=8,
                         exc_block_size=8, topk=4, max_blocks=16)
    cfg_pl = ReKVConfig(n_init=4, n_local=n_local, block_size=8,
                        exc_block_size=8, topk=4, max_blocks=16,
                        decode_attn_backend="pallas_interpret")
    rng = np.random.default_rng(1)
    for cur in cursors:
        dkv = make_cache(B, Hkv, C, D, [cur, max(1, cur - 13)], seed=cur)
        # queries sit at the cache frontier (their keys already written)
        starts = np.asarray([cur - T, max(1, cur - 13) - T], np.int32)
        starts = np.maximum(starts, 0)
        q = rng.normal(size=(B, Hq, T, D)).astype(np.float32)
        q_slots = jnp.asarray(starts[:, None]
                              + np.arange(T, dtype=np.int32)[None, :])
        o_ref = decode_attend(jnp.asarray(q), q_slots, dkv, cfg_jnp)
        o_pl = decode_attend(jnp.asarray(q), q_slots, dkv, cfg_pl)
        np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                                   rtol=2e-2, atol=2e-2)


def test_decode_attention_returns_row_maxima():
    B, Hq, Hkv, T, C, D, n_local = 1, 4, 2, 8, 256, 128, 200
    rng = np.random.default_rng(3)
    dkv = make_cache(B, Hkv, C, D, [200], seed=3)
    start = jnp.asarray([192 - T], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, T, D)).astype(np.float32))
    o, m = decode_attention(q, dkv.k, dkv.v, start, dkv.cursor,
                            n_local=n_local, interpret=True, return_m=True)
    # recompute maxima in plain jnp
    G = Hq // Hkv
    qg = q.reshape(B, Hkv, G, T, D)
    s = jnp.einsum("bhgqd,bhkd->bhgqk", qg, dkv.k).reshape(B, Hq, T, C)
    s = s * (D ** -0.5)
    slot = jnp.arange(C)[None, None, :]
    qs = (start[:, None] + jnp.arange(T)[None, :])[:, :, None]
    mask = ((qs - slot >= 0) & (qs - slot < n_local)
            & (slot < dkv.cursor[:, None, None]))[:, None]
    m_ref = jnp.max(jnp.where(mask, s, -1e30), axis=-1)
    np.testing.assert_allclose(np.asarray(m), np.asarray(m_ref),
                               rtol=2e-2, atol=2e-2)


@pytest.mark.parametrize("T,C,n_local", [(8, 256, 200), (16, 640, 512)])
def test_decode_score_matches_jnp(T, C, n_local):
    B, Hq, Hkv, D = 2, 4, 2, 16
    rng = np.random.default_rng(5)
    dkv = make_cache(B, Hkv, C, D, [C, C - 77], seed=5)
    starts = jnp.asarray([C - T, C - 77 - T], jnp.int32)
    q = jnp.asarray(rng.normal(size=(B, Hq, T, D)).astype(np.float32))
    _, m = decode_attention(q, dkv.k, dkv.v, starts, dkv.cursor,
                            n_local=n_local, interpret=True, return_m=True)
    s_pl = decode_score(q, dkv.k, m, starts, dkv.cursor, n_local=n_local,
                        interpret=True)
    s_ref = decode_score_jnp(q, dkv.k, m, starts, dkv.cursor,
                             n_local=n_local)
    np.testing.assert_allclose(np.asarray(s_pl), np.asarray(s_ref),
                               rtol=2e-2, atol=2e-2)
    assert np.asarray(s_pl).shape == (B, Hq, C)
    # masked keys (>= cursor) must carry zero mass
    assert np.allclose(np.asarray(s_pl)[1, :, C - 70:], 0.0)


def test_session_answers_match_with_pallas_decode_backend():
    """Full QA through the session with the decode kernel (interpret) must
    reproduce the jnp backend's answers exactly."""
    from stc_tpu.models import qwen2 as qw
    from stc_tpu.runtime.session import StreamingSession
    mcfg = qw.Qwen2Config.tiny()
    base = dict(n_init=6, n_local=128, block_size=8, exc_block_size=8,
                topk=4, max_blocks=64, max_prompt_tokens=32,
                max_new_tokens=8)
    params = qw.init_params(mcfg, jax.random.key(9))
    rng = np.random.default_rng(9)
    feats = rng.normal(size=(1, 20 * 8, mcfg.hidden_size)).astype(np.float32)
    answers = {}
    for backend in ("jnp", "pallas_interpret"):
        rekv = ReKVConfig(**base, decode_attn_backend=backend)
        sess = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                                state_dtype=jnp.float32)
        sess.encode_init_prompt(list(range(6)))
        sess.encode_video_features(feats)
        answers[backend] = sess.question_answering(
            [7, 8, 9], [7, 8, 9, 3], [0], max_new_tokens=6)
    assert answers["jnp"] == answers["pallas_interpret"]
    assert len(answers["jnp"]) >= 1
