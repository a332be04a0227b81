"""Behavioural equivalence of the static-shape streaming KV engine vs the
numpy oracle that literally implements the reference semantics
(deferred init fill, deferred block carving, dynamic top-k filtering)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.engine import (
    append_stream, decode_attend, decode_write, init_decode_kv,
    init_stream_kv, retrieve_blocks,
)
from oracle import OracleReKV

HQ, HKV, D = 4, 2, 16


def make_cfg(chunk_size=1):
    # n_local must exceed n_init + topk*block_size + question length, like the
    # real configs (llava_ov: 15000 > 14 + 64*60); init-fill triggers once the
    # stream passes n_local=64 tokens, i.e. at video append #8.
    return ReKVConfig(
        n_init=4, n_local=64, block_size=8, exc_block_size=8,
        topk=4, chunk_size=chunk_size, max_blocks=64,
        max_prompt_tokens=16, max_new_tokens=8,
    )


def rand_qkv(rng, T):
    q = rng.normal(size=(1, HQ, T, D)).astype(np.float32)
    k = rng.normal(size=(1, HKV, T, D)).astype(np.float32)
    v = rng.normal(size=(1, HKV, T, D)).astype(np.float32)
    return q, k, v


def run_stream(cfg, n_video_appends, seed=0):
    """Drive engine and oracle with identical inputs; return both + per-step
    output pairs."""
    rng = np.random.default_rng(seed)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    oracle = OracleReKV(cfg.n_init, cfg.n_local, cfg.block_size, cfg.topk,
                        cfg.chunk_size)
    outs = []

    q, k, v = rand_qkv(rng, cfg.n_init)
    o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v), cfg, is_init=True)
    o_ref = oracle.append(q[0], k[0], v[0])
    outs.append((np.asarray(o_eng)[0], o_ref))

    for _ in range(n_video_appends):
        q, k, v = rand_qkv(rng, cfg.block_size)
        o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), cfg, is_init=False)
        o_ref = oracle.append(q[0], k[0], v[0])
        outs.append((np.asarray(o_eng)[0], o_ref))

    return kv, oracle, outs, rng


@pytest.mark.parametrize("n_appends", [2, 8, 12])
def test_append_outputs_match_oracle(n_appends):
    cfg = make_cfg()
    _, _, outs, _ = run_stream(cfg, n_appends)
    for i, (eng, ref) in enumerate(outs):
        np.testing.assert_allclose(eng, ref, rtol=3e-4, atol=3e-4,
                                   err_msg=f"append step {i}")


@pytest.mark.parametrize("n_appends,chunk_size", [
    (2, 1),    # pre-trigger, fewer blocks than topk -> all blocks
    (8, 1),    # just past the init-fill trigger
    (12, 1),   # scored top-k path
    (12, 2),   # chunk-grouped scoring
    (11, 2),   # chunk grouping with remainder chunk (11 % 2 == 1)
])
def test_retrieval_indices_match_oracle(n_appends, chunk_size):
    cfg = make_cfg(chunk_size)
    kv, oracle, _, rng = run_stream(cfg, n_appends)
    Lq = 6
    q = rng.normal(size=(1, HQ, Lq, D)).astype(np.float32)

    ret_k, ret_v, tok_valid, valid_len = retrieve_blocks(kv, jnp.asarray(q),
                                                         cfg)
    want_idx = oracle.retrieve_indices(q[0])

    n_valid_blocks = (int(valid_len[0]) - cfg.n_init) // cfg.block_size
    assert n_valid_blocks == len(want_idx)

    # engine buffer on its valid prefix must equal the oracle's packed buffer
    want_k, want_v = oracle.retrieved_buffer(want_idx)
    vl = int(valid_len[0])
    np.testing.assert_allclose(np.asarray(ret_k)[0, :, :vl], want_k,
                               rtol=1e-6, atol=1e-6)
    np.testing.assert_allclose(np.asarray(ret_v)[0, :, :vl], want_v,
                               rtol=1e-6, atol=1e-6)
    assert np.asarray(tok_valid)[0, :vl].all()
    assert not np.asarray(tok_valid)[0, vl:].any()


@pytest.mark.parametrize("n_appends", [1, 2, 5])
def test_exc_multi_page_appends_match_oracle(n_appends):
    """exc_block_size = 4 pages: one append carries 4 blocks of tokens in a
    single attention call (reference kv_cache_manager.append exc-chunk
    semantics). Outputs, state, and retrieval must match the oracle driven
    with the same T=4S appends."""
    cfg = ReKVConfig(
        n_init=4, n_local=64, block_size=8, exc_block_size=32,
        topk=4, chunk_size=1, max_blocks=64,
        max_prompt_tokens=16, max_new_tokens=8,
    )
    rng = np.random.default_rng(11)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    oracle = OracleReKV(cfg.n_init, cfg.n_local, cfg.block_size, cfg.topk,
                        cfg.chunk_size)
    q, k, v = rand_qkv(rng, cfg.n_init)
    _, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          cfg, is_init=True)
    oracle.append(q[0], k[0], v[0])
    for step in range(n_appends):
        q, k, v = rand_qkv(rng, cfg.exc_block_size)
        o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), cfg, is_init=False)
        o_ref = oracle.append(q[0], k[0], v[0])
        np.testing.assert_allclose(np.asarray(o_eng)[0], o_ref,
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"exc append {step}")
    assert int(kv.num_blocks[0]) == n_appends * 4
    # retrieval parity on the multi-page-appended store
    q = rng.normal(size=(1, HQ, 5, D)).astype(np.float32)
    from stc_tpu.kvcache.engine import score_blocks
    abs_idx, exists = score_blocks(kv, jnp.asarray(q), cfg)
    got = [int(i) for i, e in zip(np.asarray(abs_idx)[0],
                                  np.asarray(exists)[0]) if e]
    assert got == oracle.retrieve_indices(q[0])


def test_exc_append_state_equals_per_block_appends():
    """Multi-page appends must leave the IDENTICAL page store / rep keys as
    the same tokens appended one block at a time."""
    cfg1 = make_cfg()
    cfg4 = ReKVConfig(
        n_init=4, n_local=64, block_size=8, exc_block_size=32,
        topk=4, chunk_size=1, max_blocks=64,
        max_prompt_tokens=16, max_new_tokens=8,
    )
    rng = np.random.default_rng(12)
    kv1 = init_stream_kv(cfg1, 1, HKV, D, dtype=jnp.float32)
    kv4 = init_stream_kv(cfg4, 1, HKV, D, dtype=jnp.float32)
    q, k, v = rand_qkv(rng, 4)
    _, kv1 = append_stream(kv1, *map(jnp.asarray, (q, k, v)), cfg1,
                           is_init=True)
    _, kv4 = append_stream(kv4, *map(jnp.asarray, (q, k, v)), cfg4,
                           is_init=True)
    for _ in range(3):
        q, k, v = rand_qkv(rng, 32)
        _, kv4 = append_stream(kv4, *map(jnp.asarray, (q, k, v)), cfg4,
                               is_init=False)
        for j in range(4):
            sl = slice(j * 8, (j + 1) * 8)
            _, kv1 = append_stream(kv1, jnp.asarray(q[:, :, sl]),
                                   jnp.asarray(k[:, :, sl]),
                                   jnp.asarray(v[:, :, sl]), cfg1,
                                   is_init=False)
    np.testing.assert_array_equal(np.asarray(kv1.num_blocks),
                                  np.asarray(kv4.num_blocks))
    np.testing.assert_allclose(np.asarray(kv1.block_k),
                               np.asarray(kv4.block_k), rtol=0, atol=0)
    np.testing.assert_allclose(np.asarray(kv1.block_rep),
                               np.asarray(kv4.block_rep), rtol=1e-6,
                               atol=1e-6)


def _evict(kv, n_evict):
    """Host-tier eviction on a single-layer StreamKV (kvcache.host_tier
    semantics): shift the page store left, advance page_offset; the rep
    array is ABSOLUTE-indexed and stays put."""

    def shift(a):
        return jnp.concatenate(
            [a[:, :, n_evict:], jnp.zeros_like(a[:, :, :n_evict])], axis=2)

    return kv._replace(block_k=shift(kv.block_k), block_v=shift(kv.block_v),
                       page_offset=kv.page_offset + n_evict)


@pytest.mark.parametrize("chunk_size", [1, 2])
def test_retrieval_scoring_exact_across_eviction(chunk_size):
    """Stream to 3x device capacity with host-tier eviction; block scoring
    (which ranks the FULL history via the rep array) must stay EXACTLY equal
    to the oracle, including chunk-grouped scoring (round-1 deviation was
    'exact pre-capacity only')."""
    from stc_tpu.kvcache.engine import score_blocks

    cfg = ReKVConfig(
        n_init=4, n_local=32, block_size=8, exc_block_size=8,
        topk=4, chunk_size=chunk_size, max_blocks=16, max_rep_blocks=64,
        max_prompt_tokens=16, max_new_tokens=8,
    )
    W = 8   # n_window_pages(cfg): ceil(32/8)+1=5 -> rounded to 8
    E = 4   # eviction quantum
    rng = np.random.default_rng(7)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    oracle = OracleReKV(cfg.n_init, cfg.n_local, cfg.block_size, cfg.topk,
                        cfg.chunk_size)

    q, k, v = rand_qkv(rng, cfg.n_init)
    _, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          cfg, is_init=True)
    oracle.append(q[0], k[0], v[0])

    n_blocks = 3 * cfg.max_blocks
    evicted = 0
    for step in range(n_blocks):
        resident = int(kv.num_blocks[0]) - evicted
        if resident + 1 > cfg.max_blocks:
            assert resident - E >= W
            kv = _evict(kv, E)
            evicted += E
        q, k, v = rand_qkv(rng, cfg.block_size)
        o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), cfg, is_init=False)
        o_ref = oracle.append(q[0], k[0], v[0])
        np.testing.assert_allclose(np.asarray(o_eng)[0], o_ref,
                                   rtol=3e-4, atol=3e-4,
                                   err_msg=f"append step {step}")
    assert evicted > 0 and int(kv.num_blocks[0]) == n_blocks

    hit_host = False
    for qseed in range(5):
        qr = np.random.default_rng(100 + qseed)
        q = qr.normal(size=(1, HQ, 6, D)).astype(np.float32)
        abs_idx, exists = score_blocks(kv, jnp.asarray(q), cfg)
        got = [int(i) for i, e in zip(np.asarray(abs_idx)[0],
                                      np.asarray(exists)[0]) if e]
        want = oracle.retrieve_indices(q[0])
        assert got == want, (qseed, got, want)
        hit_host |= any(i < evicted for i in want)
    # the parity claim is only interesting if some top-k hit evicted blocks
    assert hit_host


@pytest.mark.parametrize("n_appends", [2, 12])
def test_qa_attention_matches_oracle(n_appends):
    cfg = make_cfg()
    kv, oracle, _, rng = run_stream(cfg, n_appends)
    Lq = 6
    q = rng.normal(size=(1, HQ, Lq, D)).astype(np.float32)
    qk = rng.normal(size=(1, HKV, Lq, D)).astype(np.float32)
    qv = rng.normal(size=(1, HKV, Lq, D)).astype(np.float32)

    ret_k, ret_v, _, valid_len = retrieve_blocks(kv, jnp.asarray(q), cfg)
    dkv = init_decode_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                       raw_rows=(cfg.n_init if cfg.decode_cap
                                 > cfg.n_local else 0))
    dkv = decode_write(dkv, jnp.asarray(qk), jnp.asarray(qv), Lq)
    q_slots = valid_len[:, None] + jnp.arange(Lq)[None, :]
    got = np.asarray(decode_attend(jnp.asarray(q), q_slots, dkv, cfg))[0]

    idx = oracle.retrieve_indices(q[0])
    rk, rv = oracle.retrieved_buffer(idx)
    want = oracle.qa_attention(q[0], rk, rv, qk[0], qv[0])
    np.testing.assert_allclose(got, want, rtol=3e-4, atol=3e-4)


def test_multi_turn_decode_positions_consistent():
    """Decoding token-by-token must equal one-shot prefill attention."""
    cfg = make_cfg()
    kv, oracle, _, rng = run_stream(cfg, 12)
    Lq = 5
    q = rng.normal(size=(1, HQ, Lq, D)).astype(np.float32)
    qk = rng.normal(size=(1, HKV, Lq, D)).astype(np.float32)
    qv = rng.normal(size=(1, HKV, Lq, D)).astype(np.float32)

    ret_k, ret_v, _, valid_len = retrieve_blocks(kv, jnp.asarray(q), cfg)

    # one-shot
    dkv = init_decode_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                       raw_rows=(cfg.n_init if cfg.decode_cap
                                 > cfg.n_local else 0))
    dkv = decode_write(dkv, jnp.asarray(qk), jnp.asarray(qv), Lq)
    q_slots = valid_len[:, None] + jnp.arange(Lq)[None, :]
    oneshot = np.asarray(decode_attend(jnp.asarray(q), q_slots, dkv, cfg))[0]

    # token-by-token
    dkv2 = init_decode_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    dkv2 = decode_write(dkv2, ret_k, ret_v, valid_len, at_start=True,
                        raw_rows=(cfg.n_init if cfg.decode_cap
                                  > cfg.n_local else 0))
    steps = []
    for t in range(Lq):
        dkv2 = decode_write(dkv2, jnp.asarray(qk[:, :, t:t + 1]),
                            jnp.asarray(qv[:, :, t:t + 1]), 1)
        slot = valid_len[:, None] + t
        o = decode_attend(jnp.asarray(q[:, :, t:t + 1]), slot, dkv2, cfg)
        steps.append(np.asarray(o)[0, :, 0])
    stepped = np.stack(steps, axis=1)
    np.testing.assert_allclose(stepped, oneshot, rtol=2e-4, atol=2e-4)


def test_init_stage_scores_raw_bf16_keys_exactly():
    """bf16 decode caches in the len_k > n_local branch: the complement-
    window init stage must score the ONCE-rounded raw init keys, exactly as
    the reference scores its never-rotated init_h_k (rekv_attention.py:408).
    The old inverse-rotation recovery double-rounded (round -> rotate ->
    round -> inverse-rotate); now the prefix install stores the init rows
    raw (decode_write raw_rows) so the stage reads them bit-exactly."""
    from stc_tpu.kvcache.engine import rope_cos_sin, _rot

    cfg = ReKVConfig(n_init=4, n_local=24, block_size=8, exc_block_size=8,
                     topk=4, chunk_size=1, max_blocks=64,
                     max_prompt_tokens=16, max_new_tokens=8)
    assert cfg.decode_cap > cfg.n_local
    rng = np.random.default_rng(3)
    # a prefix of [init | four retrieved blocks] and a query far past
    # n_local
    nI, S = cfg.n_init, cfg.block_size
    nP = nI + 4 * S  # 36 slots: the query's window slides past init
    pre_k = rng.normal(size=(1, HKV, nP, D)).astype(np.float32)
    pre_v = rng.normal(size=(1, HKV, nP, D)).astype(np.float32)
    valid = jnp.asarray([nP], jnp.int32)
    dkv = init_decode_kv(cfg, 1, HKV, D, dtype=jnp.bfloat16)
    dkv = decode_write(dkv, jnp.asarray(pre_k), jnp.asarray(pre_v), valid,
                       at_start=True, raw_rows=nI)

    # the stored init rows must BE the once-rounded raw keys
    stored = np.asarray(dkv.k[:, :, :nI].astype(jnp.float32))
    want = np.asarray(jnp.asarray(pre_k[:, :, :nI]).astype(jnp.bfloat16)
                      .astype(jnp.float32))
    np.testing.assert_array_equal(stored, want)

    # and a query whose window slid past init attends them via the init
    # stage: compare against a dense f32 oracle built from the raw bf16
    # keys (one-angle query at n_local - 1, complement-window mask)
    qT = 1
    q = rng.normal(size=(1, HQ, qT, D)).astype(np.float32)
    qk = rng.normal(size=(1, HKV, qT, D)).astype(np.float32)
    qv = rng.normal(size=(1, HKV, qT, D)).astype(np.float32)
    dkv = decode_write(dkv, jnp.asarray(qk), jnp.asarray(qv), qT)
    slot0 = nP
    q_slots = jnp.asarray([[slot0]], jnp.int32)
    got = np.asarray(decode_attend(jnp.asarray(q), q_slots, dkv, cfg))

    # dense oracle
    G = HQ // HKV
    kk = np.asarray(dkv.k.astype(jnp.float32))[0]     # (HKV, C, D)
    vv = np.asarray(dkv.v.astype(jnp.float32))[0]
    C = kk.shape[1]
    cos, sin = rope_cos_sin(jnp.arange(C, dtype=jnp.int32), D, 10000.0)
    k_rot_init = np.asarray(_rot(jnp.asarray(kk[None, :, :nI]),
                                 cos[:nI], sin[:nI]))[0]
    k_win = np.concatenate([k_rot_init, kk[:, nI:]], axis=1)
    cos_q, sin_q = rope_cos_sin(jnp.asarray(slot0, jnp.int32), D, 10000.0)
    q_rot = np.asarray(_rot(jnp.asarray(q), cos_q, sin_q))[0]  # (HQ, 1, D)
    cos1, sin1 = rope_cos_sin(jnp.asarray(cfg.n_local - 1, jnp.int32), D,
                              10000.0)
    q_one = np.asarray(_rot(jnp.asarray(q), cos1, sin1))[0]
    out = np.zeros((HQ, qT, D), np.float32)
    pos = np.arange(C)
    win_mask = (slot0 - pos >= 0) & (slot0 - pos < cfg.n_local) \
        & (pos < slot0 + 1)
    init_mask = (slot0 - pos[:nI] >= cfg.n_local)
    assert init_mask.all()  # deep in the branch
    for hq in range(HQ):
        hkv = hq // G
        logits = np.concatenate([
            (k_win[hkv] @ q_rot[hq, 0]) / np.sqrt(D)
            + np.where(win_mask, 0.0, -np.inf),
            (kk[hkv, :nI] @ q_one[hq, 0]) / np.sqrt(D)
            + np.where(init_mask, 0.0, -np.inf)])
        p = np.exp(logits - logits.max())
        p /= p.sum()
        out[hq, 0] = p[:C] @ vv[hkv] + p[C:] @ vv[hkv, :nI]
    np.testing.assert_allclose(got[0], out, rtol=3e-3, atol=3e-3)
