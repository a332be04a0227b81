"""Long-stream soak: the adversarial COMBINATION coverage.

Streams to ~12x device capacity in IRREGULAR chunk sizes with QA interleaved
every few chunks, a checkpoint/restore in the middle, and (separately) int8
KV pages — asserting exact answer parity with an un-evicted all-device
session at every probe point, plus counter/page invariants.  The individual
features all have focused tests (test_host_tier.py, test_kv_quant.py,
test_ablation.py); this file exists because silent corruption historically
hid in path combinations (round-2 VERDICT: the rep-cap hole was only on the
pixel path; retrieval was once exact pre-capacity only).

Reference behavior being matched: the reference scores the FULL history
unconditionally and serves any block from CPU (kv_cache_manager.py
retrieval + MemoryUnit), so a bounded-device session must answer exactly
like an unbounded one at any stream length.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession
from stc_tpu.utils.checkpoint import load_session_state, save_session_state

S = 8  # block_size


def make_sess(max_blocks, seed=0, kv_quant="none", max_rep_blocks=1024):
    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=6, n_local=128, block_size=S, exc_block_size=S,
                      topk=4, chunk_size=1, max_blocks=max_blocks,
                      max_rep_blocks=max_rep_blocks,
                      max_prompt_tokens=64, max_new_tokens=8,
                      kv_quant=kv_quant)
    params = qw.init_params(mcfg, jax.random.key(seed))
    sess = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            state_dtype=jnp.float32)
    sess.encode_init_prompt(list(range(6)))
    return sess, mcfg


# irregular chunk schedule (in blocks): 3 distinct jit buckets, repeated to
# ~12x the small session's 32-page capacity
SCHEDULE = [1, 4, 2, 4, 1, 2, 4, 4, 2, 1, 4, 4] * 8  # 396 blocks total

QUESTIONS = [[5, 6, 7], [40, 41], [99, 98, 97, 96], [120], [7, 3, 11]]


def _stream_with_probes(small, big, mcfg, *, ckpt_path=None):
    """Drive both sessions through SCHEDULE; QA-probe every 8 chunks; if
    ckpt_path is set, checkpoint+restore the small session at half way."""
    rng = np.random.default_rng(7)
    probes = 0
    for i, nb in enumerate(SCHEDULE):
        feats = rng.normal(size=(1, nb * S, mcfg.hidden_size)).astype(
            np.float32)
        small.encode_video_features(feats)
        big.encode_video_features(feats)
        if i == len(SCHEDULE) // 2 and ckpt_path is not None:
            save_session_state(small, ckpt_path)
            fresh, _ = make_sess(32, seed=0)  # same params (same seed)
            load_session_state(fresh, ckpt_path)
            small = fresh
        if i % 8 == 7:
            q = QUESTIONS[probes % len(QUESTIONS)]
            a_small = small.question_answering(q, q + [8], [0],
                                               max_new_tokens=5)
            a_big = big.question_answering(q, q + [8], [0], max_new_tokens=5)
            assert a_small == a_big, (i, q)
            probes += 1
    return small, probes


def test_soak_irregular_chunks_with_checkpoint(tmp_path):
    small, mcfg = make_sess(32, seed=0)
    big, _ = make_sess(512, seed=0)
    small, probes = _stream_with_probes(
        small, big, mcfg, ckpt_path=str(tmp_path / "soak.npz"))
    assert probes >= 10
    # invariants at 12x capacity
    n_total = sum(SCHEDULE)
    assert int(np.asarray(small.kvs.num_blocks)[0, 0]) == n_total
    assert small._evicted_pages == int(np.asarray(small.kvs.page_offset)[0, 0])
    assert small._evicted_pages + 32 >= n_total  # resident fits the store
    assert small.host_store.total_pages == small._evicted_pages
    assert small.host_store.fetch_count > 0  # QA actually hit the host tier
    assert big._evicted_pages == 0


def test_soak_int8_pages_self_consistent(tmp_path):
    """Same soak under device int8 KV pages: a checkpoint/restore must
    continue the stream bit-identically (answers equal at every probe), and
    eviction must ship the already-quantized pages (host tier counters
    consistent)."""
    a, mcfg = make_sess(32, seed=1, kv_quant="int8")
    b, _ = make_sess(32, seed=1, kv_quant="int8")
    rng = np.random.default_rng(9)
    path = str(tmp_path / "soak_q.npz")
    for i, nb in enumerate(SCHEDULE[:48]):
        feats = rng.normal(size=(1, nb * S, mcfg.hidden_size)).astype(
            np.float32)
        a.encode_video_features(feats)
        b.encode_video_features(feats)
        if i == 24:  # restore A from its own checkpoint mid-stream
            save_session_state(a, path)
            fresh, _ = make_sess(32, seed=1, kv_quant="int8")
            load_session_state(fresh, path)
            a = fresh
        if i % 8 == 7:
            q = QUESTIONS[i % len(QUESTIONS)]
            ans_a = a.question_answering(q, q + [8], [0], max_new_tokens=5)
            ans_b = b.question_answering(q, q + [8], [0], max_new_tokens=5)
            assert ans_a == ans_b, (i, q)
    assert a._evicted_pages > 0 and a.host_store.fetch_count > 0
    # the quantized store really is int8 end to end: device pages AND the
    # evicted host chunks (eviction ships the already-int8 representation)
    assert np.asarray(a.kvs.block_k).dtype == np.int8
    assert a.host_store.quantized
    assert all(c.dtype == np.int8 for c in a.host_store.k_chunks)
