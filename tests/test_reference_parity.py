"""Engine parity against the REFERENCE IMPLEMENTATION ITSELF (torch, CPU).

Drives /root/reference/model/attention/kv_cache_manager.py (ContextManager +
RotaryEmbeddingESM + torch_impl multi-stage attention) on tiny tensors and
asserts the TPU engine produces the same attention outputs, the same
retrieval indices, and the same retrieved KV buffers — replacing trust in
the hand-written numpy oracle (tests/oracle.py) with the reference code.
The numpy oracle is itself validated against the reference here.
"""

import numpy as np
import pytest

torch = pytest.importorskip("torch")

import jax.numpy as jnp

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.engine import (append_stream, init_stream_kv,
                                    retrieve_blocks, score_blocks)
from oracle import OracleReKV
from reference_driver import (load_reference, make_context_manager,
                              reference_available)

pytestmark = pytest.mark.skipif(not reference_available(),
                                reason="reference tree not present")

HQ, HKV, D = 4, 2, 16


def _rand(rng, *shape):
    return rng.normal(size=shape).astype(np.float32)


def drive_pair(n_appends, chunk_size=1, exc_pages=1, seed=0):
    """Run reference ContextManager and TPU engine on identical inputs.

    Returns (cm, kv, cfg, per-append (ref_out, eng_out) list, rng).
    """
    kvm, rope_mod = load_reference()
    cfg = ReKVConfig(n_init=4, n_local=64, block_size=8,
                     exc_block_size=8 * exc_pages, topk=4,
                     chunk_size=chunk_size, max_blocks=64,
                     max_prompt_tokens=16, max_new_tokens=8)
    cm = make_context_manager(kvm, rope_mod, dim_head=D, n_init=cfg.n_init,
                              n_local=cfg.n_local, block_size=cfg.block_size,
                              topk=cfg.topk, chunk_size=cfg.chunk_size,
                              exc_block_size=cfg.exc_block_size)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    rng = np.random.default_rng(seed)
    outs = []

    q = _rand(rng, 1, HQ, cfg.n_init, D)
    k = _rand(rng, 1, HKV, cfg.n_init, D)
    v = _rand(rng, 1, HKV, cfg.n_init, D)
    o_ref = cm.append(*map(torch.from_numpy, (q, k, v)),
                      *map(torch.from_numpy, (q, k, v)))
    o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                              jnp.asarray(v), cfg, is_init=True)
    outs.append((o_ref.numpy(), np.asarray(o_eng)))

    T = cfg.exc_block_size
    for _ in range(n_appends):
        q = _rand(rng, 1, HQ, T, D)
        k = _rand(rng, 1, HKV, T, D)
        v = _rand(rng, 1, HKV, T, D)
        o_ref = cm.append(*map(torch.from_numpy, (q, k, v)),
                          *map(torch.from_numpy, (q, k, v)))
        o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), cfg, is_init=False)
        outs.append((o_ref.numpy(), np.asarray(o_eng)))
    return cm, kv, cfg, outs, rng


@pytest.mark.parametrize("n_appends", [2, 8, 14])
def test_append_outputs_match_reference(n_appends):
    """Streaming encode attention == the reference's own torch outputs,
    across the init-fill trigger (reference: append -> _append two-stage
    attention, kv_cache_manager.py:2248/2059)."""
    _, _, _, outs, _ = drive_pair(n_appends)
    for i, (ref, eng) in enumerate(outs):
        np.testing.assert_allclose(eng, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"append {i}")


@pytest.mark.parametrize("exc_pages", [2, 4])
def test_exc_append_outputs_match_reference(exc_pages):
    """Multi-page appends == reference with the same exc_block_size (its
    append loops st..ed over exc chunks internally; ours is one call)."""
    _, _, _, outs, _ = drive_pair(5, exc_pages=exc_pages)
    for i, (ref, eng) in enumerate(outs):
        np.testing.assert_allclose(eng, ref, rtol=2e-4, atol=2e-4,
                                   err_msg=f"exc append {i}")


@pytest.mark.parametrize("n_appends,chunk_size", [
    (2, 1),    # pre-trigger: blocks live in the remainder
    (8, 1),    # at the trigger
    (14, 1),   # scored top-k
    (14, 2),   # chunk-grouped scoring
    (13, 2),   # remainder chunk (13 % 2 == 1)
])
def test_retrieval_indices_match_reference(n_appends, chunk_size):
    """Top-k block retrieval indices == reference _calc_block_topk
    (kv_cache_manager.py:1414-1540) for several question tensors."""
    cm, kv, cfg, _, rng = drive_pair(n_appends, chunk_size=chunk_size)
    cm.set_retrieval()
    for qi in range(4):
        q = _rand(rng, 1, HQ, 6, D)
        cm.get_retrieved_kv(torch.from_numpy(q))
        want = list(cm.retrieved_block_indices[0])
        abs_idx, exists = score_blocks(kv, jnp.asarray(q), cfg)
        got = [int(i) for i, e in zip(np.asarray(abs_idx)[0],
                                      np.asarray(exists)[0]) if e]
        # pre-trigger the reference returns remainder-relative indices of
        # complete blocks only — identical numbering to ours
        assert got == sorted(want), (qi, got, want)


@pytest.mark.parametrize("n_appends", [14])
def test_retrieved_buffer_matches_reference(n_appends):
    """The [init | retrieved blocks] buffer handed to QA attention matches
    the reference's global buffer (get_retrieved_kv, :773-928)."""
    cm, kv, cfg, _, rng = drive_pair(n_appends)
    cm.set_retrieval()
    q = _rand(rng, 1, HQ, 6, D)
    ref_k, ref_v = cm.get_retrieved_kv(torch.from_numpy(q))
    ret_k, ret_v, _, valid_len = retrieve_blocks(kv, jnp.asarray(q), cfg)
    vl = int(valid_len[0])
    assert vl == ref_k.shape[2]
    np.testing.assert_allclose(np.asarray(ret_k)[0, :, :vl], ref_k[0].numpy(),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(ret_v)[0, :, :vl], ref_v[0].numpy(),
                               rtol=1e-5, atol=1e-5)


def test_numpy_oracle_matches_reference():
    """tests/oracle.py (used by the wider suite) is itself validated against
    the reference implementation."""
    kvm, rope_mod = load_reference()
    cfg = dict(n_init=4, n_local=64, block_size=8, topk=4, chunk_size=1,
               exc_block_size=8)
    cm = make_context_manager(kvm, rope_mod, dim_head=D, **cfg)
    oracle = OracleReKV(cfg["n_init"], cfg["n_local"], cfg["block_size"],
                        cfg["topk"], cfg["chunk_size"])
    rng = np.random.default_rng(3)
    q = _rand(rng, 1, HQ, 4, D)
    k = _rand(rng, 1, HKV, 4, D)
    v = _rand(rng, 1, HKV, 4, D)
    o_ref = cm.append(*map(torch.from_numpy, (q, k, v)),
                      *map(torch.from_numpy, (q, k, v)))
    o_orc = oracle.append(q[0], k[0], v[0])
    np.testing.assert_allclose(o_orc, o_ref[0].numpy(), rtol=2e-4, atol=2e-4)
    for i in range(14):
        q = _rand(rng, 1, HQ, 8, D)
        k = _rand(rng, 1, HKV, 8, D)
        v = _rand(rng, 1, HKV, 8, D)
        o_ref = cm.append(*map(torch.from_numpy, (q, k, v)),
                          *map(torch.from_numpy, (q, k, v)))
        o_orc = oracle.append(q[0], k[0], v[0])
        np.testing.assert_allclose(o_orc, o_ref[0].numpy(), rtol=2e-4,
                                   atol=2e-4, err_msg=f"append {i}")
    cm.set_retrieval()
    for _ in range(3):
        q = _rand(rng, 1, HQ, 6, D)
        cm.get_retrieved_kv(torch.from_numpy(q))
        assert oracle.retrieve_indices(q[0]) == sorted(
            cm.retrieved_block_indices[0])


def test_qa_attention_and_decode_match_reference():
    """QA-path parity against the reference's OWN rekv_attention_forward
    (rekv_attention.py:320-432): after a streamed prefix, the retrieval
    forward (get_retrieved_kv -> two-stage windowed attention over
    [init+retrieved | question]) and the subsequent tuple-KV decode steps
    (:364-384) must match the engine's retrieve_blocks + decode_write +
    decode_attend to float32 tolerance.  Identity/injected projections make
    the reference forward drivable on raw QKV tensors (no layer weights).
    Covers the len_k <= n_local regime (every reference config keeps QA
    caches far below n_local); the len_k > n_local branch is oracle-tested
    in test_qa_long_kv_branch_matches_reference below."""
    import jax.numpy as jnp
    from reference_driver import load_reference_attention
    from stc_tpu.kvcache.engine import (decode_attend, decode_write,
                                        init_decode_kv)

    ra, kvm, rope_mod = load_reference_attention()
    cm, kv, cfg, _, rng = drive_pair(10, seed=11)
    fwd = ra.rekv_attention_forward(
        n_local=cfg.n_local, n_init=cfg.n_init, topk=cfg.topk,
        chunk_size=cfg.chunk_size, block_size=cfg.block_size,
        max_cached_block=256, exc_block_size=cfg.exc_block_size,
        fattn=False, async_global_stream=False, pin_memory=False)
    rope = cm.position_embedding

    def ref_step(pkv, q4, k4, v4):
        """Drive the reference forward on injected post-projection QKV."""
        Tq = q4.shape[2]
        q_flat = torch.from_numpy(
            q4.transpose(0, 2, 1, 3).reshape(1, Tq, HQ * D))
        k_flat = torch.from_numpy(
            k4.transpose(0, 2, 1, 3).reshape(1, Tq, HKV * D))
        v_flat = torch.from_numpy(
            v4.transpose(0, 2, 1, 3).reshape(1, Tq, HKV * D))
        out, new_pkv = fwd(
            None, q_flat, k_flat, rope, True, pkv,
            project_q=lambda x: x, project_k=lambda x: k_flat,
            project_v=lambda x: v_flat, attention_out=lambda x: x,
            dim_head=D, num_heads=HQ, num_heads_kv=HKV)
        o = out.detach().numpy().reshape(1, Tq, HQ, D).transpose(0, 2, 1, 3)
        return o, new_pkv

    # --- retrieval forward (question) ---
    Tq = 5
    q4 = _rand(rng, 1, HQ, Tq, D)
    k4 = _rand(rng, 1, HKV, Tq, D)
    v4 = _rand(rng, 1, HKV, Tq, D)
    cm.set_retrieval()
    o_ref, pkv = ref_step(cm, q4, k4, v4)
    assert isinstance(pkv, tuple)  # current_key_value = (past_k, past_v)

    from stc_tpu.kvcache.engine import retrieve_blocks
    ret_k, ret_v, _, valid_len = retrieve_blocks(kv, jnp.asarray(q4), cfg)
    dkv = init_decode_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                       raw_rows=(cfg.n_init if cfg.decode_cap
                                 > cfg.n_local else 0))
    dkv_q = decode_write(dkv, jnp.asarray(k4), jnp.asarray(v4), Tq)
    q_slots = valid_len[:, None] + np.arange(Tq, dtype=np.int32)[None, :]
    o_eng = decode_attend(jnp.asarray(q4), jnp.asarray(q_slots), dkv_q, cfg)
    np.testing.assert_allclose(np.asarray(o_eng), o_ref, rtol=2e-4,
                               atol=2e-4)
    # question-KV-not-kept: the reference's returned tuple is the retrieved
    # prefix ONLY (updata_kv_cache=False) — the engine mirrors this by
    # resetting the cursor to the prefix length (qa_retrieve_step :301)
    assert pkv[0].shape[2] == int(np.asarray(valid_len)[0])

    # --- greedy-decode continuation: prompt prefill + two 1-token steps ---
    from stc_tpu.kvcache.state import DecodeKV
    dkv = DecodeKV(k=dkv_q.k, v=dkv_q.v, cursor=valid_len)
    cur = int(np.asarray(valid_len)[0])
    for step, Tn in enumerate((3, 1, 1)):
        qn = _rand(rng, 1, HQ, Tn, D)
        kn = _rand(rng, 1, HKV, Tn, D)
        vn = _rand(rng, 1, HKV, Tn, D)
        o_ref, pkv = ref_step(pkv, qn, kn, vn)
        dkv = decode_write(dkv, jnp.asarray(kn), jnp.asarray(vn), Tn)
        slots = np.arange(cur, cur + Tn, dtype=np.int32)[None, :]
        o_eng = decode_attend(jnp.asarray(qn), jnp.asarray(slots), dkv, cfg)
        cur += Tn
        np.testing.assert_allclose(np.asarray(o_eng), o_ref, rtol=2e-4,
                                   atol=2e-4, err_msg=f"decode step {step}")


def test_qa_long_kv_branch_matches_reference():
    """The len_k > n_local QA branch: when [retrieved | question | decode]
    outgrows the local window, the reference runs a SECOND attention stage —
    one-angle queries over the unrotated init keys with the complement
    window mask (rekv_attention.py:401-426, torch_impl complement
    dist >= n_local).  decode_attend compiles that stage in whenever
    decode_cap > n_local; this drives the reference's own forward on a
    small-n_local config deep into the branch (retrieval forward AND the
    decode continuation) and asserts output parity."""
    import jax.numpy as jnp
    from reference_driver import (load_reference, load_reference_attention,
                                  make_context_manager)
    from stc_tpu.kvcache.engine import (decode_attend, decode_write,
                                        init_decode_kv, retrieve_blocks)
    from stc_tpu.kvcache.state import DecodeKV

    ra, kvm, rope_mod = load_reference_attention()
    # retrieve_len = 4 + 4*8 = 36 <= n_init + n_local (the reference asserts
    # this bound, kv_cache_manager.py:895) but question + decode push len_k
    # past n_local = 40 from the first retrieval forward onward
    cfg = ReKVConfig(n_init=4, n_local=40, block_size=8, exc_block_size=8,
                     topk=4, chunk_size=1, max_blocks=64,
                     max_prompt_tokens=16, max_new_tokens=8)
    assert cfg.decode_cap > cfg.n_local  # the branch under test
    cm = make_context_manager(kvm, rope_mod, dim_head=D, n_init=cfg.n_init,
                              n_local=cfg.n_local, block_size=cfg.block_size,
                              topk=cfg.topk, chunk_size=cfg.chunk_size,
                              exc_block_size=cfg.exc_block_size)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    rng = np.random.default_rng(21)

    q = _rand(rng, 1, HQ, cfg.n_init, D)
    k = _rand(rng, 1, HKV, cfg.n_init, D)
    v = _rand(rng, 1, HKV, cfg.n_init, D)
    cm.append(*map(torch.from_numpy, (q, k, v)),
              *map(torch.from_numpy, (q, k, v)))
    _, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k), jnp.asarray(v),
                          cfg, is_init=True)
    for _ in range(12):
        q = _rand(rng, 1, HQ, 8, D)
        k = _rand(rng, 1, HKV, 8, D)
        v = _rand(rng, 1, HKV, 8, D)
        o_ref = cm.append(*map(torch.from_numpy, (q, k, v)),
                          *map(torch.from_numpy, (q, k, v)))
        o_eng, kv = append_stream(kv, jnp.asarray(q), jnp.asarray(k),
                                  jnp.asarray(v), cfg, is_init=False)
        np.testing.assert_allclose(np.asarray(o_eng), o_ref.numpy(),
                                   rtol=2e-4, atol=2e-4)

    fwd = ra.rekv_attention_forward(
        n_local=cfg.n_local, n_init=cfg.n_init, topk=cfg.topk,
        chunk_size=cfg.chunk_size, block_size=cfg.block_size,
        max_cached_block=256, exc_block_size=cfg.exc_block_size,
        fattn=False, async_global_stream=False, pin_memory=False)
    rope = cm.position_embedding

    def ref_step(pkv, q4, k4, v4):
        Tq = q4.shape[2]
        q_flat = torch.from_numpy(
            q4.transpose(0, 2, 1, 3).reshape(1, Tq, HQ * D))
        k_flat = torch.from_numpy(
            k4.transpose(0, 2, 1, 3).reshape(1, Tq, HKV * D))
        v_flat = torch.from_numpy(
            v4.transpose(0, 2, 1, 3).reshape(1, Tq, HKV * D))
        out, new_pkv = fwd(
            None, q_flat, k_flat, rope, True, pkv,
            project_q=lambda x: x, project_k=lambda x: k_flat,
            project_v=lambda x: v_flat, attention_out=lambda x: x,
            dim_head=D, num_heads=HQ, num_heads_kv=HKV)
        o = out.detach().numpy().reshape(1, Tq, HQ, D).transpose(0, 2, 1, 3)
        return o, new_pkv

    # retrieval forward: len_k = 36 + 5 = 41 > n_local = 24 -> init stage ON
    Tq = 5
    q4 = _rand(rng, 1, HQ, Tq, D)
    k4 = _rand(rng, 1, HKV, Tq, D)
    v4 = _rand(rng, 1, HKV, Tq, D)
    cm.set_retrieval()
    o_ref, pkv = ref_step(cm, q4, k4, v4)

    ret_k, ret_v, _, valid_len = retrieve_blocks(kv, jnp.asarray(q4), cfg)
    assert int(np.asarray(valid_len)[0]) + Tq > cfg.n_local  # deep in branch
    dkv = init_decode_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    # prefix install stores the init rows RAW (decode_cap > n_local):
    # the init stage scores them never-rotated, like the reference
    dkv = decode_write(dkv, ret_k, ret_v, valid_len, at_start=True,
                       raw_rows=cfg.n_init)
    dkv_q = decode_write(dkv, jnp.asarray(k4), jnp.asarray(v4), Tq)
    q_slots = valid_len[:, None] + np.arange(Tq, dtype=np.int32)[None, :]
    o_eng = decode_attend(jnp.asarray(q4), jnp.asarray(q_slots), dkv_q, cfg)
    np.testing.assert_allclose(np.asarray(o_eng), o_ref, rtol=2e-4, atol=2e-4)

    # decode continuation: every step's window has slid past the init tokens
    dkv = DecodeKV(k=dkv_q.k, v=dkv_q.v, cursor=valid_len)
    cur = int(np.asarray(valid_len)[0])
    for step, Tn in enumerate((3, 1, 1, 1)):
        qn = _rand(rng, 1, HQ, Tn, D)
        kn = _rand(rng, 1, HKV, Tn, D)
        vn = _rand(rng, 1, HKV, Tn, D)
        o_ref, pkv = ref_step(pkv, qn, kn, vn)
        dkv = decode_write(dkv, jnp.asarray(kn), jnp.asarray(vn), Tn)
        slots = np.arange(cur, cur + Tn, dtype=np.int32)[None, :]
        o_eng = decode_attend(jnp.asarray(qn), jnp.asarray(slots), dkv, cfg)
        cur += Tn
        np.testing.assert_allclose(np.asarray(o_eng), o_ref, rtol=2e-4,
                                   atol=2e-4, err_msg=f"decode step {step}")


def test_session_qa_runs_past_n_local():
    """Session-level smoke for the long-KV branch: a config whose decode
    cache outgrows n_local (previously asserted away at session build) now
    builds and answers end to end through the fused one-dispatch QA path."""
    import jax
    from stc_tpu.config import SessionConfig
    from stc_tpu.models import qwen2 as qw
    from stc_tpu.runtime.session import StreamingSession

    mcfg = qw.Qwen2Config.tiny()
    rekv = ReKVConfig(n_init=6, n_local=56, block_size=8, exc_block_size=8,
                      topk=6, chunk_size=1, max_blocks=64,
                      max_prompt_tokens=16, max_new_tokens=8,
                      host_kv_quant="none")
    assert rekv.decode_cap > rekv.n_local
    params = qw.init_params(mcfg, jax.random.key(0))
    sess = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            state_dtype=jnp.float32)
    rng = np.random.default_rng(5)
    sess.encode_init_prompt(list(range(6)))
    feats = rng.normal(size=(1, 10 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    ans = sess.question_answering([7, 8, 9], [1, 2, 3, 4], [0],
                                  max_new_tokens=6)
    assert len(ans) == 6
