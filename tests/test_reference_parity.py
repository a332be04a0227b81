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
