"""Pallas fused streaming-attention kernel vs the jnp reference path
(interpret mode on CPU)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.engine import append_stream, init_stream_kv

HQ, HKV, D = 4, 2, 32

CFG = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=8,
                 topk=4, chunk_size=1, max_blocks=64,
                 max_prompt_tokens=16, max_new_tokens=8)


def build_state(n_appends, seed=0):
    rng = np.random.default_rng(seed)
    kv = init_stream_kv(CFG, 1, HKV, D, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(1, HQ, CFG.n_init, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, CFG.n_init, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, CFG.n_init, D)), jnp.float32)
    _, kv = append_stream(kv, q, k, v, CFG, is_init=True)
    for _ in range(n_appends):
        q = jnp.asarray(rng.normal(size=(1, HQ, CFG.block_size, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, HKV, CFG.block_size, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, HKV, CFG.block_size, D)), jnp.float32)
        _, kv = append_stream(kv, q, k, v, CFG, is_init=False)
    return kv, rng


@pytest.mark.parametrize("n_appends", [0, 3, 12])
def test_pallas_matches_jnp(n_appends):
    """Phases: empty store, pre-init-fill window, post-trigger with far stage."""
    kv, rng = build_state(n_appends)
    q = jnp.asarray(rng.normal(size=(1, HQ, CFG.block_size, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, CFG.block_size, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, CFG.block_size, D)), jnp.float32)

    o_ref, kv_ref = append_stream(kv, q, k, v, CFG, is_init=False,
                                  backend="jnp")
    o_pl, kv_pl = append_stream(kv, q, k, v, CFG, is_init=False,
                                backend="pallas_interpret")
    # pallas uses bf16 matmuls with fp32 accumulation -> looser tolerance
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=2e-2, atol=2e-2)
    # states must be identical (attention backend does not touch state)
    np.testing.assert_array_equal(np.asarray(kv_ref.num_blocks),
                                  np.asarray(kv_pl.num_blocks))
    np.testing.assert_allclose(np.asarray(kv_ref.block_k),
                               np.asarray(kv_pl.block_k))


def test_pallas_matches_jnp_exc_append():
    """Multi-page (exc_block_size) appends through the fused kernel."""
    cfg = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=32,
                     topk=4, chunk_size=1, max_blocks=64,
                     max_prompt_tokens=16, max_new_tokens=8)
    rng = np.random.default_rng(3)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(1, HQ, cfg.n_init, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, cfg.n_init, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, cfg.n_init, D)), jnp.float32)
    _, kv = append_stream(kv, q, k, v, cfg, is_init=True)
    for step in range(4):  # crosses the init-fill trigger at 64 tokens
        q = jnp.asarray(rng.normal(size=(1, HQ, 32, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, HKV, 32, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, HKV, 32, D)), jnp.float32)
        o_ref, kv_ref = append_stream(kv, q, k, v, cfg, is_init=False,
                                      backend="jnp")
        o_pl, kv = append_stream(kv, q, k, v, cfg, is_init=False,
                                 backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                                   rtol=2e-2, atol=2e-2, err_msg=str(step))
        np.testing.assert_array_equal(np.asarray(kv_ref.num_blocks),
                                      np.asarray(kv.num_blocks))


def _evict(kv, n_evict):
    """Host-tier eviction on a single-layer StreamKV: shift the page store
    left and advance page_offset (mirrors kvcache.host_tier.evict_pages)."""

    def shift(a):
        return jnp.concatenate(
            [a[:, :, n_evict:], jnp.zeros_like(a[:, :, :n_evict])], axis=2)

    return kv._replace(block_k=shift(kv.block_k), block_v=shift(kv.block_v),
                       page_offset=kv.page_offset + n_evict)


@pytest.mark.parametrize("n_evict", [4, 8])
def test_pallas_page_offset(n_evict):
    """After host-tier eviction (page_offset > 0) key positions and window
    masks must use ABSOLUTE page indices: eviction of out-of-window pages
    must not change the attention output, and the pallas kernel must agree
    with the jnp path (round-1 advisor finding: local-index positions
    corrupted encode attention from the first eviction onward)."""
    kv, rng = build_state(20)
    q = jnp.asarray(rng.normal(size=(1, HQ, CFG.block_size, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, CFG.block_size, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, CFG.block_size, D)), jnp.float32)

    o_base, _ = append_stream(kv, q, k, v, CFG, is_init=False, backend="jnp")
    kv_ev = _evict(kv, n_evict)
    o_ref, _ = append_stream(kv_ev, q, k, v, CFG, is_init=False,
                             backend="jnp")
    o_pl, _ = append_stream(kv_ev, q, k, v, CFG, is_init=False,
                            backend="pallas_interpret")
    # evicting pages outside the sliding window is attention-invisible
    np.testing.assert_allclose(np.asarray(o_ref), np.asarray(o_base),
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                               rtol=2e-2, atol=2e-2)


def test_pallas_masks_track_phase_transitions():
    """Drive a full stream on both backends; outputs stay close everywhere."""
    rng = np.random.default_rng(1)
    kv_a = init_stream_kv(CFG, 1, HKV, D, dtype=jnp.float32)
    kv_b = init_stream_kv(CFG, 1, HKV, D, dtype=jnp.float32)
    qi = jnp.asarray(rng.normal(size=(1, HQ, CFG.n_init, D)), jnp.float32)
    ki = jnp.asarray(rng.normal(size=(1, HKV, CFG.n_init, D)), jnp.float32)
    vi = jnp.asarray(rng.normal(size=(1, HKV, CFG.n_init, D)), jnp.float32)
    _, kv_a = append_stream(kv_a, qi, ki, vi, CFG, is_init=True)
    _, kv_b = append_stream(kv_b, qi, ki, vi, CFG, is_init=True)
    max_err = 0.0
    for step in range(14):  # crosses the init-fill trigger at L+T > 64
        q = jnp.asarray(rng.normal(size=(1, HQ, 8, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, HKV, 8, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, HKV, 8, D)), jnp.float32)
        o_a, kv_a = append_stream(kv_a, q, k, v, CFG, is_init=False,
                                  backend="jnp")
        o_b, kv_b = append_stream(kv_b, q, k, v, CFG, is_init=False,
                                  backend="pallas_interpret")
        err = float(jnp.max(jnp.abs(o_a - o_b)))
        max_err = max(max_err, err)
        assert err < 3e-2, (step, err)
    assert max_err > 0  # sanity: not comparing identical objects


def test_pallas_query_tiling_matches_jnp(monkeypatch):
    """Multi-q-tile path (n_qt > 1): shrink QROWS_MAX so a 48-token exc
    append splits into 3 query tiles, covering the per-tile scratch reset,
    tile_live bounds and epilogue-per-q-tile logic."""
    from stc_tpu.ops import stream_attention as sa
    monkeypatch.setattr(sa, "QROWS_MAX", 32)  # G=2 -> TQ=16, n_qt=3
    cfg = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=48,
                     topk=4, chunk_size=1, max_blocks=64,
                     max_prompt_tokens=16, max_new_tokens=8)
    rng = np.random.default_rng(7)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.float32)
    q = jnp.asarray(rng.normal(size=(1, HQ, cfg.n_init, D)), jnp.float32)
    k = jnp.asarray(rng.normal(size=(1, HKV, cfg.n_init, D)), jnp.float32)
    v = jnp.asarray(rng.normal(size=(1, HKV, cfg.n_init, D)), jnp.float32)
    _, kv = append_stream(kv, q, k, v, cfg, is_init=True)
    for step in range(3):  # crosses the init-fill trigger at 64 tokens
        q = jnp.asarray(rng.normal(size=(1, HQ, 48, D)), jnp.float32)
        k = jnp.asarray(rng.normal(size=(1, HKV, 48, D)), jnp.float32)
        v = jnp.asarray(rng.normal(size=(1, HKV, 48, D)), jnp.float32)
        o_ref, kv_ref = append_stream(kv, q, k, v, cfg, is_init=False,
                                      backend="jnp")
        o_pl, kv = append_stream(kv, q, k, v, cfg, is_init=False,
                                 backend="pallas_interpret")
        np.testing.assert_allclose(np.asarray(o_pl), np.asarray(o_ref),
                                   rtol=2e-2, atol=2e-2, err_msg=str(step))
        np.testing.assert_array_equal(np.asarray(kv_ref.num_blocks),
                                      np.asarray(kv.num_blocks))
