"""Full LLaVA-OneVision + ReKV session end to end on a tiny random model:
frames -> SigLIP(+cacher) -> projector -> pooling -> pruner -> streaming LM
-> retrieval QA."""

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.models import llava_onevision as lo


def make(seed=0, cacher="cacher", pruner="stc"):
    cfg = lo.LlavaOVConfig.tiny()
    # tiny vision: grid 4 -> 16 tokens -> pooled 2x2 = 4 tokens/frame
    tpf = 3 if pruner == "stc" else cfg.tokens_per_frame
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=128, block_size=tpf,
                        exc_block_size=tpf, topk=4, max_blocks=64,
                        max_prompt_tokens=32, max_new_tokens=8),
        cacher=CacherConfig(strategy=cacher, update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy=pruner, token_per_frame=tpf),
    )
    params = lo.init_random_params(cfg, jax.random.key(seed))
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32)
    return sess, cfg


def test_llava_ov_full_streaming_session():
    sess, cfg = make()
    rng = np.random.default_rng(0)

    sess.encode_init_prompt([1, 2, 3, 4])
    frames = rng.uniform(0, 255, size=(6, 56, 56, 3)).astype(np.uint8)
    # stream frame-by-frame (encode_chunk_frames=1)
    for f in range(6):
        sess.encode_video(frames[f:f + 1])
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 6
    assert sess.chunk_idx == 6

    out = sess.question_answering([7, 8, 9], [7, 8, 9, 10],
                                  stop_token_ids=[0], max_new_tokens=6)
    assert 1 <= len(out) <= 6 and out[0] != 0

    # continue streaming after QA
    sess.encode_video(frames[0:1])
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 7


def test_cacher_off_matches_reference_none_strategy():
    """strategy='none' must run the full path every chunk (chunk pinned to 0
    in the reference, abstract_rekv.py:62-63).  With the pruner also off
    (stateless vision), the block written for a frame is history-independent."""
    sess, cfg = make(cacher="none", pruner="none")
    rng = np.random.default_rng(1)
    sess.encode_init_prompt([1, 2, 3, 4])
    frames = rng.uniform(0, 255, size=(2, 56, 56, 3)).astype(np.uint8)
    sess.encode_video(frames[0:1])
    sess.encode_video(frames[1:2])
    sess2, _ = make(cacher="none", pruner="none")
    sess2.encode_init_prompt([1, 2, 3, 4])
    sess2.encode_video(frames[1:2])
    # only LAYER 0's key block is history-independent (deeper layers attend
    # the local window, so their hidden states depend on past frames — in the
    # reference too); layer 0 K is a pure function of the vision features.
    # block_k layout: (L, B, Hkv, Nb, S, D) — select layer 0, block idx
    blk1 = np.asarray(sess.kvs.block_k)[0][:, :, 1]
    blk2 = np.asarray(sess2.kvs.block_k)[0][:, :, 0]
    np.testing.assert_allclose(blk1, blk2, rtol=1e-5, atol=1e-5)

    # and with the cacher ON, chunk 1 takes the cached path -> its vision
    # features (hence layer-0 K) differ from the full-compute result
    sess3, _ = make(cacher="cacher", pruner="none")
    sess3.encode_init_prompt([1, 2, 3, 4])
    sess3.encode_video(frames[0:1])
    sess3.encode_video(frames[1:2])
    blk3 = np.asarray(sess3.kvs.block_k)[0][:, :, 1]
    assert not np.allclose(blk3, blk1, rtol=1e-5, atol=1e-5)


def test_clear_cache_resets_vision_state():
    sess, _ = make()
    rng = np.random.default_rng(2)
    sess.encode_init_prompt([1, 2, 3, 4])
    sess.encode_video(rng.uniform(0, 255, (2, 56, 56, 3)).astype(np.uint8))
    sess.clear_cache()
    assert sess.chunk_idx == 0
    assert int(np.asarray(sess.kvs.length).max()) == 0


def test_multi_stream_vision_session():
    """4 parallel streams through the FULL vision+LM pipeline (north-star
    config #5, session level): per-stream cacher refs, pruner memory and KV;
    stream 0's state must match a single-stream session fed the same frames."""
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
    params = lo.init_random_params(cfg, jax.random.key(5))
    rng = np.random.default_rng(5)
    frames = rng.uniform(0, 255, size=(4, 4, 56, 56, 3)).astype(np.uint8)

    multi = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                             batch=4)
    multi.encode_init_prompt([1, 2, 3, 4])
    multi.encode_video(frames)
    assert list(np.asarray(multi.kvs.num_blocks)[0]) == [4, 4, 4, 4]

    single = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32)
    single.encode_init_prompt([1, 2, 3, 4])
    single.encode_video(frames[0])
    np.testing.assert_allclose(
        np.asarray(multi.kvs.block_k)[:, 0], np.asarray(single.kvs.block_k)[:, 0],
        rtol=2e-4, atol=2e-4)

    out = multi.question_answering([5, 6], [5, 6, 7], stop_token_ids=[0],
                                   max_new_tokens=4)
    assert 1 <= len(out) <= 4


def test_staged_uint8_ingest_matches_host_preprocess_path():
    """The low-transfer ingest path (stage_chunk: raw uint8 to device in a
    prefetch thread, normalize/transpose inside the fused frame jit) must
    produce exactly the same stream state as the legacy numpy path, chunk by
    chunk, including resize (non-native frames sizes) and multi-stream."""
    rng = np.random.default_rng(9)
    frames = rng.integers(0, 256, size=(4, 64, 64, 3), dtype=np.uint8)

    a, _ = make(seed=3)
    b, _ = make(seed=3)
    a.encode_init_prompt([1, 2, 3, 4])
    b.encode_init_prompt([1, 2, 3, 4])
    for f in range(4):
        a.encode_video(frames[f:f + 1])                  # legacy numpy path
        b.encode_video(b.stage_chunk(frames[f:f + 1]))   # staged device path
    np.testing.assert_array_equal(np.asarray(a.kvs.num_blocks),
                                  np.asarray(b.kvs.num_blocks))
    np.testing.assert_allclose(np.asarray(a.kvs.block_k),
                               np.asarray(b.kvs.block_k), rtol=1e-5,
                               atol=1e-5)
    np.testing.assert_allclose(np.asarray(a.kvs.block_v),
                               np.asarray(b.kvs.block_v), rtol=1e-5,
                               atol=1e-5)

    # prefetcher end-to-end (background staging thread)
    from stc_tpu.runtime.pipeline import FramePrefetcher
    c, _ = make(seed=3)
    c.encode_init_prompt([1, 2, 3, 4])
    for px in FramePrefetcher((frames[f:f + 1] for f in range(4)),
                              c.stage_chunk, depth=2):
        c.encode_video(px)
    np.testing.assert_allclose(np.asarray(a.kvs.block_k),
                               np.asarray(c.kvs.block_k), rtol=1e-5,
                               atol=1e-5)


def test_staged_multistream_matches_legacy_path():
    """stage_chunk handles (B, F, H, W, 3) multi-stream chunks (host reshape
    to (B*F, ...) staging) and reproduces the numpy-path stream state."""
    rng = np.random.default_rng(11)
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
    params = lo.init_random_params(cfg, jax.random.key(4))
    frames = rng.integers(0, 256, size=(2, 2, 56, 56, 3), dtype=np.uint8)

    a = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32, batch=2)
    b = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32, batch=2)
    a.encode_init_prompt([1, 2, 3, 4])
    b.encode_init_prompt([1, 2, 3, 4])
    for f in range(2):
        a.encode_video(frames[:, f:f + 1])
        b.encode_video(b.stage_chunk(frames[:, f:f + 1]))
    np.testing.assert_array_equal(np.asarray(a.kvs.num_blocks),
                                  np.asarray(b.kvs.num_blocks))
    np.testing.assert_allclose(np.asarray(a.kvs.block_k),
                               np.asarray(b.kvs.block_k), rtol=1e-5,
                               atol=1e-5)


def test_cacher_flops_saving_is_real():
    """STC-Cacher's FLOPs claim, proven from XLA's compiled cost model: the
    selective-recompute chunk must cost meaningfully fewer FLOPs than the
    full chunk on the same session state (reference measures this with
    calflops, flash_vstream_rekv.py:203-229 — here it is exact)."""
    sess, cfg = make()
    rng = np.random.default_rng(12)
    sess.encode_init_prompt([1, 2, 3, 4])
    frames = rng.integers(0, 256, size=(2, 56, 56, 3), dtype=np.uint8)
    sess.encode_video(frames)  # establish cacher refs + state
    full = sess.estimate_chunk_flops(cached=False)
    part = sess.estimate_chunk_flops(cached=True)
    if full is None or part is None:
        return  # backend without a cost model: API contract only
    # the tiny test config is LM-dominated, so the tower saving shows up as
    # a few percent here; at production shapes (27-layer SigLIP, 25% ratio)
    # the tower itself drops ~60% of its FLOPs
    assert part < 0.95 * full, (part, full)


def test_mixed_dtype_session_narrows_into_the_store():
    """f32 params over a bf16 KV store: the stream and decode caches keep
    their DECLARED state_dtype across the full session loop (the scan-carry
    formulation crashes on dtype mismatch unless writes round into the
    store at the boundary; the old xs->ys scan silently widened the store
    instead — a state-dtype leak either way)."""
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
    params = lo.init_random_params(cfg, jax.random.key(0))  # f32
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.bfloat16)
    rng = np.random.default_rng(3)
    sess.encode_init_prompt([1, 2, 3, 4])
    frames = rng.integers(0, 256, size=(4, 56, 56, 3), dtype=np.uint8)
    for f in range(4):  # covers the full AND the cached vision path
        sess.encode_video(frames[f:f + 1])
    assert sess.kvs.block_k.dtype == jnp.bfloat16
    assert sess.kvs.init_k.dtype == jnp.bfloat16
    out = sess.question_answering([7, 8, 9], [7, 8, 9, 10],
                                  stop_token_ids=[0], max_new_tokens=4)
    assert len(out) >= 1
    assert np.isfinite(np.asarray(sess.kvs.block_rep,
                                  dtype=np.float32)).all()
