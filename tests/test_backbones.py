"""LongVA / Video-LLaVA / Flash-VStream backbones: CLIP tower parity vs HF,
MLP-skip cacher semantics, end-to-end tiny sessions."""

import dataclasses

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.models import clip as cl
from stc_tpu.models import flash_vstream as fv
from stc_tpu.models import longva as lv
from stc_tpu.models import video_llava as vl


# ---------------------------------------------------------------------------
# CLIP tower vs HF
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_clip():
    torch = pytest.importorskip("torch")
    from transformers import CLIPVisionConfig, CLIPVisionModel
    torch.manual_seed(0)
    hf_cfg = CLIPVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=3,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="quick_gelu")
    model = CLIPVisionModel(hf_cfg).eval()
    cfg = cl.CLIPConfig(hidden_size=32, num_layers=3, num_heads=4,
                        intermediate_size=64, image_size=56, patch_size=14)

    from stc_tpu.models.convert import convert_clip
    params = convert_clip(dict(model.state_dict()), cfg.num_layers,
                          dtype=jnp.float32)
    return model, cfg, params


def test_clip_tower_matches_hf(hf_clip):
    import torch
    model, cfg, params = hf_clip
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        hs = model(torch.tensor(pixels), output_hidden_states=True)
    want = hs.hidden_states[-2].numpy()  # feature_layer=-2 (LongVA select)

    cacher = cl.init_clip_cacher(cfg)
    got, _ = cl.encode_full(params, cfg, jnp.asarray(pixels), cacher,
                            feature_layer=-2)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


def test_clip_cacher_skip_zero_equals_full(hf_clip):
    """skip_ratio=0 computes every token -> cached chunk == full chunk."""
    _, cfg, params = hf_clip
    rng = np.random.default_rng(1)
    ref = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    new = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    cacher = cl.init_clip_cacher(cfg)
    _, cacher = cl.encode_full(params, cfg, jnp.asarray(ref), cacher)
    got, _ = cl.encode_cached(params, cfg, jnp.asarray(new), cacher,
                              skip_ratio=0.0)
    want, _ = cl.encode_full(params, cfg, jnp.asarray(new),
                             cl.init_clip_cacher(cfg))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_clip_cacher_skips_identical_frames(hf_clip):
    """An identical frame with skip_ratio ~1 reuses the reference MLP outputs
    and stays close to the full computation."""
    _, cfg, params = hf_clip
    rng = np.random.default_rng(2)
    frame = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    cacher = cl.init_clip_cacher(cfg)
    full, cacher = cl.encode_full(params, cfg, jnp.asarray(frame), cacher)
    cached, cacher2 = cl.encode_cached(params, cfg, jnp.asarray(frame),
                                       cacher, skip_ratio=0.9)
    np.testing.assert_allclose(np.asarray(cached), np.asarray(full),
                               rtol=1e-3, atol=1e-3)
    stats = cl.cache_stats(cacher2)
    assert stats["total_tokens_skipped"] > 0


def test_layer_ratio_allocator():
    r = cl.layer_ratios(4, 0.3, "uniform")
    assert r == [0.3] * 4
    r = cl.layer_ratios(4, 0.3, "linear_increasing")
    assert abs(sum(r) / 4 - 0.3) < 1e-6
    assert r[0] < r[-1]


# ---------------------------------------------------------------------------
# End-to-end tiny sessions per backbone
# ---------------------------------------------------------------------------

def _session_cfg(tpf, n_local=256, chunk_frames=1, cacher="none"):
    return SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=n_local, block_size=tpf,
                        exc_block_size=tpf, topk=4, max_blocks=128,
                        max_prompt_tokens=32, max_new_tokens=8),
        cacher=CacherConfig(strategy=cacher, update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="none", token_per_frame=tpf),
        encode_chunk_frames=chunk_frames,
    )


def _drive(sess, cfg_text_vocab=256, n_frames=4):
    rng = np.random.default_rng(0)
    sess.encode_init_prompt([1, 2, 3, 4])
    frames = rng.uniform(0, 255, size=(n_frames, 56, 56, 3)).astype(np.uint8)
    sess.encode_video(frames)
    out = sess.question_answering([5, 6], [5, 6, 7], stop_token_ids=[0],
                                  max_new_tokens=4)
    assert 1 <= len(out) <= 4
    return sess


def test_longva_session():
    cfg = lv.LongVAConfig.tiny()
    tpf = cfg.tokens_per_frame  # grid 4 / stride 2 -> 4 tokens
    scfg = _session_cfg(tpf, cacher="cacher")
    params = lv.init_random_params(cfg, jax.random.key(0))
    sess = lv.LongVASession(params, cfg, scfg, state_dtype=jnp.float32)
    sess = _drive(sess)
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 4


def test_video_llava_session_multiframe_chunks():
    cfg = vl.VideoLlavaConfig.tiny()
    tpf = cfg.tokens_per_frame  # 16 patches + CLS = 17
    scfg = _session_cfg(tpf, chunk_frames=2)
    params = vl.init_random_params(cfg, jax.random.key(1))
    sess = vl.VideoLlavaSession(params, cfg, scfg, state_dtype=jnp.float32)
    sess = _drive(sess)
    # 4 frames in 2-frame chunks -> 4 blocks (one per frame), 2 dispatches
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 4
    assert sess.chunk_idx == 2


def test_flash_vstream_session():
    cfg = fv.FlashVStreamConfig.tiny()
    scfg = _session_cfg(cfg.tokens_per_frame)
    params = fv.init_random_params(cfg, jax.random.key(2))
    sess = fv.FlashVStreamSession(params, cfg, scfg, state_dtype=jnp.float32)
    sess = _drive(sess)
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 4


def test_model_registry():
    from stc_tpu.models import MODEL_REGISTRY
    import stc_tpu.models.llava_onevision  # noqa: F401
    for name in ("llava_ov_7b", "longva_7b", "video_llava_7b",
                 "flash_vstream_7b"):
        assert name in MODEL_REGISTRY


# ---------------------------------------------------------------------------
# Multi-stream serving across backbone families (ragged / churn / migration)
# ---------------------------------------------------------------------------

def test_longva_multistream_ragged_matches_solo():
    """LongVA (CLIP MLP-skip cacher): B=2 ragged pixel streams answer
    exactly like independent sessions — per-stream cacher references and
    per-slot schedules."""
    cfg = lv.LongVAConfig.tiny()
    scfg = _session_cfg(cfg.tokens_per_frame, cacher="cacher")
    params = lv.init_random_params(cfg, jax.random.key(3))

    def build(batch):
        s = lv.LongVASession(params, cfg, scfg, state_dtype=jnp.float32,
                             batch=batch)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    rng = np.random.default_rng(7)
    pattern = [(True, True), (True, False), (False, True), (True, True)]
    frames = [[rng.uniform(0, 255, (1, 56, 56, 3)).astype(np.uint8)
               for _ in pattern] for _ in range(2)]
    s2 = build(2)
    for step, act in enumerate(pattern):
        s2.encode_video(np.stack([frames[b][step] for b in range(2)]),
                        active=act)
    ans = s2.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4,
                                all_streams=True)
    for b in range(2):
        solo = build(1)
        for step, act in enumerate(pattern):
            if act[b]:
                solo.encode_video(frames[b][step])
        want = solo.question_answering([5, 6], [5, 6, 7], [0],
                                       max_new_tokens=4)
        assert ans[b] == want, (b, ans[b], want)


def test_video_llava_churn_and_migration(tmp_path):
    """Video-LLaVA: slot recycling + per-stream migration on the CLIP
    no-cacher path."""
    import os
    from stc_tpu.utils.checkpoint import (load_stream_state,
                                          save_stream_state)
    cfg = vl.VideoLlavaConfig.tiny()
    scfg = _session_cfg(cfg.tokens_per_frame)
    params = vl.init_random_params(cfg, jax.random.key(4))

    def build(batch):
        s = vl.VideoLlavaSession(params, cfg, scfg, state_dtype=jnp.float32,
                                 batch=batch)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    rng = np.random.default_rng(8)
    frames = [rng.uniform(0, 255, (1, 56, 56, 3)).astype(np.uint8)
              for _ in range(6)]
    s2 = build(2)
    for i in range(3):
        s2.encode_video(np.stack([frames[i], frames[i]]))
    want0 = s2.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4,
                                  all_streams=True)[0]
    path = os.path.join(str(tmp_path), "vl_stream.npz")
    save_stream_state(s2, 0, path)

    s2.reset_streams([1])
    for i in (3, 4):
        s2.encode_video(np.stack([frames[i], frames[i + 1]]),
                        active=[False, True])
    got = s2.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4,
                                all_streams=True)
    # slot 1 ingested frames[4] then frames[5] (row 1 of each tick)
    solo = build(1)
    solo.encode_video(frames[4])
    solo.encode_video(frames[5])
    want1 = solo.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4)
    assert got[1] == want1

    # migrate the saved slot-0 stream into a THIRD session's slot 1
    s3 = build(2)
    s3.encode_video(np.stack([frames[5], frames[5]]))
    load_stream_state(s3, 1, path)
    got3 = s3.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4,
                                 all_streams=True)[1]
    assert got3 == want0


def test_flash_vstream_multistream():
    """Flash-VStream: batched streams answer like independent sessions."""
    cfg = fv.FlashVStreamConfig.tiny()
    scfg = _session_cfg(cfg.tokens_per_frame)
    params = fv.init_random_params(cfg, jax.random.key(5))

    def build(batch):
        s = fv.FlashVStreamSession(params, cfg, scfg,
                                   state_dtype=jnp.float32, batch=batch)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    rng = np.random.default_rng(9)
    fa = rng.uniform(0, 255, (3, 1, 56, 56, 3)).astype(np.uint8)
    fb = rng.uniform(0, 255, (3, 1, 56, 56, 3)).astype(np.uint8)
    s2 = build(2)
    for i in range(3):
        s2.encode_video(np.stack([fa[i], fb[i]]))
    ans = s2.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4,
                                all_streams=True)
    for b, fr in enumerate((fa, fb)):
        solo = build(1)
        for i in range(3):
            solo.encode_video(fr[i])
        want = solo.question_answering([5, 6], [5, 6, 7], [0],
                                       max_new_tokens=4)
        assert ans[b] == want, b


def test_longva_churn_mixed_ticks_match_solo():
    """LongVA slot recycling drives the MIXED full/cached vision tick (the
    recycled slot's schedule disagrees with the live slot's): the live slot
    stays bit-identical to an unchurned twin, the new tenant matches a
    fresh solo session, and the per-stream skip statistics survive the
    churn (only the recycled slot's counters reset)."""
    cfg = lv.LongVAConfig.tiny()
    scfg = _session_cfg(cfg.tokens_per_frame, cacher="cacher")
    params = lv.init_random_params(cfg, jax.random.key(6))

    def build(batch):
        s = lv.LongVASession(params, cfg, scfg, state_dtype=jnp.float32,
                             batch=batch)
        s.encode_init_prompt([1, 2, 3, 4])
        return s

    rng = np.random.default_rng(10)
    frames = [rng.uniform(0, 255, (1, 56, 56, 3)).astype(np.uint8)
              for _ in range(8)]

    s2 = build(2)
    for i in range(3):
        s2.encode_video(np.stack([frames[i], frames[i]]))
    proc_live = int(np.asarray(s2._vstate.tokens_processed)[0])
    assert proc_live > 0
    s2.reset_streams([1])
    assert int(np.asarray(s2._vstate.tokens_processed)[1]) == 0
    assert int(np.asarray(s2._vstate.tokens_processed)[0]) == proc_live
    # slot_chunk now [3, 0]: the next two ticks are MIXED (full vs cached
    # parities disagree), exercising the per-slot ref selection
    assert s2._slot_chunk.tolist() == [3, 0]
    for i in range(3, 5):
        s2.encode_video(np.stack([frames[i], frames[i + 2]]))
    got = s2.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4,
                                all_streams=True)

    twin = build(2)  # never churned: live slot must match bit-exactly
    for i in range(3):
        twin.encode_video(np.stack([frames[i], frames[i]]))
    for i in range(3, 5):
        twin.encode_video(np.stack([frames[i], frames[i + 2]]))
    want0 = twin.question_answering([5, 6], [5, 6, 7], [0],
                                    max_new_tokens=4, all_streams=True)[0]
    assert got[0] == want0

    solo = build(1)  # the new tenant: frames[5], frames[6] from scratch
    solo.encode_video(frames[5])
    solo.encode_video(frames[6])
    want1 = solo.question_answering([5, 6], [5, 6, 7], [0], max_new_tokens=4)
    assert got[1] == want1
    # the recycled slot's stats restarted from zero and accrued its own
    np.testing.assert_array_equal(
        np.asarray(s2._vstate.tokens_processed)[1],
        np.asarray(solo._vstate.tokens_processed)[0])
