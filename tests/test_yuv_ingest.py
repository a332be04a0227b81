"""YUV 4:2:0 ingest: half the host->device bytes per frame.

Production video is stored 4:2:0; a decoder hands the planes over for
free, and on link-bound hosts the frame transfer dominates streaming
ingest (ROOFLINE.json).  With SessionConfig.ingest_format='yuv420' the
packed planes cross the link at 1.5 bytes/pixel and the chroma upsample +
BT.601 matrix run ON DEVICE inside the fused vision jit.

Contracts:
  - the C++ packer and the numpy fallback are BIT-IDENTICAL;
  - the device-side reconstruction matches a numpy reference exactly
    (same nearest upsample + matrix, fp32);
  - a yuv420 session runs the full encode->QA flow and its answers agree
    with the rgb session's on smooth (chroma-correlated) frames — the
    4:2:0 roundtrip is lossy on adversarial noise but tiny on video-like
    content, which is what the accuracy claim is scoped to.
"""

import numpy as np
import jax.numpy as jnp

from stc_tpu import native
from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)


def _smooth_frames(n, h, w, seed=0):
    """Video-like frames: shared luminance structure (channels correlated,
    as in natural footage — 4:2:0 exists because chroma varies slowly)
    plus gentle low-frequency per-channel tints and mild noise."""
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    out = np.zeros((n, h, w, 3), np.float32)
    for i in range(n):
        a, b, ph = rng.uniform(0.5, 2), rng.uniform(0.5, 2), rng.uniform()
        luma = 90 * np.sin(a * xx / w * 6.28 + ph) * np.cos(b * yy / h * 6.28)
        for c in range(3):
            tint = 25 * np.sin(xx / w * 3.14 + rng.uniform()) \
                * np.cos(yy / h * 3.14)
            out[i, :, :, c] = 128 + luma + tint
    out += rng.normal(0, 2, size=out.shape)
    return np.clip(out, 0, 255).astype(np.uint8)


def test_cpp_packer_matches_numpy_bitwise():
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(3, 28, 42, 3), dtype=np.uint8)
    want = native._rgb_to_yuv420_np(frames)
    got = native.rgb_to_yuv420(frames)
    assert got.shape == (3, 28 * 42 * 3 // 2) and got.dtype == np.uint8
    if native.get_lib() is None:
        import pytest
        pytest.skip("native toolchain unavailable; numpy fallback covered")
    np.testing.assert_array_equal(got, want)


def test_device_reconstruction_matches_numpy_reference():
    from stc_tpu.runtime.vlm import make_preprocessor
    h, w = 28, 28
    frames = _smooth_frames(2, h, w, seed=2)
    pre = make_preprocessor(h, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                            jnp.float32, ingest="yuv420")
    packed = pre.host(frames)
    assert packed.shape == (2, h * w * 3 // 2)
    got = np.asarray(pre._yuv_to_rgb(jnp.asarray(packed)))

    # numpy reference: identical unpack, nearest upsample, matrix, clip
    y = packed[:, : h * w].reshape(2, h, w).astype(np.float32)
    u = packed[:, h * w: h * w + h * w // 4].reshape(2, h // 2, w // 2)
    v = packed[:, h * w + h * w // 4:].reshape(2, h // 2, w // 2)
    up = lambda c: c.repeat(2, axis=1).repeat(2, axis=2).astype(np.float32)
    uf, vf = up(u) - 128.0, up(v) - 128.0
    want = np.clip(np.stack([y + 1.402 * vf,
                             y - 0.344136 * uf - 0.714136 * vf,
                             y + 1.772 * uf], axis=-1), 0, 255)
    np.testing.assert_allclose(got, want, rtol=0, atol=1e-3)

    # roundtrip error on video-like content is small (<3 gray levels rms)
    rms = np.sqrt(np.mean((got - frames.astype(np.float32)) ** 2))
    assert rms < 3.0, rms

    # already-packed planes (decoder output) pass through host() untouched
    again = pre.host(packed)
    np.testing.assert_array_equal(again, packed)


def test_yuv_session_end_to_end_answers_match_rgb():
    """Full pixel session with yuv420 ingest: encode -> QA -> fused serve
    tick all run on packed planes; answers equal the rgb session's on
    smooth frames (the tiny model's logit gaps dominate the chroma
    residual)."""
    import jax
    from stc_tpu.models import llava_onevision as lo
    from stc_tpu.models import qwen2 as qw
    from stc_tpu.models import siglip as sg

    cfg = lo.LlavaOVConfig(vision=sg.SiglipConfig.tiny(),
                           text=qw.Qwen2Config.tiny())
    params = lo.init_random_params(cfg, jax.random.key(0))
    KEEP = 3
    mk = lambda fmt: lo.build_session(
        params, cfg,
        SessionConfig(
            rekv=ReKVConfig(n_init=4, n_local=96, block_size=KEEP,
                            exc_block_size=KEEP, topk=2, chunk_size=1,
                            max_blocks=64, max_prompt_tokens=8,
                            max_new_tokens=6),
            cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                                cache_interval=2),
            pruner=PrunerConfig(strategy="stc", token_per_frame=KEEP),
            encode_chunk_frames=1, ingest_format=fmt),
        state_dtype=jnp.float32, vision_dtype=jnp.float32)

    frames = _smooth_frames(6, 56, 56, seed=3)
    answers = {}
    for fmt in ("rgb", "yuv420"):
        s = mk(fmt)
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video(frames)
        assert int(np.asarray(s.kvs.num_blocks)[0, 0]) == 6
        answers[fmt] = s.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                            max_new_tokens=6)
        # fused serve tick on packed planes
        tok, cnt = s.serve(frames[None, :1], None, [[5, 6]], [[5, 6, 7]],
                           [0], max_new_tokens=2)
        assert s.last_serve_fused and int(cnt[0]) >= 1
        # staged-transfer path (FramePrefetcher shape): packed planes too
        staged = s.stage_chunk(frames[:1])
        if fmt == "yuv420":
            assert staged.ndim == 2  # packed, half the bytes of raw RGB
        s.encode_video(staged)
    assert answers["yuv420"] == answers["rgb"]


def test_yuv_on_clip_backbone():
    """The CLIP-tower family (LongVA/Video-LLaVA/Flash-VStream share the
    preprocessor) ingests packed 4:2:0 planes through the same device-side
    reconstruction."""
    import dataclasses
    import jax
    from stc_tpu.models import longva as lv

    cfg = lv.LongVAConfig.tiny()
    tpf = cfg.tokens_per_frame
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=256, block_size=tpf,
                        exc_block_size=tpf, topk=4, max_blocks=128,
                        max_prompt_tokens=32, max_new_tokens=8),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="none", token_per_frame=tpf),
        encode_chunk_frames=1)
    params = lv.init_random_params(cfg, jax.random.key(0))
    frames = _smooth_frames(4, 56, 56, seed=5)
    answers = {}
    for fmt in ("rgb", "yuv420"):
        sc = dataclasses.replace(scfg, ingest_format=fmt)
        s = lv.LongVASession(params, cfg, sc, state_dtype=jnp.float32)
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video(frames)
        assert int(np.asarray(s.kvs.num_blocks)[0, 0]) == 4
        answers[fmt] = s.question_answering([5, 6], [5, 6, 7],
                                            stop_token_ids=[0],
                                            max_new_tokens=4)
    assert answers["yuv420"] == answers["rgb"]


def test_src_hw_change_retraces_instead_of_reusing_stale_unpack():
    """Two sources with EQUAL packed length but different geometry (64x36
    and 48x48 both pack to 3456 bytes/frame) must each unpack with their own
    (h, w) — the jit cache keys on src_hw, not just the array shape
    (round-4 advisor finding: the stale trace produced garbled frames)."""
    from stc_tpu.runtime.vlm import make_preprocessor
    assert 64 * 36 * 3 // 2 == 48 * 48 * 3 // 2
    pre = make_preprocessor(28, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                            jnp.float32, ingest="yuv420")

    outs = {}
    for (h, w) in ((64, 36), (48, 48)):
        frames = _smooth_frames(2, h, w, seed=h)
        packed = pre.host(frames)     # sets src_hw from the RGB chunk
        assert pre.src_hw == (h, w)
        outs[(h, w)] = np.asarray(pre(packed))

        # oracle: a FRESH preprocessor (no cache to go stale) on the same
        # packed planes
        fresh = make_preprocessor(28, (0.5, 0.5, 0.5), (0.5, 0.5, 0.5),
                                  jnp.float32, ingest="yuv420")
        fresh.src_hw = (h, w)
        np.testing.assert_array_equal(outs[(h, w)], np.asarray(fresh(packed)))

    # and a mismatched src_hw fails loudly instead of garbling
    pre.src_hw = (64, 36)
    bad = np.zeros((2, 100), dtype=np.uint8)
    import pytest
    with pytest.raises(AssertionError, match="does not match src_hw"):
        pre(bad)


def test_session_jit_keys_include_vision_trace_key():
    """A VLM session whose yuv420 source geometry changes between chunks
    must retrace the fused frame jit (equal packed lengths would otherwise
    hit the stale-cache path end to end)."""
    import jax
    from stc_tpu.models import llava_onevision as lo
    from stc_tpu.models import qwen2 as qw
    from stc_tpu.models import siglip as sg
    cfg = lo.LlavaOVConfig(vision=sg.SiglipConfig.tiny(),
                           text=qw.Qwen2Config.tiny())
    params = lo.init_random_params(cfg, jax.random.key(0))
    KEEP = 3
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=96, block_size=KEEP,
                        exc_block_size=KEEP, topk=2, chunk_size=1,
                        max_blocks=64, max_prompt_tokens=8,
                        max_new_tokens=6),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(strategy="stc", token_per_frame=KEEP),
        encode_chunk_frames=1, ingest_format="yuv420")
    s = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32,
                         vision_dtype=jnp.float32)
    s.encode_init_prompt(list(range(s.rekv.n_init)))
    s.encode_video(_smooth_frames(1, 64, 36, seed=1))
    keys_before = set(s._frame_jits)
    s.encode_video(_smooth_frames(1, 48, 48, seed=2))
    keys_after = set(s._frame_jits)
    assert keys_after != keys_before, (
        "second geometry must compile its own frame jit")
    ans = s.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                               max_new_tokens=6)

    # value oracle: the rgb-ingest session on the same frames must answer
    # identically (a stale 64x36 unpack trace applied to 48x48 planes
    # garbles the second chunk's pixels and flips the answer)
    import dataclasses
    s2 = lo.build_session(params, cfg,
                          dataclasses.replace(scfg, ingest_format="rgb"),
                          state_dtype=jnp.float32, vision_dtype=jnp.float32)
    s2.encode_init_prompt(list(range(s2.rekv.n_init)))
    s2.encode_video(_smooth_frames(1, 64, 36, seed=1))
    s2.encode_video(_smooth_frames(1, 48, 48, seed=2))
    ans_rgb = s2.question_answering([5, 6, 7], [5, 6, 7, 8], [0],
                                    max_new_tokens=6)
    assert ans == ans_rgb
