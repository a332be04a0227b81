"""Native C++ frame preprocessor + host prefetch pipeline."""

import numpy as np
import jax.numpy as jnp
import pytest

from stc_tpu import native
from stc_tpu.runtime.pipeline import FramePrefetcher


@pytest.fixture(scope="module")
def lib():
    if native.get_lib() is None:
        pytest.skip("g++ toolchain unavailable")
    return native.get_lib()


def test_native_preprocess_matches_jax(lib):
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(3, 73, 91, 3), dtype=np.uint8)
    mean = np.array([0.5, 0.5, 0.5], np.float32)
    std = np.array([0.5, 0.5, 0.5], np.float32)
    got = native.preprocess_frames(frames, 56, mean, std)
    assert got is not None and got.shape == (3, 3, 56, 56)

    import jax
    x = jnp.asarray(frames, jnp.float32) / 255.0
    x = jax.image.resize(x, (3, 56, 56, 3), "bilinear", antialias=False)
    want = ((x - mean) / std).transpose(0, 3, 1, 2)
    np.testing.assert_allclose(got, np.asarray(want), rtol=2e-3, atol=2e-3)


def test_native_preprocess_identity_size(lib):
    rng = np.random.default_rng(1)
    frames = rng.integers(0, 256, size=(2, 56, 56, 3), dtype=np.uint8)
    mean = np.zeros(3, np.float32)
    std = np.ones(3, np.float32)
    got = native.preprocess_frames(frames, 56, mean, std)
    want = frames.astype(np.float32).transpose(0, 3, 1, 2) / 255.0
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_native_multithreaded_consistent(lib):
    rng = np.random.default_rng(2)
    frames = rng.integers(0, 256, size=(7, 64, 48, 3), dtype=np.uint8)
    mean = np.array([0.4, 0.5, 0.6], np.float32)
    std = np.array([0.2, 0.3, 0.4], np.float32)
    a = native.preprocess_frames(frames, 32, mean, std, n_threads=1)
    b = native.preprocess_frames(frames, 32, mean, std, n_threads=4)
    np.testing.assert_array_equal(a, b)


def test_frame_prefetcher_order_and_errors():
    chunks = [np.full((1, 2, 2, 3), i, np.uint8) for i in range(5)]
    out = list(FramePrefetcher(iter(chunks), lambda c: int(c[0, 0, 0, 0])))
    assert out == [0, 1, 2, 3, 4]

    def bad(c):
        raise ValueError("boom")
    with pytest.raises(ValueError):
        list(FramePrefetcher(iter(chunks), bad))


def test_frame_prefetcher_core_count_routing():
    """Both routed arms produce identical ordered outputs, and the
    single-core route really is threadless (no queue is built)."""
    chunks = [np.full((1, 2, 2, 3), i, np.uint8) for i in range(5)]
    pre = lambda c: int(c[0, 0, 0, 0])
    sync = FramePrefetcher(iter(chunks), pre, overlap=False)
    assert not hasattr(sync, "_t")  # no thread spawned
    assert list(sync) == [0, 1, 2, 3, 4]
    threaded = FramePrefetcher(iter(chunks), pre, overlap=True)
    assert hasattr(threaded, "_t")
    assert list(threaded) == [0, 1, 2, 3, 4]
    # errors propagate on the synchronous route too
    def bad(c):
        raise ValueError("boom")
    with pytest.raises(ValueError):
        list(FramePrefetcher(iter(chunks), bad, overlap=False))


def test_session_uses_native_preprocessor():
    """VLM sessions accept uint8 frames through the native path end to end."""
    import jax
    from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                                SessionConfig)
    from stc_tpu.models import llava_onevision as lo
    cfg = lo.LlavaOVConfig.tiny()
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=128, block_size=3,
                        exc_block_size=3, topk=4, max_blocks=64,
                        max_prompt_tokens=16, max_new_tokens=4),
        cacher=CacherConfig(strategy="none"),
        pruner=PrunerConfig(token_per_frame=3))
    params = lo.init_random_params(cfg, jax.random.key(0))
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.float32)
    sess.encode_init_prompt([1, 2, 3, 4])
    frames = (np.random.default_rng(0)
              .integers(0, 256, size=(2, 80, 60, 3), dtype=np.uint8))
    sess.encode_video(frames)
    assert int(np.asarray(sess.kvs.num_blocks)[0, 0]) == 2
