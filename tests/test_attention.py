import numpy as np
import jax.numpy as jnp

from stc_tpu.ops.attention import (
    AttnStage, multi_stage_attention, sliding_window_mask,
)
from oracle import multi_stage_softmax, expand_gqa


def _np_mask(T, L, window=None, complement=False, offset=None):
    if window is None:
        return np.ones((T, L), dtype=bool)
    if offset is None:
        offset = L - T
    dist = (np.arange(T)[:, None] - np.arange(L)[None, :]) + offset
    if complement:
        return dist >= window
    return (dist >= 0) & (dist < window)


def test_single_stage_full_mask_equals_softmax_attention():
    rng = np.random.default_rng(0)
    B, Hq, Hkv, T, L, D = 2, 4, 2, 3, 7, 16
    q = rng.normal(size=(B, Hq, T, D)).astype(np.float32)
    k = rng.normal(size=(B, Hkv, L, D)).astype(np.float32)
    v = rng.normal(size=(B, Hkv, L, D)).astype(np.float32)
    mask = _np_mask(T, L)
    got = np.asarray(multi_stage_attention(
        jnp.asarray(q), [AttnStage(jnp.asarray(k), jnp.asarray(v),
                                   jnp.asarray(mask))]))
    for b in range(B):
        want = multi_stage_softmax(
            [q[b]], [(expand_gqa(k[b], Hq), expand_gqa(v[b], Hq), mask)])
        np.testing.assert_allclose(got[b], want, rtol=1e-5, atol=1e-5)


def test_two_stage_joint_softmax_with_windows():
    rng = np.random.default_rng(1)
    B, Hq, Hkv, T, D = 1, 4, 4, 4, 8
    L1, L2 = 10, 5
    q = rng.normal(size=(B, Hq, T, D)).astype(np.float32)
    k1 = rng.normal(size=(B, Hkv, L1, D)).astype(np.float32)
    v1 = rng.normal(size=(B, Hkv, L1, D)).astype(np.float32)
    k2 = rng.normal(size=(B, Hkv, L2, D)).astype(np.float32)
    v2 = rng.normal(size=(B, Hkv, L2, D)).astype(np.float32)
    m1 = _np_mask(T, L1, window=6)
    m2 = _np_mask(T, L2)
    got = np.asarray(multi_stage_attention(
        jnp.asarray(q),
        [AttnStage(jnp.asarray(k1), jnp.asarray(v1), jnp.asarray(m1)),
         AttnStage(jnp.asarray(k2), jnp.asarray(v2), jnp.asarray(m2))]))
    want = multi_stage_softmax(
        [q[0], q[0]], [(k1[0], v1[0], m1), (k2[0], v2[0], m2)])
    np.testing.assert_allclose(got[0], want, rtol=1e-5, atol=1e-5)


def test_sliding_window_mask_matches_reference_semantics():
    # reference torch_impl.py: dist = i - j + (len_k - len_q); 0 <= dist < w
    T, L, w = 3, 8, 4
    q_pos = jnp.arange(L - T, L)
    k_pos = jnp.arange(L)
    got = np.asarray(sliding_window_mask(q_pos, k_pos, w))
    want = _np_mask(T, L, window=w)
    np.testing.assert_array_equal(got, want)
    got_c = np.asarray(sliding_window_mask(q_pos, k_pos, w, complement=True))
    want_c = _np_mask(T, L, window=w, complement=True)
    np.testing.assert_array_equal(got_c, want_c)


def test_fully_masked_rows_are_finite():
    q = jnp.ones((1, 2, 2, 4))
    k = jnp.ones((1, 2, 3, 4))
    v = jnp.ones((1, 2, 3, 4))
    mask = jnp.zeros((2, 3), dtype=bool)
    out = np.asarray(multi_stage_attention(q, [AttnStage(k, v, mask)]))
    assert np.isfinite(out).all()
    np.testing.assert_allclose(out, 0.0)
