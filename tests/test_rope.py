import numpy as np
import jax.numpy as jnp

from stc_tpu.ops.rope import apply_rope, apply_rope_one_angle, rope_cos_sin
from oracle import rope_rotate, rope_one_angle


def test_apply_rope_matches_oracle():
    rng = np.random.default_rng(0)
    x = rng.normal(size=(2, 4, 6, 32)).astype(np.float32)
    pos = np.arange(6)
    got = np.asarray(apply_rope(jnp.asarray(x), jnp.asarray(pos)))
    want = rope_rotate(x, pos)
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


def test_rope_relative_shift_invariance():
    """Rotating q,k by positions shifted by a constant leaves q·k unchanged."""
    rng = np.random.default_rng(1)
    q = rng.normal(size=(1, 1, 3, 64)).astype(np.float32)
    k = rng.normal(size=(1, 1, 5, 64)).astype(np.float32)
    qp = np.arange(10, 13)
    kp = np.arange(5, 10)
    s = 137
    def logits(qq, kk):
        return np.einsum("bhtd,bhkd->bhtk", np.asarray(qq), np.asarray(kk))
    l0 = logits(apply_rope(jnp.asarray(q), jnp.asarray(qp)),
                apply_rope(jnp.asarray(k), jnp.asarray(kp)))
    l1 = logits(apply_rope(jnp.asarray(q), jnp.asarray(qp + s)),
                apply_rope(jnp.asarray(k), jnp.asarray(kp + s)))
    np.testing.assert_allclose(l0, l1, rtol=1e-4, atol=1e-4)


def test_one_angle_matches_oracle():
    rng = np.random.default_rng(2)
    x = rng.normal(size=(1, 2, 7, 16)).astype(np.float32)
    got = np.asarray(apply_rope_one_angle(jnp.asarray(x), 100))
    want = rope_one_angle(x[0, 0], 100)
    np.testing.assert_allclose(got[0, 0], want, rtol=1e-5, atol=1e-5)


def test_cos_sin_shapes():
    cos, sin = rope_cos_sin(jnp.arange(5), 32)
    assert cos.shape == (5, 32) and sin.shape == (5, 32)
