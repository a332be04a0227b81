"""Rotary position embeddings for the streaming attention stack.

TPU-native equivalent of the reference's shared RotaryEmbeddingESM
(model/attention/rope.py:4-112).  Differences by design:

- No growing cos/sin tables: angles are computed on the fly from (bounded)
  relative positions, so everything is static-shape and fusible under jit.
- Rotate-half convention identical to the reference (ESM/GPT-NeoX style:
  split in half, [-x2, x1]).
- `apply_rope_one_angle` pins a tensor at the single rotation angle of
  position `index - 1`, replicating apply_rotary_pos_emb_one_angle
  (reference rope.py:89-104) — the trick that makes retrieved global blocks
  position-agnostic.

All rotations are computed in float32 and cast back to the input dtype,
matching the reference numerics (x.float() * cos + rotate_half(x) * sin).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def rope_inv_freq(dim: int, base: float = 10000.0) -> jax.Array:
    """(dim/2,) inverse frequencies, float32."""
    exponents = jnp.arange(0, dim, 2, dtype=jnp.float32) / dim
    return 1.0 / (base ** exponents)


def rope_cos_sin(positions: jax.Array, dim: int, base: float = 10000.0,
                 distance_scale: float = 1.0):
    """cos/sin tables for integer positions of any shape.

    Returns (cos, sin) with shape positions.shape + (dim,): the half-angle
    pattern is concatenated twice, as in the reference (emb = cat(freqs, freqs)).
    """
    inv_freq = rope_inv_freq(dim, base)
    angles = positions.astype(jnp.float32)[..., None] * (distance_scale * inv_freq)
    emb = jnp.concatenate([angles, angles], axis=-1)
    return jnp.cos(emb), jnp.sin(emb)


def _rotate_half(x: jax.Array) -> jax.Array:
    x1, x2 = jnp.split(x, 2, axis=-1)
    return jnp.concatenate([-x2, x1], axis=-1)


def apply_rope(x: jax.Array, positions: jax.Array, base: float = 10000.0,
               distance_scale: float = 1.0) -> jax.Array:
    """Rotate `x` (..., T, D) by per-token integer `positions` (..., T)."""
    cos, sin = rope_cos_sin(positions, x.shape[-1], base, distance_scale)
    # Broadcast cos/sin (..., T, D) against x which may carry extra head dims:
    # x: (B, H, T, D), positions: (T,) or (B, T).
    while cos.ndim < x.ndim:
        cos = cos[..., None, :, :]
        sin = sin[..., None, :, :]
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)


def apply_rope_one_angle(x: jax.Array, index: int, base: float = 10000.0,
                         distance_scale: float = 1.0) -> jax.Array:
    """Rotate every token of `x` by the single angle of position `index - 1`.

    Reference: RotaryEmbeddingESM.apply_rotary_pos_emb_one_angle
    (model/attention/rope.py:89-104) — used for init/global queries so that
    attention to (unrotated) init keys is independent of absolute position.
    """
    pos = jnp.asarray(index - 1, dtype=jnp.int32)
    cos, sin = rope_cos_sin(pos, x.shape[-1], base, distance_scale)
    xf = x.astype(jnp.float32)
    out = xf * cos + _rotate_half(xf) * sin
    return out.astype(x.dtype)
