"""Multi-stage masked attention — jnp reference implementation.

TPU-native equivalent of the reference's MultiStageDotProductionAttention
(model/attention/dot_production_attention/{base,torch_impl,triton_impl}.py).
Semantics replicated exactly:

- Several KV "stages" (e.g. local sliding-window KV, then init KV) contribute
  logits to ONE joint softmax over the concatenated key axis.
- Per-stage masks implement a sliding window over position distance
  (0 <= dist < window), its complement (dist >= window), or full visibility.
- Logits are scaled by 1/sqrt(head_dim); softmax statistics in float32.
- GQA: Hq query heads grouped over Hkv key/value heads.

This file is the numerically-exact reference (like the reference's
torch_impl.py); the fused Pallas flash kernel in flash_attention.py must match
it on random inputs.  Under jit, XLA fuses the mask/scale/softmax chain, so
this path is already MXU-bound for moderate windows.
"""

from __future__ import annotations

from typing import NamedTuple, Optional, Sequence

import jax
import jax.numpy as jnp

NEG_INF = float("-inf")


class AttnStage(NamedTuple):
    """One KV source contributing to the joint softmax.

    k, v  : (B, Hkv, Lk, D)
    mask  : bool, broadcastable to (B, 1, Lq, Lk); True = may attend.
    q     : optional (B, Hq, Lq, D) per-stage query override — the
            reference's init stage scores with ONE-ANGLE-rotated queries
            while the local stage uses window-rotated ones
            (rekv_attention.py:388-426); both feed one joint softmax.
    """

    k: jax.Array
    v: jax.Array
    mask: jax.Array
    q: Optional[jax.Array] = None


def sliding_window_mask(q_pos: jax.Array, k_pos: jax.Array, window: int,
                        complement: bool = False) -> jax.Array:
    """Mask on position distance, matching reference torch_impl.py:60-78.

    q_pos: (..., Lq) int32, k_pos: (..., Lk) int32 global token positions.
    Normal: 0 <= (q_pos - k_pos) < window  (causal sliding window).
    Complement: (q_pos - k_pos) >= window  (the far-field, for init tokens).
    Returns (..., Lq, Lk) bool.
    """
    dist = q_pos[..., :, None] - k_pos[..., None, :]
    if complement:
        return dist >= window
    return (dist >= 0) & (dist < window)


def multi_stage_attention(
    q: jax.Array,
    stages: Sequence[AttnStage],
    scale: Optional[float] = None,
) -> jax.Array:
    """Joint-softmax attention of q over all stages' keys.

    q: (B, Hq, Lq, D).  Returns (B, Hq, Lq, D) in q.dtype.

    Mirrors torch_impl.TorchMultiStageDotProductionAttention.finalize:
    concat per-stage logits, one softmax, post-softmax mask-fill-0, sum of
    per-stage (p @ v).  Fully-masked rows return 0 (the reference never
    produces them on valid inputs; we keep them finite for safety).
    """
    B, Hq, Lq, D = q.shape
    if scale is None:
        scale = 1.0 / (D ** 0.5)

    logits_list = []
    masks = []
    for st in stages:
        Hkv = st.k.shape[1]
        assert Hq % Hkv == 0, (Hq, Hkv)
        G = Hq // Hkv
        q_st = q if st.q is None else st.q
        qg = q_st.reshape(B, Hkv, G, Lq, D)
        lg = jnp.einsum(
            "bhgqd,bhkd->bhgqk", qg.astype(jnp.float32),
            st.k.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(B, Hq, Lq, st.k.shape[2])
        m = jnp.broadcast_to(st.mask, (B, 1, Lq, st.k.shape[2])) \
            if st.mask.ndim < 4 or st.mask.shape[1] == 1 else st.mask
        lg = jnp.where(m, lg * scale, NEG_INF)
        logits_list.append(lg)
        masks.append(m)

    logits = jnp.concatenate(logits_list, axis=-1)
    m_max = jnp.max(logits, axis=-1, keepdims=True)
    m_max = jnp.where(jnp.isfinite(m_max), m_max, 0.0)  # all-masked row guard
    p = jnp.exp(logits - m_max)
    denom = jnp.sum(p, axis=-1, keepdims=True)
    denom = jnp.where(denom == 0.0, 1.0, denom)
    p = p / denom

    out = jnp.zeros((B, Hq, Lq, D), dtype=jnp.float32)
    offset = 0
    for st, m in zip(stages, masks):
        Lk = st.k.shape[2]
        Hkv = st.k.shape[1]
        G = Hq // Hkv
        p_st = p[..., offset:offset + Lk]
        p_st = jnp.where(m, p_st, 0.0)
        pg = p_st.reshape(B, Hkv, G, Lq, Lk)
        o = jnp.einsum(
            "bhgqk,bhkd->bhgqd", pg, st.v.astype(jnp.float32),
            preferred_element_type=jnp.float32,
        ).reshape(B, Hq, Lq, D)
        out = out + o
        offset += Lk

    return out.astype(q.dtype)
