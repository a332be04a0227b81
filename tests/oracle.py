"""Numpy oracle for the streaming retrieval KV cache.

This is an independent, literal re-implementation of the REFERENCE semantics
(lern-to-write/STC model/attention/kv_cache_manager.py + rekv_attention.py +
rope.py + dot_production_attention/torch_impl.py), written the reference's way
— growing python lists, deferred init fill, deferred block carving, dynamic
top-k filtering — so that tests can verify that the static-shape TPU engine in
stc_tpu/kvcache/engine.py is behaviourally equivalent, including the
early-phase local/init double-count quirk and the last-chunk index-overflow
filtering.

Everything is float32 numpy; single stream (B folded out by the tests).
"""

from __future__ import annotations

import math
from typing import List, Optional

import numpy as np


# ---------------------------------------------------------------------------
# RoPE (reference model/attention/rope.py semantics)
# ---------------------------------------------------------------------------

def _inv_freq(dim: int, base: float) -> np.ndarray:
    return 1.0 / (base ** (np.arange(0, dim, 2, dtype=np.float32) / dim))


def rope_rotate(x: np.ndarray, positions: np.ndarray, base: float = 10000.0):
    """x: (..., T, D), positions: (T,) integer positions."""
    inv = _inv_freq(x.shape[-1], base)
    ang = positions.astype(np.float32)[:, None] * inv[None, :]
    emb = np.concatenate([ang, ang], axis=-1)
    cos, sin = np.cos(emb), np.sin(emb)
    x1, x2 = np.split(x, 2, axis=-1)
    rot = np.concatenate([-x2, x1], axis=-1)
    return (x.astype(np.float32) * cos + rot * sin).astype(np.float32)


def rope_one_angle(x: np.ndarray, index: int, base: float = 10000.0):
    """Rotate all tokens by the angle of position index-1 (rope.py:89-104)."""
    return rope_rotate(x, np.full((x.shape[-2],), index - 1, dtype=np.int64),
                       base)


# ---------------------------------------------------------------------------
# Multi-stage attention (torch_impl.py semantics)
# ---------------------------------------------------------------------------

def multi_stage_softmax(q_stages, kv_stages):
    """q_stages: list of (Hq, T, D) queries (one per stage, possibly rotated
    differently); kv_stages: list of (k (Hq, Lk, D) GQA-expanded, v, mask
    (T, Lk) bool).  Joint softmax, scale 1/sqrt(D)."""
    T = q_stages[0].shape[1]
    D = q_stages[0].shape[2]
    scale = 1.0 / math.sqrt(D)
    logit_parts = []
    for q, (k, v, mask) in zip(q_stages, kv_stages):
        lg = np.einsum("htd,hkd->htk", q, k).astype(np.float32)
        lg = np.where(mask[None, :, :], lg * scale, -np.inf)
        logit_parts.append(lg)
    logits = np.concatenate(logit_parts, axis=-1)
    m = logits.max(axis=-1, keepdims=True)
    m = np.where(np.isfinite(m), m, 0.0)
    p = np.exp(logits - m)
    p = p / np.maximum(p.sum(axis=-1, keepdims=True), 1e-38)
    out = np.zeros((q_stages[0].shape[0], T, D), dtype=np.float32)
    off = 0
    for q, (k, v, mask) in zip(q_stages, kv_stages):
        Lk = k.shape[1]
        ps = np.where(mask[None], p[..., off:off + Lk], 0.0)
        out += np.einsum("htk,hkd->htd", ps, v)
        off += Lk
    return out


def expand_gqa(x: np.ndarray, Hq: int) -> np.ndarray:
    """(Hkv, L, D) -> (Hq, L, D) by group repeat (torch_impl.py:52-58)."""
    Hkv = x.shape[0]
    g = Hq // Hkv
    return np.repeat(x, g, axis=0) if g > 1 else x


# ---------------------------------------------------------------------------
# The streaming cache oracle
# ---------------------------------------------------------------------------

class OracleReKV:
    def __init__(self, n_init, n_local, block_size, topk, chunk_size,
                 rope_base=10000.0):
        self.n_init = n_init
        self.n_local = n_local
        self.block_size = block_size
        self.topk = topk
        self.chunk_size = chunk_size
        self.rope_base = rope_base

        self.remainder_k: List[np.ndarray] = []  # per-token (Hkv, D) raw
        self.remainder_v: List[np.ndarray] = []
        self.local_k: List[np.ndarray] = []      # sliding window, raw
        self.local_v: List[np.ndarray] = []
        self.init_k: List[np.ndarray] = []
        self.init_v: List[np.ndarray] = []
        self.init_exc = False
        self.blocks = []       # list of (k (Hkv,S,D), v (Hkv,S,D))
        self.block_reps = []   # (Hq*D,) mean of GQA-expanded keys
        self.length = 0

    # -- encode append (ContextManager.append for one exc block) -----------
    def append(self, q, k, v):
        """q: (Hq, T, D), k/v: (Hkv, T, D) raw.  Returns (Hq, T, D)."""
        Hq, T, D = q.shape
        L = self.length

        for t in range(T):
            self.local_k.append(k[:, t])
            self.local_v.append(v[:, t])
            self.remainder_k.append(k[:, t])
            self.remainder_v.append(v[:, t])

        # init fill trigger (get_global_hidden_and_mask): remainder holds
        # every token so far incl. this block; fill when > n_local
        if not self.init_exc and (L + T) > self.n_local:
            need = self.n_init - len(self.init_k)
            for _ in range(need):
                self.init_k.append(self.remainder_k.pop(0))
                self.init_v.append(self.remainder_v.pop(0))
            self.init_exc = len(self.init_k) == self.n_init

        # ---- attention ----
        # stage 1: local sliding window, keys = last min(L+T, n_local+T)
        win = min(L + T, self.n_local + T)
        lk = np.stack(self.local_k[-win:], axis=1)  # (Hkv, win, D)
        lv = np.stack(self.local_v[-win:], axis=1)
        k_pos = np.arange(L + T - win, L + T)
        q_pos = np.arange(L, L + T)
        # window-relative rope: q rel = len_k - len_q + t, k rel = j
        # (len_k = win; only relative distance matters for the logits)
        q_rel = np.arange(win - T, win)
        k_rel = np.arange(win)
        q_rot = rope_rotate(q, q_rel, self.rope_base)
        k_rot = rope_rotate(expand_gqa(lk, Hq), k_rel, self.rope_base)
        dist = q_pos[:, None] - k_pos[None, :]
        mask1 = (dist >= 0) & (dist < self.n_local)

        stages_q = [q_rot]
        stages_kv = [(k_rot, expand_gqa(lv, Hq), mask1)]

        # stage 2: init tokens, full mask (torch_impl sliding_window=None)
        if len(self.init_k) > 0:
            ik = np.stack(self.init_k, axis=1)
            iv = np.stack(self.init_v, axis=1)
            q_one = rope_one_angle(q, self.n_local, self.rope_base)
            mask2 = np.ones((T, ik.shape[1]), dtype=bool)
            stages_q.append(q_one)
            stages_kv.append((expand_gqa(ik, Hq), expand_gqa(iv, Hq), mask2))

        out = multi_stage_softmax(stages_q, stages_kv)

        # ---- block carving (_append_global): only once init_exc ----
        if self.init_exc:
            while len(self.remainder_k) >= self.block_size:
                bk = np.stack(self.remainder_k[: self.block_size], axis=1)
                bv = np.stack(self.remainder_v[: self.block_size], axis=1)
                del self.remainder_k[: self.block_size]
                del self.remainder_v[: self.block_size]
                self.blocks.append((bk, bv))
                rep = expand_gqa(bk, Hq).mean(axis=1).reshape(-1)  # (Hq*D,)
                self.block_reps.append(rep)

        # trim local window
        if len(self.local_k) > self.n_local:
            self.local_k = self.local_k[-self.n_local:]
            self.local_v = self.local_v[-self.n_local:]

        self.length += T
        return out

    # -- retrieval (_calc_block_topk + get_retrieved_kv) -------------------
    def retrieve_indices(self, q) -> List[int]:
        """q: (Hq, Lq, D) raw question queries."""
        Hq, Lq, D = q.shape
        q_mean = q.mean(axis=1).reshape(-1)  # (Hq*D,)

        if not self.init_exc:
            # candidates = remainder blocks after the first n_init tokens
            cand = self.remainder_k[self.n_init:]
            block_num = len(cand) // self.block_size
            assert len(cand) % self.block_size == 0
            if block_num <= self.topk:
                return list(range(block_num))
            reps = []
            for b in range(block_num):
                bk = np.stack(cand[b * self.block_size:(b + 1) * self.block_size],
                              axis=1)
                reps.append(expand_gqa(bk, Hq).mean(axis=1).reshape(-1))
            logits = np.stack(reps) @ q_mean
        else:
            if len(self.blocks) <= self.topk:
                return list(range(len(self.blocks)))
            logits = np.stack(self.block_reps) @ q_mean

        cs = self.chunk_size
        n = logits.shape[0]
        rem = n % cs
        main = logits[: n - rem].reshape(-1, cs).mean(axis=-1)
        if rem > 0:
            main = np.concatenate([main, [logits[n - rem:].mean()]])
        k_chunks = self.topk // cs
        top = np.argsort(-main, kind="stable")[:k_chunks]
        top = np.sort(top)
        idx = (top[:, None] * cs + np.arange(cs)[None, :]).reshape(-1)
        return [int(i) for i in idx if i < n]

    def retrieved_buffer(self, indices):
        """[init | blocks at indices] raw KV: (Hkv, R, D) pair."""
        if not self.init_exc:
            # init part comes from the first n_init remainder tokens
            ik = np.stack(self.remainder_k[: self.n_init], axis=1)
            iv = np.stack(self.remainder_v[: self.n_init], axis=1)
            cand_k = self.remainder_k[self.n_init:]
            cand_v = self.remainder_v[self.n_init:]
            parts_k, parts_v = [ik], [iv]
            for b in indices:
                s = b * self.block_size
                parts_k.append(np.stack(cand_k[s:s + self.block_size], axis=1))
                parts_v.append(np.stack(cand_v[s:s + self.block_size], axis=1))
        else:
            ik = np.stack(self.init_k, axis=1)
            iv = np.stack(self.init_v, axis=1)
            parts_k, parts_v = [ik], [iv]
            for b in indices:
                parts_k.append(self.blocks[b][0])
                parts_v.append(self.blocks[b][1])
        return (np.concatenate(parts_k, axis=1),
                np.concatenate(parts_v, axis=1))

    def qa_attention(self, q, ret_k, ret_v, q_k, q_v):
        """Question forward: q over [retrieved | question] sliding window.

        q: (Hq, Lq, D); ret_k/v raw (Hkv, R, D); q_k/v raw (Hkv, Lq, D).
        Mirrors rekv_attention.py:388-426 with empty init stage
        (len_k <= n_local).
        """
        Hq, Lq, D = q.shape
        k_all = np.concatenate([ret_k, q_k], axis=1)
        v_all = np.concatenate([ret_v, q_v], axis=1)
        len_k = k_all.shape[1]
        assert len_k <= self.n_local
        q_rel = np.arange(len_k - Lq, len_k)
        k_rel = np.arange(len_k)
        q_rot = rope_rotate(q, q_rel, self.rope_base)
        k_rot = rope_rotate(expand_gqa(k_all, Hq), k_rel, self.rope_base)
        dist = q_rel[:, None] - k_rel[None, :]
        mask = (dist >= 0) & (dist < self.n_local)
        return multi_stage_softmax(
            [q_rot], [(k_rot, expand_gqa(v_all, Hq), mask)])
