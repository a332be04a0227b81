"""Numpy oracles for the vision-side compression (pruner + cacher).

Literal re-implementations of the REFERENCE semantics (model/prune.py and
model/custom_siglip.py) with python loops, used to validate the batched
static-shape TPU versions.
"""

from __future__ import annotations

import numpy as np

ALPHAS = [2.0 ** k for k in range(-3, 2)]


# ---------------------------------------------------------------------------
# STC-Pruner oracle (model/prune.py:99-145)
# ---------------------------------------------------------------------------

class OraclePruner:
    def __init__(self):
        self.past_means = []  # list of (1, 1, Csel)

    def compress(self, flat_features: np.ndarray, tokens_per_frame: int,
                 keep_per_frame: int, channel_keep_ratio: float = 0.5):
        """flat_features: (F*Tin, C).  Returns (kept_flat_indices, pruned)."""
        x = flat_features.astype(np.float32)
        # channel selection: lowest-variance half (unbiased=False)
        var = x.var(axis=0)
        k_ch = int(var.shape[0] * channel_keep_ratio)
        ch = np.argsort(var, kind="stable")[:k_ch]
        sel = x[:, ch]
        F = sel.shape[0] // tokens_per_frame
        r = sel.reshape(F, tokens_per_frame, k_ch)

        # memory mean over chunk means (current chunk included)
        self.past_means.append(r.mean(axis=(0, 1), keepdims=True))
        memory_mean = np.concatenate(self.past_means, axis=0).mean(axis=0)

        def l2n(a):
            return a / np.maximum(np.linalg.norm(a, axis=-1, keepdims=True),
                                  1e-12)

        fn = l2n(r)
        frame_means = fn.mean(axis=1, keepdims=True)
        mm = l2n(memory_mean).reshape(1, 1, -1)

        def gauss(feat, tgt):
            d2 = ((feat - tgt) ** 2).sum(-1)
            return sum(np.exp(-d2 / (2 * a)) for a in ALPHAS)

        frame_score = gauss(fn, frame_means)
        memory_score = gauss(fn, mm)
        combined = memory_score + frame_score  # (F, Tin)

        kept = []
        for i in range(F):
            idx = np.argsort(combined[i], kind="stable")[:keep_per_frame]
            kept.append(np.sort(idx))
        flat_idx = np.concatenate(
            [idx + i * tokens_per_frame for i, idx in enumerate(kept)])
        return flat_idx, flat_features[flat_idx]


# ---------------------------------------------------------------------------
# STC-Cacher oracle: one selective-recompute layer
# (model/custom_siglip.py:115-224)
# ---------------------------------------------------------------------------

def layer_norm(x, w, b, eps=1e-6):
    mu = x.mean(-1, keepdims=True)
    var = ((x - mu) ** 2).mean(-1, keepdims=True)
    return (x - mu) / np.sqrt(var + eps) * w + b


def full_attention(q, k, v, num_heads):
    """q: (F, Tq, C), k/v: (F, Tk, C)."""
    F, Tq, C = q.shape
    Tk = k.shape[1]
    H, D = num_heads, C // num_heads
    qh = q.reshape(F, Tq, H, D).transpose(0, 2, 1, 3)
    kh = k.reshape(F, Tk, H, D).transpose(0, 2, 1, 3)
    vh = v.reshape(F, Tk, H, D).transpose(0, 2, 1, 3)
    lg = np.einsum("fhqd,fhkd->fhqk", qh, kh) / np.sqrt(D)
    p = np.exp(lg - lg.max(-1, keepdims=True))
    p /= p.sum(-1, keepdims=True)
    o = np.einsum("fhqk,fhkd->fhqd", p, vh)
    return o.transpose(0, 2, 1, 3).reshape(F, Tq, C)


def cached_layer_forward(h, weights, refs, update_ratio, num_heads, eps=1e-6):
    """Selective-recompute encoder layer, reference custom_siglip.py odd-chunk
    path.  h: (F, T, C); refs: dict ref_k/ref_v/ref_attn/ref_mlp of (T, C)."""
    F, T, C = h.shape
    w = weights
    hn = layer_norm(h, w["ln1_w"], w["ln1_b"], eps)
    k_full = hn @ w["wk"] + w["bk"]

    sim = (k_full * refs["ref_k"][None]).sum(-1) / (
        np.linalg.norm(k_full, axis=-1)
        * np.linalg.norm(refs["ref_k"], axis=-1)[None] + 1e-8)

    num_update = max(1, min(int(T * update_ratio), T))
    out = np.empty_like(h)
    for f in range(F):
        idx = np.argsort(sim[f], kind="stable")[:num_update]
        toks = hn[f, idx]
        q_sel = toks @ w["wq"] + w["bq"]
        v_sel = toks @ w["wv"] + w["bv"]
        v_full = refs["ref_v"].copy()
        v_full[idx] = v_sel
        attn_sel = full_attention(q_sel[None], k_full[f][None], v_full[None],
                                  num_heads)[0]
        attn_sel = attn_sel @ w["wo"] + w["bo"]
        attn_full = refs["ref_attn"].copy()
        attn_full[idx] = attn_sel
        hf = h[f] + attn_full
        hn2 = layer_norm(hf, w["ln2_w"], w["ln2_b"], eps)

        def gelu_tanh(x):
            return 0.5 * x * (1 + np.tanh(np.sqrt(2 / np.pi)
                                          * (x + 0.044715 * x ** 3)))

        mlp_sel = gelu_tanh(hn2[idx] @ w["fc1"] + w["fc1_b"]) @ w["fc2"] + w["fc2_b"]
        mlp_full = refs["ref_mlp"].copy()
        mlp_full[idx] = mlp_sel
        out[f] = hf + mlp_full
    return out
