"""Int8 weight-only quantization: logits stay close, memory halves, and a
quantized session streams + answers end to end.  (TPU-serving addition; the
reference has no quantized path.)"""

import numpy as np
import jax
import jax.numpy as jnp

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession


def _rekv():
    return ReKVConfig(n_init=6, n_local=128, block_size=8, exc_block_size=8,
                      topk=4, max_blocks=64, max_prompt_tokens=32,
                      max_new_tokens=8)


def test_quantized_logits_close_and_memory_halved():
    mcfg = qw.Qwen2Config.tiny(vocab=128)
    params = qw.fuse_params(qw.init_params(mcfg, jax.random.key(0),
                                           dtype=jnp.float32))
    qparams = qw.quantize_params_int8(params)
    assert "wqkv_q" in qparams["layers"] and "embed_q" in qparams

    def nbytes(tree):
        return sum(x.nbytes for x in jax.tree.leaves(tree))

    # int8 + f32 scales vs f32 weights: well under 0.5x for the big tensors
    assert nbytes(qparams) < 0.45 * nbytes(params)
    # idempotent
    assert qw.quantize_params_int8(qparams) is qparams

    rekv = _rekv()
    dkvs = qw.init_decode_state(mcfg, rekv, 1, jnp.float32)
    ids = jnp.asarray(np.arange(12, dtype=np.int32)[None])
    n = jnp.asarray([12], jnp.int32)
    lg_f, _ = qw.decode_step(params, mcfg, rekv, dkvs,
                             qw.embed_tokens(params, ids), n)
    dkvs = qw.init_decode_state(mcfg, rekv, 1, jnp.float32)
    lg_q, _ = qw.decode_step(qparams, mcfg, rekv, dkvs,
                             qw.embed_tokens(qparams, ids), n)
    a = np.asarray(lg_f, np.float64).reshape(-1)
    b = np.asarray(lg_q, np.float64).reshape(-1)
    cos = a @ b / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cos > 0.999, cos
    # top-1 agreement on the prompt positions
    top_f = np.asarray(lg_f).argmax(-1)
    top_q = np.asarray(lg_q).argmax(-1)
    assert (top_f == top_q).mean() > 0.9


def test_grouped_quant_bounds_outlier_blast_radius():
    """Sub-channel (per-group) scales: an outlier input channel only
    coarsens its own group's quantization grid, not the whole output
    column — reconstruction error on the non-outlier rows drops by ~the
    outlier magnitude ratio vs per-channel scales."""
    rng = np.random.default_rng(0)
    w = rng.normal(size=(64, 96)).astype(np.float32) * 0.02
    w[3, :] *= 40.0  # one outlier input channel (row)
    params = {
        "embed": jnp.zeros((16, 64), jnp.float32),
        "lm_head": jnp.asarray(w),
        "norm_f": jnp.ones((64,), jnp.float32),
        "layers": {
            "ln1": jnp.ones((1, 64)), "ln2": jnp.ones((1, 64)),
            "wqkv": jnp.asarray(w)[None], "bqkv": jnp.zeros((1, 96)),
            "wo": jnp.zeros((1, 64, 64)),
            "w_gateup": jnp.zeros((1, 64, 128)),
            "w_down": jnp.zeros((1, 64, 64)),
        },
    }

    def recon_err(qp, key_q, key_s, grouped):
        wq = np.asarray(qp["layers"][key_q])[0].astype(np.float64)
        s = np.asarray(qp["layers"][key_s])[0]
        if grouped:                                          # s: (in/G, out)
            G = 64 // s.shape[0]
            wd = (wq.reshape(s.shape[0], G, -1)
                  * s[:, None, :]).reshape(64, -1)
        else:                                                # s: (out,)
            wd = wq * s[None, :]
        mask = np.ones(64, bool)
        mask[:16] = False  # rows outside the outlier's 16-row group: the
        # outlier coarsens only its own group's grid, these stay fine
        return np.abs(wd[mask] - w[mask]).mean()

    qp_c = qw.quantize_params_int8(params)
    qp_g = qw.quantize_params_int8(params, group_size=16)
    assert "wqkv_gs" in qp_g["layers"] and "wqkv_s" not in qp_g["layers"]
    err_c = recon_err(qp_c, "wqkv_q", "wqkv_s", grouped=False)
    err_g = recon_err(qp_g, "wqkv_q", "wqkv_gs", grouped=True)
    assert err_g < err_c / 8, (err_g, err_c)

    # grouped matmul consumer agrees with the host-side reconstruction
    h = jnp.asarray(rng.normal(size=(1, 2, 64)), jnp.float32)
    out = qw._mm(h, qp_g["layers"], "wqkv")  # leading layer axis sliced off
    wq = np.asarray(qp_g["layers"]["wqkv_q"])
    s = np.asarray(qp_g["layers"]["wqkv_gs"])
    wd = (wq.reshape(1, 4, 16, 96).astype(np.float64)
          * s[:, :, None, :]).reshape(1, 64, 96)
    want = np.asarray(h, np.float64) @ wd[0]
    np.testing.assert_allclose(np.asarray(out, np.float64), want,
                               rtol=2e-5, atol=2e-5)


def test_grouped_quant_logits_closer_than_per_channel():
    """End-to-end decode logits: int8_g16 drifts less from fp32 than plain
    int8 on a model salted with outlier input channels (the case grouped
    scales exist for)."""
    mcfg = qw.Qwen2Config.tiny(vocab=128)
    params = qw.fuse_params(qw.init_params(mcfg, jax.random.key(2),
                                           dtype=jnp.float32))
    lp = dict(params["layers"])
    rng = np.random.default_rng(2)
    for name in ("wqkv", "w_gateup", "w_down", "wo"):
        w = np.array(lp[name])  # writable copy
        rows = rng.choice(w.shape[1], size=3, replace=False)
        w[:, rows, :] *= 25.0
        lp[name] = jnp.asarray(w)
    params = {**params, "layers": lp}

    rekv = _rekv()
    ids = jnp.asarray(np.arange(12, dtype=np.int32)[None])
    n = jnp.asarray([12], jnp.int32)

    def logits_of(p):
        dkvs = qw.init_decode_state(mcfg, rekv, 1, jnp.float32)
        lg, _ = qw.decode_step(p, mcfg, rekv, dkvs,
                               qw.embed_tokens(p, ids), n)
        return np.asarray(lg, np.float64).reshape(-1)

    ref = logits_of(params)
    err_c = np.abs(logits_of(qw.quantize_params_int8(params)) - ref).mean()
    err_g = np.abs(logits_of(qw.quantize_params_int8(params, group_size=16))
                   - ref).mean()
    assert err_g < err_c * 0.6, (err_g, err_c)


def test_grouped_quant_session_and_config():
    """weights_quant='int8_g32' threads through SessionConfig into a
    streaming session end to end; malformed strings fail fast."""
    import pytest
    from stc_tpu.config import SessionConfig as SC
    assert SC(weights_quant="int8_g128").weights_quant_group == 128
    assert SC(weights_quant="int8").weights_quant_group == 0
    for bad in ("INT8", "int8_g", "int8_gx", "int4"):
        with pytest.raises(AssertionError):
            SC(weights_quant=bad)

    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(3))
    sess = StreamingSession(
        params, mcfg, SessionConfig(rekv=_rekv(), weights_quant="int8_g32"),
        state_dtype=jnp.float32)
    assert "wqkv_gs" in sess.params["layers"]
    sess.encode_init_prompt(list(range(6)))
    rng = np.random.default_rng(3)
    feats = rng.normal(size=(1, 8 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    ans = sess.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                  max_new_tokens=6)
    assert 1 <= len(ans) <= 6


def test_quantized_session_streams_and_answers():
    mcfg = qw.Qwen2Config.tiny()
    params = qw.init_params(mcfg, jax.random.key(1))
    sess = StreamingSession(params, mcfg,
                            SessionConfig(rekv=_rekv(), weights_quant="int8"),
                            state_dtype=jnp.float32)
    sess.encode_init_prompt(list(range(6)))
    rng = np.random.default_rng(1)
    feats = rng.normal(size=(1, 12 * 8, mcfg.hidden_size)).astype(np.float32)
    sess.encode_video_features(feats)
    ans = sess.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                  max_new_tokens=6)
    assert 1 <= len(ans) <= 6
    # bf16-weight session should produce a closely-related answer stream
    ref = StreamingSession(params, mcfg, SessionConfig(rekv=_rekv()),
                           state_dtype=jnp.float32)
    ref.encode_init_prompt(list(range(6)))
    ref.encode_video_features(feats)
    ans_ref = ref.question_answering([3, 4, 5], [3, 4, 5, 6], [0],
                                     max_new_tokens=6)
    assert len(ans_ref) >= 1  # smoke: same flow works unquantized
