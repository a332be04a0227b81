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
