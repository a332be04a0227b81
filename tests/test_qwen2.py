"""Qwen2 streaming decoder: numerical parity vs HuggingFace transformers.

For sequences shorter than n_local (and with the decode cache empty) the
streaming sliding-window attention is exactly full causal attention, so our
decode_step logits must match HF Qwen2ForCausalLM on a random tiny model.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.models.convert import convert_qwen2, qwen2_config_from_hf

REKV = ReKVConfig(n_init=4, n_local=256, block_size=8, exc_block_size=8,
                  topk=4, chunk_size=1, max_blocks=64,
                  max_prompt_tokens=32, max_new_tokens=8)


@pytest.fixture(scope="module")
def hf_pair():
    torch = pytest.importorskip("torch")
    from transformers import Qwen2Config as HFConfig, Qwen2ForCausalLM

    torch.manual_seed(0)
    hf_cfg = HFConfig(
        vocab_size=256, hidden_size=64, intermediate_size=128,
        num_hidden_layers=2, num_attention_heads=4, num_key_value_heads=2,
        max_position_embeddings=512, rope_theta=10000.0, rms_norm_eps=1e-6,
        tie_word_embeddings=False, attention_dropout=0.0,
    )
    model = Qwen2ForCausalLM(hf_cfg).eval()
    cfg = qwen2_config_from_hf(hf_cfg)
    params = convert_qwen2(dict(model.state_dict()), cfg, dtype=jnp.float32)
    return model, cfg, params


def test_decode_step_matches_hf_causal(hf_pair):
    import torch
    model, cfg, params = hf_pair
    T = 12
    rng = np.random.default_rng(0)
    ids = rng.integers(0, cfg.vocab_size, size=(1, T))

    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()

    dkv = qw.init_decode_state(cfg, REKV, 1, dtype=jnp.float32)
    embeds = qw.embed_tokens(params, jnp.asarray(ids))
    logits, dkv = qw.decode_step(params, cfg, REKV, dkv, embeds,
                                 jnp.asarray([T]))
    got = np.asarray(logits)
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert int(np.asarray(dkv.cursor)[0, 0]) == T


def test_incremental_decode_matches_oneshot(hf_pair):
    _, cfg, params = hf_pair
    T = 10
    rng = np.random.default_rng(1)
    ids = rng.integers(0, cfg.vocab_size, size=(1, T))
    embeds = qw.embed_tokens(params, jnp.asarray(ids))

    dkv = qw.init_decode_state(cfg, REKV, 1, dtype=jnp.float32)
    oneshot, _ = qw.decode_step(params, cfg, REKV, dkv, embeds,
                                jnp.asarray([T]))

    dkv = qw.init_decode_state(cfg, REKV, 1, dtype=jnp.float32)
    outs = []
    for t in range(T):
        lg, dkv = qw.decode_step(params, cfg, REKV, dkv,
                                 embeds[:, t:t + 1], jnp.asarray([1]))
        outs.append(np.asarray(lg)[:, 0])
    stepped = np.stack(outs, axis=1)
    np.testing.assert_allclose(stepped, np.asarray(oneshot),
                               rtol=2e-4, atol=2e-4)


def test_encode_step_matches_hf_hidden(hf_pair):
    """Streaming encode of a single init block == full causal attention
    (window-relative RoPE is shift-invariant)."""
    import torch
    model, cfg, params = hf_pair
    T = REKV.n_init
    rng = np.random.default_rng(2)
    ids = rng.integers(0, cfg.vocab_size, size=(1, T))

    with torch.no_grad():
        want = model(torch.tensor(ids)).logits.float().numpy()

    kvs = qw.init_stream_state(cfg, REKV, 1, dtype=jnp.float32)
    embeds = qw.embed_tokens(params, jnp.asarray(ids))
    h, kvs = qw.encode_step(params, cfg, REKV, kvs, embeds, is_init=True)
    h = qw.rms_norm(h, params["norm_f"], cfg.rms_eps)
    got = np.asarray(h @ params["lm_head"])
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-4)
    assert int(np.asarray(kvs.length)[0, 0]) == T


def test_qa_retrieval_pipeline_shapes(hf_pair):
    """Full streaming session smoke: init + video + retrieval + decode."""
    _, cfg, params = hf_pair
    rng = np.random.default_rng(3)
    kvs = qw.init_stream_state(cfg, REKV, 1, dtype=jnp.float32)

    ids = rng.integers(0, cfg.vocab_size, size=(1, REKV.n_init))
    _, kvs = qw.encode_step(params, cfg, REKV, kvs,
                            qw.embed_tokens(params, jnp.asarray(ids)),
                            is_init=True)
    for _ in range(6):
        feats = jnp.asarray(
            rng.normal(size=(1, REKV.block_size, cfg.hidden_size)),
            jnp.float32)
        _, kvs = qw.encode_step(params, cfg, REKV, kvs, feats, is_init=False)
    assert int(np.asarray(kvs.num_blocks)[0, 0]) == 6

    q_ids = rng.integers(0, cfg.vocab_size, size=(1, 5))
    dkvs = qw.init_decode_state(cfg, REKV, 1, dtype=jnp.float32)
    dkvs = qw.qa_retrieve_step(params, cfg, REKV, kvs, dkvs,
                               qw.embed_tokens(params, jnp.asarray(q_ids)))
    # question KV must NOT be kept (updata_kv_cache=False semantics)
    expect_cursor = REKV.n_init + 4 * REKV.block_size  # 6 blocks > topk=4
    assert int(np.asarray(dkvs.cursor)[0, 0]) == expect_cursor

    p_ids = rng.integers(0, cfg.vocab_size, size=(1, 7))
    logits, dkvs = qw.decode_step(params, cfg, REKV, dkvs,
                                  qw.embed_tokens(params, jnp.asarray(p_ids)),
                                  jnp.asarray([7]))
    assert logits.shape == (1, 7, cfg.vocab_size)
    assert np.isfinite(np.asarray(logits)).all()
    assert int(np.asarray(dkvs.cursor)[0, 0]) == expect_cursor + 7
