"""Multi-device sharding: the full streaming step compiles and runs on an
8-device CPU mesh (dp=2 streams x tp=4 head shards) and matches the
single-device result."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.config import ReKVConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.parallel.mesh import make_mesh
from stc_tpu.parallel.sharding import (decode_kv_specs, qwen2_param_specs,
                                       shard_pytree, stream_kv_specs)

pytestmark = pytest.mark.skipif(
    len(jax.devices()) < 8, reason="needs 8 virtual devices")

MCFG = qw.Qwen2Config(vocab_size=128, hidden_size=64, num_layers=2,
                      num_heads=8, num_kv_heads=4, head_dim=8,
                      intermediate_size=128, rope_base=10000.0)
REKV = ReKVConfig(n_init=4, n_local=128, block_size=8, exc_block_size=8,
                  topk=4, chunk_size=1, max_blocks=32,
                  max_prompt_tokens=16, max_new_tokens=4)
B = 2


def _run(params, kvs, feats, q_embeds, sharded):
    _, kvs = qw.encode_step(params, MCFG, REKV, kvs, feats, is_init=False)
    dkvs = qw.init_decode_state(MCFG, REKV, B, jnp.float32)
    dkvs = qw.qa_retrieve_step(params, MCFG, REKV, kvs, dkvs, q_embeds)
    logits, dkvs = qw.decode_step(params, MCFG, REKV, dkvs, q_embeds,
                                  jnp.full((B,), q_embeds.shape[1]))
    return kvs.length, dkvs.cursor, logits


def test_sharded_step_matches_single_device():
    rng = np.random.default_rng(0)
    params = qw.init_params(MCFG, jax.random.key(0))
    kvs = qw.init_stream_state(MCFG, REKV, B, jnp.float32)

    ids = rng.integers(0, MCFG.vocab_size, size=(B, REKV.n_init))
    _, kvs = qw.encode_step(params, MCFG, REKV, kvs,
                            qw.embed_tokens(params, jnp.asarray(ids)),
                            is_init=True)
    feats = jnp.asarray(rng.normal(size=(B, REKV.block_size, MCFG.hidden_size)),
                        jnp.float32)
    q_embeds = jnp.asarray(rng.normal(size=(B, 4, MCFG.hidden_size)),
                           jnp.float32)

    # single-device reference
    want_len, want_cur, want_logits = jax.jit(
        lambda p, k, f, q: _run(p, k, f, q, False))(params, kvs, feats,
                                                    q_embeds)

    # 8-device mesh
    mesh = make_mesh(dp=2, tp=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    params_s = shard_pytree(params, qwen2_param_specs(), mesh)
    kvs_s = shard_pytree(kvs, stream_kv_specs(), mesh)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P("dp", None, None)))
    q_s = jax.device_put(q_embeds, NamedSharding(mesh, P("dp", None, None)))

    got_len, got_cur, got_logits = jax.jit(
        lambda p, k, f, q: _run(p, k, f, q, True))(params_s, kvs_s, feats_s,
                                                   q_s)

    np.testing.assert_array_equal(np.asarray(want_len), np.asarray(got_len))
    np.testing.assert_array_equal(np.asarray(want_cur), np.asarray(got_cur))
    np.testing.assert_allclose(np.asarray(want_logits),
                               np.asarray(got_logits), rtol=2e-4, atol=2e-4)


def test_sharded_quantized_step_matches_single_device():
    """int8-quantized params shard over the same dp x tp mesh (specs keyed
    to the quantized names) and reproduce the single-device computation."""
    rng = np.random.default_rng(1)
    params = qw.quantize_params_int8(qw.fuse_params(
        qw.init_params(MCFG, jax.random.key(1))))
    kvs = qw.init_stream_state(MCFG, REKV, B, jnp.float32)
    ids = rng.integers(0, MCFG.vocab_size, size=(B, REKV.n_init))
    _, kvs = qw.encode_step(params, MCFG, REKV, kvs,
                            qw.embed_tokens(params, jnp.asarray(ids)),
                            is_init=True)
    feats = jnp.asarray(rng.normal(size=(B, REKV.block_size,
                                         MCFG.hidden_size)), jnp.float32)
    q_embeds = jnp.asarray(rng.normal(size=(B, 4, MCFG.hidden_size)),
                           jnp.float32)

    want_len, want_cur, want_logits = jax.jit(
        lambda p, k, f, q: _run(p, k, f, q, False))(params, kvs, feats,
                                                    q_embeds)

    mesh = make_mesh(dp=2, tp=4)
    from jax.sharding import NamedSharding, PartitionSpec as P
    params_s = shard_pytree(params, qwen2_param_specs(params), mesh)
    kvs_s = shard_pytree(kvs, stream_kv_specs(), mesh)
    feats_s = jax.device_put(feats, NamedSharding(mesh, P("dp", None, None)))
    q_s = jax.device_put(q_embeds, NamedSharding(mesh, P("dp", None, None)))

    got_len, got_cur, got_logits = jax.jit(
        lambda p, k, f, q: _run(p, k, f, q, True))(params_s, kvs_s, feats_s,
                                                   q_s)
    np.testing.assert_array_equal(np.asarray(want_len), np.asarray(got_len))
    np.testing.assert_array_equal(np.asarray(want_cur), np.asarray(got_cur))
    np.testing.assert_allclose(np.asarray(want_logits),
                               np.asarray(got_logits), rtol=2e-4, atol=2e-4)
