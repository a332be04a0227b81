"""Pipeline-parallel prefill (parallel/pipeline.py) — bit-equivalence vs the
sequential encode path on a CPU 'pp' mesh.

The pp schedule's masked (bubble) ticks ride append_stream's `active`
machinery, so a correct implementation leaves the KV state EXACTLY equal to
running the microbatches sequentially — which is itself the session's normal
exc-chunk ingest loop.  Reference baseline: no pipeline parallelism exists in
the reference (SURVEY.md §2.5); its closest analogue is accelerate's naive
device_map layer placement (video_llava_rekv.py:137), which is sequential.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from stc_tpu.config import ReKVConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.parallel.pipeline import (jit_pp_encode_step, pp_encode_step,
                                       pp_kv_specs, pp_layer_specs)


def _setup(n_layers=4, B=2, seed=0):
    cfg = qw.Qwen2Config(vocab_size=64, hidden_size=32, num_layers=n_layers,
                         num_heads=4, num_kv_heads=2, head_dim=8,
                         intermediate_size=64, rope_base=10000.0)
    rekv = ReKVConfig(n_init=4, n_local=24, block_size=4, exc_block_size=8,
                      topk=2, chunk_size=1, max_blocks=16,
                      max_prompt_tokens=16, max_new_tokens=4)
    params = qw.init_params(cfg, jax.random.key(seed))
    kvs = qw.init_stream_state(cfg, rekv, B, jnp.float32)
    rng = np.random.default_rng(seed + 1)
    init_e = jnp.asarray(rng.normal(size=(B, rekv.n_init, cfg.hidden_size)),
                         jnp.float32)
    _, kvs = qw.encode_step(params, cfg, rekv, kvs, init_e, is_init=True)
    return cfg, rekv, params, kvs, rng


def _pp_mesh(pp, extra=()):
    devs = jax.devices()
    n = pp * int(np.prod([e[1] for e in extra])) if extra else pp
    names = ("pp",) + tuple(e[0] for e in extra)
    shape = (pp,) + tuple(e[1] for e in extra)
    assert len(devs) >= n
    return Mesh(np.asarray(devs[:n]).reshape(shape), names)


@pytest.mark.parametrize("pp,n_micro", [(2, 3), (4, 2), (4, 1)])
def test_pp_matches_sequential(pp, n_micro):
    cfg, rekv, params, kvs, rng = _setup(n_layers=4)
    B = 2
    Tm = rekv.exc_block_size
    T = n_micro * Tm
    embeds = jnp.asarray(
        rng.normal(size=(B, T, cfg.hidden_size)), jnp.float32)

    # sequential baseline: the session's own exc-chunk loop
    seq_kvs = kvs
    hs = []
    for i in range(n_micro):
        h, seq_kvs = qw.encode_step(params, cfg, rekv, seq_kvs,
                                    embeds[:, i * Tm:(i + 1) * Tm],
                                    is_init=False)
        hs.append(np.asarray(h))
    h_seq = np.concatenate(hs, axis=1)
    # encode_step applies nothing after the layer stack except what the
    # pipeline also applies, so outputs are directly comparable

    mesh = _pp_mesh(pp)
    lp = jax.device_put(
        params["layers"],
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     pp_layer_specs(params["layers"])))
    kvs_pp = jax.device_put(
        kvs, jax.tree.map(lambda s: NamedSharding(mesh, s), pp_kv_specs()))
    h_pp, kvs_pp = pp_encode_step(lp, cfg, rekv, kvs_pp, embeds,
                                  mesh=mesh, n_micro=n_micro)

    np.testing.assert_allclose(np.asarray(h_pp), h_seq, rtol=2e-5, atol=2e-5)
    for name in seq_kvs._fields:
        a = np.asarray(getattr(seq_kvs, name))
        b = np.asarray(getattr(kvs_pp, name))
        np.testing.assert_allclose(b, a, rtol=2e-5, atol=2e-5,
                                   err_msg=f"StreamKV.{name} diverged")
    # counters advanced exactly n_micro pages' worth
    assert np.asarray(kvs_pp.num_blocks).tolist() == \
        np.asarray(seq_kvs.num_blocks).tolist()


def test_pp_jit_donated_and_chained():
    """The jitted closure runs chunk after chunk (streaming regime) and
    stays equal to the sequential path across appends."""
    cfg, rekv, params, kvs, rng = _setup(n_layers=4)
    B = 2
    n_micro, Tm = 2, 4
    mesh = _pp_mesh(4)
    lp = jax.device_put(
        params["layers"],
        jax.tree.map(lambda s: NamedSharding(mesh, s),
                     pp_layer_specs(params["layers"])))
    kvs_pp = jax.device_put(
        kvs, jax.tree.map(lambda s: NamedSharding(mesh, s), pp_kv_specs()))
    step = jit_pp_encode_step(lp, cfg, rekv, mesh=mesh, n_micro=n_micro)

    seq_kvs = kvs
    for it in range(3):
        embeds = jnp.asarray(
            rng.normal(size=(B, n_micro * Tm, cfg.hidden_size)), jnp.float32)
        for i in range(n_micro):
            _, seq_kvs = qw.encode_step(params, cfg, rekv, seq_kvs,
                                        embeds[:, i * Tm:(i + 1) * Tm],
                                        is_init=False)
        _, kvs_pp = step(lp, kvs_pp, embeds)
    for name in seq_kvs._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(kvs_pp, name)),
            np.asarray(getattr(seq_kvs, name)), rtol=2e-5, atol=2e-5,
            err_msg=f"StreamKV.{name} diverged")


def test_pp_composes_with_tp():
    """pp manual + tp automatic (GSPMD) in one mesh: layer leaves sharded
    ('pp' on the layer axis, 'tp' on the head/hidden axis) flow through the
    shard_map body with tp handled by the compiler."""
    cfg, rekv, params, kvs, rng = _setup(n_layers=4)
    B = 2
    mesh = _pp_mesh(4, extra=(("tp", 2),))
    from stc_tpu.parallel.sharding import qwen2_param_specs

    tp_specs = qwen2_param_specs()["layers"]

    def _merge(tp_spec):
        # prepend nothing: layer axis is already axis 0 in both; combine
        # P('pp') with the tp spec's later axes
        return P("pp", *tp_spec[1:])

    lp = jax.device_put(
        params["layers"],
        jax.tree.map(lambda sp: NamedSharding(mesh, _merge(sp)), tp_specs))
    kvs_pp = jax.device_put(
        kvs, jax.tree.map(lambda s: NamedSharding(mesh, s), pp_kv_specs()))

    Tm, n_micro = 4, 2
    embeds = jnp.asarray(
        rng.normal(size=(B, n_micro * Tm, cfg.hidden_size)), jnp.float32)
    seq_kvs = kvs
    for i in range(n_micro):
        _, seq_kvs = qw.encode_step(params, cfg, rekv, seq_kvs,
                                    embeds[:, i * Tm:(i + 1) * Tm],
                                    is_init=False)
    _, kvs_pp = pp_encode_step(lp, cfg, rekv, kvs_pp, embeds,
                               mesh=mesh, n_micro=n_micro)
    for name in seq_kvs._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(kvs_pp, name)),
            np.asarray(getattr(seq_kvs, name)), rtol=2e-5, atol=2e-5,
            err_msg=f"StreamKV.{name} diverged")
