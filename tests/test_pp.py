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


def _sess_pair(pp, n_layers=8, B=1, seed=0, batch=1, extra=()):
    """(sequential session, pp session) with identical weights/config."""
    from stc_tpu.config import SessionConfig
    from stc_tpu.runtime.session import StreamingSession
    cfg = qw.Qwen2Config(vocab_size=96, hidden_size=32, num_layers=n_layers,
                         num_heads=4, num_kv_heads=2, head_dim=8,
                         intermediate_size=64, rope_base=10000.0)
    rekv = ReKVConfig(n_init=4, n_local=24, block_size=4, exc_block_size=8,
                      topk=2, chunk_size=1, max_blocks=32,
                      max_prompt_tokens=16, max_new_tokens=6)
    params = qw.init_params(cfg, jax.random.key(seed))
    scfg = SessionConfig(rekv=rekv)
    seq = StreamingSession(params, cfg, scfg, batch=batch,
                           state_dtype=jnp.float32)
    mesh = _pp_mesh(pp, extra=extra)
    pps = StreamingSession(params, cfg, scfg, batch=batch,
                           state_dtype=jnp.float32, mesh=mesh)
    assert pps.pp == pp
    return cfg, rekv, seq, pps


@pytest.mark.parametrize("pp", [2, 4])
def test_pp_session_end_to_end_matches_sequential(pp):
    """The FULL session loop under pp — init prompt, streaming ingest
    (single- and multi-chunk appends), and fused QA — answers exactly like
    the sequential session.  This is the bf16-7B-across-chips story running
    end to end: weights, KV pages, and the QA decode cache all shard by
    layer over the 'pp' mesh axis (the round-3 gap: pp was prefill-only
    with no runtime call site)."""
    cfg, rekv, seq, pps = _sess_pair(pp, n_layers=8)
    rng = np.random.default_rng(7)
    for s in (seq, pps):
        s.encode_init_prompt([1, 2, 3, 4])
    feats1 = rng.normal(size=(1, 16, cfg.hidden_size)).astype(np.float32)
    feats2 = rng.normal(size=(1, 8, cfg.hidden_size)).astype(np.float32)
    for s in (seq, pps):
        s.encode_video_features(feats1)   # multi-chunk: GPipe microbatches
        s.encode_video_features(feats2)   # single exc chunk
    for name in seq.kvs._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(pps.kvs, name)),
            np.asarray(getattr(seq.kvs, name)), rtol=2e-5, atol=2e-5,
            err_msg=f"StreamKV.{name} diverged")
    for q, p in ([[5, 6, 7], [8, 9]], [[10], [11, 12, 13]]):
        a_seq = seq.question_answering(q, p, [0], max_new_tokens=6)
        a_pp = pps.question_answering(q, p, [0], max_new_tokens=6)
        assert a_seq == a_pp, (q, a_seq, a_pp)
        # interleaved streaming continues after QA (reference
        # rekv_stream_refactored.py alternation)
        more = rng.normal(size=(1, 8, cfg.hidden_size)).astype(np.float32)
        seq.encode_video_features(more)
        pps.encode_video_features(more)


def test_pp_session_full_depth_7b_shaped():
    """FULL 28-layer depth (the llava-ov-7B layer count) at narrow widths:
    streaming + QA under pp=4, answers equal to sequential.  Narrow dims
    keep the CPU-mesh test fast; depth is what pp shards."""
    cfg, rekv, seq, pps = _sess_pair(4, n_layers=28, seed=3)
    rng = np.random.default_rng(8)
    for s in (seq, pps):
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video_features(
            rng.normal(size=(1, 24, cfg.hidden_size)).astype(np.float32))
        rng = np.random.default_rng(8)  # same stream for both sessions
    rng = np.random.default_rng(9)
    a_seq = seq.question_answering([5, 6], [7, 8, 9], [0], max_new_tokens=6)
    a_pp = pps.question_answering([5, 6], [7, 8, 9], [0], max_new_tokens=6)
    assert a_seq == a_pp


def test_pp_session_batch_and_external_indices():
    """pp composes with batched streams, per-stream questions, ragged
    ingest, and the external-retrieval path."""
    cfg, rekv, seq, pps = _sess_pair(2, n_layers=4, batch=2, seed=5)
    rng = np.random.default_rng(11)
    for s in (seq, pps):
        s.encode_init_prompt([1, 2, 3, 4])
    feats = rng.normal(size=(2, 16, cfg.hidden_size)).astype(np.float32)
    for s in (seq, pps):
        s.encode_video_features(feats)
    # ragged tick: only stream 1 ingests
    more = rng.normal(size=(2, 8, cfg.hidden_size)).astype(np.float32)
    for s in (seq, pps):
        s.encode_video_features(more, active=[False, True])
    a_seq = seq.question_answering_batch([[5, 6], [7]], [[8], [9, 10]], [0],
                                         max_new_tokens=5)
    a_pp = pps.question_answering_batch([[5, 6], [7]], [[8], [9, 10]], [0],
                                        max_new_tokens=5)
    assert a_seq == a_pp
    e_seq = seq.question_answering([5, 6], [8], [0], max_new_tokens=4,
                                   retrieved_indices=[0, 2])
    e_pp = pps.question_answering([5, 6], [8], [0], max_new_tokens=4,
                                  retrieved_indices=[0, 2])
    assert e_seq == e_pp


def test_pp_set_spec_decode_zero_keeps_pp_answer():
    """set_spec_decode(draft=0) on a LIVE pp session must not clobber the
    stage-relay QA pipeline installed by _init_pp with the sequential
    answer_question (advisor round-4 medium: the pp external-retrieval
    branch then passed retrieved_indices= to a function without that
    parameter).  After the toggle, both the hot-path QA and the
    external-indices QA still answer exactly like the sequential session."""
    cfg, rekv, seq, pps = _sess_pair(2, n_layers=4, seed=9)
    rng = np.random.default_rng(13)
    for s in (seq, pps):
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video_features(
            rng.normal(size=(1, 16, cfg.hidden_size)).astype(np.float32))
        rng = np.random.default_rng(13)
    pps.set_spec_decode(0)  # no-op toggle must keep the pp programs
    a_seq = seq.question_answering([5, 6], [7, 8], [0], max_new_tokens=5)
    a_pp = pps.question_answering([5, 6], [7, 8], [0], max_new_tokens=5)
    assert a_seq == a_pp
    # the branch the round-4 bug broke: external indices under pp
    e_seq = seq.question_answering([5, 6], [8], [0], max_new_tokens=4,
                                   retrieved_indices=[0, 1])
    e_pp = pps.question_answering([5, 6], [8], [0], max_new_tokens=4,
                                  retrieved_indices=[0, 1])
    assert e_seq == e_pp


def test_pp_spec_decode_rejected():
    """Speculative decode under pp fails fast at BOTH entry points: the
    live toggle raises, and building a pp session with a drafting config
    asserts (docs/serving.md documents the limit)."""
    import dataclasses
    from stc_tpu.config import SessionConfig
    from stc_tpu.runtime.session import StreamingSession
    cfg, rekv, seq, pps = _sess_pair(2, n_layers=4, seed=10)
    with pytest.raises(ValueError, match="not supported under pp"):
        pps.set_spec_decode(2)
    # config-time rejection
    rekv_spec = dataclasses.replace(rekv, spec_decode_draft=2)
    params = qw.init_params(cfg, jax.random.key(0))
    with pytest.raises(AssertionError, match="speculative decode"):
        StreamingSession(params, cfg, SessionConfig(rekv=rekv_spec),
                         state_dtype=jnp.float32, mesh=_pp_mesh(2))


def test_pp_host_tier_eviction_rejected():
    """Streaming past max_blocks under pp fails fast with the documented
    message instead of silently corrupting the two-tier store (the host-tier
    QA paths are not pp-wired; VERDICT r4 'pp matrix holes')."""
    cfg, rekv, seq, pps = _sess_pair(2, n_layers=4, seed=11)
    rng = np.random.default_rng(14)
    pps.encode_init_prompt([1, 2, 3, 4])
    # fill the device store to max_blocks (32 blocks of 4 tokens), then one
    # more chunk would need an eviction
    n_fill = rekv.max_blocks - pps._total_blocks
    pps.encode_video_features(rng.normal(
        size=(1, n_fill * rekv.block_size, cfg.hidden_size)).astype(np.float32))
    with pytest.raises(RuntimeError, match="not supported under pipeline"):
        pps.encode_video_features(rng.normal(
            size=(1, 8, cfg.hidden_size)).astype(np.float32))


def test_pp_session_composes_with_tp():
    """pp (manual stage relay) + tp (GSPMD head sharding) in one session
    mesh: answers still equal the single-device sequential session."""
    cfg, rekv, seq, pps = _sess_pair(2, n_layers=4, seed=6,
                                     extra=(("tp", 2),))
    # re-place the layer leaves with MERGED pp+tp specs (the default pp
    # placement replicates over tp, which is also valid — this exercises
    # the sharded-weights composition)
    from jax.sharding import NamedSharding
    from stc_tpu.parallel.sharding import qwen2_param_specs
    mesh = pps.mesh
    tp_specs = qwen2_param_specs(pps.params)["layers"]  # fused-layout names
    lp = jax.device_put(
        pps.params["layers"],
        jax.tree.map(lambda sp: NamedSharding(mesh, P("pp", *sp[1:])),
                     {k: tp_specs[k] for k in pps.params["layers"]}))
    pps.params = {**pps.params, "layers": lp}
    rng = np.random.default_rng(12)
    for s in (seq, pps):
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video_features(
            rng.normal(size=(1, 16, cfg.hidden_size)).astype(np.float32))
        rng = np.random.default_rng(12)
    a_seq = seq.question_answering([5, 6], [7, 8], [0], max_new_tokens=5)
    a_pp = pps.question_answering([5, 6], [7, 8], [0], max_new_tokens=5)
    assert a_seq == a_pp


def test_pp_hosttier_eviction_fails_fast():
    """Host-tier eviction under pp is an UNSUPPORTED capability
    intersection (the two-tier QA paths are not pp-wired): streaming past
    max_blocks on a pp session must raise the clear RuntimeError BEFORE
    touching device state, not evict into a broken path (docs/serving.md
    documents the limit and the workaround: raise max_blocks — the store's
    per-chip HBM already divides by pp)."""
    import dataclasses
    from stc_tpu.config import SessionConfig
    from stc_tpu.runtime.session import StreamingSession
    cfg, rekv, _, _ = _sess_pair(2, n_layers=4, seed=12)
    # small store: 8 pages total, window needs 24/4 + margins
    rekv_small = dataclasses.replace(rekv, max_blocks=8)
    pps = StreamingSession(qw.init_params(cfg, jax.random.key(12)), cfg,
                           SessionConfig(rekv=rekv_small),
                           state_dtype=jnp.float32, mesh=_pp_mesh(2))
    rng = np.random.default_rng(14)
    pps.encode_init_prompt([1, 2, 3, 4])
    feats = rng.normal(size=(1, 8 * 4, cfg.hidden_size)).astype(np.float32)
    pps.encode_video_features(feats)  # fills the 8-page store exactly
    with pytest.raises(RuntimeError, match="not supported under pipeline"):
        pps.encode_video_features(feats[:, :8])
