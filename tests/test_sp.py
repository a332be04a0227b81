"""Sequence(temporal)-parallel vision encode — 'sp' mesh axis.

A streaming chunk's frames are independent through the whole vision side
(tower, projector, pooling; the pruner couples frames only through cheap
per-frame means), so the chunk's TOKEN/frame axis shards over an 'sp' mesh
axis with zero collectives until the LM boundary, where GSPMD all-gathers
the pruned tokens (ICI) for the windowed LM prefill.  This is where sp
belongs in this workload: the vision tower dominates per-chunk FLOPs
(26 layers x 729 tokens/frame vs 24 layers x 60 pruned tokens/frame on
llava-ov).  The reference has no sequence parallelism of any kind
(SURVEY.md §2.5).
"""

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from stc_tpu.models import llava_onevision as lo
from stc_tpu.models import qwen2 as qw
from stc_tpu.models import siglip as sg
from stc_tpu.parallel.mesh import make_mesh
from stc_tpu.parallel.sharding import (projector_param_specs,
                                       qwen2_param_specs, shard_pytree,
                                       siglip_param_specs, shard_vision_sp,
                                       stream_kv_specs)


def _cfgs():
    vcfg = sg.SiglipConfig(hidden_size=32, num_layers=2, num_heads=4,
                           intermediate_size=64, image_size=56, patch_size=14)
    mcfg = qw.Qwen2Config(vocab_size=128, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128, rope_base=10000.0)
    return lo.LlavaOVConfig(vision=vcfg, text=mcfg)


def test_sp_vision_matches_unsharded():
    """Frame-sharded (dp x sp) vision chunk -> pruner -> LM append equals the
    single-device run: sharding is layout, never semantics."""
    cfg = _cfgs()
    vcfg, mcfg = cfg.vision, cfg.text
    from stc_tpu.compress.pruner import init_pruner_state, stc_prune
    from stc_tpu.config import ReKVConfig

    B, F = 2, 4  # 2 streams x 4 frames per chunk
    S = cfg.tokens_per_frame
    rekv = ReKVConfig(n_init=4, n_local=32, block_size=S,
                      exc_block_size=S * F, topk=4, chunk_size=1,
                      max_blocks=32, max_prompt_tokens=16, max_new_tokens=4)
    params = lo.init_random_params(cfg, jax.random.key(0))
    kvs0 = qw.init_stream_state(mcfg, rekv, B, jnp.float32)
    cacher0 = sg.init_cacher_state(vcfg, B)
    pstate0 = init_pruner_state(B, int(mcfg.hidden_size * 0.5))
    rng = np.random.default_rng(1)
    pixels = rng.normal(size=(B * F, 3, vcfg.image_size, vcfg.image_size)
                        ).astype(np.float32)

    def step(params, pixels, kvs, cacher, pstate):
        feats, cacher = sg.encode_full(params["vision"], vcfg, pixels,
                                       cacher, n_streams=B)
        feats = lo.project(params["projector"], feats)
        feats = lo.apply_pooling(feats, vcfg.grid)
        BF, T, E = feats.shape
        pruned, _, pstate = stc_prune(feats.reshape(B, F, T, E), pstate,
                                      keep_per_frame=S,
                                      channel_keep_ratio=0.5)
        flat = pruned.reshape(B, F * S, E)
        _, kvs = qw.encode_step(params["text"], mcfg, rekv, kvs, flat,
                                is_init=False)
        return flat, kvs, cacher, pstate

    # single-device baseline
    flat0, kvs_ref, cacher_ref, _ = jax.jit(step)(
        params, pixels, kvs0, cacher0, pstate0)

    # dp x sp x tp mesh: frames shard over (dp, sp), params over tp
    mesh = make_mesh(dp=2, tp=2, sp=2)
    sparams = {
        "vision": shard_pytree(params["vision"], siglip_param_specs(), mesh),
        "projector": shard_pytree(params["projector"],
                                  projector_param_specs(), mesh),
        "text": shard_pytree(params["text"], qwen2_param_specs(), mesh),
    }
    pix_sh, cacher_sh = shard_vision_sp(mesh)
    spix = jax.device_put(pixels, NamedSharding(mesh, pix_sh))
    scacher = jax.device_put(cacher0, NamedSharding(mesh, cacher_sh))
    skvs = shard_pytree(kvs0, stream_kv_specs(), mesh)
    spstate = jax.device_put(pstate0, NamedSharding(mesh, P("dp")))

    flat1, kvs_sp, cacher_sp, _ = jax.jit(step)(
        sparams, spix, skvs, scacher, spstate)

    np.testing.assert_allclose(np.asarray(flat1), np.asarray(flat0),
                               rtol=2e-5, atol=2e-5)
    for name in kvs_ref._fields:
        np.testing.assert_allclose(
            np.asarray(getattr(kvs_sp, name)),
            np.asarray(getattr(kvs_ref, name)), rtol=2e-5, atol=2e-5,
            err_msg=f"StreamKV.{name} diverged under dp x sp x tp")
    np.testing.assert_allclose(np.asarray(cacher_sp.ref_k),
                               np.asarray(cacher_ref.ref_k),
                               rtol=2e-5, atol=2e-5)


def test_make_mesh_sp_axis_names():
    mesh = make_mesh(dp=2, tp=2, sp=2)
    assert mesh.axis_names == ("dp", "sp", "tp")
    assert mesh.shape["sp"] == 2
    legacy = make_mesh(dp=4, tp=2)
    assert legacy.axis_names == ("dp", "tp")


def test_sp_lm_session_matches_sequential():
    """LM-PREFILL sequence parallelism through the session API: a
    StreamingSession built with a dp x sp x tp mesh shards every encode
    append's token axis over 'sp' (plus Megatron tp on params and
    dp/tp on the page store) and must answer EXACTLY like the sequential
    session — sharding is layout, never semantics.  tp=1 arm asserts
    bit-equality (no psum reorders); tp=2 arm allows reduction-order
    noise."""
    from stc_tpu.config import ReKVConfig, SessionConfig
    from stc_tpu.runtime.session import StreamingSession

    mcfg = qw.Qwen2Config(vocab_size=128, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128, rope_base=10000.0)
    rekv = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=16,
                      topk=4, chunk_size=1, max_blocks=32,
                      max_prompt_tokens=16, max_new_tokens=8,
                      host_kv_quant="none")
    params = qw.init_params(mcfg, jax.random.key(3))
    rng = np.random.default_rng(4)
    B = 2
    feats = rng.normal(size=(B, 8 * 16, mcfg.hidden_size)).astype(np.float32)
    q, p = [5, 6], [7, 8, 9]

    def run(mesh):
        s = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                             batch=B, state_dtype=jnp.float32, mesh=mesh)
        s.encode_init_prompt([1, 2, 3, 4])
        s.encode_video_features(feats)
        ans = s.question_answering(q, p, [0], max_new_tokens=6)
        # serve tick on the sp mesh: ragged encode + QA in one dispatch
        tok, cnt = s.serve(feats[:, :16], None, [q, q], [p, p], [0],
                           max_new_tokens=4)
        return ans, np.asarray(tok), np.asarray(cnt), s

    ans_ref, tok_ref, cnt_ref, _ = run(None)

    sess_sp = None
    for dp, sp, tp in ((2, 4, 1), (2, 2, 2)):
        mesh = make_mesh(dp=dp, tp=tp, sp=sp)
        ans, tok, cnt, sess_sp = run(mesh)
        assert sess_sp.sp == sp
        if tp == 1:
            assert ans == ans_ref, (dp, sp, tp)
            np.testing.assert_array_equal(tok, tok_ref)
            np.testing.assert_array_equal(cnt, cnt_ref)
        else:
            # tp psums reorder float adds; greedy argmax ties can flip a
            # token only if logits collide — equal answers still expected
            # on this seed
            assert ans == ans_ref, (dp, sp, tp)

    # the store lives distributed on the mesh (placement specs constrain
    # the INPUTS; GSPMD owns output shardings, which may permute the axes)
    from jax.sharding import NamedSharding
    shd = sess_sp.kvs.block_k.sharding
    assert isinstance(shd, NamedSharding)
    assert not shd.is_fully_replicated
    assert len(shd.device_set) == 8


def test_sp_pp_mesh_rejected():
    from stc_tpu.config import ReKVConfig, SessionConfig
    from stc_tpu.runtime.session import StreamingSession
    from jax.sharding import Mesh
    import pytest as _pytest

    mcfg = qw.Qwen2Config(vocab_size=128, hidden_size=64, num_layers=2,
                          num_heads=4, num_kv_heads=2, head_dim=16,
                          intermediate_size=128, rope_base=10000.0)
    rekv = ReKVConfig(n_init=4, n_local=64, block_size=8, exc_block_size=16,
                      topk=4, chunk_size=1, max_blocks=32,
                      max_prompt_tokens=16, max_new_tokens=8)
    devs = np.asarray(jax.devices()[:4]).reshape(2, 2)
    mesh = Mesh(devs, axis_names=("pp", "sp"))
    params = qw.init_params(mcfg, jax.random.key(0))
    with _pytest.raises(AssertionError, match="sp .*composes with dp/tp"):
        StreamingSession(params, mcfg, SessionConfig(rekv=rekv), batch=2,
                         mesh=mesh)
