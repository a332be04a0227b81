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
