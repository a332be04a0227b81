"""Vision side: SigLIP parity vs HF, pooling parity vs torch, cacher and
pruner parity vs numpy oracles, FrameEncoder end-to-end."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from stc_tpu.compress.pruner import (init_pruner_state, map_indices_flat,
                                     map_indices_grid, stc_prune)
from stc_tpu.config import CacherConfig, PrunerConfig, ReKVConfig, SessionConfig
from stc_tpu.models import llava_onevision as lo
from stc_tpu.models import siglip as sg
from oracle_vision import OraclePruner, cached_layer_forward


# ---------------------------------------------------------------------------
# SigLIP tower vs HF
# ---------------------------------------------------------------------------

@pytest.fixture(scope="module")
def hf_siglip():
    torch = pytest.importorskip("torch")
    from transformers import SiglipVisionConfig, SiglipVisionModel
    torch.manual_seed(0)
    hf_cfg = SiglipVisionConfig(
        hidden_size=32, intermediate_size=64, num_hidden_layers=2,
        num_attention_heads=4, image_size=56, patch_size=14,
        hidden_act="gelu_pytorch_tanh")
    model = SiglipVisionModel(hf_cfg).eval()
    cfg = sg.SiglipConfig(hidden_size=32, num_layers=2, num_heads=4,
                          intermediate_size=64, image_size=56, patch_size=14)
    from stc_tpu.models.convert import convert_siglip
    params = convert_siglip(dict(model.state_dict()), cfg.num_layers,
                            prefix="vision_model.", dtype=jnp.float32)
    return model, cfg, params


def test_siglip_full_matches_hf(hf_siglip):
    import torch
    model, cfg, params = hf_siglip
    rng = np.random.default_rng(0)
    pixels = rng.normal(size=(3, 3, 56, 56)).astype(np.float32)

    with torch.no_grad():
        hs = model(torch.tensor(pixels), output_hidden_states=True)
    want = hs.hidden_states[-1].numpy()  # last encoder layer, pre-post-LN

    cacher = sg.init_cacher_state(cfg, 1)
    got, cacher = sg.encode_full(params, cfg, jnp.asarray(pixels), cacher)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)
    # reference frame = last frame of the chunk
    np.testing.assert_allclose(
        np.asarray(cacher.ref_mlp)[0, 0],
        np.asarray(cacher.ref_mlp)[0, 0], rtol=0, atol=0)
    assert cacher.ref_k.shape == (2, 1, cfg.num_tokens, cfg.hidden_size)


def test_cacher_ratio_one_equals_full(hf_siglip):
    """update_ratio=1.0 recomputes every token -> cached path == full path."""
    _, cfg, params = hf_siglip
    rng = np.random.default_rng(1)
    ref_pix = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    new_pix = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)

    cacher = sg.init_cacher_state(cfg, 1)
    _, cacher = sg.encode_full(params, cfg, jnp.asarray(ref_pix), cacher)

    got = sg.encode_cached(params, cfg, jnp.asarray(new_pix), cacher,
                           update_ratio=1.0)
    want, _ = sg.encode_full(params, cfg, jnp.asarray(new_pix),
                             sg.init_cacher_state(cfg, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)


def test_cached_layer_matches_oracle(hf_siglip):
    _, cfg, params = hf_siglip
    rng = np.random.default_rng(2)
    T, C = cfg.num_tokens, cfg.hidden_size
    F = 2
    h = rng.normal(size=(F, T, C)).astype(np.float32)
    refs = {k: rng.normal(size=(T, C)).astype(np.float32)
            for k in ("ref_k", "ref_v", "ref_attn", "ref_mlp")}
    lp = {k: np.asarray(v[0]) for k, v in params["layers"].items()}

    want = cached_layer_forward(h, lp, refs, update_ratio=0.25,
                                num_heads=cfg.num_heads)

    lp_j = {k: jnp.asarray(v) for k, v in lp.items()}
    refs_j = tuple(jnp.asarray(refs[k])[None]
                   for k in ("ref_k", "ref_v", "ref_attn", "ref_mlp"))
    num_update = max(1, int(T * 0.25))
    got = sg._layer_cached(lp_j, jnp.asarray(h), refs_j, num_update, cfg)
    np.testing.assert_allclose(np.asarray(got), want, rtol=3e-4, atol=3e-4)


# ---------------------------------------------------------------------------
# Pooling parity vs torch
# ---------------------------------------------------------------------------

def test_apply_pooling_matches_torch_interpolate():
    torch = pytest.importorskip("torch")
    rng = np.random.default_rng(3)
    F, g, E = 2, 9, 8
    feats = rng.normal(size=(F, g * g, E)).astype(np.float32)
    got = np.asarray(lo.apply_pooling(jnp.asarray(feats), g))

    x = torch.tensor(feats).view(F, g, g, E).permute(0, 3, 1, 2)
    out = int(np.ceil(g / 2))
    y = torch.nn.functional.interpolate(x, size=(out, out), mode="bilinear")
    want = y.permute(0, 2, 3, 1).reshape(F, out * out, E).numpy()
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)


# ---------------------------------------------------------------------------
# Pruner parity vs oracle
# ---------------------------------------------------------------------------

def test_pruner_matches_oracle_multi_chunk():
    rng = np.random.default_rng(4)
    Tin, C, keep = 16, 12, 5
    state = init_pruner_state(1, C // 2)
    oracle = OraclePruner()
    for chunk in range(4):
        F = 2
        feats = rng.normal(size=(F, Tin, C)).astype(np.float32)
        pruned, idx, state = stc_prune(jnp.asarray(feats)[None], state,
                                       keep_per_frame=keep)
        want_idx, want_feats = oracle.compress(
            feats.reshape(F * Tin, C), Tin, keep)
        got_flat = np.asarray(map_indices_flat(idx, Tin))[0]
        np.testing.assert_array_equal(got_flat, want_idx,
                                      err_msg=f"chunk {chunk}")
        np.testing.assert_allclose(
            np.asarray(pruned)[0].reshape(F * keep, C), want_feats,
            rtol=1e-5, atol=1e-5)


def test_grid_index_mapping():
    # one frame, grid 13: kept feature idx k maps to row*(13+1)+col and all 13
    # newline tokens are appended per frame
    idx = jnp.asarray([[[0, 13, 168]]])  # (B=1, F=1, K=3): (0,0),(1,0),(12,12)
    got = np.asarray(map_indices_grid(idx, 13))[0]
    assert got[0] == 0
    assert got[1] == 14          # row 1 starts at 14 in the 13x14 layout
    assert got[2] == 12 * 14 + 12
    # newline tokens: col 13 of each row
    np.testing.assert_array_equal(got[3:], np.arange(13) * 14 + 13)


# ---------------------------------------------------------------------------
# FrameEncoder end-to-end
# ---------------------------------------------------------------------------

def test_frame_encoder_pipeline():
    cfg = lo.LlavaOVConfig.tiny()
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=4, n_local=256, block_size=3, exc_block_size=3,
                        topk=4, max_blocks=128, max_prompt_tokens=16,
                        max_new_tokens=4),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.5,
                            cache_interval=2),
        pruner=PrunerConfig(token_per_frame=3),
    )
    params = lo.init_random_params(cfg, jax.random.key(0))
    enc = lo.FrameEncoder(params, cfg, scfg)

    frames = (np.random.default_rng(0)
              .uniform(0, 255, size=(1, 56, 56, 3)).astype(np.uint8))
    out0 = enc(frames)   # chunk 0: full
    out1 = enc(frames)   # chunk 1: cached
    assert out0.shape == (1, 3, cfg.text.hidden_size)
    assert out1.shape == (1, 3, cfg.text.hidden_size)
    assert enc.chunk_idx == 2
    # identical frames + cacher: outputs should be very close (all tokens
    # redundant; recomputed ones equal reference values)
    np.testing.assert_allclose(np.asarray(out0), np.asarray(out1),
                               rtol=0.2, atol=0.2)

    enc.reset()
    assert enc.chunk_idx == 0


def test_cacher_value_similarity_variant(hf_siglip):
    """sim_source='value' (reference V-similarity variant): ratio=1.0 must
    also equal the full path, and selections generally differ from 'key'."""
    _, cfg, params = hf_siglip
    rng = np.random.default_rng(7)
    ref = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    new = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    cacher = sg.init_cacher_state(cfg, 1)
    _, cacher = sg.encode_full(params, cfg, jnp.asarray(ref), cacher)
    got = sg.encode_cached(params, cfg, jnp.asarray(new), cacher,
                           update_ratio=1.0, sim_source="value")
    want, _ = sg.encode_full(params, cfg, jnp.asarray(new),
                             sg.init_cacher_state(cfg, 1))
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)
    a = sg.encode_cached(params, cfg, jnp.asarray(new), cacher,
                         update_ratio=0.25, sim_source="value")
    b = sg.encode_cached(params, cfg, jnp.asarray(new), cacher,
                         update_ratio=0.25, sim_source="key")
    assert not np.allclose(np.asarray(a), np.asarray(b))


def test_onehot_gather_impl_bit_identical(hf_siglip):
    """gather_impl='onehot' replaces every row gather/scatter in the cached
    layer with 0/1 matmuls (MXU path instead of the ~20 GB/s XLA gather on
    TPU).  Every one-hot product is x*1 or x*0 and every cross-term adds an
    exact zero, so outputs must be BIT-IDENTICAL to the index path — in
    f32 and in bf16."""
    _, cfg, params = hf_siglip
    rng = np.random.default_rng(7)
    ref_pix = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    new_pix = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)

    for dt in (jnp.float32, jnp.bfloat16):
        p = jax.tree.map(lambda x: jnp.asarray(x, dt), params)
        cacher = sg.init_cacher_state(cfg, 1, dt)
        _, cacher = sg.encode_full(p, cfg, jnp.asarray(ref_pix, dt), cacher)
        outs = {}
        for impl in ("index", "onehot"):
            outs[impl] = np.asarray(sg.encode_cached(
                p, cfg, jnp.asarray(new_pix, dt), cacher,
                update_ratio=0.25, gather_impl=impl).astype(jnp.float32))
        np.testing.assert_array_equal(outs["index"], outs["onehot"])

    # and through the multi-stream vmapped path
    p = params
    cacher2 = sg.init_cacher_state(cfg, 2)
    pix4 = rng.normal(size=(4, 3, 56, 56)).astype(np.float32)
    _, cacher2 = sg.encode_full(p, cfg, jnp.asarray(pix4), cacher2,
                                n_streams=2)
    a = sg.encode_cached(p, cfg, jnp.asarray(pix4), cacher2,
                         update_ratio=0.25, n_streams=2,
                         gather_impl="index")
    b = sg.encode_cached(p, cfg, jnp.asarray(pix4), cacher2,
                         update_ratio=0.25, n_streams=2,
                         gather_impl="onehot")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


# ---------------------------------------------------------------------------
# K-proxy cacher (low-rank staleness ranking + ref-K logits decomposition)
# ---------------------------------------------------------------------------

def test_kproxy_ratio_one_equals_full(hf_siglip):
    """k_proxy_rank > 0 with update_ratio=1.0: every row is selected, so
    K_scattered == fresh K everywhere and the decomposed logits must equal
    the full path up to f32 rounding (the sketch only RANKS; at ratio 1.0
    the ranking is irrelevant)."""
    _, cfg, params = hf_siglip
    rng = np.random.default_rng(11)
    ref = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    new = rng.normal(size=(2, 3, 56, 56)).astype(np.float32)
    cacher = sg.init_cacher_state(cfg, 1)
    _, cacher = sg.encode_full(params, cfg, jnp.asarray(ref), cacher)
    want, _ = sg.encode_full(params, cfg, jnp.asarray(new),
                             sg.init_cacher_state(cfg, 1))
    for impl in ("index", "onehot"):
        got = sg.encode_cached(params, cfg, jnp.asarray(new), cacher,
                               update_ratio=1.0, gather_impl=impl,
                               k_proxy_rank=16)
        np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                                   rtol=3e-4, atol=3e-4)


def test_kproxy_ranks_clearly_stale_tokens_like_exact_cosine():
    """The JL sketch must rank clearly-changed tokens below unchanged ones
    exactly as the full cosine does: perturb a known patch subset (patches
    map 1:1 to ViT tokens), compare top-k sets of the exact and sketched
    staleness scores."""
    cfg = sg.SiglipConfig.tiny()
    params = sg.init_params(cfg, jax.random.PRNGKey(0))
    rng = np.random.default_rng(3)
    T, C = cfg.num_tokens, cfg.hidden_size
    hn = rng.normal(size=(1, T, C)).astype(np.float32)
    hn_ref = hn.copy()
    stale = np.array([2, 5, 11, 14])
    hn[0, stale] = rng.normal(size=(len(stale), C)).astype(np.float32)

    wk = np.asarray(params["layers"]["wk"][0])
    bk = np.asarray(params["layers"]["bk"][0])
    ref_k = hn_ref @ wk + bk

    def cos(a, b):
        return np.sum(a * b, -1) / (np.linalg.norm(a, axis=-1)
                                    * np.linalg.norm(b, axis=-1) + 1e-8)

    sim_exact = cos(hn @ wk + bk, ref_k)
    R = np.asarray(sg._kproxy_matrix(C, 16, jnp.float32))
    sim_proxy = cos(hn @ (wk @ R) + bk @ R, ref_k @ R)

    top_exact = set(np.argsort(sim_exact[0])[:len(stale)].tolist())
    top_proxy = set(np.argsort(sim_proxy[0])[:len(stale)].tolist())
    assert top_exact == top_proxy == set(stale.tolist())


def test_kproxy_matches_exact_cacher_on_locally_perturbed_chunk():
    """One-layer tower, new chunk == reference chunk except at a few patches:
    both the exact and proxy paths must select exactly the perturbed tokens,
    the non-selected columns' fresh K is bit-equal to the reference K, so the
    proxy's ref-K substitution is exact and the two cached outputs agree to
    rounding."""
    cfg = sg.SiglipConfig(hidden_size=32, num_layers=1, num_heads=4,
                          intermediate_size=64, image_size=56, patch_size=14)
    params = sg.init_params(cfg, jax.random.PRNGKey(1))
    rng = np.random.default_rng(5)
    # the cacher references the LAST frame of the full chunk — tile one base
    # frame so every new frame's unperturbed rows match the reference rows
    base = rng.normal(size=(1, 3, 56, 56)).astype(np.float32)
    ref_pix = np.tile(base, (2, 1, 1, 1))
    new_pix = ref_pix.copy()
    # perturb patch (1,2) and (3,0) -> tokens 6 and 12 on the 4x4 grid
    for (gy, gx) in ((1, 2), (3, 0)):
        new_pix[:, :, gy*14:(gy+1)*14, gx*14:(gx+1)*14] = rng.normal(
            size=(2, 3, 14, 14)).astype(np.float32)

    cacher = sg.init_cacher_state(cfg, 1)
    _, cacher = sg.encode_full(params, cfg, jnp.asarray(ref_pix), cacher)
    ratio = 2 / cfg.num_tokens          # num_update == number perturbed
    exact = sg.encode_cached(params, cfg, jnp.asarray(new_pix), cacher,
                             update_ratio=ratio)
    proxy = sg.encode_cached(params, cfg, jnp.asarray(new_pix), cacher,
                             update_ratio=ratio, k_proxy_rank=16)
    np.testing.assert_allclose(np.asarray(proxy), np.asarray(exact),
                               rtol=2e-5, atol=2e-5)


def test_kproxy_multistream_and_value_sim_paths(hf_siglip):
    """k_proxy through the vmapped multi-stream path (ratio=1.0 == full per
    stream) and a no-op under sim_source='value' (the knob is key-sim only)."""
    _, cfg, params = hf_siglip
    rng = np.random.default_rng(13)
    pix4 = rng.normal(size=(4, 3, 56, 56)).astype(np.float32)
    cacher2 = sg.init_cacher_state(cfg, 2)
    _, cacher2 = sg.encode_full(params, cfg, jnp.asarray(pix4), cacher2,
                                n_streams=2)
    got = sg.encode_cached(params, cfg, jnp.asarray(pix4), cacher2,
                           update_ratio=1.0, n_streams=2, k_proxy_rank=16)
    want, _ = sg.encode_full(params, cfg, jnp.asarray(pix4),
                             sg.init_cacher_state(cfg, 2), n_streams=2)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=3e-4, atol=3e-4)

    a = sg.encode_cached(params, cfg, jnp.asarray(pix4), cacher2,
                         update_ratio=0.25, n_streams=2,
                         sim_source="value", k_proxy_rank=16)
    b = sg.encode_cached(params, cfg, jnp.asarray(pix4), cacher2,
                         update_ratio=0.25, n_streams=2, sim_source="value")
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
