"""PartitionSpec layouts for params and streaming state.

Megatron-style tensor parallelism over heads/MLP-hidden; KV state shards by
kv-head on 'tp' and by stream on 'dp'.  GSPMD inserts the psums after wo /
w_down and the partial-sum psum inside retrieval scoring.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from stc_tpu.kvcache.state import DecodeKV, StreamKV


_LAYER_SPECS = {
    "ln1": P(), "ln2": P(),
    "wq": P(None, None, "tp"), "bq": P(None, "tp"),
    "wk": P(None, None, "tp"), "bk": P(None, "tp"),
    "wv": P(None, None, "tp"), "bv": P(None, "tp"),
    "wo": P(None, "tp", None),
    "w_gate": P(None, None, "tp"),
    "w_up": P(None, None, "tp"),
    "w_down": P(None, "tp", None),
    # fused layouts (fuse_params): the concatenated qkv / gate-up output
    # axis shards evenly over tp; GSPMD reshards around the in-layer split.
    "wqkv": P(None, None, "tp"), "bqkv": P(None, "tp"),
    "w_gateup": P(None, None, "tp"),
    # int8 quantized layouts (quantize_params_int8): weights shard like
    # their bf16 counterparts, per-output-channel scales follow the
    # output axis.
    "wqkv_q": P(None, None, "tp"), "wqkv_s": P(None, "tp"),
    "wo_q": P(None, "tp", None), "wo_s": P(),
    "w_gateup_q": P(None, None, "tp"), "w_gateup_s": P(None, "tp"),
    "w_down_q": P(None, "tp", None), "w_down_s": P(),
    # sub-channel scales (weights_quant='int8_gN'): (L, in/G, out) — the
    # group axis tracks the weight's INPUT axis, so it shards wherever the
    # input axis does (row-parallel wo/w_down); per-shard group counts stay
    # integral because G divides each tp shard of the contraction dim.
    "wqkv_gs": P(None, None, "tp"),
    "wo_gs": P(None, "tp", None),
    "w_gateup_gs": P(None, None, "tp"),
    "w_down_gs": P(None, "tp", None),
}

_TOP_SPECS = {
    "embed": P(), "embed_q": P(), "embed_s": P(),
    "norm_f": P(),
    "lm_head": P(None, "tp"), "lm_head_q": P(None, "tp"),
    "lm_head_s": P("tp"), "lm_head_gs": P(None, "tp"),
}


def qwen2_param_specs(params=None):
    """PartitionSpecs for a qwen2 param tree.

    With no argument: the legacy unfused layout.  Given an actual param tree
    (unfused, fused, or fused+int8-quantized), specs are keyed to the names
    present, so sharding composes with fuse_params / quantize_params_int8.
    """
    if params is None:
        names = ("ln1", "ln2", "wq", "bq", "wk", "bk", "wv", "bv", "wo",
                 "w_gate", "w_up", "w_down")
        return {
            "embed": P(),
            "layers": {n: _LAYER_SPECS[n] for n in names},
            "norm_f": P(),
            "lm_head": P(None, "tp"),
        }
    return {
        k: ({n: _LAYER_SPECS[n] for n in params["layers"]} if k == "layers"
            else _TOP_SPECS[k])
        for k in params
    }


def siglip_param_specs():
    """Megatron-style tp specs for the SigLIP tower (models/siglip.py
    init_params layout): attention projections shard over heads on the
    output axis, the MLP over its hidden axis; GSPMD inserts the psums
    after wo / fc2.  Norms, patch embed, and position embeddings replicate
    (tiny)."""
    col = P(None, None, "tp")   # (L, C, C_out) -> output axis sharded
    colb = P(None, "tp")
    row = P(None, "tp", None)   # (L, C_in, C) -> input axis sharded
    return {
        "patch_w": P(), "patch_b": P(), "pos_embed": P(),
        "layers": {
            "ln1_w": P(), "ln1_b": P(),
            "wq": col, "bq": colb, "wk": col, "bk": colb,
            "wv": col, "bv": colb,
            "wo": row, "bo": P(),
            "ln2_w": P(), "ln2_b": P(),
            "fc1": col, "fc1_b": colb,
            "fc2": row, "fc2_b": P(),
        },
        "post_ln_w": P(), "post_ln_b": P(),
    }


def projector_param_specs():
    """Two-layer GELU projector: column- then row-parallel (one psum)."""
    return {"w1": P(None, "tp"), "b1": P("tp"),
            "w2": P("tp", None), "b2": P()}


def stream_kv_specs() -> StreamKV:
    """Specs for the layer-stacked StreamKV: leaves carry (L, B, ...)."""
    return StreamKV(
        init_k=P(None, "dp", "tp", None, None),
        init_v=P(None, "dp", "tp", None, None),
        block_k=P(None, "dp", "tp", None, None, None),
        block_v=P(None, "dp", "tp", None, None, None),
        block_k_scale=P(None, "dp", "tp", None, None),
        block_v_scale=P(None, "dp", "tp", None, None),
        block_rep=P(None, "dp", None, "tp", None),
        page_keep=P(None, "dp", None, None),
        num_blocks=P(None, "dp"),
        page_offset=P(None, "dp"),
        length=P(None, "dp"),
    )


def decode_kv_specs() -> DecodeKV:
    return DecodeKV(
        k=P(None, "dp", "tp", None, None),
        v=P(None, "dp", "tp", None, None),
        cursor=P(None, "dp"),
    )


def shard_vision_sp(mesh):
    """Specs for SEQUENCE(temporal)-parallel vision chunks: the stream-major
    frame axis (B*F) of a chunk's pixels shards over the combined
    ('dp', 'sp') axes — each dp row holds one stream's frames, sub-split
    across sp — and the cacher reference state stays per-stream on dp (each
    stream's reference frame is read by all of its frames' sp shards; GSPMD
    broadcasts it over sp, which is free: refs are one frame per stream).

    Returns (pixel_spec, cacher_spec).  Inside jit nothing else changes:
    tower/projector/pooling are frame-local so sp needs no collectives, and
    the all-gather of the pruned tokens to the LM's P('dp', None, None)
    embeds rides ICI at the vision->LM boundary (tests/test_sp.py proves
    numerical equality with the unsharded run)."""
    del mesh  # uniform across mesh shapes; kept for call-site symmetry
    return (P(("dp", "sp"), None, None, None),
            P(None, "dp", None, None))


def shard_pytree(tree, specs, mesh):
    """device_put every leaf with its NamedSharding (PartitionSpec is a
    pytree leaf, so the two trees align)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
