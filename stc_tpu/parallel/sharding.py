"""PartitionSpec layouts for params and streaming state.

Megatron-style tensor parallelism over heads/MLP-hidden; KV state shards by
kv-head on 'tp' and by stream on 'dp'.  GSPMD inserts the psums after wo /
w_down and the partial-sum psum inside retrieval scoring.
"""

from __future__ import annotations

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from stc_tpu.kvcache.state import DecodeKV, StreamKV


def qwen2_param_specs():
    lp = {
        "ln1": P(), "ln2": P(),
        "wq": P(None, None, "tp"), "bq": P(None, "tp"),
        "wk": P(None, None, "tp"), "bk": P(None, "tp"),
        "wv": P(None, None, "tp"), "bv": P(None, "tp"),
        "wo": P(None, "tp", None),
        "w_gate": P(None, None, "tp"),
        "w_up": P(None, None, "tp"),
        "w_down": P(None, "tp", None),
    }
    return {
        "embed": P(),
        "layers": lp,
        "norm_f": P(),
        "lm_head": P(None, "tp"),
    }


def stream_kv_specs() -> StreamKV:
    """Specs for the layer-stacked StreamKV: leaves carry (L, B, ...)."""
    return StreamKV(
        init_k=P(None, "dp", "tp", None, None),
        init_v=P(None, "dp", "tp", None, None),
        block_k=P(None, "dp", "tp", None, None, None),
        block_v=P(None, "dp", "tp", None, None, None),
        block_rep=P(None, "dp", None, "tp", None),
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


def shard_pytree(tree, specs, mesh):
    """device_put every leaf with its NamedSharding (PartitionSpec is a
    pytree leaf, so the two trees align)."""
    return jax.tree.map(
        lambda x, s: jax.device_put(x, NamedSharding(mesh, s)), tree, specs)
