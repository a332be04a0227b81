"""Pipeline-parallel streaming LM prefill (pp axis).

The decoder's per-layer params and StreamKV are already stacked on a leading
layer axis (models/qwen2.py) — pipeline parallelism shards THAT axis over a
'pp' mesh axis: each device holds num_layers/pp contiguous layers plus their
KV pages, and one streaming append flows through the stages as a GPipe-style
microbatch pipeline over the chunk's TOKEN axis.

Why token-axis microbatches are semantically free here: the session's ingest
loop already processes a chunk as sequential exc-sized appends
(runtime/session.py encode_video_features), and append_stream is defined so
that one T-token append equals a sequence of smaller block-multiple appends.
A microbatch is just a smaller append, so pipelining introduces NO
approximation — pp_encode_step is bit-equivalent to running the microbatches
sequentially (tests/test_pp.py asserts this).

Schedule: with M microbatches and P stages, ticks t = 0..M+P-2; stage s
works on microbatch (t - s) when 0 <= t-s < M, else it runs a masked tick
(append_stream's `active=False` path keeps its KV state bit-identical —
the same machinery that powers ragged multi-stream ingest).  Hidden states
hop stages over ICI via lax.ppermute; the last stage's outputs are summed
out with a psum (all other stages contribute zeros).

Bubble fraction is (P-1)/(M+P-1); the streaming regime amortizes it away
because every tick of every stage is also serving the PREVIOUS chunk's
microbatches once chunks are fed back to back.

The reference has no pipeline parallelism at all (SURVEY.md §2.5: DP-only,
plus accelerate's naive device_map layer placement,
video_llava_rekv.py:137) — this is TPU-native beyond-parity scale-out: a
7B's bf16 weights don't fit one v5e chip, and pp divides both the weight
and the KV-page HBM by P with only the (B, Tm, E) activation crossing ICI
per tick.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
from jax.sharding import PartitionSpec as P

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.engine import append_stream, make_rope_cache
from stc_tpu.kvcache.state import StreamKV
from stc_tpu.models.qwen2 import Qwen2Config, _mlp, _proj_out, _qkv, rms_norm


def pp_layer_specs(layers_params) -> dict:
    """PartitionSpec P('pp') on the stacked layer axis for every layer leaf
    (composes with fused/quantized layouts: the layer axis is always 0)."""
    return jax.tree.map(lambda _: P("pp"), layers_params)


def pp_kv_specs() -> StreamKV:
    """StreamKV leaves are (L, B, ...): shard the layer axis over 'pp'."""
    return StreamKV(*([P("pp")] * len(StreamKV._fields)))


def pp_encode_step(
    layers_params,
    cfg: Qwen2Config,
    rekv: ReKVConfig,
    kvs: StreamKV,
    embeds: jax.Array,
    *,
    mesh,
    n_micro: int,
    attn_backend: str = "jnp",
    win_pages: Optional[int] = None,
) -> Tuple[jax.Array, StreamKV]:
    """One streaming append of T tokens, pipelined over mesh axis 'pp'.

    layers_params: params['layers'] with every leaf (L, ...) sharded
    P('pp') on axis 0 (pp_layer_specs).  kvs: stacked StreamKV, leaves
    (L, B, ...) sharded P('pp') (pp_kv_specs).  embeds: (B, T, E) with
    T == n_micro * Tm, Tm a block_size multiple and <= exc_block_size.

    Returns (final hidden states (B, T, E), new StreamKV) — bit-identical
    to n_micro sequential Tm-token encode_step appends.  Layer norms /
    embeddings / lm_head are NOT applied here (this is the layer stack
    only); callers needing logits run them on the output.  Mesh axes other
    than 'pp' stay GSPMD-automatic, so pp composes with the dp/tp specs.
    """
    B, T, E = embeds.shape
    S = rekv.block_size
    assert T % n_micro == 0, (T, n_micro)
    Tm = T // n_micro
    assert Tm % S == 0 and Tm <= rekv.exc_block_size, (Tm, S,
                                                       rekv.exc_block_size)
    pp = mesh.shape["pp"]
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)

    def stage(lp, kv, embeds):
        s = jax.lax.axis_index("pp")
        is_last = s == pp - 1

        def tick(carry, t):
            kv, h_in, out = carry
            mb = t - s                      # microbatch this stage serves
            valid = (mb >= 0) & (mb < n_micro)
            mb_c = jnp.clip(mb, 0, n_micro - 1)
            x0 = jax.lax.dynamic_slice_in_dim(embeds, mb_c * Tm, Tm, axis=1)
            h = jnp.where(s == 0, x0, h_in)
            active = jnp.broadcast_to(valid, (B,))
            # all local layers share counters (they advance in lockstep on
            # valid ticks), so one rope/mask cache serves the local scan —
            # same trick as encode_step, per stage per tick
            rc = make_rope_cache(kv.length[0], kv.num_blocks[0], Tm, rekv,
                                 cfg.head_dim, cfg.rope_base,
                                 n_pages=win_pages,
                                 page_offset=kv.page_offset[0])

            def body(h, xs):
                lp_l, kv_l = xs
                hn = rms_norm(h, lp_l["ln1"], cfg.rms_eps)
                q, k, v = _qkv(lp_l, hn, cfg)
                o, kv_l = append_stream(kv_l, q, k, v, rekv, is_init=False,
                                        rope_base=cfg.rope_base,
                                        rope_cache=rc, backend=attn_backend,
                                        active=active)
                h = h + _proj_out(lp_l, o, cfg)
                hn = rms_norm(h, lp_l["ln2"], cfg.rms_eps)
                h = h + _mlp(lp_l, hn, cfg)
                return h, kv_l

            h_out, kv = jax.lax.scan(body, h, (lp, kv))
            # collect the last stage's finished microbatch
            keep = (is_last & valid)
            out = out.at[mb_c].set(jnp.where(keep, h_out, out[mb_c]))
            # hand the activation to the next stage over ICI
            h_next = jax.lax.ppermute(
                h_out, "pp", perm=[(i, i + 1) for i in range(pp - 1)])
            return (kv, h_next, out), None

        h0 = jnp.zeros((B, Tm, E), embeds.dtype)
        out0 = jnp.zeros((n_micro, B, Tm, E), embeds.dtype)
        (kv, _, out), _ = jax.lax.scan(
            tick, (kv, h0, out0),
            jnp.arange(n_micro + pp - 1, dtype=jnp.int32))
        # only the last stage wrote non-zeros; psum replicates the result
        out = jax.lax.psum(out, "pp")
        h = out.transpose(1, 0, 2, 3).reshape(B, T, E)
        return h, kv

    # zero-size leaves (the 0-width quant-scale arrays when kv_quant='none')
    # cannot carry a mesh sharding — XLA canonicalizes them to replicated,
    # tripping shard_map's out-sharding check.  Pass them pre-shrunk to the
    # per-stage layer count as replicated operands (content is vacuous) and
    # restore the originals afterwards.
    Lloc = cfg.num_layers // pp
    zero_fields = [n for n in kvs._fields if getattr(kvs, n).size == 0]
    kv_in = kvs._replace(**{
        n: jnp.zeros((Lloc,) + getattr(kvs, n).shape[1:],
                     getattr(kvs, n).dtype)
        for n in zero_fields})
    kv_specs = kvs._replace(**{
        n: (P() if getattr(kvs, n).size == 0 else P("pp"))
        for n in kvs._fields})
    lp_specs = pp_layer_specs(layers_params)
    fn = jax.shard_map(stage, mesh=mesh,
                       in_specs=(lp_specs, kv_specs, P()),
                       out_specs=(P(), kv_specs),
                       axis_names={"pp"}, check_vma=False)
    # always route through jit: jax's EAGER shard_map impl path rejects
    # partial-manual specs on multi-axis meshes (its internal unmatch spec
    # names the auto axes too); under an outer jit this nested jit inlines
    fn = jax.jit(fn)
    h, kv_out = fn(layers_params, kv_in, embeds)
    return h, kv_out._replace(**{n: getattr(kvs, n) for n in zero_fields})


def jit_pp_encode_step(layers_params, cfg, rekv, *, mesh, n_micro,
                       attn_backend: str = "jnp",
                       win_pages: Optional[int] = None):
    """A jitted, donated-state closure over the static config (the shape a
    session-level integration would cache, mirroring session._encode_block)."""
    f = functools.partial(pp_encode_step, cfg=cfg, rekv=rekv, mesh=mesh,
                          n_micro=n_micro, attn_backend=attn_backend,
                          win_pages=win_pages)

    @functools.partial(jax.jit, donate_argnames=("kvs",))
    def step(layers_params, kvs, embeds):
        return f(layers_params, kvs=kvs, embeds=embeds)

    return step
