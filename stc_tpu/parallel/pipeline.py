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
from stc_tpu.models.qwen2 import (Qwen2Config, _mlp, _proj_out, _qkv,
                                  rms_norm, scan_layers)


def pp_layer_specs(layers_params) -> dict:
    """PartitionSpec P('pp') on the stacked layer axis for every layer leaf
    (composes with fused/quantized layouts: the layer axis is always 0)."""
    return jax.tree.map(lambda _: P("pp"), layers_params)


def pp_kv_specs() -> StreamKV:
    """StreamKV leaves are (L, B, ...): shard the layer axis over 'pp'."""
    return StreamKV(*([P("pp")] * len(StreamKV._fields)))


def _zero_safe_kv(kvs: StreamKV, l_local: int):
    """Zero-size leaves (the 0-width quant-scale arrays when kv_quant='none')
    cannot carry a mesh sharding — XLA canonicalizes them to replicated,
    tripping shard_map's sharding checks.  Returns (kv_in, kv_specs,
    restore): kv_in carries the zero leaves pre-shrunk to the per-stage
    layer count as replicated operands (content is vacuous); restore(out)
    puts the session's originals back."""
    zero_fields = [n for n in kvs._fields if getattr(kvs, n).size == 0]
    kv_in = kvs._replace(**{
        n: jnp.zeros((l_local,) + getattr(kvs, n).shape[1:],
                     getattr(kvs, n).dtype)
        for n in zero_fields})
    kv_specs = kvs._replace(**{
        n: (P() if getattr(kvs, n).size == 0 else P("pp"))
        for n in kvs._fields})

    def restore(kv_out: StreamKV) -> StreamKV:
        return kv_out._replace(**{n: getattr(kvs, n) for n in zero_fields})

    return kv_in, kv_specs, restore


def _pipe(pp: int, s, local_fn, h0, states, *, mask_bubbles: bool = False):
    """Single-microbatch stage relay (the QA-path pipeline schedule).

    Stage `s` applies local_fn(h, states) -> (h, states) at tick t == s and
    the activation hops to the next stage over ICI (ppermute) after every
    tick.  Returns (states, h_final) with h_final REPLICATED across stages
    (psum of the last stage's output), so replicated epilogues (final norm,
    lm_head, argmax) run identically everywhere and keep while_loop control
    flow in lockstep.

    mask_bubbles selects how bubble ticks skip the layer compute:
    - False (pp-only meshes): lax.cond skips it outright — safe because the
      stage-local layer pass contains no collectives.
    - True (meshes with live auto axes, e.g. pp x tp): GSPMD partitioning
      inserts tp all-reduces INSIDE the layer pass; a cond whose predicate
      diverges across pp ranks then sends devices to different collectives
      and deadlocks the communicator (XLA:CPU aborts after a rendezvous
      timeout; real-chip ICI hangs the same way).  Instead every stage runs
      the pass on every tick and discards bubble results with selects, so
      all devices execute an identical collective schedule.  Per-device
      FLOPs rise from L/pp to L per relay — the pp win this path keeps is
      the memory one (weights + KV divide by pp), which is what the QA
      relay is for.
    """
    def tick(carry, t):
        states, h = carry
        if mask_bubbles:
            on = t == s
            h_new, st_new = local_fn(h, states)
            h2 = jnp.where(on, h_new, h)
            states = jax.tree.map(
                lambda a, b: jnp.where(on, a, b) if b.size else b,
                st_new, states)
        else:
            h2, states = jax.lax.cond(
                t == s, lambda a: local_fn(*a), lambda a: a, (h, states))
        h_next = jax.lax.ppermute(
            h2, "pp", perm=[(i, i + 1) for i in range(pp - 1)])
        return (states, h_next), h2

    (states, _), hs = jax.lax.scan(tick, (states, h0),
                                   jnp.arange(pp, dtype=jnp.int32))
    h_fin = jax.lax.psum(
        jnp.where(s == pp - 1, hs[-1], jnp.zeros_like(hs[-1])), "pp")
    return states, h_fin


def _mask_bubbles(mesh) -> bool:
    """True when the mesh carries live non-pp (GSPMD-auto) axes — see
    _pipe's docstring for why bubble ticks must then be masked, not
    branched."""
    return any(int(mesh.shape[n]) > 1 for n in mesh.axis_names if n != "pp")


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
    active: Optional[jax.Array] = None,
) -> Tuple[jax.Array, StreamKV]:
    """One streaming append of T tokens, pipelined over mesh axis 'pp'.

    layers_params: params['layers'] with every leaf (L, ...) sharded
    P('pp') on axis 0 (pp_layer_specs).  kvs: stacked StreamKV, leaves
    (L, B, ...) sharded P('pp') (pp_kv_specs).  embeds: (B, T, E) with
    T == n_micro * Tm, Tm a block_size multiple and <= exc_block_size.
    active: optional (B,) bool RAGGED-ingest mask (combined with the
    schedule's own bubble mask; inactive streams stay bit-identical).

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

    def stage(lp, kv, embeds, user_active):
        s = jax.lax.axis_index("pp")
        is_last = s == pp - 1

        def tick(carry, t):
            kv, h_in, out = carry
            mb = t - s                      # microbatch this stage serves
            valid = (mb >= 0) & (mb < n_micro)
            mb_c = jnp.clip(mb, 0, n_micro - 1)
            x0 = jax.lax.dynamic_slice_in_dim(embeds, mb_c * Tm, Tm, axis=1)
            h = jnp.where(s == 0, x0, h_in)
            active = jnp.broadcast_to(valid, (B,)) & user_active
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

            h_out, kv = scan_layers(body, h, lp, kv)
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

    kv_in, kv_specs, _restore = _zero_safe_kv(kvs, cfg.num_layers // pp)
    lp_specs = pp_layer_specs(layers_params)
    fn = jax.shard_map(stage, mesh=mesh,
                       in_specs=(lp_specs, kv_specs, P(), P()),
                       out_specs=(P(), kv_specs),
                       axis_names={"pp"}, check_vma=False)
    # always route through jit: jax's EAGER shard_map impl path rejects
    # partial-manual specs on multi-axis meshes (its internal unmatch spec
    # names the auto axes too); under an outer jit this nested jit inlines
    fn = jax.jit(fn)
    user_active = (jnp.ones((B,), bool) if active is None
                   else jnp.asarray(active, bool))
    h, kv_out = fn(layers_params, kv_in, embeds, user_active)
    return h, _restore(kv_out)


def jit_pp_encode_step(layers_params, cfg, rekv, *, mesh, n_micro,
                       attn_backend: str = "jnp",
                       win_pages: Optional[int] = None):
    """A jitted, donated-state closure over the static config (the shape a
    session-level integration would cache, mirroring session._encode_block)."""
    f = functools.partial(pp_encode_step, cfg=cfg, rekv=rekv, mesh=mesh,
                          n_micro=n_micro, attn_backend=attn_backend,
                          win_pages=win_pages)

    @functools.partial(jax.jit, donate_argnames=("kvs",))
    def step(layers_params, kvs, embeds, active=None):
        return f(layers_params, kvs=kvs, embeds=embeds, active=active)

    return step


def pp_encode_init(layers_params, cfg: Qwen2Config, rekv: ReKVConfig,
                   kvs: StreamKV, embeds: jax.Array, *, mesh
                   ) -> Tuple[jax.Array, StreamKV]:
    """Init-prompt append (append_stream is_init=True) pipelined over 'pp'.

    embeds: (B, n_init, E).  Bit-equal to qwen2.encode_step(is_init=True);
    each stage captures its local layers' init KV."""
    pp = mesh.shape["pp"]
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    mask = _mask_bubbles(mesh)
    kv_in, kv_specs, restore = _zero_safe_kv(kvs, cfg.num_layers // pp)

    def stage(lp, kv, embeds):
        s = jax.lax.axis_index("pp")

        def body(h, xs):
            lp_l, kv_l = xs
            hn = rms_norm(h, lp_l["ln1"], cfg.rms_eps)
            q, k, v = _qkv(lp_l, hn, cfg)
            o, kv_l = append_stream(kv_l, q, k, v, rekv, is_init=True,
                                    rope_base=cfg.rope_base)
            h = h + _proj_out(lp_l, o, cfg)
            hn = rms_norm(h, lp_l["ln2"], cfg.rms_eps)
            h = h + _mlp(lp_l, hn, cfg)
            return h, kv_l

        def local_fn(h, kv_):
            return scan_layers(body, h, lp, kv_)

        kv, h = _pipe(pp, s, local_fn, embeds, kv, mask_bubbles=mask)
        return h, kv

    fn = jax.shard_map(stage, mesh=mesh,
                       in_specs=(pp_layer_specs(layers_params), kv_specs,
                                 P()),
                       out_specs=(P(), kv_specs),
                       axis_names={"pp"}, check_vma=False)
    h, kv_out = jax.jit(fn)(layers_params, kv_in, embeds)
    return h, restore(kv_out)


def pp_answer_question(params, kvs: StreamKV, q_ids: jax.Array,
                       q_len: jax.Array, p_ids: jax.Array, p_len: jax.Array,
                       stop_ids: jax.Array, max_new_tokens: int, *,
                       cfg: Qwen2Config, rekv: ReKVConfig, mesh,
                       retrieved_indices: Optional[jax.Array] = None):
    """Whole QA under pipeline parallelism, one jitted program: retrieval
    forward + prompt prefill + greedy decode, with every layer pass flowing
    through the pp stage relay (_pipe) and the replicated epilogues (final
    norm, lm_head, token pick) running in lockstep on every stage.

    Per-layer scan bodies are shared with the sequential path
    (models/qwen2.py qa_retrieve_layer_body / decode_layer_body), so the
    answer is numerically the sequential answer_question's.  The DecodeKV
    cache shards on the same layer axis as the weights — per-stage HBM for
    QA state divides by pp.  embed/norm_f/lm_head stay replicated (~2.2 GB
    bf16 at 7B — small next to the 13 GB of layer weights pp divides).

    Signature mirrors qwen2.answer_question (sans spec-decode history:
    greedy only under pp).  Returns (tokens (B, max_new_tokens), count (B,)).
    """
    from stc_tpu.kvcache.engine import init_decode_kv
    from stc_tpu.models.qwen2 import (_lm_head, decode_layer_body,
                                      embed_tokens, qa_retrieve_layer_body)
    pp = mesh.shape["pp"]
    assert cfg.num_layers % pp == 0, (cfg.num_layers, pp)
    mask = _mask_bubbles(mesh)
    Lloc = cfg.num_layers // pp
    B, Tq = q_ids.shape
    Tp = p_ids.shape[1]
    lp = params["layers"]
    top = {k: v for k, v in params.items() if k != "layers"}
    kv_in, kv_specs, _ = _zero_safe_kv(kvs, Lloc)
    ridx_ops = () if retrieved_indices is None else (
        jnp.asarray(retrieved_indices, jnp.int32),)

    def stage(lp, kv, top, q_ids, q_len, p_ids, p_len, stop_ids, *ridx):
        ridx = ridx[0] if ridx else None
        s = jax.lax.axis_index("pp")
        dt = kv.init_k.dtype
        one = init_decode_kv(rekv, B, cfg.num_kv_heads, cfg.head_dim, dt)
        dkv = jax.tree.map(
            lambda x: jnp.broadcast_to(x, (Lloc,) + x.shape).copy(), one)

        # --- retrieval forward (question; KV not kept) ---
        q_valid = jnp.arange(Tq, dtype=jnp.int32)[None, :] < q_len[:, None]
        rbody = qa_retrieve_layer_body(cfg, rekv, q_valid, ridx, Tq)

        def local_ret(h, st):
            kv_, dkv_ = st
            h, dkv_ = scan_layers(rbody, h, lp, dkv_, ro_states=(kv_,))
            return h, (kv_, dkv_)

        (kv, dkv), _ = _pipe(pp, s, local_ret, embed_tokens(top, q_ids),
                             (kv, dkv), mask_bubbles=mask)

        # --- prompt prefill ---
        pbody = decode_layer_body(cfg, rekv, p_len, Tp)

        def local_pre(h, dkv_):
            return scan_layers(pbody, h, lp, dkv_)

        dkv, h_fin = _pipe(pp, s, local_pre, embed_tokens(top, p_ids), dkv,
                           mask_bubbles=mask)
        h_fin = rms_norm(h_fin, top["norm_f"], cfg.rms_eps)
        logits = _lm_head(top, h_fin)
        last = jnp.take_along_axis(logits, (p_len - 1)[:, None, None],
                                   axis=1)[:, 0]

        # --- greedy decode: replicated control flow, piped layer pass ---
        dbody = decode_layer_body(cfg, rekv, jnp.ones((B,), jnp.int32), 1)

        def local_dec(h, dkv_):
            return scan_layers(dbody, h, lp, dkv_)

        def is_stop(tok):
            return jnp.any(tok[:, None] == stop_ids[None, :], axis=1)

        def pick(lg, i):
            _, top2 = jax.lax.top_k(lg, 2)
            tok = top2[:, 0]
            # step 0: never emit a stop token first (reference
            # llava_onevision_rekv.py:127-131)
            tok = jnp.where((i == 0) & is_stop(tok), top2[:, 1], tok)
            return tok.astype(jnp.int32)

        # FIXED trip count (fori_loop, not the sequential path's early-exit
        # while_loop): the loop body carries collectives (ppermute/psum), so
        # every device must execute the same number of rounds — a
        # data-dependent exit deadlocks XLA:CPU's in-process communicator
        # under pp x tp, and on real chips a fixed count also spares the
        # cross-stage predicate sync.  Finished streams are masked, exactly
        # like the sequential loop's `done` gating.
        def body_fn(i, state):
            lg, tokens, done, count, dkv_ = state
            tok = pick(lg, i)
            record = ~done
            tokens = tokens.at[:, i].set(jnp.where(record, tok, 0))
            count = count + record.astype(jnp.int32)
            done = done | is_stop(tok)
            emb = embed_tokens(top, tok[:, None])
            dkv_, h1 = _pipe(pp, s, local_dec, emb, dkv_,
                             mask_bubbles=mask)
            h1 = rms_norm(h1, top["norm_f"], cfg.rms_eps)
            lg_next = _lm_head(top, h1)[:, 0]
            return (lg_next, tokens, done, count, dkv_)

        state = (last, jnp.zeros((B, max_new_tokens), jnp.int32),
                 jnp.zeros((B,), bool), jnp.zeros((B,), jnp.int32), dkv)
        _, tokens, _, count, _ = jax.lax.fori_loop(0, max_new_tokens,
                                                   body_fn, state)
        return tokens, count

    top_specs = jax.tree.map(lambda _: P(), top)
    fn = jax.shard_map(
        stage, mesh=mesh,
        in_specs=(pp_layer_specs(lp), kv_specs, top_specs,
                  P(), P(), P(), P(), P()) + tuple(P() for _ in ridx_ops),
        out_specs=(P(), P()),
        axis_names={"pp"}, check_vma=False)
    return jax.jit(fn)(lp, kv_in, top, q_ids, q_len, p_ids, p_len, stop_ids,
                       *ridx_ops)
