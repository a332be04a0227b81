"""Streaming session runtime — the 4-method plug-and-play API.

TPU-native equivalent of Abstract_ReKV (reference model/abstract_rekv.py:7-87):

    clear_cache() / encode_init_prompt(ids) / encode_video(frames or feats)
    / question_answering(...)

Differences by design:
- All device work happens in a handful of jitted step functions with donated
  state buffers (no per-token python in the hot path beyond the decode loop).
- Video chunks enter as *pruned frame features* (the vision tower + pruner
  produce exactly block_size tokens per frame); a frame_encoder callable can
  be attached to go straight from pixel frames.
- Prompt/question lengths are bucketed to powers of two to bound recompiles.
"""

from __future__ import annotations

import functools
import os
import time
from typing import Callable, List, Optional, Sequence

import jax
import jax.numpy as jnp
import numpy as np

from stc_tpu.config import SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.models.qwen2 import Qwen2Config


def _bucket(n: int, cap: int) -> int:
    b = 8
    while b < n:
        b *= 2
    return min(b, cap)


def _stop_arr(stop_token_ids) -> np.ndarray:
    """Fixed-width stop-token operand (-1 padded) so the decode jits see one
    shape across stop sets."""
    arr = np.full((max(4, len(stop_token_ids)),), -1, np.int32)
    arr[:len(stop_token_ids)] = np.asarray(list(stop_token_ids), np.int32)
    return arr


def _resolve_backend(name: str) -> str:
    """'auto' -> fused Pallas attention on accelerators, jnp on CPU."""
    if name != "auto":
        return name
    return "jnp" if jax.default_backend() == "cpu" else "pallas"


class _ServeRouter:
    """MEASURED-COST routing between the fused serving tick (one dispatch)
    and the unfused encode+QA dispatch pair.

    Structural eligibility says the fused tick CAN run; whether it's FASTER
    is a platform property, not a code property — one merged XLA program
    can schedule/lay out worse than the two programs it replaces (measured
    on the round-3 relay: the fused tick ran 0.84x the pair it fused).  So
    'auto' routes on live measurements: for each dispatch-shape key the
    first 1+N ticks run fused (the first is the compile tick, discarded),
    the next 1+N run unfused, then the winner — min of timed samples, ties
    prefer fused (fewer dispatches) — serves every later tick of that
    shape.  Probe ticks are real serving ticks (both paths are correct);
    only their latency differs, so probing costs nothing but the slower
    arm's samples.

    STC_SERVE_ROUTE=fused|unfused pins the route (tests pin 'fused' to
    exercise the fused tick's structure deterministically; bench.py
    measures both arms explicitly and reports what 'auto' would pick).

    Probe symmetry: each arm discards its first sample at a key (the fused
    arm's is a shape-specialized compile; the unfused arm's jits are shared
    across keys so its index-0 may already be warm — discarding it anyway
    keeps the timed samples steady-state on both sides) and then times
    N_TIME real ticks.  Probe ticks ARE serving ticks, so a larger N_TIME
    costs only the slower arm's extra samples.
    """

    N_TIME = 3

    def __init__(self, mode: str | None = None):
        self.mode = mode or os.environ.get("STC_SERVE_ROUTE", "auto")
        assert self.mode in ("auto", "fused", "unfused"), self.mode
        self._hist: dict = {}
        self.decisions: dict = {}  # key -> "fused"|"unfused" (observability)

    def plan(self, key) -> str:
        if self.mode != "auto":
            return self.mode
        if key in self.decisions:
            return self.decisions[key]
        h = self._hist.setdefault(key, {"fused": [], "unfused": []})
        if len(h["fused"]) < 1 + self.N_TIME:
            return "fused"
        if len(h["unfused"]) < 1 + self.N_TIME:
            return "unfused"
        t_f, t_u = min(h["fused"][1:]), min(h["unfused"][1:])
        self.decisions[key] = "fused" if t_f <= t_u else "unfused"
        return self.decisions[key]

    def record(self, key, fused: bool, dt: float) -> None:
        if self.mode != "auto" or key in self.decisions:
            return
        self._hist.setdefault(key, {"fused": [], "unfused": []})[
            "fused" if fused else "unfused"].append(dt)


class StreamingSession:
    def __init__(
        self,
        params,
        model_cfg: Qwen2Config,
        session_cfg: SessionConfig,
        batch: int = 1,
        state_dtype=jnp.bfloat16,
        frame_encoder: Optional[Callable] = None,
        mesh=None,
    ):
        """mesh: optional jax.sharding.Mesh.  A mesh with a 'pp' axis turns
        on PIPELINE PARALLELISM over the LM's stacked layer axis: weights,
        stream KV pages, and the QA decode cache all shard by layer across
        the 'pp' devices (per-chip HBM divides by pp — a bf16 7B needs >1
        v5e chip), encode appends run the GPipe token-microbatch schedule,
        and QA runs the stage-relay pipeline (parallel/pipeline.py), answers
        numerically equal to the sequential session (tests/test_pp.py).
        Other mesh axes (dp/tp) stay GSPMD-automatic and compose."""
        self.params = qw.fuse_params(params)
        if session_cfg.weights_quant != "none":
            self.params = qw.quantize_params_int8(
                self.params, group_size=session_cfg.weights_quant_group)
        self.mcfg = model_cfg
        self.scfg = session_cfg
        self.rekv = session_cfg.rekv
        self.batch = batch
        self.state_dtype = state_dtype
        self.frame_encoder = frame_encoder
        self.mesh = mesh
        self.pp = (int(mesh.shape["pp"])
                   if mesh is not None and "pp" in mesh.shape else 1)
        self.sp = (int(mesh.shape["sp"])
                   if mesh is not None and "sp" in mesh.shape else 1)
        assert self.pp == 1 or self.sp == 1, (
            "sp (sequence-parallel prefill) composes with dp/tp via GSPMD; "
            "pp runs its own stage-relay schedule — build either a "
            "dp x sp x tp mesh or a pp x tp mesh, not both")
        # fused-vs-unfused serving ticks route on live measurements
        self._serve_router = _ServeRouter()

        # decode_cap > n_local (large topk / small n_local / long decodes)
        # engages decode_attend's complement-window init stage — the
        # reference's len_k > n_local QA branch (rekv_attention.py:401-426);
        # standard configs (decode_cap <= n_local) compile without it.
        # The retrieved buffer itself must still fit the window + init
        # (retrieved blocks the window has slid past are invisible to every
        # query) — the reference asserts the same bound on its global
        # buffer (kv_cache_manager.py:895).
        assert self.rekv.retrieve_len <= self.rekv.n_init + self.rekv.n_local, (
            f"retrieve_len={self.rekv.retrieve_len} exceeds n_init + n_local "
            f"= {self.rekv.n_init + self.rekv.n_local}: retrieved blocks "
            "beyond the local window can never be attended (the reference "
            "asserts the same bound, kv_cache_manager.py:895). Lower topk "
            "or raise n_local.")

        mc, rc = model_cfg, self.rekv
        self.attn_backend = _resolve_backend(
            os.environ.get("STC_ATTN_BACKEND", "auto"))
        if rc.window_kv_compression != "none" and \
                self.attn_backend.startswith("pallas"):
            # the paged Pallas kernel (compiled OR interpret) does not read
            # page keep masks
            self.attn_backend = "jnp"
        # Page-store LAYOUT COMMIT (round-5 #1): on TPU, XLA's while loops
        # prefer a NON-DEFAULT layout for the page store (the page axis
        # hoisted: major_to_minor (0,3,1,2,4,5) at 0.5b shapes) and pay
        # full-store relayout copies at every parameter boundary that
        # disagrees — 4 copies (~1.5 GB each) in the fused serve tick, which
        # made one dispatch SLOWER than the two it replaced (rounds 3-4).
        # Committing kvs buffers in the loop-preferred layout at init
        # removes every copy (measured: fused 715->380 ms class; probe
        # artifact scripts/probe_serve_layout.out.json).  _kvs_fmt is a
        # StreamKV of Formats once committed; every kvs-DONATING jit must
        # then pin its kvs output to the same formats or XLA un-aliases the
        # donation (double-buffers the 3 GB store and relayouts — measured
        # OOM at 0.5b/B=4).  CPU tests and meshed sessions keep defaults.
        self._kvs_fmt = None
        self._build_kv_jits()
        self._qa_retrieve = jax.jit(functools.partial(
            qw.qa_retrieve_step, cfg=mc, rekv=rc), donate_argnames=("dkvs",))
        self._decode = jax.jit(functools.partial(
            qw.decode_step, cfg=mc, rekv=rc), donate_argnames=("dkvs",))
        self._greedy = jax.jit(functools.partial(
            qw.greedy_decode, cfg=mc, rekv=rc),
            static_argnames=("max_new_tokens",), donate_argnames=("dkvs",))
        self._answer = jax.jit(functools.partial(
            qw.answer_question, cfg=mc, rekv=rc),
            static_argnames=("max_new_tokens",))
        self._answer_host = jax.jit(functools.partial(
            qw.answer_question_hosttier, cfg=mc, rekv=rc),
            static_argnames=("max_new_tokens",))

        def _hp_scatter_fn(hp_kv, hp_ids, delta, coords, scales=None):
            # delta: (n, 2, Hkv, S, D); coords: (n, 4) = (layer, b, col, id);
            # scales (n, 2, Hkv, D) present when the host tier is quantized —
            # dequantization happens here, inside the one staging dispatch
            # (packed-int4 deltas cross the link at quarter size and unpack
            # here too)
            li, bi, ci, pi = (coords[:, 0], coords[:, 1], coords[:, 2],
                              coords[:, 3])
            if scales is not None:
                if delta.dtype == jnp.uint8:
                    from stc_tpu.kvcache.engine import _unpack_int4
                    delta = _unpack_int4(delta)
                delta = (delta.astype(jnp.float32)
                         * scales[:, :, :, None, :]).astype(hp_kv.dtype)
            # advanced indices at axes (1, 2, 4) move to the front: the
            # update window is (n, 2, Hkv, S, D) — page-row granular
            hp_kv = hp_kv.at[:, li, bi, :, ci].set(delta)
            hp_ids = hp_ids.at[li, bi, ci].set(pi)
            return hp_kv, hp_ids

        self._hp_scatter = jax.jit(_hp_scatter_fn, donate_argnums=(0, 1))
        # HBM cap for the prefetch table: reset when any (layer, b) table
        # outgrows this many columns (bytes = 2*L*B*Hkv*M*S*D).  This is an
        # INTER-question bound, checked at _qa_hosttier entry: miss rounds
        # within one question may grow past it (bounded by the evicted-page
        # count), and the overshoot is reclaimed at the next question.
        self._hp_cap = max(2 * rc.topk, 64)
        self._embed = jax.jit(qw.embed_tokens)
        self._qa_logits_l = jax.jit(functools.partial(
            qw.qa_layer_logits, cfg=mc, rekv=rc))
        self._qa_attend_l = jax.jit(functools.partial(
            qw.qa_layer_attend, cfg=mc, rekv=rc))
        # observability: per-layer block indices chosen by the last QA
        # (layerwise paths only; the fused hot path keeps them on device)
        self.last_retrieved_indices = None

        if self.pp > 1:
            self._init_pp()
        elif self.sp > 1:
            self._init_sp()

        from stc_tpu.kvcache.engine import n_window_pages
        self._window_pages = n_window_pages(rc)
        # host-tier eviction quantum: a quarter of the store, but never so
        # much that the local window would leave the device
        self._evict_n = min(rc.max_blocks // 4,
                            rc.max_blocks - self._window_pages)

        self.kvs = None
        self.clear_cache()

    # ------------------------------------------------------------------ #
    def _build_kv_jits(self):
        """(Re)build the kvs-donating jits; once _kvs_fmt is set their kvs
        outputs are pinned to the committed formats so donation aliases
        in-place (input layout == output layout) on every tick."""
        mc, rc = self.mcfg, self.rekv
        okv = ({} if self._kvs_fmt is None
               else dict(out_shardings=(None, self._kvs_fmt)))
        self._encode_init = jax.jit(functools.partial(
            qw.encode_step, cfg=mc, rekv=rc, is_init=True),
            donate_argnames=("kvs",), **okv)
        self._encode_block = jax.jit(functools.partial(
            qw.encode_step, cfg=mc, rekv=rc, is_init=False,
            attn_backend=self.attn_backend),
            donate_argnames=("kvs",), **okv)
        for name in ("_serve_jit", "_reset_jit", "_evict_jit"):
            if hasattr(self, name):
                delattr(self, name)  # rebuilt lazily against _kvs_fmt

    def _layout_commit_enabled(self) -> bool:
        mode = os.environ.get("STC_KV_LAYOUT", "auto")
        if mode == "off":
            return False
        if mode == "force":  # tests: exercise the machinery on CPU
            return self.mesh is None
        return self.mesh is None and jax.default_backend() != "cpu"

    def _commit_serve_layout(self, embeds, active, q_ids, q_len, p_ids,
                             p_len, stop_ids, max_new_tokens: int):
        """Learn the MERGED serve program's preferred page-store layout
        (AUTO-layout compile at the tick's real shapes), commit the live
        store into it, and rebuild the donating jits with pinned outputs.

        Only the merged encode+QA program prefers a non-default layout —
        the standalone encode/QA programs are happy with the store's
        natural layout (zero copies), which is why this commit is LAZY at
        the first fused serve tick: streaming/QA-only sessions never pay
        the probe compile or the 3-GB relayout.  One-time cost at first
        serve: the AUTO probe compile plus recompiles of the kv jits
        against the committed layout."""
        from jax.experimental.layout import Format, Layout
        mc, rc = self.mcfg, self.rekv
        kvs_auto = jax.tree.map(lambda _: Format(Layout.AUTO), self.kvs)
        serve_fn = functools.partial(qw.serve_step, cfg=mc, rekv=rc,
                                     attn_backend=self.attn_backend,
                                     max_new_tokens=max_new_tokens)

        def pos(params, kvs, embeds, active, q_ids, q_len, p_ids, p_len,
                stop_ids):
            return serve_fn(params, kvs=kvs, embeds=embeds, active=active,
                            q_ids=q_ids, q_len=q_len, p_ids=p_ids,
                            p_len=p_len, stop_ids=stop_ids)

        probe = jax.jit(pos, in_shardings=(None, kvs_auto) + (None,) * 7,
                        out_shardings=(kvs_auto, None, None),
                        donate_argnums=(1,))
        sds = jax.tree.map(lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype),
                           (embeds, active, q_ids, q_len, p_ids, p_len,
                            stop_ids))
        kvs_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), self.kvs)
        comp = probe.lower(self.params, kvs_sds, *sds).compile()
        self._kvs_fmt = type(self.kvs)(*comp.input_formats[0][1])
        del comp, probe
        self.kvs = jax.device_put(self.kvs, self._kvs_fmt)
        self._build_kv_jits()

    # ------------------------------------------------------------------ #
    def _init_sp(self):
        """SEQUENCE-PARALLEL LM prefill (dp x sp x tp mesh, no 'pp' axis):
        params take the Megatron tp layout, the page store shards by
        stream (dp) and kv-head (tp), and every encode append's TOKEN axis
        shards over 'sp' (_place_embeds).  No collective is hand-written —
        GSPMD keeps each sp shard's queries token-local through QKV,
        windowed attention, and the MLP, and all-gathers only the chunk's
        NEW K/V rows (T x Hkv x D, tiny next to the window) over ICI at
        the store write.  The reference has no sequence parallelism of any
        kind (SURVEY.md §2.5); vision-side sp (parallel/sharding.
        shard_vision_sp) composes on the same mesh.  Numerical equality
        with the sequential session: tests/test_sp.py."""
        from stc_tpu.parallel.sharding import (qwen2_param_specs,
                                               shard_pytree)
        mesh, mc, rc = self.mesh, self.mcfg, self.rekv
        assert "dp" in mesh.shape and "tp" in mesh.shape, (
            "sp sessions want the make_mesh(dp, tp, sp) axis set; got "
            f"{tuple(mesh.shape)}")
        assert self.batch % int(mesh.shape["dp"]) == 0, (
            self.batch, dict(mesh.shape))
        assert mc.num_kv_heads % int(mesh.shape["tp"]) == 0, (
            mc.num_kv_heads, dict(mesh.shape))
        self.params = shard_pytree(self.params,
                                   qwen2_param_specs(self.params), mesh)

    def _place_embeds(self, feats):
        """Shard an encode append's (B, T, E) embeds over the sp mesh:
        tokens over 'sp' when T divides evenly (exc-sized chunks by
        construction), streams over 'dp' always.  Identity off-mesh."""
        if self.sp == 1:
            return feats
        from jax.sharding import NamedSharding, PartitionSpec as P
        spec = (P("dp", "sp", None) if feats.shape[1] % self.sp == 0
                else P("dp", None, None))
        return jax.device_put(feats, NamedSharding(self.mesh, spec))

    def _place_kvs_sp(self, kvs):
        from stc_tpu.parallel.sharding import shard_pytree, stream_kv_specs
        return shard_pytree(kvs, stream_kv_specs(), self.mesh)

    # ------------------------------------------------------------------ #
    def _init_pp(self):
        """Pipeline-parallel wiring: place params/state on the 'pp' mesh
        axis and swap the three hot jits (init append, streaming append,
        fused QA) for their stage-relay pipelines.  Fallback paths that are
        not pp-wired fail fast with a clear message (host tier) or run via
        GSPMD resharding (external-indices / layerwise QA — correct, not
        pipelined)."""
        from jax.sharding import NamedSharding, PartitionSpec as P
        from stc_tpu.parallel import pipeline as pl
        mesh, mc, rc = self.mesh, self.mcfg, self.rekv
        assert mc.num_layers % self.pp == 0, (mc.num_layers, self.pp)
        assert rc.spec_decode_draft == 0, (
            "speculative decode is not supported under pp (greedy only)")
        # layer leaves shard P('pp') on the stacked axis 0 (composes with
        # fused/quantized layouts); embed/norm/lm_head replicate (~2.2 GB
        # bf16 at 7B — small next to the layer weights pp divides)
        lspecs = pl.pp_layer_specs(self.params["layers"])
        specs = {k: (lspecs if k == "layers"
                     else jax.tree.map(lambda _: P(), v))
                 for k, v in self.params.items()}
        self.params = jax.tree.map(
            lambda x, s: jax.device_put(x, NamedSharding(mesh, s)),
            self.params, specs)

        @functools.partial(jax.jit, donate_argnames=("kvs",))
        def enc_init(params, kvs, embeds):
            return pl.pp_encode_init(params["layers"], mc, rc, kvs, embeds,
                                     mesh=mesh)

        self._encode_init = enc_init
        self._pp_enc_jits = {}

        def enc_block(params, kvs, embeds, active=None):
            # whole multi-chunk arrays pipeline as GPipe microbatches; a
            # single exc chunk (the streaming tick) is one microbatch
            T = embeds.shape[1]
            exc = rc.exc_block_size
            n_micro = T // exc if (T > exc and T % exc == 0) else 1
            key = (n_micro, T, active is not None)
            if key not in self._pp_enc_jits:
                f = functools.partial(pl.pp_encode_step, cfg=mc, rekv=rc,
                                      mesh=mesh, n_micro=n_micro,
                                      attn_backend=self.attn_backend)
                if active is None:
                    def wrapped(params, kvs, embeds):
                        return f(params["layers"], kvs=kvs, embeds=embeds)
                else:
                    def wrapped(params, kvs, embeds, active):
                        return f(params["layers"], kvs=kvs, embeds=embeds,
                                 active=active)
                self._pp_enc_jits[key] = jax.jit(
                    wrapped, donate_argnames=("kvs",))
            kw = {} if active is None else {"active": active}
            return self._pp_enc_jits[key](params, kvs=kvs, embeds=embeds,
                                          **kw)

        self._encode_block = enc_block
        self._answer = jax.jit(functools.partial(
            pl.pp_answer_question, cfg=mc, rekv=rc, mesh=mesh),
            static_argnames=("max_new_tokens",))

    def _place_kvs_pp(self, kvs):
        from jax.sharding import NamedSharding
        from stc_tpu.parallel.pipeline import pp_kv_specs
        specs = pp_kv_specs()
        return jax.tree.map(
            lambda x, s: (jax.device_put(x, NamedSharding(self.mesh, s))
                          if x.size else x), kvs, specs)

    def clear_cache(self):
        from stc_tpu.kvcache.host_tier import HostBlockStore
        self.kvs = qw.init_stream_state(self.mcfg, self.rekv, self.batch,
                                        self.state_dtype)
        if self.pp > 1:
            self.kvs = self._place_kvs_pp(self.kvs)
        elif self.sp > 1:
            self.kvs = self._place_kvs_sp(self.kvs)
        elif self._kvs_fmt is not None:
            # a serving session that already committed keeps the serve-
            # preferred layout across clear_cache (its jits are pinned to it)
            self.kvs = jax.device_put(self.kvs, self._kvs_fmt)
        self.host_store = HostBlockStore()
        self.hp_reset()
        self._total_blocks = 0
        self._init_len = 0  # n_init once the init prompt is encoded
        # per-stream block counts for RAGGED ingest (encode_video* active=
        # masks); _total_blocks stays the max — every capacity check is
        # conservative over the longest stream
        self._stream_blocks = np.zeros(self.batch, dtype=np.int64)
        self._ragged = False
        self._evicted_pages = 0
        # cross-question speculative-draft history (ReKVConfig.
        # spec_history_tokens recent question+prompt+answer tokens per
        # stream) — draft material only, never affects answers
        H = self.rekv.spec_history_tokens if self.rekv.spec_decode_draft \
            else 0
        self._qa_hist = np.zeros((self.batch, H), dtype=np.int32)
        self._qa_hist_len = np.zeros(self.batch, dtype=np.int32)
        self._pruner_state = None  # reset by the vision pipeline if attached
        if self.frame_encoder is not None and hasattr(self.frame_encoder,
                                                      "reset"):
            self.frame_encoder.reset()

    # ------------------------------------------------------------------ #
    def _maybe_evict(self, incoming_blocks: int):
        """Offload the oldest device pages to host RAM before they would
        overflow the store (reference MemoryUnit CPU offload).

        Every ingest path (feature and pixel alike) funnels through this
        before touching the device state, so the rep-capacity fail-fast
        lives here: no path can silently stream past rep_cap (round-2
        verdict: the pixel path bypassed the guard)."""
        self._check_rep_capacity(incoming_blocks)
        rc = self.rekv
        from stc_tpu.kvcache.host_tier import evict_pages
        if self.pp > 1 and (self._total_blocks - self._evicted_pages
                            + incoming_blocks > rc.max_blocks):
            raise RuntimeError(
                "host-tier eviction is not supported under pipeline "
                "parallelism: the two-tier QA paths are not pp-wired. "
                "Raise max_blocks instead — the page store's per-chip HBM "
                f"already divides by pp={self.pp}.")
        while (self._total_blocks - self._evicted_pages
               + incoming_blocks > rc.max_blocks):
            if self._ragged and np.ptp(self._stream_blocks) > 0:
                raise RuntimeError(
                    "host-tier eviction with DIVERGED ragged streams is not "
                    "supported: evict_pages shifts every stream's page ring "
                    "uniformly, which would evict unwritten slots of the "
                    f"shorter streams (per-stream blocks: "
                    f"{self._stream_blocks.tolist()}). Raise max_blocks to "
                    "cover the longest stream, or keep ragged streams "
                    "within device capacity.")
            resident = self._total_blocks - self._evicted_pages
            E = self._evict_n
            assert E > 0 and resident - E >= self._window_pages, (
                "max_blocks too small for host-tier eviction margins")
            if self._kvs_fmt is not None:
                # committed-layout store: pin the shifted store's output
                # layout or the donation un-aliases and the next tick's
                # jits see a default-layout store (recompile thrash)
                if not hasattr(self, "_evict_jit"):
                    self._evict_jit = jax.jit(
                        evict_pages.__wrapped__,
                        static_argnames=("n_evict",), donate_argnums=(0,),
                        out_shardings=(None, None, None, None,
                                       self._kvs_fmt))
                ev_k, ev_v, ev_ks, ev_vs, self.kvs = self._evict_jit(
                    self.kvs, E)
            else:
                ev_k, ev_v, ev_ks, ev_vs, self.kvs = evict_pages(self.kvs, E)
            if rc.kv_quant != "none":
                # device pages are already int8 (or packed-int4) + scales:
                # the D2H copy is compressed with zero extra work (host tier
                # stores the same representation; host_kv_quant is implied)
                self.host_store.append(np.asarray(ev_k), np.asarray(ev_v),
                                       np.asarray(ev_ks), np.asarray(ev_vs))
            elif rc.host_kv_quant in ("int8", "int4"):
                # quantize ON DEVICE so the D2H copy is already compressed
                # (int8 half-size; int4 packed nibbles quarter-size)
                from stc_tpu.kvcache.host_tier import (quantize_pages,
                                                       quantize_pages_int4)
                qfn = (quantize_pages_int4 if rc.host_kv_quant == "int4"
                       else quantize_pages)
                kq, ks, vq, vs = qfn(ev_k, ev_v)
                self.host_store.append(np.asarray(kq), np.asarray(vq),
                                       np.asarray(ks), np.asarray(vs))
            else:
                self.host_store.append(np.asarray(ev_k), np.asarray(ev_v))
            self._evicted_pages += E

    def _ensure_ragged(self):
        """Adopt the scalar history as uniform per-stream counters (covers
        states fast-forwarded by tests/benches via _total_blocks)."""
        if not self._ragged:
            self._stream_blocks[:] = self._total_blocks
            self._ragged = True

    def _track_blocks(self, n: int, active=None):
        if active is None:
            self._total_blocks += n
            self._stream_blocks += n
            return
        self._ensure_ragged()
        self._stream_blocks += n * np.asarray(active, dtype=np.int64)
        self._total_blocks = int(self._stream_blocks.max())

    def _normalize_active(self, active):
        """-> (jnp bool (B,) or None, np bool (B,) or None); all-True
        masks collapse to None (the uniform fast path)."""
        if active is None:
            return None, None
        a = np.asarray(active, dtype=bool).reshape(-1)
        assert a.shape == (self.batch,), (a.shape, self.batch)
        if a.all():
            return None, None
        return jnp.asarray(a), a

    def _check_rep_capacity(self, incoming_blocks: int):
        """The rep array scores the FULL block history (host tier included);
        past rep_cap new blocks would silently overwrite the last rep slot
        and become unretrievable (engine.append_stream clamps the slot).
        Fail fast instead — size max_rep_blocks to the stream length."""
        rc = self.rekv
        if self._total_blocks + incoming_blocks > rc.rep_cap:
            raise RuntimeError(
                f"stream exceeds rep-key capacity: {self._total_blocks} + "
                f"{incoming_blocks} blocks > rep_cap={rc.rep_cap}. Set "
                "ReKVConfig.max_rep_blocks to at least the total number of "
                "frames in the stream (rep keys cost Hkv*D per block, "
                "~1/block_size of the page bytes, so large caps are cheap); "
                "the host tier keeps full-history retrieval only up to "
                "rep_cap blocks.")

    def encode_init_prompt(self, init_prompt_ids: Sequence[int]):
        ids = np.asarray(init_prompt_ids, dtype=np.int32).reshape(1, -1)
        ids = np.broadcast_to(ids, (self.batch, ids.shape[1]))
        assert ids.shape[1] == self.rekv.n_init, (
            f"init prompt must be exactly n_init={self.rekv.n_init} tokens, "
            f"got {ids.shape[1]} (set ReKVConfig.n_init from the tokenizer)")
        embeds = self._embed(self.params, jnp.asarray(ids))
        _, self.kvs = self._encode_init(self.params, kvs=self.kvs,
                                        embeds=embeds)
        self._init_len = self.rekv.n_init

    def encode_video_features(self, feats, active=None):
        """feats: (B, n_frames*block_size, E) pruned visual features.

        active: optional (B,) bool RAGGED-ingest mask — streams at different
        positions/rates batched into the same dispatches; inactive streams'
        rows are ignored and their cache state stays bit-identical (the
        serving shape the reference's one-session-per-process DP cannot
        express).  Ragged streams must stay within device capacity once
        their lengths diverge (host-tier eviction shifts all streams
        uniformly — _maybe_evict raises otherwise)."""
        feats = jnp.asarray(feats, qw.param_dtype(self.params))
        B, T, E = feats.shape
        S = self.rekv.block_size
        exc = self.rekv.exc_block_size
        assert T % S == 0, (T, S)
        act_dev, act_np = self._normalize_active(active)
        self._check_rep_capacity(T // S)
        if self.pp > 1 and T > exc and T % exc == 0:
            # pipeline parallelism: the whole array rides ONE dispatch as
            # T/exc GPipe microbatches (bubble (pp-1)/(n_micro+pp-1)
            # instead of (pp-1)/pp per exc chunk)
            self._maybe_evict(T // S)
            kw = {} if act_dev is None else {"active": act_dev}
            _, self.kvs = self._encode_block(self.params, kvs=self.kvs,
                                             embeds=feats, **kw)
            self._track_blocks(T // S, active=act_np)
            return
        # exc_block_size tokens per attention dispatch (multi-page appends);
        # the tail chunk compiles once at its own (block-multiple) shape
        for i in range(0, T, exc):
            n = min(exc, T - i) // S
            self._maybe_evict(n)
            chunk = self._place_embeds(feats[:, i:i + n * S])
            if act_dev is None:
                _, self.kvs = self._encode_block(
                    self.params, kvs=self.kvs, embeds=chunk)
            else:
                _, self.kvs = self._encode_block(
                    self.params, kvs=self.kvs, embeds=chunk,
                    active=act_dev)
            self._track_blocks(n, active=act_np)

    def encode_video(self, frames):
        """frames: (n_frames, H, W, 3) uint8.  On a bare StreamingSession
        this needs an attached frame_encoder; VLMSession overrides it with
        the fused vision+LM path."""
        assert self.frame_encoder is not None, "no frame_encoder attached"
        feats = self.frame_encoder(frames)
        self.encode_video_features(feats)

    # ------------------------------------------------------------------ #
    def question_answering(
        self,
        question_ids: Sequence[int],
        prompt_ids: Sequence[int],
        stop_token_ids: Sequence[int],
        max_new_tokens: int = 128,
        retrieved_indices: Optional[Sequence[int]] = None,
        all_streams: bool = False,
    ) -> List[int]:
        """Retrieve with `question_ids`, then greedy-decode from `prompt_ids`.

        Replicates the reference QA loop (llava_onevision_rekv.py:71-152)
        including the anti-EOS-at-step-0 top-2 fallback (:127-131).
        retrieved_indices: optional external block indices (reference
        external-retrieval path); padded/truncated to topk.
        all_streams: with batch > 1, return one token list per stream
        instead of stream 0's (the question is shared; retrieval and the
        answer are per-stream).
        """
        B = self.batch
        q_ids, q_len = self._pad_ids([question_ids] * B)
        p_ids, p_len = self._pad_ids([prompt_ids] * B)
        tokens, count = self._qa_run(q_ids, q_len, p_ids, p_len,
                                     stop_token_ids, max_new_tokens,
                                     retrieved_indices)
        if all_streams:
            return [[int(t) for t in tokens[b, :int(count[b])]]
                    for b in range(B)]
        return [int(t) for t in tokens[0, :int(count[0])]]

    def question_answering_batch(
        self,
        questions: Sequence[Sequence[int]],
        prompts: Sequence[Sequence[int]],
        stop_token_ids: Sequence[int],
        max_new_tokens: int = 128,
        retrieved_indices: Optional[Sequence[int]] = None,
        asked=None,
    ) -> List[List[int]]:
        """PER-STREAM questions in one batched QA: `questions[b]`/`prompts[b]`
        may differ per stream in content and length (right-padded to a shared
        bucket; retrieval, prefill-logit gather, and greedy stopping are all
        per-stream already).  The serving shape for multiplexed sessions —
        the reference answers one question per process.  Returns one token
        list per stream."""
        assert len(questions) == self.batch and len(prompts) == self.batch
        q_ids, q_len = self._pad_ids(questions)
        p_ids, p_len = self._pad_ids(prompts)
        tokens, count = self._qa_run(q_ids, q_len, p_ids, p_len,
                                     stop_token_ids, max_new_tokens,
                                     retrieved_indices, hist_rows=asked)
        return [[int(t) for t in tokens[b, :int(count[b])]]
                for b in range(self.batch)]

    def serve(self, feats, active, questions, prompts, stop_token_ids,
              max_new_tokens: int = 128, asked=None):
        """PHASE-HETEROGENEOUS serving tick: ragged-encode `feats` into the
        `active` streams AND answer per-stream `questions` — in ONE dispatch
        on the device-resident hot path (mean_dot scorer, nothing evicted,
        one exc chunk).  Streams may encode, answer, both (the answer sees
        this tick's chunk), or neither; continuous batching the reference's
        one-session-per-process loop cannot express.

        feats: (B, T, E) pruned features (inactive rows ignored — zeros ok).
        active: (B,) bool or None (all encode).  questions/prompts: B token
        sequences (dummy entries for streams not asking; their output rows
        are still computed — SPMD-dense — and must be ignored by the caller).
        asked: (B,) bool or None — with dummy question rows AND
        spec_history_tokens on, pass the real-question mask so placeholder
        rows don't pollute the per-stream draft history (the ServingEngine
        always does).
        Returns (tokens (B, M) np, count (B,) np).
        Falls back to encode + QA dispatches on the host-tier/ablation paths.
        """
        feats = self._place_embeds(
            jnp.asarray(feats, qw.param_dtype(self.params)))
        B, T, E = feats.shape
        rc = self.rekv
        S = rc.block_size
        assert T % S == 0, (T, S)
        n = T // S
        act_dev, act_np = self._normalize_active(active)
        q_ids, q_len = self._pad_ids(questions)
        p_ids, p_len = self._pad_ids(prompts)
        eligible = (T <= rc.exc_block_size
                    and rc.retrieval_scorer == "mean_dot"
                    and self._evicted_pages == 0
                    and self.pp == 1  # serve_step is not pp-wired; pp ticks
                                      # run encode + QA pipelines separately
                    and self._total_blocks + n - self._evicted_pages
                    <= rc.max_blocks)
        key = ("feat", T, q_ids.shape[1], p_ids.shape[1], max_new_tokens)
        fused = (eligible
                 and self._serve_router.plan(key) == "fused")
        self.last_serve_fused = fused  # observability (ServingEngine stats)
        if not fused:
            t0 = time.perf_counter()
            self.encode_video_features(feats, active=act_np)
            out = self._qa_run(q_ids, q_len, p_ids, p_len, stop_token_ids,
                               max_new_tokens, hist_rows=asked)
            if eligible:  # a routed (not structural) unfused tick: sample it
                self._serve_router.record(key, False,
                                          time.perf_counter() - t0)
            return out
        self._maybe_evict(n)  # rep-capacity fail-fast (never evicts here)
        stop_arr = _stop_arr(stop_token_ids)
        mask = (jnp.ones((B,), bool) if act_dev is None else act_dev)
        if self._kvs_fmt is None and self._layout_commit_enabled():
            # first fused tick: commit the store into the merged program's
            # preferred layout (kills its 4 full-store relayout copies —
            # measured 565 -> 380 ms at 0.5b/B=4, probe_serve_layout.out)
            self._commit_serve_layout(
                jnp.asarray(feats), mask, jnp.asarray(q_ids),
                jnp.asarray(q_len, jnp.int32), jnp.asarray(p_ids),
                jnp.asarray(p_len, jnp.int32), jnp.asarray(stop_arr),
                max_new_tokens)
        if not hasattr(self, "_serve_jit"):
            okv = ({} if self._kvs_fmt is None
                   else dict(out_shardings=(self._kvs_fmt, None, None)))
            self._serve_jit = jax.jit(functools.partial(
                qw.serve_step, cfg=self.mcfg, rekv=rc,
                attn_backend=self.attn_backend),
                static_argnames=("max_new_tokens",),
                donate_argnames=("kvs",), **okv)
        t0 = time.perf_counter()
        self.kvs, tokens, count = self._serve_jit(
            self.params, kvs=self.kvs, embeds=feats, active=mask,
            q_ids=jnp.asarray(q_ids), q_len=jnp.asarray(q_len, jnp.int32),
            p_ids=jnp.asarray(p_ids), p_len=jnp.asarray(p_len, jnp.int32),
            stop_ids=jnp.asarray(stop_arr), max_new_tokens=max_new_tokens,
            **self._hist_kw())
        self._track_blocks(n, active=act_np)
        tokens, count = np.asarray(tokens), np.asarray(count)
        self._serve_router.record(key, True, time.perf_counter() - t0)
        self._hist_append(q_ids, q_len, p_ids, p_len, tokens, count,
                          rows=asked)
        return tokens, count

    def reset_streams(self, slots: Sequence[int]):
        """Recycle stream slots: return each slot in `slots` to its
        just-after-init-prompt state while the OTHER slots' streams continue
        untouched — the retirement/admission half of continuous batching
        (a video ends, its slot serves the next incoming stream).  The
        reference tears down one process per stream; here a recycled slot is
        answer-identical to a fresh session (engine.reset_streams zeroes the
        counters/rep keys; stale page data is unreachable by construction).

        Slots keep the session-wide init/system prompt (init KV is identical
        across slots).  Not supported once pages were evicted to the host
        tier: eviction shifts every stream's ring uniformly, so per-slot
        history cannot be unwound (same restriction as diverged-ragged
        eviction)."""
        mask = np.zeros(self.batch, dtype=bool)
        mask[list(slots)] = True
        assert mask.any()
        if self._evicted_pages > 0:
            raise RuntimeError(
                "reset_streams with host-evicted pages is not supported: "
                "the host tier's page ring is shared across streams. "
                "clear_cache() the whole session, or size max_blocks to "
                "keep serving sessions device-resident.")
        if not hasattr(self, "_reset_jit"):
            from stc_tpu.kvcache.engine import reset_streams as _rs
            okv = ({} if self._kvs_fmt is None
                   else dict(out_shardings=self._kvs_fmt))
            self._reset_jit = jax.jit(
                functools.partial(_rs, batch_axis=1),
                donate_argnames=("kv",), **okv)
        self.kvs = self._reset_jit(kv=self.kvs, reset=jnp.asarray(mask),
                                   init_len=jnp.int32(self._init_len))
        self._ensure_ragged()
        self._stream_blocks[mask] = 0
        self._total_blocks = int(self._stream_blocks.max())
        # a recycled slot must not draft from the previous tenant's QAs
        self._qa_hist[mask] = 0
        self._qa_hist_len[mask] = 0

    def set_spec_decode(self, draft: int, history_tokens: int | None = None):
        """Toggle prompt-lookup SPECULATIVE DECODING at runtime without
        touching stream state: swap the QA programs (answers are
        bit-identical to greedy either way, so a server can flip this on
        the live session — e.g. enable drafting once a stream enters the
        repeat-question regime, or disable it to halve QA memory).

        draft: drafts per round (0 = plain greedy).  history_tokens:
        cross-question draft-history size (None keeps the config value).
        The draft-history ring is resized to match; it only ever feeds
        draft PROPOSALS, so resizing never changes answers."""
        import dataclasses
        if self.pp > 1 and draft > 0:
            raise ValueError("speculative decode is not supported under pp")
        kw = dict(spec_decode_draft=draft)
        if history_tokens is not None:
            kw["spec_history_tokens"] = history_tokens
        self.rekv = rc = dataclasses.replace(self.rekv, **kw)
        self.scfg = dataclasses.replace(self.scfg, rekv=rc)
        mc = self.mcfg
        # rebuild the programs that bake the draft schedule in; the streaming
        # encode path is untouched.  Under pp the QA programs are the
        # stage-relay pipelines installed by _init_pp — draft is always 0
        # there (asserted above), so the rekv swap is a no-op for them and
        # rebuilding would CLOBBER the pp _answer with the sequential
        # answer_question (whose signature lacks retrieved_indices=, breaking
        # the pp external-retrieval branch).  Only the history ring below
        # applies under pp.
        if self.pp == 1:
            self._greedy = jax.jit(functools.partial(
                qw.greedy_decode, cfg=mc, rekv=rc),
                static_argnames=("max_new_tokens",), donate_argnames=("dkvs",))
            self._answer = jax.jit(functools.partial(
                qw.answer_question, cfg=mc, rekv=rc),
                static_argnames=("max_new_tokens",))
            self._answer_host = jax.jit(functools.partial(
                qw.answer_question_hosttier, cfg=mc, rekv=rc),
                static_argnames=("max_new_tokens",))
            if hasattr(self, "_serve_jit"):
                del self._serve_jit  # rebuilt lazily against the new rekv
        H = rc.spec_history_tokens if draft else 0
        if H != self._qa_hist.shape[1]:
            old, old_len = self._qa_hist, self._qa_hist_len
            self._qa_hist = np.zeros((self.batch, H), dtype=np.int32)
            self._qa_hist_len = np.zeros(self.batch, dtype=np.int32)
            keep = min(H, old.shape[1])
            if keep:  # most recent draft material survives a resize
                for b in range(self.batch):
                    L = min(int(old_len[b]), keep)
                    self._qa_hist[b, :L] = old[b, int(old_len[b]) - L:
                                               int(old_len[b])]
                    self._qa_hist_len[b] = L

    def _hist_kw(self):
        """Speculative-draft history operands for the QA jits ({} when the
        cross-question history is off)."""
        if self._qa_hist.shape[1] == 0:
            return {}
        return dict(hist_ids=jnp.asarray(self._qa_hist),
                    hist_len=jnp.asarray(self._qa_hist_len))

    def _hist_append(self, q_ids, q_len, p_ids, p_len, tokens, count,
                     rows=None):
        """Record this QA's question+prompt+answer tokens per stream into
        the draft-history ring (most recent kept).  rows: optional per-
        stream mask — serving ticks record only the slots that really asked
        (dummy rows must not pollute the draft material)."""
        H = self._qa_hist.shape[1]
        if H == 0:
            return
        q_len, p_len = np.asarray(q_len), np.asarray(p_len)
        for b in range(self.batch):
            if rows is not None and not rows[b]:
                continue
            seq = np.concatenate([
                np.asarray(q_ids[b, :q_len[b]], np.int32),
                np.asarray(p_ids[b, :p_len[b]], np.int32),
                np.asarray(tokens[b, :int(count[b])], np.int32)])[-H:]
            n, L = len(seq), int(self._qa_hist_len[b])
            if L + n > H:
                shift = L + n - H
                self._qa_hist[b, :L - shift] = self._qa_hist[b, shift:L]
                L -= shift
            self._qa_hist[b, L:L + n] = seq
            self._qa_hist_len[b] = L + n

    def _pad_ids(self, seqs):
        """Right-pad B token sequences to a shared power-of-two bucket.
        -> ((B, bucket) int32, (B,) int32 true lengths)."""
        lens = np.asarray([len(s) for s in seqs], np.int32)
        b = _bucket(int(lens.max()), self.rekv.max_prompt_tokens)
        assert int(lens.max()) <= b, (lens, self.rekv.max_prompt_tokens)
        arr = np.zeros((self.batch, b), dtype=np.int32)
        for i, s in enumerate(seqs):
            arr[i, :len(s)] = np.asarray(list(s), dtype=np.int32)
        return arr, lens

    def _qa_run(self, q_ids, q_len, p_ids, p_len, stop_token_ids,
                max_new_tokens: int, retrieved_indices=None,
                hist_rows=None):
        """Shared QA core over padded id arrays: picks the fused, host-tier,
        external-indices, or layerwise-scorer path.  Returns (tokens (B, M)
        np, count (B,) np)."""
        rc = self.rekv
        B = self.batch

        ext_idx = None
        if retrieved_indices is not None:
            arr = np.full((B, rc.topk), -1, dtype=np.int32)
            ids = list(retrieved_indices)[: rc.topk]
            arr[:, :len(ids)] = np.asarray(ids, dtype=np.int32)
            ext_idx = jnp.asarray(arr)

        stop_arr = _stop_arr(stop_token_ids)

        q_len_np = np.asarray(q_len)
        q_len = jnp.asarray(q_len, jnp.int32)
        p_len_j = jnp.asarray(p_len, jnp.int32)

        def ctx_kw():
            # lookup history for the layerwise/ext-idx _greedy calls only:
            # the fused and host-tier paths build it INSIDE their own jits
            # (building it here would cost un-jitted dispatches per question)
            if rc.spec_decode_draft == 0:
                return {}
            hk = self._hist_kw()
            c_ids, c_len = qw.build_spec_ctx(
                jnp.asarray(q_ids), q_len, jnp.asarray(p_ids), p_len_j,
                max_new_tokens, hk.get("hist_ids"), hk.get("hist_len"))
            return dict(ctx_ids=c_ids, ctx_len=c_len)

        if rc.retrieval_scorer != "mean_dot" and ext_idx is None:
            # layer-by-layer retrieval with host work between dispatches:
            # the host-side ablation scorers (aks/dpc_knn/l2norm) pick blocks
            # between per-layer dispatches; host-tier pages are fetched the
            # same way.
            dkvs = self._qa_retrieve_layerwise(q_ids, q_len)
            logits, dkvs = self._decode(
                self.params, dkvs=dkvs,
                embeds=self._embed(self.params, jnp.asarray(p_ids)),
                n_tokens=p_len_j)
            last = jnp.take_along_axis(
                logits, jnp.asarray(p_len - 1)[:, None, None], axis=1)[:, 0]
            tokens, count, dkvs = self._greedy(
                self.params, dkvs=dkvs, last_logits=last,
                stop_ids=jnp.asarray(stop_arr), max_new_tokens=max_new_tokens,
                **ctx_kw())
        elif self._evicted_pages > 0:
            # two-tier store: speculative-prefetch QA — whole rounds in ONE
            # dispatch each, exact once the chosen host pages are all staged
            # (typically 2 rounds; 1 when the table is warm or ext_idx given)
            tokens, count = self._qa_hosttier(
                q_ids, q_len, p_ids, p_len_j, stop_arr, max_new_tokens,
                ext_idx)
        elif ext_idx is not None and self.pp > 1:
            # external retrieval under pp rides the same QA pipeline
            tokens, count = self._answer(
                self.params, kvs=self.kvs, q_ids=jnp.asarray(q_ids),
                q_len=q_len, p_ids=jnp.asarray(p_ids), p_len=p_len_j,
                stop_ids=jnp.asarray(stop_arr),
                max_new_tokens=max_new_tokens, retrieved_indices=ext_idx)
        elif ext_idx is not None:
            dkvs = qw.init_decode_state(self.mcfg, rc, B, self.state_dtype)
            dkvs = self._qa_retrieve(
                self.params, kvs=self.kvs, dkvs=dkvs,
                embeds=self._embed(self.params, jnp.asarray(q_ids)),
                n_tokens=q_len, retrieved_indices=ext_idx)
            logits, dkvs = self._decode(
                self.params, dkvs=dkvs,
                embeds=self._embed(self.params, jnp.asarray(p_ids)),
                n_tokens=p_len_j)
            last = jnp.take_along_axis(
                logits, jnp.asarray(p_len - 1)[:, None, None], axis=1)[:, 0]
            tokens, count, dkvs = self._greedy(
                self.params, dkvs=dkvs, last_logits=last,
                stop_ids=jnp.asarray(stop_arr), max_new_tokens=max_new_tokens,
                **ctx_kw())
        else:
            # hot path: retrieval + prefill + greedy decode in ONE dispatch
            tokens, count = self._answer(
                self.params, kvs=self.kvs, q_ids=jnp.asarray(q_ids),
                q_len=q_len, p_ids=jnp.asarray(p_ids), p_len=p_len_j,
                stop_ids=jnp.asarray(stop_arr),
                max_new_tokens=max_new_tokens, **self._hist_kw())
        tokens, count = np.asarray(tokens), np.asarray(count)
        self._hist_append(q_ids, q_len_np, p_ids, p_len, tokens, count,
                          rows=hist_rows)
        return tokens, count

    # ------------------------------------------------------------------ #
    def hp_reset(self):
        """Drop the speculative-prefetch table (host pages staged on device).
        Called from clear_cache and when the table outgrows its HBM cap."""
        self._hp_cols = {}     # (layer, b) -> {abs page id: device column}
        # (layer, b, col, page id, k, v, scales-or-None) not yet staged
        self._hp_pending = []
        self._hp_dev = None    # (hp_kv (2,L,B,Hkv,M,S,D), hp_ids (L,B,M))

    def _hp_fetch(self, layer: int, b: int, ids):
        """Pull host pages and queue them for the device prefetch table.
        Quantized stores stage the RAW int8 pages + scales (half the bytes
        across the link; dequant happens in the scatter dispatch)."""
        cols = self._hp_cols.setdefault((layer, b), {})
        need = [int(i) for i in ids if int(i) not in cols]
        if not need:
            return
        hk, hv, hks, hvs = self.host_store.fetch_raw(layer, b, need)
        for j, p in enumerate(need):
            col = len(cols)
            cols[p] = col
            sc = None if hks is None else np.stack([hks[j], hvs[j]])
            self._hp_pending.append((layer, b, col, p, hk[j], hv[j], sc))

    def _hp_device(self):
        """Sync the device-resident prefetch table and return
        (hp_kv (2, L, B, Hkv, M, S, D), hp_ids (L, B, M)).

        The table is append-only on device: each sync transfers ONLY the
        newly fetched pages (packed delta + (l, b, col, id) coords, one
        scatter dispatch) — warm questions re-dispatch with zero host->device
        traffic.  M is bucketed to bound recompiles of the answer step."""
        rc, mc = self.rekv, self.mcfg
        L, B = mc.num_layers, self.batch
        S, Hkv, D = rc.block_size, mc.num_kv_heads, mc.head_dim
        longest = max([len(c) for c in self._hp_cols.values()] or [0])
        M = _bucket(max(longest, 1), 1 << 30)
        dt = self.kvs.init_k.dtype
        imax = np.iinfo(np.int32).max
        if self._hp_dev is None:
            kv = jnp.zeros((2, L, B, Hkv, M, S, D), dt)
            ids = jnp.full((L, B, M), imax, jnp.int32)
        else:
            kv, ids = self._hp_dev
            M_old = ids.shape[-1]
            if M > M_old:
                kv = jnp.concatenate(
                    [kv, jnp.zeros((2, L, B, Hkv, M - M_old, S, D), dt)],
                    axis=4)
                ids = jnp.concatenate(
                    [ids, jnp.full((L, B, M - M_old), imax, jnp.int32)],
                    axis=2)
        if self._hp_pending:
            delta = np.stack([np.stack([k, v]) for (_, _, _, _, k, v, _)
                              in self._hp_pending])   # (n, 2, Hkv, S, D)
            coords = np.asarray([(l, b, c, p) for (l, b, c, p, _, _, _)
                                 in self._hp_pending], np.int32)
            scs = [s for (_, _, _, _, _, _, s) in self._hp_pending]
            if scs[0] is not None:  # int8 host tier: dequant in the scatter
                kv, ids = self._hp_scatter(
                    kv, ids, jnp.asarray(delta), jnp.asarray(coords),
                    jnp.asarray(np.stack(scs), np.float32))
            else:
                kv, ids = self._hp_scatter(kv, ids, jnp.asarray(delta),
                                           jnp.asarray(coords))
            self._hp_pending = []
        self._hp_dev = (kv, ids)
        return kv, ids

    def _qa_hosttier(self, q_ids, q_len, p_ids, p_len, stop_arr,
                     max_new_tokens: int, ext_idx=None):
        """QA against the two-tier store via speculative prefetch.

        Each round is ONE dispatch (question forward + prefill + decode,
        answer_question_hosttier); between rounds the host pages the forward
        selected but could not serve are staged into the table.  A round whose
        selections were all served is self-consistent and therefore EXACT
        (identical to an all-device run) — see retrieve_blocks_hosttier.
        Works at any batch; the table persists across questions, so repeat
        questions usually converge in a single round."""
        rc, mc = self.rekv, self.mcfg
        B, L = self.batch, mc.num_layers
        if max([len(c) for c in self._hp_cols.values()] or [0]) > self._hp_cap:
            self.hp_reset()  # table outgrew its HBM budget: restage on demand
        if ext_idx is not None:
            # external indices are known up front: stage their host pages now
            e = np.asarray(ext_idx)
            for b in range(B):
                need = [int(i) for i in e[b] if 0 <= i < self._evicted_pages]
                for l in range(L):
                    self._hp_fetch(l, b, need)
        kw = dict(q_ids=jnp.asarray(q_ids),
                  q_len=jnp.broadcast_to(jnp.asarray(q_len, jnp.int32), (B,)),
                  p_ids=jnp.asarray(p_ids),
                  p_len=jnp.broadcast_to(jnp.asarray(p_len, jnp.int32), (B,)),
                  stop_ids=jnp.asarray(stop_arr),
                  max_new_tokens=max_new_tokens,
                  retrieved_indices=ext_idx, **self._hist_kw())
        # F grows monotonically and is bounded by the host-page count, so the
        # loop terminates; in practice round 1 stages everything round 2 needs
        for _ in range(int(self._evicted_pages) + 2):
            hp_kv, hp_ids = self._hp_device()
            tokens, count, abs_idx, exists, missing = self._answer_host(
                self.params, kvs=self.kvs, hp_kv=hp_kv, hp_ids=hp_ids, **kw)
            miss = np.asarray(missing)
            if not miss.any():
                a, ex = np.asarray(abs_idx), np.asarray(exists)
                self.last_retrieved_indices = [
                    [[int(i) for i, e in zip(a[l, b], ex[l, b]) if e]
                     for b in range(B)] if B > 1 else
                    [int(i) for i, e in zip(a[l, 0], ex[l, 0]) if e]
                    for l in range(L)]
                return tokens, count
            a = np.asarray(abs_idx)
            for l in range(L):
                for b in range(B):
                    if miss[l, b].any():
                        self._hp_fetch(l, b, a[l, b][miss[l, b]])
        raise RuntimeError("host-tier speculative retrieval did not converge")

    # ------------------------------------------------------------------ #
    def _qa_retrieve_layerwise(self, q_ids: np.ndarray, qlen):
        """Question forward with per-layer host-side block selection.

        Serves the ablation scorers (aks/dpc_knn/l2norm — reference
        *_calc_block_topk variants): the device computes each layer's rep
        logits, the selection strategy runs host-side between dispatches, and
        host-tier pages picked by it are fetched the same way.  Any batch.
        question_answering never routes the default mean_dot scorer here
        (it runs fully on device — fused or speculative-prefetch paths),
        but select_blocks replicates it for direct/observability use."""
        rc = self.rekv
        mc = self.mcfg
        B = self.batch
        n_tok = jnp.broadcast_to(jnp.asarray(qlen, jnp.int32), (B,))
        h = self._embed(self.params, jnp.asarray(q_ids))
        S, Hkv, D = rc.block_size, mc.num_kv_heads, mc.head_dim

        from stc_tpu.compress.scoring import select_blocks
        scorer = rc.retrieval_scorer
        G = mc.num_heads // mc.num_kv_heads
        picked = []
        dk, dv, cur = [], [], []
        for l in range(mc.num_layers):
            lp = jax.tree.map(lambda x: x[l], self.params["layers"])
            kv_l = jax.tree.map(lambda x: x[l], self.kvs)
            # ablation scorers: device computes the rep logits, the
            # selection strategy runs host-side (reference
            # aks/dpc_knn/l2norm _calc_block_topk variants)
            q, k, v, logits, _, q_mean = self._qa_logits_l(
                lp, kv_l=kv_l, h=h, n_tokens=n_tok)
            logits_np = np.asarray(logits, np.float32)
            reps_all = np.asarray(kv_l.block_rep, np.float32)
            q_mean_np = np.asarray(q_mean, np.float32)
            arr = np.full((B, rc.topk), -1, np.int32)
            for b in range(B):
                # per-STREAM block count: ragged/recycled slots hold fewer
                # blocks than the longest stream and must not score the
                # longer streams' (or a prior tenant's) rep slots
                nb = int(self._stream_blocks[b]) if self._ragged \
                    else self._total_blocks
                if nb == 0:
                    continue
                reps_flat = np.repeat(reps_all[b, :nb], G,
                                      axis=1).reshape(nb, -1)
                idx = select_blocks(scorer, logits_np[b, :nb], reps_flat,
                                    q_mean_np[b].reshape(-1), rc.topk,
                                    rc.chunk_size)
                arr[b, :len(idx)] = np.asarray(idx, np.int32)
            abs_idx = jnp.asarray(arr)
            exists = jnp.asarray(arr >= 0)
            abs_np, exists_np = arr, arr >= 0
            picked.append(
                [[int(i) for i, e in zip(abs_np[b], exists_np[b]) if e]
                 for b in range(B)] if B > 1 else
                [int(i) for i, e in zip(abs_np[0], exists_np[0]) if e])
            use_host = exists_np & (abs_np < self._evicted_pages)
            host_k = np.zeros((B, rc.topk, Hkv, S, D),
                              dtype=np.asarray(self.kvs.init_k).dtype)
            host_v = np.zeros_like(host_k)
            for b in range(B):
                if use_host[b].any():
                    hk, hv = self.host_store.fetch(l, b,
                                                   abs_np[b][use_host[b]])
                    host_k[b, use_host[b]] = hk
                    host_v[b, use_host[b]] = hv
            h, k_l, v_l, c_l = self._qa_attend_l(
                lp, kv_l=kv_l, h=h, q=q, k=k, v=v, abs_idx=abs_idx,
                exists=exists, use_host=jnp.asarray(use_host),
                host_k=jnp.asarray(host_k), host_v=jnp.asarray(host_v),
                n_tokens=n_tok)
            dk.append(k_l)
            dv.append(v_l)
            cur.append(c_l)
        self.last_retrieved_indices = picked
        from stc_tpu.kvcache.state import DecodeKV
        return DecodeKV(k=jnp.stack(dk), v=jnp.stack(dv),
                        cursor=jnp.stack(cur))

    # ------------------------------------------------------------------ #
    def kv_memory_bytes(self) -> int:
        """Bytes held by the global block store (reference calc_memory_usage)."""
        n = int(np.asarray(self.kvs.num_blocks).max())
        blk = self.kvs.block_k
        per_block = (np.prod(blk.shape[2:]) * blk.dtype.itemsize) * 2
        return int(blk.shape[0] * n * per_block)
