"""Generic vision-language streaming session.

Generalizes the per-frame fused step over backbones: a VisionPipeline
strategy supplies the tower paths (full / cacher-accelerated), and VLMSession
fuses vision + LM prefill into ONE jitted device dispatch per chunk with
donated state buffers.  Host-side chunk scheduling (chunk_idx %
cache_interval) mirrors the reference's STC_CACHE.new_instance-per-chunk loop
(abstract_rekv.py:55-69).
"""

from __future__ import annotations

import functools
import time
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from stc_tpu.config import SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession, _stop_arr


class Preprocessor:
    """Staged frame preprocessor.

    The hot path transfers RAW uint8 frames and finishes preprocessing ON
    DEVICE inside the caller's fused jit (`device`): the host->device link
    is the streaming bottleneck on PCIe-relayed hosts, and uint8 halves the
    bytes vs bf16 pixels (4x vs f32) while the normalize/transpose ride the
    same dispatch as the vision tower.  `host` is the staging half (a cheap
    passthrough for uint8; full host preprocess for already-float inputs).
    Calling the object runs both halves host-side (legacy path, used by
    standalone encoders and tests)."""

    def __init__(self, image_size: int, mean, std, dtype,
                 ingest: str = "rgb"):
        self.image_size = image_size
        self.mean = np.asarray(mean, np.float32)
        self.std = np.asarray(std, np.float32)
        self.dtype = dtype
        self.ingest = ingest
        self._src_hw = None  # (h, w) of packed yuv420 planes, set on host()
        # device() reads _src_hw at TRACE time, so the jit cache must key on
        # it: two sources with equal h*w (64x36 then 48x48) would otherwise
        # silently reuse the first trace's unpack layout (garbled frames)
        self._jits = {}

    def host(self, frames) -> np.ndarray:
        """Stage frames for transfer: uint8 passes through untouched (rgb)
        or packs to planar YUV 4:2:0 at half the bytes (ingest='yuv420').
        Already-packed (N, h*w*3//2) uint8 planes pass through — the shape
        a video decoder hands over directly (set src_hw first or stage one
        RGB chunk)."""
        frames = np.asarray(frames)
        if frames.dtype == np.uint8 and self.ingest == "yuv420":
            if frames.ndim == 2:  # already-packed planes
                assert self._src_hw is not None, (
                    "packed yuv420 input needs src_hw: stage one RGB chunk "
                    "first or set pre.src_hw = (h, w)")
                return np.ascontiguousarray(frames)
            from stc_tpu import native
            self._src_hw = (frames.shape[1], frames.shape[2])
            return native.rgb_to_yuv420(frames)
        if frames.dtype == np.uint8:
            return np.ascontiguousarray(frames)
        return frames  # float input: device() normalizes it the same way

    @property
    def src_hw(self):
        return self._src_hw

    @src_hw.setter
    def src_hw(self, hw):
        self._src_hw = (int(hw[0]), int(hw[1]))

    def _yuv_to_rgb(self, x):
        """(N, h*w*3//2) packed uint8 planes -> (N, h, w, 3) float RGB in
        [0, 255]: nearest 2x2 chroma upsample + BT.601 full-range matrix,
        traced into the caller's fused jit (the whole conversion rides the
        same dispatch as the vision tower — zero extra host work)."""
        h, w = self._src_hw
        assert x.shape[1] == h * w * 3 // 2, (
            f"packed yuv420 length {x.shape[1]} does not match src_hw "
            f"({h}, {w}) -> {h * w * 3 // 2}; set pre.src_hw to the "
            "decoder's plane geometry before staging packed planes")
        N = x.shape[0]
        ch, cw = h // 2, w // 2
        y = x[:, : h * w].reshape(N, h, w).astype(jnp.float32)
        u = x[:, h * w: h * w + ch * cw].reshape(N, ch, cw)
        v = x[:, h * w + ch * cw:].reshape(N, ch, cw)
        up = lambda c: jnp.repeat(jnp.repeat(c, 2, axis=1), 2, axis=2)
        uf = up(u).astype(jnp.float32) - 128.0
        vf = up(v).astype(jnp.float32) - 128.0
        r = y + 1.402 * vf
        g = y - 0.344136 * uf - 0.714136 * vf
        b = y + 1.772 * uf
        return jnp.clip(jnp.stack([r, g, b], axis=-1), 0.0, 255.0)

    def device(self, x, _src_hw=None):
        """Finish preprocessing inside a jit: (N,H,W,3) uint8/float or
        (N, h*w*3//2) packed yuv420 -> (N,3,S,S) normalized `dtype`.
        Already-preprocessed (N,3,S,S) inputs pass through with a cast.

        _src_hw: trace-identity pin for the packed-plane unpack geometry —
        functools.partial(device, _src_hw=...) hashes the geometry into
        jax's trace cache (jit wrappers over the SAME bound method with the
        SAME avals share traces, so a dict of wrappers is not enough)."""
        if _src_hw is not None:
            assert _src_hw == self._src_hw, (_src_hw, self._src_hw)
        if x.ndim == 2:  # packed yuv420 planes
            x = self._yuv_to_rgb(x) / 255.0
            return self._normalize(x)
        if x.ndim == 4 and x.shape[1] == 3 and x.shape[-1] != 3:
            return x.astype(self.dtype)  # legacy NCHW pixels
        x = x.astype(jnp.float32) / 255.0  # uint8 and 0-255 float alike
        return self._normalize(x)

    def _normalize(self, x):
        if x.shape[1] != self.image_size or x.shape[2] != self.image_size:
            # plain half-pixel bilinear (no antialias), matching the native
            # C++ preprocessor and torch interpolate align_corners=False
            x = jax.image.resize(
                x, (x.shape[0], self.image_size, self.image_size, 3),
                "bilinear", antialias=False)
        x = (x - self.mean) / self.std
        return x.transpose(0, 3, 1, 2).astype(self.dtype)

    def __call__(self, frames):
        frames = self.host(frames)
        if frames.dtype == np.uint8 and frames.ndim == 4:
            # native fast path handles raw RGB only; packed yuv420 planes
            # (ndim == 2) unpack on device
            from stc_tpu import native
            out = native.preprocess_frames(frames, self.image_size,
                                           self.mean, self.std)
            if out is not None:
                return jnp.asarray(out, self.dtype)
        if self._src_hw not in self._jits:
            self._jits[self._src_hw] = jax.jit(functools.partial(
                self.device, _src_hw=self._src_hw))
        return self._jits[self._src_hw](jnp.asarray(frames))


def make_preprocessor(image_size: int, mean, std, dtype,
                      ingest: str = "rgb"):
    """Frame preprocessor: call it for the legacy full-host path, or use
    .host (staging) + .device (inside a jit) for the low-transfer path.
    ingest='yuv420' stages packed 4:2:0 planes (half the link bytes) and
    reconstructs RGB on device."""
    return Preprocessor(image_size, mean, std, dtype, ingest=ingest)


class VisionPipeline:
    """Backbone-specific vision stack: frames -> (B, F*block_size, E)."""

    def init_state(self):
        """-> (vision_state, pruner_state) pytrees."""
        raise NotImplementedError

    def preprocess(self, frames: np.ndarray) -> jax.Array:
        """Host half: stage frames for transfer (uint8 passthrough)."""
        raise NotImplementedError

    def device_preprocess(self, pixels):
        """Device half, traced inside the fused frame jit.  Default: the
        staged array is already model input."""
        return pixels

    def trace_key(self):
        """Hashable host state device_preprocess reads at TRACE time (e.g.
        the yuv420 source (h, w)).  The session folds it into every frame
        jit's cache key, so a change retraces instead of silently reusing a
        stale trace (packed-plane shapes don't encode their geometry)."""
        return None

    def full(self, params, pixels, vstate, pstate):
        """-> (flat_features, vstate, pstate)"""
        raise NotImplementedError

    def cached(self, params, pixels, vstate, pstate):
        """-> (flat_features, vstate, pstate)"""
        raise NotImplementedError

    def select_streams(self, vstate, pstate, old_vstate, old_pstate, mask):
        """Ragged ingest: keep OLD per-stream vision/pruner state for
        inactive streams (their garbage pixels must not pollute cacher
        references or the pruner's running memory).  Pipelines whose state
        carries a stream axis override this; the default refuses."""
        raise NotImplementedError(
            f"{type(self).__name__} does not support ragged (active-masked) "
            "multi-stream ingest: its vision state has no stream axis")

    def stream_axes(self):
        """(vstate_axis, pstate_axis) of the per-stream dim — used by the
        default extract_stream/restore_stream when every state leaf carries
        the stream axis.  Pipelines with mixed-rank state override
        extract/restore directly."""
        raise NotImplementedError(
            f"{type(self).__name__} has no per-stream vision state axis")

    def extract_stream(self, vstate, pstate, slot: int):
        """One slot's vision/pruner state as host pytrees, for per-stream
        checkpoint/migration (utils/checkpoint.save_stream_state)."""
        va, pa = self.stream_axes()
        return (jax.tree.map(lambda x: np.asarray(jnp.take(x, slot, axis=va)),
                             vstate),
                jax.tree.map(lambda x: np.asarray(jnp.take(x, slot, axis=pa)),
                             pstate))

    def restore_stream(self, vstate, pstate, slot: int, v_blob, p_blob):
        """Scatter a blob from extract_stream into `slot` of the live
        state; returns (vstate, pstate)."""
        va, pa = self.stream_axes()

        def put(axis):
            def f(cur, new):
                idx = (slice(None),) * axis + (slot,)
                return cur.at[idx].set(jnp.asarray(new, cur.dtype))
            return f

        return (jax.tree.map(put(va), vstate, v_blob),
                jax.tree.map(put(pa), pstate, p_blob))


class VLMSession(StreamingSession):
    def __init__(self, params: Dict[str, Any], text_cfg, scfg: SessionConfig,
                 vision: VisionPipeline, state_dtype=jnp.bfloat16,
                 batch: int = 1, mesh=None):
        text = qw.fuse_params(params["text"])
        if scfg.weights_quant != "none":
            text = qw.quantize_params_int8(
                text, group_size=scfg.weights_quant_group)
        params = {**params, "text": text}
        self._all_params = params
        self.vision = vision
        super().__init__(params["text"], text_cfg, scfg, batch=batch,
                         state_dtype=state_dtype, mesh=mesh)
        # under pp, super() re-placed the LM params on the mesh — the fused
        # vision+LM jits must read the SAME (placed) tree
        self._all_params = {**self._all_params, "text": self.params}
        rekv = scfg.rekv
        from stc_tpu.kvcache.engine import n_window_pages
        self._W = n_window_pages(rekv)

        def _append_flat(params, flat, kvs, bucket, active):
            """Append pruned features to the stream KV, one attention call
            per exc chunk (reference exc_block_size semantics) — a whole
            multi-frame chunk is ONE append when exc_block_size covers it.
            Partial windows take the XLA path (cost scales with the bucket);
            the fused Pallas kernel wins only at full window on this
            platform (~1.1 ms fixed cost per pallas_call).
            Under pp the append runs the GPipe stage pipeline instead (the
            vision tower + projector stay replicated/GSPMD in the same
            dispatch)."""
            S = rekv.block_size
            assert flat.shape[1] % S == 0, (flat.shape, S)
            backend = (self.attn_backend if bucket >= self._W else
                       ("jnp" if self.attn_backend == "pallas"
                        else self.attn_backend))
            exc = rekv.exc_block_size
            if self.pp > 1:
                from stc_tpu.parallel.pipeline import pp_encode_step
                T = flat.shape[1]
                n_micro = T // exc if (T > exc and T % exc == 0) else 1
                if T % exc and T > exc:  # ragged tail: per-chunk pipeline
                    for i in range(0, T, exc):
                        _, kvs = pp_encode_step(
                            params["text"]["layers"], text_cfg, rekv, kvs,
                            flat[:, i:i + exc], mesh=self.mesh, n_micro=1,
                            attn_backend=backend, win_pages=bucket,
                            active=active)
                    return kvs
                _, kvs = pp_encode_step(
                    params["text"]["layers"], text_cfg, rekv, kvs, flat,
                    mesh=self.mesh, n_micro=n_micro, attn_backend=backend,
                    win_pages=bucket, active=active)
                return kvs
            for i in range(0, flat.shape[1], exc):
                _, kvs = qw.encode_step(params["text"], text_cfg, rekv, kvs,
                                        flat[:, i:i + exc],
                                        is_init=False,
                                        attn_backend=backend,
                                        win_pages=bucket,
                                        active=active)
            return kvs

        # trace_key: unused in the bodies — baked into the jit partials so
        # host state read at trace time (yuv420 geometry) is part of jax's
        # trace-cache identity (wrappers over the same function + avals
        # share traces; the session-level _frame_jits dict alone is not
        # enough)
        def _frame(params, pixels, kvs, vstate, pstate, active=None, *,
                   cached, bucket, trace_key=None):
            pixels = vision.device_preprocess(pixels)
            path = vision.cached if cached else vision.full
            flat, vstate, pstate = path(params, pixels, vstate, pstate)
            kvs = _append_flat(params, flat, kvs, bucket, active)
            return kvs, vstate, pstate

        def _frame_ragged(params, pixels, kvs, vstate, pstate, active, *,
                          cached, bucket, trace_key=None):
            new_kvs, new_v, new_p = _frame(params, pixels, kvs, vstate,
                                           pstate, active, cached=cached,
                                           bucket=bucket)
            new_v, new_p = vision.select_streams(new_v, new_p, vstate,
                                                 pstate, active)
            return new_kvs, new_v, new_p

        def _frame_mixed(params, pixels, kvs, vstate, pstate, need_full,
                         active=None, *, bucket, trace_key=None):
            """PER-SLOT cacher schedule tick: slots whose own chunk counter
            lands on a full-compute chunk (fresh/recycled/migrated streams,
            ragged slots at different rates) ride the full path while the
            rest ride the cacher — both computed in the one dispatch,
            selected per slot.  Costs one extra vision pass only on ticks
            where slots disagree; live slots' features stay bit-identical to
            an unchurned session."""
            px = vision.device_preprocess(pixels)
            flat_f, v_f, p_f = vision.full(params, px, vstate, pstate)
            flat_c, v_c, p_c = vision.cached(params, px, vstate, pstate)
            B = need_full.shape[0]
            flat = jnp.where(need_full.reshape(B, 1, 1), flat_f, flat_c)
            new_v, new_p = vision.select_streams(v_f, p_f, v_c, p_c,
                                                 need_full)
            kvs = _append_flat(params, flat, kvs, bucket, active)
            if active is not None:
                new_v, new_p = vision.select_streams(new_v, new_p, vstate,
                                                     pstate, active)
            return kvs, new_v, new_p

        def _serve_pixels(params, pixels, kvs, vstate, pstate, active,
                          q_ids, q_len, p_ids, p_len, stop_ids,
                          need_full=None, hist_ids=None, hist_len=None, *,
                          cached, mixed, bucket, ragged, max_new_tokens,
                          trace_key=None):
            """Fused PIXEL serving tick: vision tower (+cacher/pruner) +
            ragged KV append + per-stream retrieval QA + greedy decode in
            ONE dispatch — the pixel-path counterpart of
            StreamingSession.serve (the reference runs vision, encode, and
            QA as separate loops per process, abstract_rekv.py:38-87)."""
            px = vision.device_preprocess(pixels)
            if mixed:
                flat_f, v_f, p_f = vision.full(params, px, vstate, pstate)
                flat_c, v_c, p_c = vision.cached(params, px, vstate, pstate)
                B = need_full.shape[0]
                flat = jnp.where(need_full.reshape(B, 1, 1), flat_f, flat_c)
                new_v, new_p = vision.select_streams(v_f, p_f, v_c, p_c,
                                                     need_full)
            else:
                path = vision.cached if cached else vision.full
                flat, new_v, new_p = path(params, px, vstate, pstate)
            if ragged:
                new_v, new_p = vision.select_streams(new_v, new_p, vstate,
                                                     pstate, active)
            backend = (self.attn_backend if bucket >= self._W else
                       ("jnp" if self.attn_backend == "pallas"
                        else self.attn_backend))
            kvs, tokens, count = qw.serve_step(
                params["text"], text_cfg, rekv, kvs, flat, active,
                q_ids, q_len, p_ids, p_len, stop_ids, max_new_tokens,
                attn_backend=backend, win_pages=bucket,
                hist_ids=hist_ids, hist_len=hist_len)
            return kvs, new_v, new_p, tokens, count

        self._frame_fn = _frame
        self._frame_ragged_fn = _frame_ragged
        self._frame_mixed_fn = _frame_mixed
        self._serve_pixel_fn = _serve_pixels
        self._frame_jits = {}
        self._reset_vision()

    def _kv_out(self, tail: int):
        """out_shardings pinning the kvs output (position 0) to the
        session's committed store formats, with `tail` unconstrained
        outputs after it; {} when the layout is not committed (CPU/mesh).
        Donating jits must pin or XLA un-aliases the donation
        (runtime/session.py layout-commit notes)."""
        if self._kvs_fmt is None:
            return {}
        return dict(out_shardings=(self._kvs_fmt,) + (None,) * tail)

    def _get_frame_jit(self, cached: bool, bucket: int,
                       ragged: bool = False):
        tk = self.vision.trace_key()
        key = (cached, bucket, ragged, tk)
        if key not in self._frame_jits:
            donate = ("kvs",) if cached else ("kvs", "vstate")
            fn = self._frame_ragged_fn if ragged else self._frame_fn
            self._frame_jits[key] = jax.jit(
                functools.partial(fn, cached=cached, bucket=bucket,
                                  trace_key=tk),
                donate_argnames=donate, **self._kv_out(2))
        return self._frame_jits[key]

    def _get_serve_jit(self, cached: bool, mixed: bool, bucket: int,
                       ragged: bool, max_new_tokens: int):
        # max_new_tokens is part of the jit-cache key: each DISTINCT value
        # compiles its own fused vision+LM program (same recompile behavior
        # as a static_argname, made explicit here).  serve() therefore
        # expects one fixed max_new_tokens per session — the ServingEngine
        # holds it as an engine-level constant; per-request values would
        # compile-thrash.
        tk = self.vision.trace_key()
        key = ("serve", cached, mixed, bucket, ragged, max_new_tokens, tk)
        if key not in self._frame_jits:
            donate = (("kvs",) if (cached or mixed) else ("kvs", "vstate"))
            self._frame_jits[key] = jax.jit(
                functools.partial(self._serve_pixel_fn, cached=cached,
                                  mixed=mixed, bucket=bucket, ragged=ragged,
                                  max_new_tokens=max_new_tokens,
                                  trace_key=tk),
                donate_argnames=donate, **self._kv_out(4))
        return self._frame_jits[key]

    def _get_mixed_jit(self, bucket: int):
        tk = self.vision.trace_key()
        key = ("mixed", bucket, tk)
        if key not in self._frame_jits:
            self._frame_jits[key] = jax.jit(
                functools.partial(self._frame_mixed_fn, bucket=bucket,
                                  trace_key=tk),
                donate_argnames=("kvs",), **self._kv_out(2))
        return self._frame_jits[key]

    def _bucket(self, blocks_after: int) -> int:
        b = 8
        while b < min(blocks_after, self._W):
            b *= 2
        return min(b, self._W)

    def _reset_vision(self):
        self.chunk_idx = 0
        # PER-SLOT cacher schedule: each stream's full-vs-cached parity
        # follows its own chunk counter (reference semantics — one stream
        # per process means one counter per stream there too).  Churned /
        # ragged slots can disagree; those ticks take the mixed-path jit.
        self._slot_chunk = np.zeros(self.batch, dtype=np.int64)
        self._vstate, self._pstate = self.vision.init_state()

    def clear_cache(self):
        super().clear_cache()
        if hasattr(self, "_all_params"):
            self._reset_vision()

    def reset_streams(self, slots):
        """Slot recycling on the pixel path: also returns the recycled
        slots' cacher references, pruner running memory, and PER-SLOT chunk
        counter to fresh-session state (via the pipelines' per-stream
        select_streams).  The recycled slot's next chunk is a full-compute
        chunk — exactly like a fresh session — while every live slot keeps
        its own schedule bit-identically (the mixed-path jit serves ticks
        where slots disagree)."""
        super().reset_streams(slots)
        mask = np.zeros(self.batch, dtype=bool)
        mask[list(slots)] = True
        fresh_v, fresh_p = self.vision.init_state()
        self._vstate, self._pstate = self.vision.select_streams(
            fresh_v, fresh_p, self._vstate, self._pstate, jnp.asarray(mask))
        self._slot_chunk[mask] = 0

    def encode_video(self, frames, active=None):
        """frames: (n, H, W, 3) single stream or (B, n, H, W, 3) multi-stream
        (B must equal the session batch).  A jax.Array input is treated as
        ALREADY STAGED pixels for exactly one chunk (the FramePrefetcher /
        double-buffered ingest path: the host thread device_puts staged uint8
        frames ahead of time so the transfer overlaps device compute).

        active: optional (B,) bool RAGGED-ingest mask — streams ticking at
        different rates share one dispatch; inactive streams' rows are
        ignored (feed anything, e.g. the previous chunk) and their KV,
        cacher, and pruner state stay bit-identical."""
        if isinstance(frames, jax.Array):
            self._encode_staged_chunk(frames, active)
            return
        frames = np.asarray(frames)
        if frames.ndim == 5:
            assert frames.shape[0] == self.batch, (frames.shape, self.batch)
        elif self.batch > 1:
            raise ValueError("multi-stream session needs (B, n, H, W, 3)")
        n = self.scfg.encode_chunk_frames
        frame_axis = 1 if frames.ndim == 5 else 0
        for s in range(0, frames.shape[frame_axis], n):
            chunk = (frames[:, s:s + n] if frames.ndim == 5
                     else frames[s:s + n])
            self._encode_chunk_pixels(self.vision.preprocess(chunk),
                                      chunk.shape[frame_axis], active)

    def _encode_staged_chunk(self, pixels: jax.Array, active=None):
        assert pixels.shape[0] % self.batch == 0, (pixels.shape, self.batch)
        self._encode_chunk_pixels(pixels, pixels.shape[0] // self.batch,
                                  active)

    def serve(self, frames, active, questions, prompts, stop_token_ids,
              max_new_tokens: int = 128, asked=None):
        """PHASE-HETEROGENEOUS serving tick on the PIXEL path: vision tower
        (+cacher/pruner, per-slot schedules) + ragged encode of one frame
        chunk into the `active` streams + per-stream retrieval QA — all in
        ONE dispatch on the hot path (mean_dot scorer, nothing evicted, one
        exc chunk).  The pixel-session counterpart of
        StreamingSession.serve; the reference runs vision, encode, and QA
        as separate sequential loops per process (abstract_rekv.py:38-87).

        frames: (B, n, H, W, 3) uint8, or a jax.Array already staged via
        stage_chunk (one chunk).  Other args as StreamingSession.serve.
        Returns (tokens (B, M) np, count (B,) np).  Falls back to
        encode_video + batched QA dispatches off the hot path."""
        rc = self.rekv
        S = rc.block_size
        if isinstance(frames, jax.Array):
            pixels = frames
            n_frames = frames.shape[0] // self.batch
        else:
            frames = np.asarray(frames)
            assert frames.ndim == 5 and frames.shape[0] == self.batch, (
                "VLM serve wants (B, n, H, W, 3) frames", frames.shape)
            n_frames = frames.shape[1]
            pixels = None  # staged below only if the fused path is taken
        eligible = (n_frames * S <= rc.exc_block_size
                    and rc.retrieval_scorer == "mean_dot"
                    and self._evicted_pages == 0
                    and self.pp == 1  # serve_step is not pp-wired
                    and self._total_blocks + n_frames <= rc.max_blocks)
        q_ids, q_len = self._pad_ids(questions)
        p_ids, p_len = self._pad_ids(prompts)
        # measured-cost routing (see session._ServeRouter): the fused
        # vision+encode+QA program can lose to the dispatch pair on some
        # platforms (round-3 bench: 0.84x) — probe both arms, keep the
        # winner.  The per-slot cacher schedule is part of the key: full,
        # cached, and mixed ticks compile different programs.
        key = None
        if eligible:
            sched = (self.scfg.cacher.enabled
                     and bool((self._slot_chunk
                               % self.scfg.cacher.cache_interval != 0).any()))
            key = ("vlm", n_frames, sched, q_ids.shape[1], p_ids.shape[1],
                   max_new_tokens)
        fused = eligible and self._serve_router.plan(key) == "fused"
        self.last_serve_fused = fused
        if not fused:
            t0 = time.perf_counter()
            self.encode_video(frames, active=active)
            out = self._qa_run(q_ids, q_len, p_ids, p_len, stop_token_ids,
                               max_new_tokens, hist_rows=asked)
            if eligible:
                self._serve_router.record(key, False,
                                          time.perf_counter() - t0)
            return out
        if pixels is None:
            pixels = self.vision.preprocess(frames)
        act_dev, act_np = self._normalize_active(active)
        self._maybe_evict(n_frames)  # rep-capacity fail-fast (never evicts)
        bucket = self._bucket(self._total_blocks + n_frames
                              - self._evicted_pages)
        cached_mask = (self.scfg.cacher.enabled
                       & (self._slot_chunk % self.scfg.cacher.cache_interval
                          != 0))
        ticking = cached_mask if act_np is None else cached_mask[act_np]
        mixed = bool(ticking.size and ticking.any() and not ticking.all())
        cached = bool(ticking.size and ticking.all()) and not mixed
        ragged = act_dev is not None
        fn = self._get_serve_jit(cached, mixed, bucket, ragged,
                                 max_new_tokens)
        mask = (jnp.ones((self.batch,), bool) if act_dev is None
                else act_dev)
        kw = dict(self._hist_kw())
        if mixed:
            kw["need_full"] = jnp.asarray(~cached_mask)
        t0 = time.perf_counter()
        self.kvs, self._vstate, self._pstate, tokens, count = fn(
            self._all_params, pixels, kvs=self.kvs, vstate=self._vstate,
            pstate=self._pstate, active=mask,
            q_ids=jnp.asarray(q_ids), q_len=jnp.asarray(q_len, jnp.int32),
            p_ids=jnp.asarray(p_ids), p_len=jnp.asarray(p_len, jnp.int32),
            stop_ids=jnp.asarray(_stop_arr(stop_token_ids)), **kw)
        self._track_blocks(n_frames, active=act_np)
        self._slot_chunk += 1 if act_np is None else act_np.astype(np.int64)
        self.chunk_idx += 1
        tokens, count = np.asarray(tokens), np.asarray(count)
        self._serve_router.record(key, True, time.perf_counter() - t0)
        self._hist_append(q_ids, q_len, p_ids, p_len, tokens, count,
                          rows=asked)
        return tokens, count

    def _encode_chunk_pixels(self, pixels, n_frames: int, active=None):
        act_dev, act_np = self._normalize_active(active)
        self._maybe_evict(n_frames)
        resident_after = (self._total_blocks + n_frames
                          - self._evicted_pages)
        bucket = self._bucket(resident_after)
        # per-SLOT cacher parity (slot_chunk % interval); the dispatch shape
        # is decided by the slots that actually tick this round
        cached_mask = (self.scfg.cacher.enabled
                       & (self._slot_chunk % self.scfg.cacher.cache_interval
                          != 0))
        ticking = cached_mask if act_np is None else cached_mask[act_np]
        if ticking.size and ticking.any() and not ticking.all():
            fn = self._get_mixed_jit(bucket)
            need_full = jnp.asarray(~cached_mask)
            if act_dev is None:
                self.kvs, self._vstate, self._pstate = fn(
                    self._all_params, pixels, kvs=self.kvs,
                    vstate=self._vstate, pstate=self._pstate,
                    need_full=need_full)
            else:
                self.kvs, self._vstate, self._pstate = fn(
                    self._all_params, pixels, kvs=self.kvs,
                    vstate=self._vstate, pstate=self._pstate,
                    need_full=need_full, active=act_dev)
        else:
            use_cached = bool(ticking.size and ticking.all())
            fn = self._get_frame_jit(use_cached, bucket,
                                     ragged=act_dev is not None)
            if act_dev is None:
                self.kvs, self._vstate, self._pstate = fn(
                    self._all_params, pixels, kvs=self.kvs,
                    vstate=self._vstate, pstate=self._pstate)
            else:
                self.kvs, self._vstate, self._pstate = fn(
                    self._all_params, pixels, kvs=self.kvs,
                    vstate=self._vstate, pstate=self._pstate, active=act_dev)
        self._track_blocks(n_frames, active=act_np)
        self._slot_chunk += 1 if act_np is None else act_np.astype(np.int64)
        self.chunk_idx += 1

    def stage_chunk(self, frames) -> jax.Array:
        """Host-stage + start the device transfer for one chunk of frames
        (call from a prefetch thread; pair with encode_video(staged))."""
        return jax.device_put(self.vision.preprocess(frames))

    def estimate_chunk_flops(self, cached: bool = False):
        """Analytical FLOPs of one encode chunk at the current stream state,
        from XLA's compiled cost model — the exact-counterpart of the
        reference's calflops GFLOPs instrumentation
        (flash_vstream_rekv.py:116-123, 203-229).  cached=True measures the
        STC-Cacher selective-recompute path; the full/cached ratio is the
        cacher's true FLOPs saving for the compiled program.  Returns None
        on backends without a cost model."""
        n = self.scfg.encode_chunk_frames
        hw = self.vision.cfg.vision.image_size
        pixels = np.zeros((n * self.batch, hw, hw, 3), np.uint8)
        bucket = self._bucket(
            max(self._total_blocks + n - self._evicted_pages, 1))
        fn = self._get_frame_jit(cached, bucket)
        from stc_tpu.utils.metrics import flops_of_compiled
        return flops_of_compiled(
            fn.lower(self._all_params, pixels, kvs=self.kvs,
                     vstate=self._vstate, pstate=self._pstate).compile())
