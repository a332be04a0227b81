"""Streaming benchmarks — frames/sec/chip (encode + LM prefill) and more.

Default mode measures the flagship LLaVA-OneVision-0.5B-shaped pipeline with
STC cacher+pruner defaults (196 -> 60 tokens/frame, 25% ViT recompute on
cached chunks) ingesting a single stream in 8-frame chunks (reference
encode_chunk_size semantics: abstract_rekv.py:49-69; exc_block_size covers
the chunk so each chunk is ONE attention dispatch per layer — the
query-tiled kernel keeps the 480-token append inside VMEM).  Weights are
random (throughput does not depend on weight values); shapes are the real
llava-onevision-qwen2-0.5b-ov ones.  The timed section runs at STEADY STATE
(full local window, the long-stream production regime — the fused Pallas
kernel path); the state is fast-forwarded there because attention cost
depends on state SIZE, not content.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60}
vs_baseline is the multiple of 60-fps real-time ingest (the BASELINE.md
north-star: >=2x real-time on the 7B config on a v5e-8 pod; this measures the
single-chip 0.5B-shaped config).

Other modes via BENCH_MODE (each still prints one JSON line):
  qa          — QA latency (retrieval + prompt prefill + 16-token greedy
                decode), p50 over repeats
  multistream — aggregate ingest fps with B=4 parallel streams; the chunk
                size is auto-tuned to the live link (the relay's
                per-dispatch payload cliff moves between sessions — see
                autotune_multistream), BENCH_CHUNK_FRAMES pins it
  7b          — ingest fps at LLaVA-OV-7B shapes (single chip, int8 weights)
scripts/bench_all.py runs every mode and writes bench_report.json.

Timing is the MEDIAN of 5 passes (run-to-run variance on this platform is
~20%; round 1's best-of-2 flattered the number).  NOTE: this box has ONE
host CPU — concurrent host work starves the feed loop and corrupts the
measurement (observed 65 -> 28 fps under a parallel pytest run).
"""

import json
import os
import statistics
import sys
import time

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                            SessionConfig)
from stc_tpu.models import llava_onevision as lo
from stc_tpu.models import qwen2 as qw
from stc_tpu.models import siglip as sg

CHUNK = int(os.getenv("BENCH_CHUNK_FRAMES", "8"))
STEADY_BLOCKS = int(os.getenv("BENCH_STEADY_BLOCKS", "400"))


def build(batch=1, seven_b=False, kv_quant="none", chunk=None, spec=0,
          spec_history=0, ingest="rgb"):
    chunk = CHUNK if chunk is None else chunk
    vision = sg.SiglipConfig(hidden_size=1152, num_layers=27, num_heads=16,
                             intermediate_size=4304, image_size=384,
                             patch_size=14)
    if seven_b:
        # FULL-DEPTH 7B with int8 weights (bf16 activations/KV): bf16
        # weights alone are ~15 GB and do not fit one 16 GB chip, but the
        # int8 path (quantize_params_int8) does — ~7.3 GB weights + ~3.5 GB
        # KV store.  Throughput does not depend on weight values, so the
        # quantized tree is generated directly on device (no host transfer).
        text = qw.Qwen2Config(vocab_size=152064, hidden_size=3584,
                              num_layers=28, num_heads=28, num_kv_heads=4,
                              head_dim=128, intermediate_size=18944,
                              rope_base=1000000.0)
    else:
        text = qw.Qwen2Config(vocab_size=151936, hidden_size=896,
                              num_layers=24, num_heads=14, num_kv_heads=2,
                              head_dim=64, intermediate_size=4864,
                              rope_base=1000000.0)
    cfg = lo.LlavaOVConfig(vision=vision, text=text)
    # 7B: trim the page store (KV bytes scale with Hkv*D and layer count;
    # 768 pages cover warmup + the timed passes without host eviction)
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=14, n_local=15000, block_size=60,
                        exc_block_size=60 * chunk, topk=64, chunk_size=1,
                        max_blocks=768 if seven_b else 1024,
                        max_prompt_tokens=256,
                        max_new_tokens=128, kv_quant=kv_quant,
                        spec_decode_draft=spec,
                        spec_history_tokens=spec_history),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.25,
                            cache_interval=2,
                            gather_impl=os.getenv("STC_GATHER_IMPL", "auto"),
                            k_proxy_rank=int(
                                os.getenv("STC_K_PROXY_RANK", "0"))),
        pruner=PrunerConfig(token_per_frame=60),
        encode_chunk_frames=chunk,
        ingest_format=ingest,
    )
    if seven_b:
        scfg = SessionConfig(rekv=scfg.rekv, cacher=scfg.cacher,
                             pruner=scfg.pruner,
                             encode_chunk_frames=scfg.encode_chunk_frames,
                             ingest_format=ingest,
                             weights_quant="int8")
        params = init_random_params_int8(cfg, jax.random.key(0))
    else:
        params = lo.init_random_params(cfg, jax.random.key(0),
                                       dtype=jnp.bfloat16)
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.bfloat16,
                            vision_dtype=jnp.bfloat16, batch=batch)
    return sess, cfg


def init_random_params_int8(cfg, key):
    """Random FUSED+QUANTIZED llava-ov params built directly on device:
    int8 weights with constant per-channel scales (values are irrelevant for
    throughput; generating bf16 first would spike past HBM and a host-side
    build would cross the ~50 MB/s relay)."""
    t = cfg.text
    E, L, F = t.hidden_size, t.num_layers, t.intermediate_size
    Hq, Hkv, D = t.num_heads, t.num_kv_heads, t.head_dim
    V = t.vocab_size
    s = jnp.float32(0.02 / 127.0)
    ks = iter(jax.random.split(key, 16))

    def w8(shape):
        # generate ONE layer's bits and broadcast over the layer axis —
        # per-element generation materializes 4-byte intermediates (the
        # 3.8 GB gate/up tensor would transiently need 15 GB); repeated
        # layer values are irrelevant for throughput
        if len(shape) == 3:
            part = w8(shape[1:])
            return jnp.broadcast_to(part[None], shape) + jnp.int8(0)
        u8 = jax.random.bits(next(ks), shape, dtype=jnp.uint8)
        return u8.astype(jnp.int8)

    def sc(shape):
        return jnp.full(shape, s, jnp.float32)

    import stc_tpu.models.siglip as sg
    text = {
        "embed_q": w8((V, E)), "embed_s": sc((V,)),
        "lm_head_q": w8((E, V)), "lm_head_s": sc((V,)),
        "norm_f": jnp.ones((E,), jnp.bfloat16),
        "layers": {
            "ln1": jnp.ones((L, E), jnp.bfloat16),
            "ln2": jnp.ones((L, E), jnp.bfloat16),
            "wqkv_q": w8((L, E, (Hq + 2 * Hkv) * D)),
            "wqkv_s": sc((L, (Hq + 2 * Hkv) * D)),
            "bqkv": jnp.zeros((L, (Hq + 2 * Hkv) * D), jnp.bfloat16),
            "wo_q": w8((L, Hq * D, E)), "wo_s": sc((L, E)),
            "w_gateup_q": w8((L, E, 2 * F)), "w_gateup_s": sc((L, 2 * F)),
            "w_down_q": w8((L, F, E)), "w_down_s": sc((L, E)),
        },
    }
    k1, k2 = jax.random.split(next(ks))
    Cv = cfg.vision.hidden_size
    return {
        "vision": sg.init_params(cfg.vision, k1, jnp.bfloat16),
        "projector": {
            "w1": (jax.random.normal(k2, (Cv, E)) * 0.02).astype(jnp.bfloat16),
            "b1": jnp.zeros((E,), jnp.bfloat16),
            "w2": (jax.random.normal(k2, (E, E)) * 0.02).astype(jnp.bfloat16),
            "b2": jnp.zeros((E,), jnp.bfloat16),
        },
        "text": text,
    }


def hard_sync(sess):
    # NOTE: on this platform block_until_ready can return before the
    # execution finishes; fetching a value is the only reliable barrier
    return float(jnp.sum(sess.kvs.block_rep.astype(jnp.float32)[..., :1]))


def fast_forward(sess, n_blocks):
    """Jump the stream state to a long-stream steady point: counters say
    n_blocks pages were ingested (page contents are irrelevant for
    throughput; only the state SIZE drives attention cost)."""
    S = sess.rekv.block_size
    sess.kvs = sess.kvs._replace(
        num_blocks=jnp.full_like(sess.kvs.num_blocks, n_blocks),
        length=jnp.full_like(sess.kvs.length,
                             sess.rekv.n_init + n_blocks * S))
    sess._total_blocks = n_blocks


_LAST_SAMPLES: list = []


def record_samples(vals):
    """Stash the per-pass samples of the mode's PRIMARY timed section (fps
    or ms per pass) for the report's variance fields."""
    _LAST_SAMPLES[:] = [float(v) for v in vals]


def spread_fields(d):
    """Median +- spread protocol: every mode's JSON carries its per-pass
    samples and (max-min)/median so a single-number regression can be told
    apart from relay variance (PLATFORM_NOTES.md: transfer-bound modes swing
    +-30% across sessions; cross-session single samples are not comparable).
    """
    s = list(_LAST_SAMPLES)
    if len(s) >= 3:
        med = statistics.median(s)
        d["samples"] = [round(x, 2) for x in s]
        d["spread_pct"] = round(100.0 * (max(s) - min(s)) / med, 1)
    return d


def emit(d):
    print(json.dumps(spread_fields(d)))


def timed_passes(fn, sync, n_passes=5):
    times = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        fn()
        sync()
        times.append(time.perf_counter() - t0)
    timed_passes.last = list(times)
    return statistics.median(times)


def bench_ingest(batch=1, seven_b=False, kv_quant="none", staged=False,
                 chunk_frames=None, ingest="rgb"):
    C = CHUNK if chunk_frames is None else chunk_frames
    n_frames = int(os.getenv("BENCH_FRAMES", "96"))
    rng = np.random.default_rng(0)
    sess, cfg = build(batch=batch, seven_b=seven_b, kv_quant=kv_quant,
                      chunk=C, ingest=ingest)
    sess.encode_init_prompt(list(range(14)))
    fast_forward(sess, STEADY_BLOCKS)

    pool = C + 4  # frame pool; slices rotate so chunks are not identical
    if batch == 1:
        frames = rng.integers(0, 256, size=(pool, 384, 384, 3),
                              dtype=np.uint8)

        def chunk(i):
            return frames[i % 4: i % 4 + C]
    else:
        frames = rng.integers(0, 256, size=(batch, pool, 384, 384, 3),
                              dtype=np.uint8)

        def chunk(i):
            return frames[:, i % 4: i % 4 + C]

    # warmup compiles both chunk paths (full + cacher) at the steady bucket
    for i in range(0, 6 * C, C):
        sess.encode_video(chunk(i))
    hard_sync(sess)

    # production ingest: RAW uint8 frames ride the jit dispatch (442 KB/frame
    # vs 884 KB as bf16 pixels) and normalize/transpose run inside the fused
    # frame jit.  Measured here: jit-arg transfer is far cheaper than explicit
    # device_put on this relay (71 vs 47 fps), and a prefetch thread is
    # counterproductive on this 1-core host (10 fps) — so the loop stays
    # synchronous; use FramePrefetcher+stage_chunk on multi-core hosts.

    if staged:
        # double-buffered ingest: a prefetch thread host-stages + device_puts
        # the next chunk while the device runs the current one
        # (FramePrefetcher/stage_chunk — the multi-core-host transfer path;
        # counterproductive on 1-core hosts, see PLATFORM_NOTES.md)
        from stc_tpu.runtime.pipeline import FramePrefetcher

        def one_pass():
            gen = (chunk(i) for i in range(0, n_frames, C))
            for px in FramePrefetcher(gen, sess.stage_chunk, depth=2):
                sess.encode_video(px)
    else:
        def one_pass():
            for i in range(0, n_frames, C):
                sess.encode_video(chunk(i))

    dt = timed_passes(one_pass, lambda: hard_sync(sess))
    record_samples([batch * n_frames / t for t in timed_passes.last])
    return batch * n_frames / dt


def autotune_multistream(staged=False):
    """Multistream fps with the chunk size picked AT RUN TIME.

    The relay's per-dispatch payload cliff moves between sessions (a 7 MB
    B4C4 dispatch rode the fast path in round 2 at 66 fps agg, and measured
    22 fps in round 3 — while B4C2's 3.5 MB payload held 52 fps in both).
    A deployment tunes its transfer chunk to the link it actually has, so
    the bench does the same: probe the candidate chunk sizes and report the
    best, labelled with the choice.  BENCH_CHUNK_FRAMES pins a single size
    (no probing) for controlled sweeps.
    """
    if os.getenv("BENCH_CHUNK_FRAMES") is not None:
        fmt = os.getenv("BENCH_INGEST_FORMAT", "rgb")
        kvq = os.getenv("BENCH_KV_QUANT", "none")
        return (bench_ingest(batch=4, staged=staged, ingest=fmt,
                             kv_quant=kvq),
                f"{CHUNK}-frame {fmt} chunks, kv={kvq}")
    # candidates: chunk size x ingest format.  yuv420 ships packed 4:2:0
    # planes at HALF the bytes/frame (production video is stored 4:2:0 —
    # the decoder hands planes over for free; chroma upsample + BT.601
    # matrix ride the fused vision jit ON DEVICE) — the decisive lever on
    # transfer-bound links where raw uint8 RGB saturates the relay.
    # One SUBPROCESS per candidate: sequential B=4 session builds in one
    # process exhaust HBM (~6 GB state each; freeing between builds is not
    # reliable on this backend — the round-3 qa_7b_spec OOM pattern).
    import subprocess
    child_mode = "multistream_staged" if staged else "multistream"
    results = {}
    # int4 KV pages quarter the B=4 page-store traffic (round-5 #7); the
    # quant/dequant rides the encode jit so the only cost is in-kernel
    # nibble math — probe it alongside the transfer-format candidates.
    for c, fmt, kvq in ((2, "rgb", "none"), (2, "yuv420", "none"),
                        (4, "yuv420", "none"), (2, "yuv420", "int4")):
        env = dict(os.environ, BENCH_MODE=child_mode,
                   BENCH_CHUNK_FRAMES=str(c), BENCH_INGEST_FORMAT=fmt,
                   BENCH_KV_QUANT=kvq)
        r = subprocess.run([sys.executable, os.path.abspath(__file__)],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
        d = (json.loads(lines[-1])
             if (r.returncode == 0 and lines) else {"value": 0.0})
        results[(c, fmt, kvq)] = d["value"]
        # propagate the winning candidate's per-pass samples to the report
        results[(c, fmt, kvq, "samples")] = d.get("samples", [])
    best = max((k for k in results if len(k) == 3), key=results.get)
    record_samples(results.get(best + ("samples",), []))
    probed = ", ".join(
        f"C{c}/{f}/{q}={results[(c, f, q)]:.1f}"
        for c, f, q in sorted(k for k in results if len(k) == 3))
    kv_tag = "" if best[2] == "none" else f" + {best[2]} KV pages"
    return results[best], (f"{best[0]}-frame {best[1]} chunks{kv_tag} "
                           f"auto-tuned to the live link (probed {probed} "
                           "fps)")


def link_probe_mbps() -> float:
    """Measured host->device throughput of one ~16 MB transfer (median of
    3).  Stamped into bench_report entries so transfer-bound numbers are
    interpretable across sessions (this relay's link health varies
    45-90 MB/s day to day — PLATFORM_NOTES.md)."""
    buf = np.random.default_rng(0).integers(
        0, 256, size=(16 << 20,), dtype=np.uint8)
    f = jax.jit(lambda x: jnp.sum(x, dtype=jnp.int32))
    float(f(buf))  # compile AT THE TIMED SHAPE (a different shape would
    #                recompile inside the first timed sample)
    ts = []
    for _ in range(3):
        t0 = time.perf_counter()
        float(f(buf))
        ts.append(time.perf_counter() - t0)
    return (buf.nbytes / (1 << 20)) / statistics.median(ts)


def bench_qa(seven_b=False, spec=0, max_new=16, vs_plain=False):
    """QA latency: retrieval forward + prompt prefill + decode.

    spec>0 builds the session with prompt-lookup speculative decoding
    (spec_decode_draft=spec) PLUS cross-question draft history — the bench
    asks the same question repeatedly, which is the repeat/related-question
    serving regime (StreamingBench re-asks over one video) where history
    drafting shines; answers are bit-identical to plain greedy either way,
    so the delta is pure decode-loop speedup at the achieved acceptance.

    vs_plain: also measure PLAIN greedy on the SAME session via the runtime
    set_spec_decode(0) toggle and return (spec_ms, plain_ms).  One session
    serves both arms: identical stream state for a fair delta, and half the
    peak HBM — two 7B sessions (~11 GB each) cannot coexist on one 16 GB
    chip (the round-3 qa_7b_spec RESOURCE_EXHAUSTED)."""
    sess, cfg = build(seven_b=seven_b, spec=spec,
                      spec_history=256 if spec else 0)
    sess.encode_init_prompt(list(range(14)))
    fast_forward(sess, STEADY_BLOCKS)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(CHUNK, 384, 384, 3), dtype=np.uint8)
    sess.encode_video(frames)
    hard_sync(sess)
    q = list(rng.integers(1, 1000, size=24))
    p = list(rng.integers(1, 1000, size=40))

    def arm():
        lat = []
        for rep in range(7):
            t0 = time.perf_counter()
            ans = sess.question_answering(q, p, stop_token_ids=[-2],
                                          max_new_tokens=max_new)
            lat.append((time.perf_counter() - t0) * 1000)
            assert len(ans) == max_new
        lat.sort()
        record_samples(lat)
        return lat[len(lat) // 2]

    spec_ms = arm()
    if not vs_plain:
        return spec_ms
    spec_samples = list(_LAST_SAMPLES)
    sess.set_spec_decode(0)
    plain_ms = arm()
    record_samples(spec_samples)  # the reported value is the spec arm's
    return spec_ms, plain_ms


def bench_qa_host(warm=False, quant="default"):
    """QA latency when retrieval hits HOST-evicted pages (two-tier store,
    speculative-prefetch path).  Cold: the prefetch table is cleared between
    repeats, so every repeat pays the new-question cost — a miss round (one
    dispatch), the host fetches, one bulk delta transfer to the device table,
    and the served round(s).  Warm: the table persists (repeat/related
    questions), so each QA is a single dispatch with zero host->device
    traffic.  The cold-warm gap is pure transfer; on a real v5e host PCIe
    the cold path is ~5 ms.  quant='default' measures the DEFAULT config
    (host_kv_quant='int8': pages cross the link as int8+scales, half the
    cold-path transfer; error bounded by test_host_tier.py); 'exact'
    measures the opt-in bit-exact tier (host_kv_quant='none')."""
    kvq = {"kv_int8": "int8", "kv_int4": "int4"}.get(quant, "none")
    sess, cfg = build(kv_quant=kvq)
    if quant == "exact":
        import dataclasses
        sess.rekv = dataclasses.replace(sess.rekv, host_kv_quant="none")
    elif quant == "tier_int4":
        # bf16 device store, INT4 host tier: quarter-size page transfers on
        # the cold path with the device-resident window untouched
        import dataclasses
        sess.rekv = dataclasses.replace(sess.rekv, host_kv_quant="int4")
    sess.encode_init_prompt(list(range(14)))
    fast_forward(sess, STEADY_BLOCKS)
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(CHUNK, 384, 384, 3), dtype=np.uint8)
    sess.encode_video(frames)
    # move the oldest 128 pages to host RAM (long-stream production state);
    # rep keys of fast-forwarded pages are zero, so the top-64 retrieval
    # lands entirely in the host tier — the worst case for this path
    from stc_tpu.kvcache.host_tier import (evict_pages, quantize_pages,
                                           quantize_pages_int4)
    E = 128
    ev_k, ev_v, ev_ks, ev_vs, sess.kvs = evict_pages(sess.kvs, E)
    if quant in ("kv_int8", "kv_int4"):
        # device pages are already int8/packed-int4 + scales (kv_quant store)
        sess.host_store.append(np.asarray(ev_k), np.asarray(ev_v),
                               np.asarray(ev_ks), np.asarray(ev_vs))
    elif sess.rekv.host_kv_quant in ("int8", "int4"):  # quantized tiers
        qfn = (quantize_pages_int4 if sess.rekv.host_kv_quant == "int4"
               else quantize_pages)
        kq, ks, vq, vs = qfn(ev_k, ev_v)
        sess.host_store.append(np.asarray(kq), np.asarray(vq),
                               np.asarray(ks), np.asarray(vs))
    else:
        sess.host_store.append(np.asarray(ev_k), np.asarray(ev_v))
    sess._evicted_pages = E
    hard_sync(sess)
    q = list(rng.integers(1, 1000, size=24))
    p = list(rng.integers(1, 1000, size=40))

    lat = []
    for rep in range(7):
        if not warm:
            sess.hp_reset()  # cold table each repeat (new-question case)
        t0 = time.perf_counter()
        ans = sess.question_answering(q, p, stop_token_ids=[-2],
                                      max_new_tokens=16)
        lat.append((time.perf_counter() - t0) * 1000)
        assert len(ans) == 16
    lat.sort()
    record_samples(lat)
    return lat[len(lat) // 2]


def bench_serving():
    """Fused phase-heterogeneous serving tick vs the unfused path.

    B=4 multiplexed streams each ingest an 8-frame chunk (480 pruned tokens)
    AND each answers its OWN question (ragged lengths) in the same tick —
    the ServingEngine shape.  Fused: ONE dispatch (models.qwen2.serve_step:
    ragged encode + retrieval + prefill + 16-token greedy decode).  Unfused:
    the same work as an encode dispatch + a batched-QA dispatch.  The gap is
    the dispatch overhead the fused path deletes; the reference pays one
    process per stream and one loop per phase (abstract_rekv.py:38-87).
    Returns (fused_ms, unfused_ms)."""
    from stc_tpu.config import ReKVConfig, SessionConfig
    from stc_tpu.runtime.session import StreamingSession
    B = 4
    text = qw.Qwen2Config(vocab_size=151936, hidden_size=896, num_layers=24,
                          num_heads=14, num_kv_heads=2, head_dim=64,
                          intermediate_size=4864, rope_base=1000000.0)
    rekv = ReKVConfig(n_init=14, n_local=15000, block_size=60,
                      exc_block_size=60 * CHUNK, topk=64, chunk_size=1,
                      max_blocks=1024, max_prompt_tokens=256,
                      max_new_tokens=128)
    params = qw.init_params(text, jax.random.key(0), dtype=jnp.bfloat16)
    sess = StreamingSession(params, text, SessionConfig(rekv=rekv), batch=B,
                            state_dtype=jnp.bfloat16)
    sess.encode_init_prompt(list(range(14)))
    fast_forward(sess, STEADY_BLOCKS)
    rng = np.random.default_rng(0)
    feats = rng.normal(size=(B, 60 * CHUNK, text.hidden_size)
                       ).astype(np.float32) * 0.02
    qs = [list(rng.integers(1, 1000, size=n)) for n in (24, 20, 16, 24)]
    ps = [list(rng.integers(1, 1000, size=n)) for n in (40, 36, 40, 32)]

    # pin the router: this bench measures BOTH arms explicitly (production
    # sessions default to 'auto', which probes exactly these two arms on
    # live ticks and keeps the winner)
    from stc_tpu.runtime.session import _ServeRouter
    sess._serve_router = _ServeRouter("fused")

    def fused():
        tok, cnt = sess.serve(feats, None, qs, ps, stop_token_ids=[-2],
                              max_new_tokens=16)
        assert sess.last_serve_fused and (cnt == 16).all()

    def unfused():
        sess.encode_video_features(feats)
        ans = sess.question_answering_batch(qs, ps, stop_token_ids=[-2],
                                            max_new_tokens=16)
        assert all(len(a) == 16 for a in ans)

    fused(); unfused(); hard_sync(sess)  # compile both paths
    lat = {"fused": [], "unfused": []}
    for rep in range(7):
        for name, fn in (("fused", fused), ("unfused", unfused)):
            t0 = time.perf_counter()
            fn()
            hard_sync(sess)
            lat[name].append((time.perf_counter() - t0) * 1000)
    f_med = statistics.median(lat["fused"])
    u_med = statistics.median(lat["unfused"])
    record_samples(lat["fused"] if f_med <= u_med else lat["unfused"])
    return f_med, u_med


def main():
    mode = os.getenv("BENCH_MODE", "ingest")
    if mode == "ingest":
        fps = bench_ingest()
        emit({
            "metric": "streaming ingest frames/sec/chip (llava-ov-0.5b "
                      f"shapes, STC cacher+pruner, {CHUNK}-frame chunks, "
                      "steady-state full window, encode+prefill)",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        })
    elif mode == "multistream":
        fps, label = autotune_multistream()
        emit({
            "metric": "aggregate streaming ingest frames/sec/chip "
                      "(4 parallel streams, llava-ov-0.5b shapes, STC "
                      f"cacher+pruner, {label}, steady state; "
                      f"= {fps / 4:.1f} fps per stream — multiplexing 4 "
                      "streams through one chip costs each stream vs the "
                      "single-stream ingest number)",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        })
    elif mode == "7b":
        fps = bench_ingest(seven_b=True)
        emit({
            "metric": "streaming ingest frames/sec/chip (llava-ov-7B FULL "
                      "28-layer depth, int8 weights + bf16 activations/KV — "
                      "bf16 weights need >1 chip — STC cacher+pruner, "
                      f"{CHUNK}-frame chunks, steady state; north star is "
                      "120 fps on v5e-8 = 15 fps/chip, dp streams are "
                      "independent so fps/chip scales linearly)",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 15.0, 3),
        })
    elif mode == "qa_7b":
        ms = bench_qa(seven_b=True)
        emit({
            "metric": "QA latency p50 (retrieval + 40-token prompt prefill "
                      "+ 16-token greedy decode, llava-ov-7B FULL depth, "
                      "int8 weights, steady-state full window)",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    elif mode == "qa":
        ms = bench_qa()
        emit({
            "metric": "QA latency p50 (retrieval + 40-token prompt prefill "
                      "+ 16-token greedy decode, llava-ov-0.5b shapes, "
                      "steady-state full window)",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    elif mode in ("qa_spec", "qa_7b_spec"):
        seven = mode == "qa_7b_spec"
        # one session serves BOTH arms (set_spec_decode(0) swaps the QA
        # program on the live state): a fair same-state delta, and half the
        # peak HBM — two 7B sessions cannot coexist on one 16 GB chip
        spec_ms, plain_ms = bench_qa(seven_b=seven, spec=4, max_new=32,
                                     vs_plain=True)
        shapes = "llava-ov-7b int8 weights" if seven else "llava-ov-0.5b"
        emit({
            "metric": "QA latency p50 WITH PROMPT-LOOKUP SPECULATIVE DECODE "
                      "+ cross-question draft history (K=4 drafts/round, "
                      f"32-token decode, {shapes}, steady-state, repeated-"
                      "question serving regime; answers bit-identical to "
                      "greedy; vs_baseline = plain-greedy p50 / speculative "
                      "p50 at the achieved draft acceptance)",
            "value": round(spec_ms, 1),
            "unit": "ms",
            "vs_baseline": round(plain_ms / spec_ms, 3),
        })
    elif mode == "ingest_kvq4":
        fps = bench_ingest(kv_quant="int4")
        emit({
            "metric": "streaming ingest frames/sec/chip with INT4 KV PAGES "
                      "(packed nibbles: quarter the page bytes + "
                      "quarter-width window reads, 4x retrievable history "
                      "at equal HBM, in-kernel nibble unpack; llava-ov-0.5b "
                      f"shapes, {CHUNK}-frame chunks, steady state)",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        })
    elif mode == "qa_host_kvq4":
        ms = bench_qa_host(quant="kv_int4")
        emit({
            "metric": "QA latency p50 with host-tier hits, INT4 KV pages "
                      "end to end (quarter-size page transfer, cold "
                      "prefetch table), llava-ov-0.5b shapes",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    elif mode == "ingest_yuv":
        fps = bench_ingest(ingest="yuv420")
        emit({
            "metric": "streaming ingest frames/sec/chip with YUV 4:2:0 "
                      "ingest (packed planar BT.601 planes cross the link "
                      "at HALF the bytes/frame — codecs store 4:2:0, the "
                      "decoder hands planes over for free; chroma upsample "
                      "+ RGB matrix ride the fused vision jit on device; "
                      f"llava-ov-0.5b shapes, {CHUNK}-frame chunks, steady "
                      "state)",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        })
    elif mode == "ingest_kvq":
        fps = bench_ingest(kv_quant="int8")
        emit({
            "metric": "streaming ingest frames/sec/chip with INT8 KV PAGES "
                      "(page store int8+scales: half the window-read HBM "
                      "bandwidth, 2x retrievable history at equal memory; "
                      f"llava-ov-0.5b shapes, {CHUNK}-frame chunks, steady "
                      "state)",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        })
    elif mode == "multistream_staged":
        fps, label = autotune_multistream(staged=True)
        ncpu = os.cpu_count()
        routed = "threaded overlap" if (ncpu or 1) >= 2 else (
            "synchronous (prefetch thread would contend with the "
            "dispatch thread for the only core)")
        emit({
            "metric": f"aggregate ingest fps, 4 streams, {label}, STAGED "
                      f"transfer path ({fps / 4:.1f} fps per stream; "
                      "FramePrefetcher+stage_chunk) with "
                      "core-count ROUTING: the prefetcher overlaps on "
                      "multi-core hosts and degrades to synchronous "
                      f"staging otherwise; this {ncpu}-core host routed to "
                      f"{routed}",
            "value": round(fps, 2),
            "unit": "frames/sec",
            "vs_baseline": round(fps / 60.0, 3),
        })
    elif mode == "qa_host_t4":
        ms = bench_qa_host(quant="tier_int4")
        emit({
            "metric": "QA latency p50 with host-tier hits, INT4 HOST TIER "
                      "over a bf16 device store (packed-nibble pages: "
                      "quarter-size cold-path transfers, device window "
                      "untouched; cold prefetch table), llava-ov-0.5b "
                      "shapes; error bound in test_host_tier.py",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    elif mode == "qa_host_kvq":
        ms = bench_qa_host(quant="kv_int8")
        emit({
            "metric": "QA latency p50 with host-tier hits, DEVICE int8 KV "
                      "pages end to end (store+host tier int8; cold "
                      "prefetch table), llava-ov-0.5b shapes",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    elif mode == "qa_host":
        ms = bench_qa_host()
        emit({
            "metric": "QA latency p50 with host-tier hits (top-64 retrieval "
                      "entirely from host RAM, cold prefetch table, + 40-token "
                      "prefill + 16-token decode, llava-ov-0.5b shapes; "
                      "DEFAULT config — host_kv_quant='int8' host tier, "
                      "error bound in test_host_tier.py; the opt-in "
                      "bit-exact 'none' tier costs ~1.7x more cold-path "
                      "transfer)",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    elif mode == "serving":
        fused_ms, unfused_ms = bench_serving()
        routed_ms = min(fused_ms, unfused_ms)
        pick = "fused" if fused_ms <= unfused_ms else "unfused"
        emit({
            "metric": "ROUTED serving tick p50 (4 multiplexed streams: "
                      f"ragged {CHUNK}-frame encode + 4 per-stream questions "
                      "with 16-token decode; sessions probe the fused "
                      "one-dispatch tick vs the unfused encode+QA pair on "
                      "live ticks and keep the winner — _ServeRouter; "
                      f"this run measured fused={fused_ms:.0f} ms, "
                      f"unfused={unfused_ms:.0f} ms, routed to {pick}; "
                      "vs_baseline = unfused pair p50 / routed p50)",
            "value": round(routed_ms, 1),
            "unit": "ms",
            "vs_baseline": round(unfused_ms / routed_ms, 3),
        })
    elif mode == "qa_host_warm":
        ms = bench_qa_host(warm=True)
        emit({
            "metric": "QA latency p50 with host-tier hits, WARM prefetch "
                      "table (repeat/related questions: one dispatch, zero "
                      "host->device traffic), llava-ov-0.5b shapes",
            "value": round(ms, 1),
            "unit": "ms",
            "vs_baseline": round(1000.0 / ms, 3),  # questions/sec
        })
    else:
        raise SystemExit(f"unknown BENCH_MODE={mode}")


if __name__ == "__main__":
    main()
