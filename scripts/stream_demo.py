#!/usr/bin/env python
"""Streaming session demo + smoke: synthesizes a video stream, runs the full
STC pipeline (cacher + pruner + ReKV), asks questions mid-stream, prints
live throughput/latency metrics.

Runs with random weights (no checkpoint needed) — useful as a quick
end-to-end health check on any device:

  python scripts/stream_demo.py --frames 32 --size tiny
  python scripts/stream_demo.py --frames 64 --size 0.5b   # real shapes
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--frames", type=int, default=32)
    ap.add_argument("--size", choices=["tiny", "0.5b"], default="tiny")
    ap.add_argument("--question_every", type=int, default=16)
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from stc_tpu.config import (CacherConfig, PrunerConfig, ReKVConfig,
                                SessionConfig)
    from stc_tpu.models import llava_onevision as lo
    from stc_tpu.models import qwen2 as qw
    from stc_tpu.models import siglip as sg
    from stc_tpu.utils.metrics import StreamingStats

    if args.size == "tiny":
        cfg = lo.LlavaOVConfig.tiny()
        rekv = ReKVConfig(n_init=4, n_local=256, block_size=3,
                          exc_block_size=3, topk=4, max_blocks=128,
                          max_prompt_tokens=32, max_new_tokens=8)
        tpf, hw = 3, 56
    else:
        cfg = lo.LlavaOVConfig(
            vision=sg.SiglipConfig(),
            text=qw.Qwen2Config(vocab_size=151936, hidden_size=896,
                                num_layers=24, num_heads=14, num_kv_heads=2,
                                head_dim=64, intermediate_size=4864,
                                rope_base=1e6))
        rekv = ReKVConfig(n_init=14, n_local=15000, block_size=60,
                          exc_block_size=60, topk=64, max_blocks=1024,
                          max_prompt_tokens=256, max_new_tokens=32)
        tpf, hw = 60, 384
    scfg = SessionConfig(rekv=rekv, cacher=CacherConfig(),
                         pruner=PrunerConfig(token_per_frame=tpf))

    dtype = jnp.float32 if args.cpu else jnp.bfloat16
    params = lo.init_random_params(cfg, jax.random.key(0), dtype=dtype)
    sess = lo.build_session(params, cfg, scfg, state_dtype=dtype,
                            vision_dtype=dtype)
    stats = StreamingStats()

    sess.encode_init_prompt(list(range(rekv.n_init)))
    rng = np.random.default_rng(0)
    print(f"streaming {args.frames} frames ({args.size} shapes, "
          f"{tpf} tokens/frame after pruning)...")
    for i in range(args.frames):
        frame = rng.integers(0, 256, (1, hw, hw, 3), dtype=np.uint8)
        t0 = time.perf_counter()
        sess.encode_video(frame)
        if i % 8 == 7:  # periodic hard sync for honest numbers
            float(jnp.sum(sess.kvs.block_rep.astype(jnp.float32)))
        stats.record_frame(time.perf_counter() - t0, tokens=tpf)

        if (i + 1) % args.question_every == 0:
            t0 = time.perf_counter()
            ans = sess.question_answering(
                [5, 6, 7], [5, 6, 7, 8], stop_token_ids=[0],
                max_new_tokens=rekv.max_new_tokens)
            stats.record_qa(time.perf_counter() - t0)
            print(f"  t={i + 1:4d}f  QA -> {len(ans)} tokens "
                  f"({stats.qa_times[-1] * 1e3:.0f} ms)")

    s = stats.summary(sess.kv_memory_bytes())
    print(f"done: {s['fps']:.1f} fps | p50 {s['frame_p50_ms']:.1f} ms | "
          f"p95 {s['frame_p95_ms']:.1f} ms | {s['questions']} questions | "
          f"KV {s['kv_memory_gb'] * 1024:.1f} MB | "
          f"host tier: {sess.host_store.total_pages} pages")


if __name__ == "__main__":
    main()
