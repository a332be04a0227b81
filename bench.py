"""Streaming ingest benchmark — frames/sec/chip (encode + LM prefill).

Runs the flagship LLaVA-OneVision-0.5B-shaped pipeline with STC cacher+pruner
defaults (196 -> 60 tokens/frame, 25% ViT recompute on cached chunks) on the
default JAX platform (the real TPU chip under the driver).  Weights are
random (throughput does not depend on weight values); shapes are the real
llava-onevision-qwen2-0.5b-ov ones.

Prints ONE JSON line:
  {"metric": ..., "value": fps, "unit": "frames/sec", "vs_baseline": fps/60}
vs_baseline is the multiple of 60-fps real-time ingest (the BASELINE.md
north-star: >=2x real-time on the 7B config on a v5e-8 pod; this measures the
single-chip 0.5B-shaped config).
"""

import json
import os
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


def build():
    vision = sg.SiglipConfig(hidden_size=1152, num_layers=27, num_heads=16,
                             intermediate_size=4304, image_size=384,
                             patch_size=14)
    text = qw.Qwen2Config(vocab_size=151936, hidden_size=896, num_layers=24,
                          num_heads=14, num_kv_heads=2, head_dim=64,
                          intermediate_size=4864, rope_base=1000000.0)
    cfg = lo.LlavaOVConfig(vision=vision, text=text)
    scfg = SessionConfig(
        rekv=ReKVConfig(n_init=14, n_local=15000, block_size=60,
                        exc_block_size=60, topk=64, chunk_size=1,
                        max_blocks=1024, max_prompt_tokens=256,
                        max_new_tokens=128),
        cacher=CacherConfig(strategy="cacher", update_token_ratio=0.25,
                            cache_interval=2),
        pruner=PrunerConfig(token_per_frame=60),
    )
    params = lo.init_random_params(cfg, jax.random.key(0), dtype=jnp.bfloat16)
    sess = lo.build_session(params, cfg, scfg, state_dtype=jnp.bfloat16,
                            vision_dtype=jnp.bfloat16)
    return sess, cfg


def main():
    # warmup must cross every window bucket the timed section touches
    # (bucketed window attention recompiles at powers of two)
    n_frames = int(os.getenv("BENCH_FRAMES", "24"))
    n_warmup = int(os.getenv("BENCH_WARMUP", "40"))
    rng = np.random.default_rng(0)

    sess, cfg = build()
    sess.encode_init_prompt(list(range(14)))

    frames = rng.integers(0, 256, size=(4, 384, 384, 3), dtype=np.uint8)

    def hard_sync():
        # NOTE: on this platform block_until_ready can return before the
        # execution finishes; fetching a value is the only reliable barrier
        return float(jnp.sum(sess.kvs.block_rep.astype(jnp.float32)))

    # warmup: compile both vision paths + LM encode
    for i in range(n_warmup):
        sess.encode_video(frames[i % 4:i % 4 + 1])
    hard_sync()

    # best-of-2 timed passes (this platform's run-to-run variance is ~20%)
    best = float("inf")
    for _ in range(2):
        t0 = time.perf_counter()
        for i in range(n_frames):
            sess.encode_video(frames[i % 4:i % 4 + 1])
        hard_sync()
        best = min(best, time.perf_counter() - t0)

    fps = n_frames / best
    print(json.dumps({
        "metric": "streaming ingest frames/sec/chip "
                  "(llava-ov-0.5b shapes, STC cacher+pruner, encode+prefill)",
        "value": round(fps, 2),
        "unit": "frames/sec",
        "vs_baseline": round(fps / 60.0, 3),
    }))


if __name__ == "__main__":
    main()
