"""stc_tpu — TPU-native streaming-video LLM acceleration framework.

A from-scratch JAX/XLA/Pallas rebuild of the capabilities of lern-to-write/STC
(STC-Cacher + STC-Pruner + ReKV streaming retrieval KV cache), designed
TPU-first: static shapes, jit-compiled session steps, ring-buffered paged KV
in HBM, `lax.scan` over stacked decoder layers, and `jax.sharding` meshes for
multi-chip scale-out.

Layer map (mirrors reference SURVEY.md §1, re-architected):
  ops/       — RoPE, multi-stage masked attention (jnp reference + Pallas kernels)
  kvcache/   — fixed-capacity streaming KV state + jitted append/retrieve engine
               (TPU equivalent of reference model/attention/kv_cache_manager.py)
  compress/  — STC-Pruner and STC-Cacher (reference model/prune.py, custom_siglip.py)
  models/    — JAX model definitions + HF weight converters (reference model/*_rekv.py)
  runtime/   — streaming session API (reference model/abstract_rekv.py)
  parallel/  — meshes and shardings (reference used torchrun DP only; we add tp/dp)
  eval/      — benchmark harnesses (reference model/video_qa, streamingbench, ovobench)
"""

__version__ = "0.1.0"
