"""Performance instrumentation for streaming sessions.

Equivalent of the reference's ad-hoc CUDA-event timing + peak-memory stats
(videomme_refactored.py:20-44, abstract_rekv.py:84-87), as a first-class
utility: per-frame latency percentiles, throughput, and KV memory — the
BASELINE.md primary metrics (frames/sec/chip, p50 per-frame latency).
"""

from __future__ import annotations

import time
from typing import Dict, List, Optional


class Timer:
    """`with Timer() as t: ...; t.seconds` — wall-clock; call `sync` for a
    function that forces device completion first (on this platform a value
    fetch, since block_until_ready can return early)."""

    def __init__(self, sync=None):
        self._sync = sync
        self.seconds = 0.0

    def __enter__(self):
        if self._sync:
            self._sync()
        self._t0 = time.perf_counter()
        return self

    def __exit__(self, *exc):
        if self._sync:
            self._sync()
        self.seconds = time.perf_counter() - self._t0
        return False


class StreamingStats:
    def __init__(self):
        self.frame_times: List[float] = []
        self.encode_tokens = 0
        self.questions = 0
        self.qa_times: List[float] = []

    def record_frame(self, seconds: float, tokens: int = 0):
        self.frame_times.append(seconds)
        self.encode_tokens += tokens

    def record_qa(self, seconds: float):
        self.questions += 1
        self.qa_times.append(seconds)

    @staticmethod
    def _pct(xs: List[float], p: float) -> Optional[float]:
        if not xs:
            return None
        xs = sorted(xs)
        i = min(len(xs) - 1, int(round(p / 100 * (len(xs) - 1))))
        return xs[i]

    def summary(self, kv_memory_bytes: int = 0) -> Dict:
        ft = self.frame_times
        total = sum(ft)
        return {
            "frames": len(ft),
            "fps": len(ft) / total if total else None,
            "frame_p50_ms": (self._pct(ft, 50) or 0) * 1e3 if ft else None,
            "frame_p95_ms": (self._pct(ft, 95) or 0) * 1e3 if ft else None,
            "encode_tokens": self.encode_tokens,
            "questions": self.questions,
            "qa_p50_ms": (self._pct(self.qa_times, 50) or 0) * 1e3
            if self.qa_times else None,
            "kv_memory_gb": kv_memory_bytes / 1024 ** 3,
        }


def flops_of_compiled(compiled) -> Optional[float]:
    """Read the FLOPs figure out of a compiled executable's cost analysis.
    Shared by every cost-model reader (estimate_flops, VLMSession.
    estimate_chunk_flops) so the extraction quirks — list unwrapping,
    missing-analysis backends — cannot drift apart."""
    try:
        ca = compiled.cost_analysis()
    except Exception:
        return None
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    if not ca or "flops" not in ca:
        return None
    return float(ca["flops"])


def estimate_flops(fn, *args, **kwargs) -> Optional[float]:
    """Analytical FLOPs of one call of `fn(*args, **kwargs)` from XLA's
    compiled cost model — the TPU-native analogue of the reference's
    calflops GFLOPs instrumentation (flash_vstream_rekv.py:116-123,
    203-229), but exact for the compiled program instead of a torch-module
    estimate.  Returns None when the backend reports no cost analysis
    (some platforms/plugins omit it)."""
    import jax

    return flops_of_compiled(jax.jit(fn).lower(*args, **kwargs).compile())
