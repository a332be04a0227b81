"""Streaming host pipeline: decode/preprocess frames ahead of the device.

TPU-native equivalent of the reference's CUDA-side-stream overlap
(kv_cache_manager.py GLOBAL_STREAM + pinned-memory copies, SURVEY.md §2.4):
here the overlap is host-threaded — a prefetch thread decodes + preprocesses
chunk t+1 (native C++ preprocessor when available) while the device encodes
chunk t (JAX dispatch is async, so the python thread is free).

Also provides ffmpeg-free / decord-free loading fallbacks for .npy frame
dumps so the pipeline runs in containers without video codecs.
"""

from __future__ import annotations

import os
import queue
import threading
from typing import Callable, Iterable, Iterator, Optional

import numpy as np


def _can_overlap() -> bool:
    """A prefetch thread only helps when a core is free to run it; on a
    single-core host it contends with the dispatching thread for the GIL
    and the CPU and measurably LOSES to synchronous staging (PLATFORM_NOTES
    staged-vs-sync numbers).  Routed the same way serve ticks route
    fused-vs-unfused: act on the host we actually have."""
    return (os.cpu_count() or 1) >= 2


class FramePrefetcher:
    """Wraps a frame-chunk iterator with a background preprocessing thread.

    chunks: iterable of (n, H, W, 3) uint8 arrays.
    preprocess: host-side fn chunk -> model input (numpy or device array).
    depth: max prefetched chunks (double buffering by default).
    overlap: True/False pins the threaded path; None (default) routes on
        the host's core count — single-core hosts iterate synchronously
        (same outputs, no thread).  STC_PREFETCH_OVERLAP=0/1 overrides.
    """

    _SENTINEL = object()

    def __init__(self, chunks: Iterable[np.ndarray],
                 preprocess: Callable, depth: int = 2,
                 overlap: Optional[bool] = None):
        env = os.getenv("STC_PREFETCH_OVERLAP")
        if overlap is None:
            overlap = _can_overlap() if env is None else env not in ("0", "")
        self._overlap = bool(overlap)
        if not self._overlap:  # synchronous passthrough (1-core hosts)
            self._chunks, self._pre = chunks, preprocess
            return
        self._q: "queue.Queue" = queue.Queue(maxsize=depth)
        self._err: Optional[BaseException] = None

        def worker():
            try:
                for c in chunks:
                    self._q.put(preprocess(c))
            except BaseException as e:  # propagate to consumer
                self._err = e
            finally:
                self._q.put(self._SENTINEL)

        self._t = threading.Thread(target=worker, daemon=True)
        self._t.start()

    def __iter__(self) -> Iterator:
        if not self._overlap:
            for c in self._chunks:
                yield self._pre(c)
            return
        while True:
            item = self._q.get()
            if item is self._SENTINEL:
                if self._err is not None:
                    raise self._err
                return
            yield item


def native_preprocess(frames: np.ndarray, out_hw: int, mean, std):
    """C++ preprocessor with numpy fallback (same math, half-pixel bilinear
    left to jax on-device in the fallback: returns HWC uint8 untouched so the
    session's jitted _pre handles it)."""
    from stc_tpu import native
    out = native.preprocess_frames(frames, out_hw, mean, std)
    return out if out is not None else frames


def stream_encode(session, frames: np.ndarray, chunk_frames: int = 1,
                  depth: int = 2):
    """Encode a whole clip through the session with host prefetch overlap."""
    chunks = (frames[i:i + chunk_frames]
              for i in range(0, len(frames), chunk_frames))
    for chunk in FramePrefetcher(chunks, lambda c: c, depth=depth):
        session.encode_video(chunk)
