"""Continuous-batching serving engine over one batched streaming session.

Multiplexes B independent logical streams (each its own video + question
traffic, arriving at its own rate) onto the B slots of a single batched
StreamingSession/VLMSession.  Each scheduler tick drains at most one frame
chunk and one question per slot and batches them into shared dispatches:

  - encode work rides a RAGGED dispatch (per-stream `active` masks;
    engine.append_stream keeps inactive streams bit-identical),
  - question work rides a per-stream-question batched QA
    (session.question_answering_batch), and
  - a tick with BOTH runs them in ONE fused dispatch on the hot path
    (session.serve -> models.qwen2.serve_step).

This is the serving shape the reference cannot express: its sessions are
one-per-process and every phase is a separate loop
(model/abstract_rekv.py:38-87 encodes and answers strictly in sequence for
a single stream).  On a dispatch-bound host (see ROOFLINE.json) batching
k streams' ticks into one dispatch is ~k times the aggregate throughput.
"""

from __future__ import annotations

import collections
from dataclasses import dataclass, field
from typing import Any, Dict, List, Optional, Sequence

import numpy as np


@dataclass
class _Request:
    question_ids: List[int]
    prompt_ids: List[int]
    request_id: int


@dataclass
class ServingStats:
    ticks: int = 0
    fused_ticks: int = 0
    encode_chunks: int = 0
    answers: int = 0
    streams_retired: int = 0
    streams_admitted: int = 0
    # per-slot counters
    slot_chunks: List[int] = field(default_factory=list)
    slot_answers: List[int] = field(default_factory=list)


class ServingEngine:
    """Continuous-batching multiplexer.

    session: a StreamingSession (features in) or VLMSession (pixels in) with
    batch == number of slots.  stop_token_ids / max_new_tokens are engine
    level: one fused dispatch shares the stop set and the static decode
    bound across streams (per-request values would force one dispatch per
    distinct bound).
    """

    def __init__(self, session, stop_token_ids: Sequence[int],
                 max_new_tokens: int = 32):
        self.sess = session
        self.n_slots = session.batch
        self.stop_token_ids = list(stop_token_ids)
        self.max_new_tokens = max_new_tokens
        self._chunks = [collections.deque() for _ in range(self.n_slots)]
        self._questions = [collections.deque() for _ in range(self.n_slots)]
        self._next_rid = 0
        self._free: set = set()  # retired slots awaiting admission
        self.stats = ServingStats(slot_chunks=[0] * self.n_slots,
                                  slot_answers=[0] * self.n_slots)

    # ------------------------------------------------------------------ #
    def submit_chunk(self, slot: int, chunk) -> None:
        """Queue one frame chunk for `slot`.

        Features session: (T, E) pruned features, T a block_size multiple.
        VLM session: (n_frames, H, W, 3) uint8 pixels.
        Every queued chunk must share one shape — ticks batch across slots.
        """
        assert slot not in self._free, f"slot {slot} is retired (admit first)"
        chunk = np.asarray(chunk)
        for q in self._chunks:
            if q:
                assert q[0].shape == chunk.shape, (
                    f"serving ticks batch one chunk per slot into a shared "
                    f"dispatch; all queued chunks must share a shape, got "
                    f"{chunk.shape} vs {q[0].shape}")
                break
        self._chunks[slot].append(chunk)

    def submit_question(self, slot: int, question_ids: Sequence[int],
                        prompt_ids: Sequence[int]) -> int:
        """Queue a question for `slot`; returns a request id that keys the
        answer in step()'s result dict."""
        assert slot not in self._free, f"slot {slot} is retired (admit first)"
        rid = self._next_rid
        self._next_rid += 1
        self._questions[slot].append(
            _Request(list(question_ids), list(prompt_ids), rid))
        return rid

    # ------------------------------------------------------------------ #
    def retire(self, slot: int) -> None:
        """A stream ended: drop its queued work, recycle its session slot
        (counters/rep keys/cacher refs/pruner memory back to fresh-session
        state — session.reset_streams), and mark the slot free for the next
        incoming stream.  The other slots' streams continue untouched; the
        reference ends a whole process per stream instead."""
        assert 0 <= slot < self.n_slots and slot not in self._free
        self._chunks[slot].clear()
        self._questions[slot].clear()
        self.sess.reset_streams([slot])
        self._free.add(slot)
        self.stats.streams_retired += 1

    def admit(self) -> int:
        """Claim a recycled slot for a new stream; returns the slot id.
        Raises if no slot is free (callers queue admission at a higher
        level — slot count is the static batch of the session)."""
        if not self._free:
            raise RuntimeError(
                f"all {self.n_slots} slots are serving; retire one first")
        slot = min(self._free)
        self._free.discard(slot)
        self.stats.streams_admitted += 1
        return slot

    @property
    def free_slots(self) -> int:
        return len(self._free)

    def is_free(self, slot: int) -> bool:
        """True if `slot` is retired and awaiting admission."""
        return slot in self._free

    @property
    def pending(self) -> int:
        return (sum(len(q) for q in self._chunks)
                + sum(len(q) for q in self._questions))

    @property
    def route_decisions(self) -> Dict:
        """Measured-cost routing decisions the session has settled so far
        ({dispatch-shape key: 'fused'|'unfused'} — see session._ServeRouter);
        empty while probing or when STC_SERVE_ROUTE pins the route."""
        return dict(self.sess._serve_router.decisions)

    # ------------------------------------------------------------------ #
    def step(self) -> Dict[int, Dict[str, Any]]:
        """One scheduler tick: drain <= 1 chunk and <= 1 question per slot.

        Returns {request_id: {"slot": b, "tokens": [...]}} for every question
        answered this tick (empty dict on a pure-encode or idle tick).
        """
        enc = [q.popleft() if q else None for q in self._chunks]
        ask = [q.popleft() if q else None for q in self._questions]
        any_enc = any(c is not None for c in enc)
        any_ask = any(r is not None for r in ask)
        if not (any_enc or any_ask):
            return {}
        self.stats.ticks += 1

        active = np.asarray([c is not None for c in enc])
        for b, c in enumerate(enc):
            if c is not None:
                self.stats.slot_chunks[b] += 1
                self.stats.encode_chunks += 1
        feats = None
        if any_enc:
            shape = next(c for c in enc if c is not None).shape
            feats = np.stack([c if c is not None
                              else np.zeros(shape, enc_dtype(enc))
                              for c in enc])

        out: Dict[int, Dict[str, Any]] = {}
        if not any_ask:
            self._encode(feats, active)
            return out

        # dummy question/prompt rows for slots not asking (their computed
        # answers are discarded — the dispatch is SPMD-dense either way)
        questions = [(r.question_ids if r else [0]) for r in ask]
        prompts = [(r.prompt_ids if r else [0]) for r in ask]
        asked = [r is not None for r in ask]
        if any_enc:
            # both session kinds fuse encode+QA into one dispatch on the hot
            # path: features via session.serve -> qwen2.serve_step, pixels
            # via VLMSession.serve (vision tower rides the same dispatch)
            tokens, count = self.sess.serve(
                feats, active, questions, prompts, self.stop_token_ids,
                max_new_tokens=self.max_new_tokens, asked=asked)
            if self.sess.last_serve_fused:
                self.stats.fused_ticks += 1
            answers = [[int(t) for t in tokens[b, :int(count[b])]]
                       for b in range(self.n_slots)]
        else:
            answers = self.sess.question_answering_batch(
                questions, prompts, self.stop_token_ids,
                max_new_tokens=self.max_new_tokens, asked=asked)
        for b, r in enumerate(ask):
            if r is not None:
                self.stats.slot_answers[b] += 1
                self.stats.answers += 1
                out[r.request_id] = {"slot": b, "tokens": answers[b]}
        return out

    def run(self, max_ticks: int = 1_000_000) -> Dict[int, Dict[str, Any]]:
        """Drain all queued work; returns the merged answer dict."""
        out: Dict[int, Dict[str, Any]] = {}
        for _ in range(max_ticks):
            if self.pending == 0:
                return out
            out.update(self.step())
        raise RuntimeError("serving queue did not drain")

    # ------------------------------------------------------------------ #
    def _is_features_session(self) -> bool:
        # VLMSession ingests pixels through its own fused vision+LM jits
        return not hasattr(self.sess, "vision")

    def _encode(self, feats: np.ndarray, active: np.ndarray) -> None:
        if self._is_features_session():
            self.sess.encode_video_features(feats, active=active)
        else:
            self.sess.encode_video(feats, active=active)


def enc_dtype(enc) -> np.dtype:
    return next(c for c in enc if c is not None).dtype
