#!/usr/bin/env python
"""Continuous-batching serving demo + smoke: multiplexes N logical streams
(each its own synthetic video + question traffic) onto one batched session
through the ServingEngine, with mid-run stream churn (retire/admit) and an
optional slot migration through a checkpoint file.  Prints per-tick and
aggregate stats (fused-tick ratio, answers, churn).

The reference serves one stream per PROCESS with strictly sequential
encode/QA phases (model/abstract_rekv.py:38-87); everything below runs in
one process on one device, one dispatch per tick.

Runs with random weights (no checkpoint needed):

  python scripts/serve_demo.py --slots 4 --ticks 24 --size tiny --cpu
  python scripts/serve_demo.py --slots 4 --ticks 24 --size 0.5b --spec 4
"""

import argparse
import os
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--slots", type=int, default=4)
    ap.add_argument("--ticks", type=int, default=24)
    ap.add_argument("--size", choices=["tiny", "0.5b"], default="tiny")
    ap.add_argument("--spec", type=int, default=0,
                    help="spec_decode_draft (0 = plain greedy)")
    ap.add_argument("--churn_at", type=int, default=None,
                    help="tick at which stream 1 ends and a new one is "
                    "admitted into its slot (default: ticks//2)")
    ap.add_argument("--migrate", action="store_true",
                    help="also checkpoint stream 0 and restore it into the "
                    "recycled slot (save_stream_state round trip)")
    ap.add_argument("--cpu", action="store_true")
    args = ap.parse_args()
    churn_at = args.churn_at if args.churn_at is not None else args.ticks // 2

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    from stc_tpu.config import ReKVConfig, SessionConfig
    from stc_tpu.models import qwen2 as qw
    from stc_tpu.runtime.serving import ServingEngine
    from stc_tpu.runtime.session import StreamingSession
    from stc_tpu.utils.checkpoint import load_stream_state, save_stream_state

    if args.size == "tiny":
        mcfg = qw.Qwen2Config.tiny()
        rekv = ReKVConfig(n_init=4, n_local=128, block_size=8,
                          exc_block_size=8, topk=4, max_blocks=256,
                          max_prompt_tokens=16, max_new_tokens=8,
                          spec_decode_draft=args.spec,
                          spec_history_tokens=256 if args.spec else 0)
        q_vocab = mcfg.vocab_size
    else:
        mcfg = qw.Qwen2Config(vocab_size=151936, hidden_size=896,
                              num_layers=24, num_heads=14, num_kv_heads=2,
                              head_dim=64, intermediate_size=4864,
                              rope_base=1e6)
        rekv = ReKVConfig(n_init=14, n_local=15000, block_size=60,
                          exc_block_size=60, topk=64, max_blocks=1024,
                          max_prompt_tokens=64, max_new_tokens=16,
                          spec_decode_draft=args.spec,
                          spec_history_tokens=512 if args.spec else 0)
        q_vocab = 1000
    dtype = jnp.float32 if args.size == "tiny" else jnp.bfloat16
    params = qw.init_params(mcfg, jax.random.key(0), dtype=dtype)
    sess = StreamingSession(params, mcfg, SessionConfig(rekv=rekv),
                            batch=args.slots, state_dtype=dtype)
    sess.encode_init_prompt(list(range(rekv.n_init)))
    eng = ServingEngine(sess, stop_token_ids=[0],
                        max_new_tokens=rekv.max_new_tokens)

    rng = np.random.default_rng(0)

    def chunk():
        return rng.normal(size=(rekv.block_size, mcfg.hidden_size)
                          ).astype(np.float32) * 0.02

    def question(slot, tick):
        n = 4 + (slot + tick) % 5
        return (list(rng.integers(1, q_vocab, size=n)),
                list(rng.integers(1, q_vocab, size=n + 2)))

    print(f"serving {args.slots} streams, {args.ticks} ticks, "
          f"spec_decode_draft={args.spec}, churn at tick {churn_at}")
    t0 = time.perf_counter()
    answered = 0
    for tick in range(args.ticks):
        # per-slot arrival pattern: slot s ticks every s+1 steps
        for s in range(args.slots):
            if eng.is_free(s):
                continue
            if tick % (s + 1) == 0:
                eng.submit_chunk(s, chunk())
            if (tick + s) % 5 == 4:
                q, p = question(s, tick)
                eng.submit_question(s, q, p)
        if tick == churn_at and args.slots > 1:
            blob = None
            if args.migrate:
                blob = os.path.join(tempfile.mkdtemp(), "stream0.npz")
                save_stream_state(sess, 0, blob)
            eng.retire(1)
            slot = eng.admit()
            if blob is not None:
                load_stream_state(sess, slot, blob)
                print(f"  tick {tick}: stream 1 retired; stream 0 cloned "
                      f"into slot {slot} via {blob}")
            else:
                print(f"  tick {tick}: stream 1 retired; fresh stream "
                      f"admitted into slot {slot}")
        res = eng.step()
        answered += len(res)
        for rid, r in res.items():
            print(f"  tick {tick}: slot {r['slot']} answered rid={rid} "
                  f"({len(r['tokens'])} tokens)")
    eng.run()  # drain
    dt = time.perf_counter() - t0
    st = eng.stats
    print(f"done in {dt:.1f}s: {st.ticks} ticks ({st.fused_ticks} fused), "
          f"{st.encode_chunks} chunks, {st.answers} answers, "
          f"{st.streams_retired} retired / {st.streams_admitted} admitted")
    print(f"per-slot chunks {st.slot_chunks} answers {st.slot_answers}")
    if eng.route_decisions:
        print(f"serve routing settled: {eng.route_decisions}")
    assert st.answers >= answered and st.encode_chunks > 0


if __name__ == "__main__":
    main()
