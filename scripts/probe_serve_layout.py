"""Probe the fused serving tick's parameter-layout boundary (round-5 #1).

Round-4 diagnosis (NEXT_STEPS #5): in the merged encode+QA program XLA
prefers a NON-DEFAULT layout for the page store inside its while loop and
pays ~4 full-store relayout copies at the parameter boundary
(bf16[24,4,2,1024,60,64] ~ 1.5 GB each).  The specified fix: commit the
session's kvs buffers in the loop-preferred layout at init so the boundary
matches.

This script measures, on the live TPU:
  1. baseline: lower the fused serve program with default input layouts,
     count `copy` ops of the store shape in the optimized HLO;
  2. AUTO: compile with Layout.AUTO on the kvs leaves, read back XLA's
     preferred input formats, count copies in THAT program;
  3. committed: device_put kvs into the preferred formats, retrace the jit
     normally (committed layouts become input constraints), re-count copies
     and check the donated output keeps the committed layout (so steady-state
     ticks never relayout);
  4. time fused vs unfused in both layout regimes (same process, interleaved).

Writes scripts/probe_serve_layout.out.json.
"""

import functools
import json
import os
import re
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp
from jax.experimental.layout import Format, Layout

from stc_tpu.config import ReKVConfig, SessionConfig
from stc_tpu.models import qwen2 as qw
from stc_tpu.runtime.session import StreamingSession, _ServeRouter, _stop_arr

CHUNK = 8
B = 4
STEADY_BLOCKS = int(os.getenv("BENCH_STEADY_BLOCKS", "400"))


def count_store_copies(hlo_text: str, shape_re: str) -> int:
    """Count copy ops over the page-store shape in optimized HLO."""
    n = 0
    for line in hlo_text.splitlines():
        if (" copy(" in line or " copy-start(" in line) \
                and re.search(shape_re, line):
            n += 1
    return n


def main():
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
    # fast-forward the window so the serve tick sees steady state
    from bench import fast_forward, hard_sync  # repo-root bench helpers
    fast_forward(sess, STEADY_BLOCKS)
    hard_sync(sess)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, 60 * CHUNK, text.hidden_size))
                        .astype(np.float32) * 0.02, jnp.bfloat16)
    qs = [list(rng.integers(1, 1000, size=n)) for n in (24, 20, 16, 24)]
    ps = [list(rng.integers(1, 1000, size=n)) for n in (40, 36, 40, 32)]
    q_ids, q_len = sess._pad_ids(qs)
    p_ids, p_len = sess._pad_ids(ps)
    stop_arr = _stop_arr([-2])
    mask = jnp.ones((B,), bool)

    serve_fn = functools.partial(qw.serve_step, cfg=text, rekv=rekv,
                                 max_new_tokens=16,
                                 attn_backend=sess.attn_backend)

    def serve_pos(params, kvs, embeds, active, q_ids, q_len, p_ids, p_len,
                  stop_ids):
        return serve_fn(params, kvs=kvs, embeds=embeds, active=active,
                        q_ids=q_ids, q_len=q_len, p_ids=p_ids, p_len=p_len,
                        stop_ids=stop_ids)

    args = (sess.params, sess.kvs, feats, mask, jnp.asarray(q_ids),
            jnp.asarray(q_len, jnp.int32), jnp.asarray(p_ids),
            jnp.asarray(p_len, jnp.int32), jnp.asarray(stop_arr))

    L, Hkv, D = text.num_layers, text.num_kv_heads, text.head_dim
    S, M = rekv.block_size, rekv.max_blocks
    store_re = rf"bf16\[{L},{B},{Hkv},{M},{S},{D}\]"
    out = {"store_shape": f"bf16[{L},{B},{Hkv},{M},{S},{D}]"}

    # -- 1. baseline program ------------------------------------------------
    print("[probe] compiling baseline fused program...", flush=True)
    t0 = time.perf_counter()
    base_jit = jax.jit(serve_pos, donate_argnums=(1,))
    base_comp = base_jit.lower(*args).compile()
    out["baseline_compile_s"] = round(time.perf_counter() - t0, 1)
    base_hlo = base_comp.as_text()
    out["baseline_store_copies"] = count_store_copies(base_hlo, store_re)
    base_fmts = base_comp.input_formats[0][1]  # the session state's layouts
    out["baseline_block_k_layout"] = str(base_fmts.block_k.layout)
    print(f"[probe] baseline copies: {out['baseline_store_copies']}",
          flush=True)

    # -- 2. AUTO layouts on the kvs argument ---------------------------------
    print("[probe] compiling AUTO-layout fused program...", flush=True)
    kvs_auto = jax.tree.map(lambda _: Format(Layout.AUTO), sess.kvs)
    in_fmts = (None, kvs_auto) + (None,) * 7
    out_fmts_spec = (kvs_auto, None, None)  # donation demands AUTO out too
    t0 = time.perf_counter()
    auto_jit = jax.jit(serve_pos, in_shardings=in_fmts,
                       out_shardings=out_fmts_spec, donate_argnums=(1,))
    auto_comp = auto_jit.lower(*args).compile()
    out["auto_compile_s"] = round(time.perf_counter() - t0, 1)
    auto_hlo = auto_comp.as_text()
    out["auto_store_copies"] = count_store_copies(auto_hlo, store_re)
    fmts = auto_comp.input_formats[0][1]  # kvs subtree of positional args
    fmt_desc = {k: str(getattr(f, "layout", f))
                for k, f in zip(sess.kvs._fields, fmts)}
    out["auto_kvs_layouts"] = fmt_desc
    out_fmts = auto_comp.output_formats
    print(f"[probe] AUTO copies: {out['auto_store_copies']}", flush=True)
    print(f"[probe] AUTO kvs layouts: {json.dumps(fmt_desc, indent=1)}",
          flush=True)

    # -- 3. commit kvs into the preferred formats, retrace with the kvs
    # output PINNED to the same formats (donation must alias: a default-
    # layout output cannot share the committed input buffer — without the
    # pin the program needs a second 3-GB store + relayouts and OOMs)
    print("[probe] committing kvs to preferred layouts...", flush=True)
    from stc_tpu.kvcache.state import StreamKV
    params, rest = args[0], args[2:]
    kvs = args[1]
    del args
    sess.kvs = None  # the probe owns the one live store from here on
    kvs_committed = jax.device_put(kvs, StreamKV(*fmts))
    jax.block_until_ready(kvs_committed)
    del kvs  # never hold two 3-GB stores beyond the transfer itself
    t0 = time.perf_counter()
    comm_jit = jax.jit(serve_pos, donate_argnums=(1,),
                       out_shardings=(StreamKV(*fmts), None, None))
    comm_comp = comm_jit.lower(params, kvs_committed, *rest).compile()
    out["committed_compile_s"] = round(time.perf_counter() - t0, 1)
    comm_hlo = comm_comp.as_text()
    out["committed_store_copies"] = count_store_copies(comm_hlo, store_re)
    print(f"[probe] committed copies: {out['committed_store_copies']}",
          flush=True)

    in_l = str(kvs_committed.block_k.format.layout)

    def tick(comp, kvs):
        kvs2, tokens, count = comp(params, kvs, *rest)
        np.asarray(count)  # hard sync (block_until_ready lies on this relay)
        return kvs2

    # does the donated output keep the committed layout?
    kvs_com = tick(comm_comp, kvs_committed)
    del kvs_committed  # donated
    out_l = str(kvs_com.block_k.format.layout)
    out["committed_in_layout"] = in_l
    out["committed_out_layout"] = out_l
    out["output_keeps_layout"] = (in_l == out_l)
    print(f"[probe] block_k layout in={in_l} out={out_l}", flush=True)

    # -- 4. timing: fused committed vs fused default vs unfused --------------
    # Donation consumes each rep's kvs; chain the state through the reps
    # exactly like production serving (num_blocks grows 8/rep, cost is
    # window-bounded so constant).  One 3-GB store lives at a time.
    print("[probe] timing committed...", flush=True)
    lat = {"fused_default": [], "fused_committed": [], "unfused": []}
    kvs_com = tick(comm_comp, kvs_com)  # warm (beyond the layout check)
    for rep in range(6):
        t0 = time.perf_counter()
        kvs_com = tick(comm_comp, kvs_com)
        lat["fused_committed"].append((time.perf_counter() - t0) * 1000)

    print("[probe] committed ms:", [round(x, 1) for x in
          lat["fused_committed"]], flush=True)
    print("[probe] timing default...", flush=True)
    from stc_tpu.kvcache.state import StreamKV as _SKV
    kvs_def = jax.device_put(kvs_com, _SKV(*base_fmts))  # session layouts
    jax.block_until_ready(kvs_def)
    del kvs_com
    kvs_def = tick(base_comp, kvs_def)  # warm
    for rep in range(6):
        t0 = time.perf_counter()
        kvs_def = tick(base_comp, kvs_def)
        lat["fused_default"].append((time.perf_counter() - t0) * 1000)

    print("[probe] default ms:", [round(x, 1) for x in
          lat["fused_default"]], flush=True)
    # unfused pair on the live session (default layouts, router pinned)
    print("[probe] timing unfused...", flush=True)
    sess.kvs = kvs_def
    n = int(np.asarray(kvs_def.num_blocks).max())
    sess._total_blocks = n
    sess._stream_blocks[:] = n
    del kvs_def
    sess._serve_router = _ServeRouter("unfused")

    def unfused():
        sess.encode_video_features(np.asarray(feats, np.float32))
        ans = sess.question_answering_batch(qs, ps, stop_token_ids=[-2],
                                            max_new_tokens=16)
        assert all(len(a) == 16 for a in ans)

    unfused(); hard_sync(sess)
    for rep in range(6):
        t0 = time.perf_counter()
        unfused()
        hard_sync(sess)
        lat["unfused"].append((time.perf_counter() - t0) * 1000)

    out["latency_ms"] = {k: {"median": round(statistics.median(v), 1),
                             "min": round(min(v), 1),
                             "all": [round(x, 1) for x in v]}
                         for k, v in lat.items()}
    print(json.dumps(out["latency_ms"], indent=1), flush=True)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_serve_layout.out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
