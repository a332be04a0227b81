"""Is the fused serve tick's retrieve-scan UNROLL still a win now that the
layout commit removes the relayout copies it was working around?

Round-4 unrolled the retrieve layer scan inside serve_step because a second
while loop over the page store picked a conflicting layout (copies 6 -> 4).
The layout commit (runtime/session.py) now removes ALL copies by committing
the store in the merged program's preferred layout — so the unroll is no
longer load-bearing for layouts and straight-line bodies may LOSE to the
while-loop scan (software pipelining, smaller program).  This probe measures,
device-resident on the live TPU, each variant under its own AUTO-committed
layout, plus the unfused encode+QA pair over default and committed stores.

Writes scripts/probe_serve_unroll.out.json.
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
from stc_tpu.runtime.session import StreamingSession, _stop_arr
from stc_tpu.kvcache.state import StreamKV

CHUNK = 8
B = 4
STEADY_BLOCKS = int(os.getenv("BENCH_STEADY_BLOCKS", "400"))
REPS = 6


def count_store_copies(hlo_text: str, shape_re: str) -> int:
    n = 0
    for line in hlo_text.splitlines():
        if (" copy(" in line or " copy-start(" in line) \
                and re.search(shape_re, line):
            n += 1
    return n


def _flush(out):
    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_serve_unroll.out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)


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
    from bench import fast_forward, hard_sync
    fast_forward(sess, STEADY_BLOCKS)
    hard_sync(sess)

    rng = np.random.default_rng(0)
    feats = jnp.asarray(rng.normal(size=(B, 60 * CHUNK, text.hidden_size))
                        .astype(np.float32) * 0.02, jnp.bfloat16)
    qs = [list(rng.integers(1, 1000, size=n)) for n in (24, 20, 16, 24)]
    ps = [list(rng.integers(1, 1000, size=n)) for n in (40, 36, 40, 32)]
    q_ids, q_len = sess._pad_ids(qs)
    p_ids, p_len = sess._pad_ids(ps)
    q_ids = jnp.asarray(q_ids); q_len = jnp.asarray(q_len, jnp.int32)
    p_ids = jnp.asarray(p_ids); p_len = jnp.asarray(p_len, jnp.int32)
    stop_ids = jnp.asarray(_stop_arr([-2]))
    mask = jnp.ones((B,), bool)

    L, Hkv, D = text.num_layers, text.num_kv_heads, text.head_dim
    S, M = rekv.block_size, rekv.max_blocks
    store_re = rf"bf16\[{L},{B},{Hkv},{M},{S},{D}\]"
    out = {"store_shape": f"bf16[{L},{B},{Hkv},{M},{S},{D}]",
           "variants": {}}

    kvs = sess.kvs
    sess.kvs = None  # the probe owns the single live store
    params = sess.params
    default_fmt = jax.tree.map(lambda x: x.format, kvs)

    def tick(comp, kvs, *rest):
        r = comp(params, kvs, *rest)
        np.asarray(r[-1])  # hard sync
        return r[0]

    def time_variant(name, unroll):
        nonlocal kvs
        serve_fn = functools.partial(qw.serve_step, cfg=text, rekv=rekv,
                                     attn_backend=sess.attn_backend,
                                     max_new_tokens=16,
                                     unroll_retrieve=unroll)

        def pos(params, kvs, embeds, active, q_ids, q_len, p_ids, p_len,
                stop_ids):
            return serve_fn(params, kvs=kvs, embeds=embeds, active=active,
                            q_ids=q_ids, q_len=q_len, p_ids=p_ids,
                            p_len=p_len, stop_ids=stop_ids)

        rest = (feats, mask, q_ids, q_len, p_ids, p_len, stop_ids)
        kvs_auto = jax.tree.map(lambda _: Format(Layout.AUTO), kvs)
        t0 = time.perf_counter()
        probe = jax.jit(pos, in_shardings=(None, kvs_auto) + (None,) * 7,
                        out_shardings=(kvs_auto, None, None),
                        donate_argnums=(1,))
        kvs_sds = jax.tree.map(
            lambda x: jax.ShapeDtypeStruct(x.shape, x.dtype), kvs)
        comp0 = probe.lower(params, kvs_sds, *rest).compile()
        fmts = StreamKV(*comp0.input_formats[0][1])
        del probe, comp0
        kvs = jax.device_put(kvs, fmts)
        jax.block_until_ready(kvs)
        jit = jax.jit(pos, donate_argnums=(1,),
                      out_shardings=(fmts, None, None))
        comp = jit.lower(params, kvs, *rest).compile()
        compile_s = round(time.perf_counter() - t0, 1)
        copies = count_store_copies(comp.as_text(), store_re)
        kvs = tick(comp, kvs, *rest)  # warm
        lat = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            kvs = tick(comp, kvs, *rest)
            lat.append((time.perf_counter() - t0) * 1000)
        out["variants"][name] = {
            "median_ms": round(statistics.median(lat), 1),
            "min_ms": round(min(lat), 1),
            "all_ms": [round(x, 1) for x in lat],
            "store_copies": copies,
            "compile_s": compile_s,
            "block_k_layout": str(fmts.block_k.layout),
        }
        print(f"[probe] {name}: {out['variants'][name]}", flush=True)
        _flush(out)
        return fmts

    def time_unfused(name, fmt):
        """Device-resident unfused pair over a store committed to fmt
        (None = whatever layout kvs currently has)."""
        nonlocal kvs
        if fmt is not None:
            kvs = jax.device_put(kvs, fmt)
            jax.block_until_ready(kvs)
        enc = jax.jit(functools.partial(qw.encode_step, cfg=text, rekv=rekv,
                                        is_init=False,
                                        attn_backend=sess.attn_backend),
                      donate_argnames=("kvs",))
        qa = jax.jit(functools.partial(qw.answer_question, cfg=text,
                                       rekv=rekv, max_new_tokens=16))

        def pair(kvs):
            _, kvs = enc(params, kvs=kvs, embeds=feats, active=mask)
            tokens, count = qa(params, kvs=kvs, q_ids=q_ids, q_len=q_len,
                               p_ids=p_ids, p_len=p_len, stop_ids=stop_ids)
            np.asarray(count)
            return kvs

        kvs = pair(kvs)  # compile+warm
        kvs = pair(kvs)
        lat = []
        for _ in range(REPS):
            t0 = time.perf_counter()
            kvs = pair(kvs)
            lat.append((time.perf_counter() - t0) * 1000)
        # what layout does the donated encode output carry?
        out_l = str(kvs.block_k.format.layout)
        out["variants"][name] = {
            "median_ms": round(statistics.median(lat), 1),
            "min_ms": round(min(lat), 1),
            "all_ms": [round(x, 1) for x in lat],
            "block_k_layout_after": out_l,
        }
        print(f"[probe] {name}: {out['variants'][name]}", flush=True)
        _flush(out)

    only = set(filter(None, os.getenv("PROBE_VARIANTS", "").split(",")))

    def want(name):
        return not only or name in only

    if want("fused_unroll_committed"):
        time_variant("fused_unroll_committed", True)
    if want("fused_scan_committed"):
        time_variant("fused_scan_committed", False)
    if want("unfused_current_layout"):
        time_unfused("unfused_current_layout", None)
    if want("unfused_default"):
        time_unfused("unfused_default", default_fmt)

    path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                        "probe_serve_unroll.out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[probe] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
