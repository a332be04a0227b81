"""Compiled Pallas kernel vs jnp reference — ON THE REAL TPU.

Interpret-mode tests (tests/test_stream_attention.py) validate kernel logic
under Mosaic EMULATION; this script validates the Mosaic COMPILATION on the
actual chip (VERDICT round 1: 'Mosaic emulation != Mosaic compilation') and
records the result as an artifact: PALLAS_PARITY_TPU.json at the repo root.

Covers: empty store, pre-init-fill, post-trigger far stage, multi-page exc
appends, page_offset > 0 (host-tier eviction), and the decode/QA-path kernel
(ops/decode_attention.py) incl. its per-key attention-mass score variant.
"""

import json
import os
import sys

import numpy as np
import jax
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from stc_tpu.config import ReKVConfig
from stc_tpu.kvcache.engine import append_stream, init_stream_kv

HQ, HKV, D = 14, 2, 64  # llava-ov-0.5b head geometry


def run_case(name, cfg, n_appends, exc_pages=1, evict=0, seed=0):
    rng = np.random.default_rng(seed)
    kv = init_stream_kv(cfg, 1, HKV, D, dtype=jnp.bfloat16)
    T0 = cfg.n_init
    q = jnp.asarray(rng.normal(size=(1, HQ, T0, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, HKV, T0, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, HKV, T0, D)), jnp.bfloat16)
    _, kv = append_stream(kv, q, k, v, cfg, is_init=True)
    T = cfg.block_size * exc_pages
    for _ in range(n_appends):
        q = jnp.asarray(rng.normal(size=(1, HQ, T, D)), jnp.bfloat16)
        k = jnp.asarray(rng.normal(size=(1, HKV, T, D)), jnp.bfloat16)
        v = jnp.asarray(rng.normal(size=(1, HKV, T, D)), jnp.bfloat16)
        _, kv = append_stream(kv, q, k, v, cfg, is_init=False)
    if evict:
        def shift(a):
            return jnp.concatenate(
                [a[:, :, evict:], jnp.zeros_like(a[:, :, :evict])], axis=2)
        kv = kv._replace(block_k=shift(kv.block_k), block_v=shift(kv.block_v),
                         page_offset=kv.page_offset + evict)
    q = jnp.asarray(rng.normal(size=(1, HQ, T, D)), jnp.bfloat16)
    k = jnp.asarray(rng.normal(size=(1, HKV, T, D)), jnp.bfloat16)
    v = jnp.asarray(rng.normal(size=(1, HKV, T, D)), jnp.bfloat16)
    o_ref, _ = append_stream(kv, q, k, v, cfg, is_init=False, backend="jnp")
    o_pl, _ = append_stream(kv, q, k, v, cfg, is_init=False, backend="pallas")
    o_ref = np.asarray(o_ref, np.float32)
    o_pl = np.asarray(o_pl, np.float32)
    err = float(np.max(np.abs(o_ref - o_pl)))
    ref_scale = float(np.mean(np.abs(o_ref)))
    ok = err < max(3e-2, 0.1 * ref_scale)
    return {"case": name, "max_abs_err": round(err, 6),
            "mean_abs_ref": round(ref_scale, 6), "ok": ok}


def run_decode_case(name, T, C, n_local, cursor, score=False, seed=0):
    from stc_tpu.kvcache.engine import decode_attend
    from stc_tpu.kvcache.state import DecodeKV
    from stc_tpu.ops.decode_attention import (decode_attention, decode_score,
                                              decode_score_jnp)
    rng = np.random.default_rng(seed)
    dkv = DecodeKV(
        k=jnp.asarray(rng.normal(size=(1, HKV, C, D)), jnp.bfloat16),
        v=jnp.asarray(rng.normal(size=(1, HKV, C, D)), jnp.bfloat16),
        cursor=jnp.asarray([cursor], jnp.int32))
    q = jnp.asarray(rng.normal(size=(1, HQ, T, D)), jnp.bfloat16)
    start = jnp.asarray([max(0, cursor - T)], jnp.int32)
    if score:
        _, m = decode_attention(q, dkv.k, dkv.v, start, dkv.cursor,
                                n_local=n_local, return_m=True)
        o_pl = decode_score(q, dkv.k, m, start, dkv.cursor, n_local=n_local)
        o_ref = decode_score_jnp(q, dkv.k, m, start, dkv.cursor,
                                 n_local=n_local)
    else:
        cfg_j = ReKVConfig(n_init=14, n_local=n_local, block_size=60,
                           exc_block_size=60, topk=8, max_blocks=64)
        cfg_p = ReKVConfig(n_init=14, n_local=n_local, block_size=60,
                           exc_block_size=60, topk=8, max_blocks=64,
                           decode_attn_backend="pallas")
        q_slots = start[:, None] + jnp.arange(T, dtype=jnp.int32)[None, :]
        o_ref = decode_attend(q, q_slots, dkv, cfg_j)
        o_pl = decode_attend(q, q_slots, dkv, cfg_p)
    o_ref = np.asarray(o_ref, np.float32)
    o_pl = np.asarray(o_pl, np.float32)
    err = float(np.max(np.abs(o_ref - o_pl)))
    ref_scale = float(np.mean(np.abs(o_ref)))
    ok = err < max(3e-2, 0.1 * max(ref_scale, 1e-6))
    return {"case": name, "max_abs_err": round(err, 6),
            "mean_abs_ref": round(ref_scale, 6), "ok": ok}


def main():
    cfg = ReKVConfig(n_init=14, n_local=960, block_size=60,
                     exc_block_size=240, topk=8, chunk_size=1, max_blocks=64,
                     max_prompt_tokens=64, max_new_tokens=16)
    cases = [
        run_case("empty_store", cfg, 0),
        run_case("pre_trigger", cfg, 3),
        run_case("post_trigger_far_stage", cfg, 20),
        run_case("exc_4page_append", cfg, 5, exc_pages=4),
        run_case("page_offset_8", cfg, 30, evict=8),
        run_case("page_offset_16_exc4", cfg, 8, exc_pages=4, evict=16),
        # 8-page exc appends (T=480): G*Tp = 3360 rows > QROWS_MAX, so this
        # exercises the query-tiled grid (n_qt=2) in COMPILED Mosaic
        run_case("exc_8page_append_qtiled",
                 ReKVConfig(n_init=14, n_local=960, block_size=60,
                            exc_block_size=480, topk=8, chunk_size=1,
                            max_blocks=64, max_prompt_tokens=64,
                            max_new_tokens=16), 4, exc_pages=8),
        run_decode_case("decode_prefill_T64", 64, 4608, 15000, 4000, seed=1),
        run_decode_case("decode_token_T1", 1, 4608, 15000, 4001, seed=2),
        run_decode_case("decode_partial_cache", 24, 640, 512, 300, seed=3),
        run_decode_case("decode_score_T24", 24, 4608, 15000, 4000,
                        score=True, seed=4),
    ]
    report = {
        "platform": str(jax.devices()[0]),
        "backend": jax.default_backend(),
        "dtype": "bfloat16",
        "cases": cases,
        "all_ok": all(c["ok"] for c in cases),
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "PALLAS_PARITY_TPU.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(json.dumps(report))
    if not report["all_ok"]:
        raise SystemExit(1)


if __name__ == "__main__":
    main()
