"""Device-resident A/B of the cached vision encode step (round-5 #3).

The round-4 verdict: 2.28x fewer FLOPs bought only a 1.28x wall-clock
ratio over the full step.  Round-5 shipped two levers —
  - gather_impl='onehot': row gather/scatter as 0/1-matrix matmuls (MXU
    path instead of the ~20 GB/s dynamic-gather path);
  - k_proxy_rank=r: skip the full fresh-K projection, rank staleness on
    rank-r JL sketches, project K only at the selected rows
(models/siglip.py:_layer_cached; both bit-equal / ranking-equal tested in
tests/test_vision.py).  This probe measures what they buy ON THE CHIP:
one subprocess per config (fresh HBM), timing the full and cacher encode
steps device-resident (no host link in the timed region), two interleaved
rounds per config so a platform drift mid-probe shows up as spread.

Writes scripts/probe_cacher.out.json and prints a table.
Usage: python scripts/probe_cacher.py [--passes N] [--rounds N]
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)

CONFIGS = [
    # label, STC_GATHER_IMPL, STC_K_PROXY_RANK
    ("index_r0", "index", "0"),      # round-3/4 state of record
    ("onehot_r0", "onehot", "0"),    # MXU gather/scatter only
    ("onehot_r16", "onehot", "16"),  # + rank-16 K proxy
    ("onehot_r32", "onehot", "32"),  # + rank-32 K proxy
    ("onehot_r64", "onehot", "64"),  # + rank-64 K proxy (ranking-safe tier)
]


def child(passes: int) -> None:
    import numpy as np
    import jax
    import bench

    sess, _ = bench.build()
    sess.encode_init_prompt(list(range(14)))
    bench.fast_forward(sess, bench.STEADY_BLOCKS)
    C = bench.CHUNK
    rng = np.random.default_rng(0)
    frames = rng.integers(0, 256, size=(C, 384, 384, 3), dtype=np.uint8)
    pixels = jax.device_put(sess.vision.preprocess(frames))
    bucket = sess._bucket(sess._total_blocks + C)

    def fetch(tree):
        np.asarray(jax.tree.leaves(tree)[0][(0,) * jax.tree.leaves(tree)[0].ndim])

    out = {}
    for cached in (False, True):
        fn = sess._get_frame_jit(cached, bucket)
        kvs, vstate, pstate = sess.kvs, sess._vstate, sess._pstate

        def step():
            nonlocal kvs, vstate, pstate
            kvs, vstate, pstate = fn(sess._all_params, pixels, kvs=kvs,
                                     vstate=vstate, pstate=pstate)
            return kvs

        fetch(step())  # warm
        samples = []
        for _ in range(passes):
            t0 = time.perf_counter()
            fetch(step())
            samples.append((time.perf_counter() - t0) * 1e3)
        sess.kvs, sess._vstate, sess._pstate = kvs, vstate, pstate
        out["cacher" if cached else "full"] = samples
    print("PROBE" + json.dumps(out))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--passes", type=int, default=8)
    ap.add_argument("--rounds", type=int, default=2)
    ap.add_argument("--timeout", type=int, default=3600,
                    help="per-child wall clock; a degraded relay window "
                         "can stretch one child past 30 min")
    ap.add_argument("--child", action="store_true")
    args = ap.parse_args()
    if args.child:
        child(args.passes)
        return

    raw = {label: {"full": [], "cacher": []} for label, _, _ in CONFIGS}
    for rnd in range(args.rounds):
        for label, gi, kr in CONFIGS:
            env = dict(os.environ, STC_GATHER_IMPL=gi, STC_K_PROXY_RANK=kr)
            try:
                r = subprocess.run(
                    [sys.executable, os.path.abspath(__file__), "--child",
                     "--passes", str(args.passes)],
                    env=env, cwd=ROOT, capture_output=True, text=True,
                    timeout=args.timeout)
            except subprocess.TimeoutExpired:
                print(f"[{label} round {rnd}] TIMEOUT after "
                      f"{args.timeout}s (degraded link window?) — "
                      "skipping config this round", file=sys.stderr,
                      flush=True)
                continue
            lines = [ln for ln in r.stdout.splitlines()
                     if ln.startswith("PROBE")]
            if r.returncode != 0 or not lines:
                print(f"[{label} round {rnd}] FAILED:",
                      (r.stderr or r.stdout)[-300:], file=sys.stderr)
                continue
            d = json.loads(lines[-1][len("PROBE"):])
            raw[label]["full"] += d["full"]
            raw[label]["cacher"] += d["cacher"]
            print(f"[{label} round {rnd}] full med "
                  f"{statistics.median(d['full']):.1f} ms, cacher med "
                  f"{statistics.median(d['cacher']):.1f} ms", flush=True)

    rows = []
    for label, gi, kr in CONFIGS:
        f, c = raw[label]["full"], raw[label]["cacher"]
        if not f or not c:
            rows.append({"config": label, "error": "no samples"})
            continue
        fm, cm = statistics.median(f), statistics.median(c)
        rows.append({
            "config": label, "gather_impl": gi, "k_proxy_rank": int(kr),
            "full_ms": round(fm, 2), "cacher_ms": round(cm, 2),
            "ratio": round(fm / cm, 3),
            "full_spread_pct": round(100 * (max(f) - min(f)) / fm, 1),
            "cacher_spread_pct": round(100 * (max(c) - min(c)) / cm, 1),
            "full_samples": [round(x, 2) for x in f],
            "cacher_samples": [round(x, 2) for x in c],
        })
    out = {"passes": args.passes, "rounds": args.rounds, "rows": rows}
    path = os.path.join(ROOT, "scripts", "probe_cacher.out.json")
    with open(path, "w") as fh:
        json.dump(out, fh, indent=1)
    for r in rows:
        if "error" in r:
            print(r["config"], "ERROR", r["error"])
        else:
            print(f"{r['config']:12s} full {r['full_ms']:7.1f} ms  cacher "
                  f"{r['cacher_ms']:7.1f} ms  ratio {r['ratio']:.3f}  "
                  f"(spread {r['full_spread_pct']:.0f}%/"
                  f"{r['cacher_spread_pct']:.0f}%)")
    print("wrote", path)


if __name__ == "__main__":
    main()
