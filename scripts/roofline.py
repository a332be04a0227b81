"""Speed-of-light (roofline) report for the hot compiled steps.

For each hot program — full encode chunk, cacher encode chunk, fused QA —
this reads FLOPs + bytes accessed from XLA's compiled cost model, times the
step on device-resident inputs (no host link in the timed region), and
reports how close the step runs to the chip's roofline:

    sol_ms      = max(flops / peak_flops, bytes / peak_bw)   [spec sheet]
    sol_eff_ms  = same, against this box's MEASURED ceilings (the relayed
                  container tops out well below spec: PLATFORM_NOTES.md
                  records ~99 TF/s matmul and ~247 GB/s elementwise)
    xla_optimal = XLA's own optimal_seconds estimate

plus the platform's dispatch floor (one tiny jit round trip), which bounds
what ANY per-chunk step can achieve here regardless of kernel quality.

This is the TPU-native successor to the reference's ad-hoc CUDA-event
timing (videomme_refactored.py:20-44) and calflops GFLOPs instrumentation
(flash_vstream_rekv.py:116-123): exact compiled-program counts, not module
estimates, tied to the hardware model the kernels were designed against.

Writes ROOFLINE.json at the repo root and prints a table.
Usage: python scripts/roofline.py [--seven-b] [--passes N]
"""

import argparse
import gc
import json
import os
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax
import jax.numpy as jnp

import bench
from stc_tpu.utils.metrics import flops_of_compiled

# Spec-sheet peaks per chip (bf16 FLOP/s, HBM bytes/s)
PEAKS = {
    "TPU v5 lite": (197e12, 819e9),
    "TPU v5e": (197e12, 819e9),
    "TPU v4": (275e12, 1228e9),
    "TPU v5p": (459e12, 2765e9),
    "TPU v6 lite": (918e12, 1640e9),
}
# Measured ceilings of THIS relayed container (PLATFORM_NOTES.md):
# chained bf16 matmuls ~99 TF/s, elementwise read+write ~247 GB/s.
MEASURED_CEILING = (99e12, 247e9)


def cost_of(lowered_compiled):
    ca = lowered_compiled.cost_analysis()
    if isinstance(ca, (list, tuple)):
        ca = ca[0] if ca else None
    ca = ca or {}
    # XLA returns -1 for optimal_seconds when it has no estimate (and sums
    # of per-op -1s go arbitrarily negative on big programs) — map any
    # non-positive value to None instead of shipping impossible numbers
    # (round-4 ROOFLINE.json carried -990..-2978 ms).
    opt = float(ca.get("optimal_seconds", 0.0))
    return (float(ca.get("flops", 0.0)),
            float(ca.get("bytes accessed", 0.0)),
            opt if opt > 0.0 else None)


def fetch_sync(tree):
    """Force completion by fetching a value (block_until_ready can return
    early on this platform)."""
    leaf = jax.tree.leaves(tree)[0]
    np.asarray(jax.device_get(leaf.ravel()[:1]))


def timed(fn, n_passes):
    ts = []
    for _ in range(n_passes):
        t0 = time.perf_counter()
        out = fn()
        fetch_sync(out)
        ts.append(time.perf_counter() - t0)
    return statistics.median(ts)


def dispatch_floor_ms(n_passes=7):
    x = jnp.zeros((8, 128), jnp.float32)
    f = jax.jit(lambda a: a + 1.0)
    fetch_sync(f(x))
    return timed(lambda: f(x), n_passes) * 1e3


def analyze(name, measured_s, flops, bytes_acc, xla_opt_s, peaks):
    pf, pb = peaks
    mf, mb = MEASURED_CEILING
    sol_s = max(flops / pf, bytes_acc / pb)
    sol_eff_s = max(flops / mf, bytes_acc / mb)
    bound = "compute" if flops / pf >= bytes_acc / pb else "bandwidth"
    return {
        "step": name,
        "flops": flops,
        "bytes_accessed": bytes_acc,
        "arithmetic_intensity": flops / bytes_acc if bytes_acc else None,
        "bound": bound,
        "measured_ms": round(measured_s * 1e3, 3),
        "sol_ms_spec": round(sol_s * 1e3, 3),
        "sol_ms_measured_ceiling": round(sol_eff_s * 1e3, 3),
        "xla_optimal_ms": (round(xla_opt_s * 1e3, 3)
                           if xla_opt_s is not None else None),
        "achieved_tflops": round(flops / measured_s / 1e12, 2),
        "achieved_gbs": round(bytes_acc / measured_s / 1e9, 2),
        "pct_of_sol_spec": round(100 * sol_s / measured_s, 1),
        "pct_of_sol_measured_ceiling": round(100 * sol_eff_s / measured_s, 1),
    }


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--seven-b", action="store_true",
                    help="also analyze the 7B ingest step (slower build)")
    ap.add_argument("--passes", type=int, default=5)
    ap.add_argument("--variant", choices=["0.5b", "7b"], default=None,
                    help="internal: analyze ONE variant, print rows as JSON")
    args = ap.parse_args()

    if args.variant is None and args.seven_b:
        # one subprocess per model variant: the 7B needs ~12 GB HBM and must
        # start from an empty chip (0.5b remnants + executables OOM it)
        import subprocess
        rows = []
        for v in ("0.5b", "7b"):
            r = subprocess.run(
                [sys.executable, os.path.abspath(__file__), "--variant", v,
                 "--passes", str(args.passes)],
                capture_output=True, text=True, timeout=1800)
            tail = [ln for ln in r.stdout.splitlines() if ln.startswith("[")]
            if r.returncode == 0 and tail:
                rows.extend(json.loads(tail[-1]))
            else:
                rows.append({"step": f"variant_{v}",
                             "error": (r.stderr or r.stdout)[-300:]})
        finish(rows, args)
        return

    kind = jax.devices()[0].device_kind
    peaks = PEAKS.get(kind, MEASURED_CEILING)
    rows = []

    variants = ([("0.5b", False)] if args.variant in (None, "0.5b")
                else []) + ([("7b", True)] if args.variant == "7b" else [])
    for tag, seven_b in variants:
        sess, cfg = bench.build(seven_b=seven_b)
        sess.encode_init_prompt(list(range(14)))
        bench.fast_forward(sess, bench.STEADY_BLOCKS)
        C = bench.CHUNK
        rng = np.random.default_rng(0)
        frames = rng.integers(0, 256, size=(C, 384, 384, 3), dtype=np.uint8)
        # stage pixels ON DEVICE once: the roofline times device compute, not
        # the relay link (bench.py measures the end-to-end ingest number)
        pixels = jax.device_put(sess.vision.preprocess(frames))
        bucket = sess._bucket(sess._total_blocks + C)

        for cached in (False, True):
            name = f"encode_chunk_{'cacher' if cached else 'full'}_{tag}"
            try:
                fn = sess._get_frame_jit(cached, bucket)
                kvs, vstate, pstate = sess.kvs, sess._vstate, sess._pstate

                def step():
                    # donated state threads through, exactly as in a session
                    nonlocal kvs, vstate, pstate
                    kvs, vstate, pstate = fn(sess._all_params, pixels,
                                             kvs=kvs, vstate=vstate,
                                             pstate=pstate)
                    return kvs
                fetch_sync(step())  # warm (populates fn's executable cache)
                dt = timed(step, args.passes)
                sess.kvs, sess._vstate, sess._pstate = kvs, vstate, pstate
                # cost analysis AFTER timing: .lower().compile() may build a
                # second executable; drop it immediately
                c = fn.lower(sess._all_params, pixels, kvs=sess.kvs,
                             vstate=sess._vstate,
                             pstate=sess._pstate).compile()
                flops, bytes_acc, xla_opt = cost_of(c)
                del c
                gc.collect()
                rows.append(analyze(name, dt, flops, bytes_acc, xla_opt,
                                    peaks))
            except Exception as e:  # record and continue (e.g. HBM limits)
                rows.append({"step": name, "error": repr(e)[:200]})

        # fused QA: retrieval + 40-token prefill + 16-token greedy decode in
        # one dispatch (the bench_qa hot path); kvs is not donated
        try:
            B, rc = sess.batch, sess.rekv
            q_ids = jnp.asarray(rng.integers(1, 1000, size=(B, 32)),
                                jnp.int32)
            p_ids = jnp.asarray(rng.integers(1, 1000, size=(B, 64)),
                                jnp.int32)
            stop = jnp.full((4,), -2, jnp.int32)
            kw = dict(q_ids=q_ids, q_len=jnp.full((B,), 24, jnp.int32),
                      p_ids=p_ids, p_len=jnp.full((B,), 40, jnp.int32),
                      stop_ids=stop, max_new_tokens=16)
            fetch_sync(sess._answer(sess.params, kvs=sess.kvs, **kw))
            dt = timed(lambda: sess._answer(sess.params, kvs=sess.kvs, **kw),
                       args.passes)
            c = sess._answer.lower(sess.params, kvs=sess.kvs, **kw).compile()
            flops, bytes_acc, xla_opt = cost_of(c)
            del c
            gc.collect()
            rows.append(analyze(f"qa_fused_{tag}", dt, flops, bytes_acc,
                                xla_opt, peaks))
        except Exception as e:
            rows.append({"step": f"qa_fused_{tag}", "error": repr(e)[:200]})
        del sess
        gc.collect()

    if args.variant is not None:
        print(json.dumps(rows))  # parent process collects this line
        return
    finish(rows, args)


def finish(rows, args):
    kind = jax.devices()[0].device_kind
    peaks = PEAKS.get(kind, MEASURED_CEILING)
    floor = dispatch_floor_ms()
    report = {
        "device_kind": kind,
        "peaks_spec": {"bf16_tflops": peaks[0] / 1e12,
                       "hbm_gbs": peaks[1] / 1e9},
        "peaks_measured_ceiling": {
            "bf16_tflops": MEASURED_CEILING[0] / 1e12,
            "hbm_gbs": MEASURED_CEILING[1] / 1e9,
            "note": "this relayed container's measured ceilings "
                    "(PLATFORM_NOTES.md); spec-sheet rates are not "
                    "reachable here",
        },
        "dispatch_floor_ms": round(floor, 3),
        "dispatch_floor_note":
            "host->device round trip of a trivial jit on this relay; an "
            "N-dispatch step cannot beat N x this floor regardless of "
            "kernel quality",
        "bytes_accessed_note":
            "XLA's 'bytes accessed' charges dynamic-slice/dynamic-update-"
            "slice on a loop-carried buffer at the FULL buffer size per "
            "iteration, even when the compiled program updates a small "
            "window in place (verified round 5 with a controlled pair: the "
            "same small-window work costed 192.9 MB written as scan xs->ys "
            "vs 295.2 MB as carry+dyn-update-slice; an untouched dead "
            "carry costs 0 — it is the slice ops, not the carry itself). "
            "Programs with scan-carried KV state therefore OVERCOUNT real "
            "traffic (round-4 finding: the scan-carry restructure RAISED "
            "bytes_accessed while measuring faster).  Treat bytes_accessed "
            "as an upper bound for cross-program comparisons; measured_ms "
            "is the ground truth.",
        "steps": rows,
    }
    out = os.path.join(os.path.dirname(os.path.dirname(
        os.path.abspath(__file__))), "ROOFLINE.json")
    with open(out, "w") as f:
        json.dump(report, f, indent=1)
    print(f"wrote {out}")
    hdr = (f"{'step':34s} {'ms':>8s} {'SoL':>7s} {'SoL*':>7s} {'TF/s':>6s} "
           f"{'GB/s':>6s} {'%SoL*':>6s} bound")
    print(hdr)
    for r in rows:
        if "error" in r:
            print(f"{r['step']:34s} ERROR {r['error']}")
            continue
        print(f"{r['step']:34s} {r['measured_ms']:8.2f} "
              f"{r['sol_ms_spec']:7.2f} {r['sol_ms_measured_ceiling']:7.2f} "
              f"{r['achieved_tflops']:6.1f} {r['achieved_gbs']:6.1f} "
              f"{r['pct_of_sol_measured_ceiling']:6.1f} {r['bound']}")
    print(f"dispatch floor: {floor:.2f} ms  (SoL* = vs this box's measured "
          f"ceilings)")


if __name__ == "__main__":
    main()
