"""Interleaved A/B of HEAD vs a prior build for the ingest bench (round-5
protocol: settle code-vs-relay questions with data from ONE link window).

The round-of-record BENCH files are cross-session single samples, which
PLATFORM_NOTES.md itself says are not comparable for transfer-bound modes
(+-30% swings at equal probed MB/s).  This tool answers "did ingest regress
between builds?" properly: it checks out the comparison ref into a git
worktree and alternates fresh-subprocess bench runs A, B, A, B, ... within
one session, stamping a link probe before each run.  Same pattern as the
round-4 int4-dip controls, promoted to a reusable tool.

Usage:
  python scripts/ab_ingest.py [REF] [--mode ingest] [--reps 3]
REF defaults to the round-3 close (545f3ae).  Writes
scripts/ab_ingest.out.json and prints a verdict line.
"""

import argparse
import json
import os
import statistics
import subprocess
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def sh(cmd, **kw):
    return subprocess.run(cmd, check=True, capture_output=True, text=True,
                          **kw)


def probe_link() -> float:
    code = ("import bench, json; "
            "print(json.dumps({'mbps': round(bench.link_probe_mbps(), 1)}))")
    try:
        r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                           capture_output=True, text=True, timeout=1500)
        return json.loads(r.stdout.strip().splitlines()[-1])["mbps"]
    except Exception:
        return -1.0


def run_bench(cwd: str, mode: str, timeout: int = 2700):
    env = {**os.environ, "BENCH_MODE": mode}
    r = subprocess.run([sys.executable, os.path.join(cwd, "bench.py")],
                       env=env, cwd=cwd, capture_output=True, text=True,
                       timeout=timeout)
    lines = [ln for ln in r.stdout.splitlines() if ln.startswith("{")]
    if r.returncode != 0 or not lines:
        return {"error": r.stderr.strip()[-400:]}
    return json.loads(lines[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("ref", nargs="?", default="545f3ae",
                    help="comparison ref (default: round-3 close)")
    ap.add_argument("--mode", default="ingest")
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    wt = f"/tmp/ab_{args.ref}"
    if not os.path.isdir(wt):
        sh(["git", "worktree", "add", "--detach", wt, args.ref], cwd=ROOT)
    # the worktree needs the native lib dir to exist; bench falls back to
    # numpy when the .so is absent, which is fine for ingest timing
    out = {"ref": args.ref, "mode": args.mode,
           "runs": []}  # chronological: (arm, link_mbps, value)
    arms = {"head": ROOT, "ref": wt}
    for rep in range(args.reps):
        for arm in ("head", "ref"):
            mbps = probe_link()
            t0 = time.time()
            d = run_bench(arms[arm], args.mode)
            d_row = {"arm": arm, "rep": rep, "link_mbps": mbps,
                     "wall_s": round(time.time() - t0, 1),
                     "value": d.get("value"),
                     "samples": d.get("samples"),
                     "error": d.get("error")}
            out["runs"].append(d_row)
            print(json.dumps(d_row), flush=True)

    for arm in ("head", "ref"):
        vals = [r["value"] for r in out["runs"]
                if r["arm"] == arm and r["value"] is not None]
        if vals:
            out[f"{arm}_median"] = round(statistics.median(vals), 2)
            out[f"{arm}_all"] = vals
    if "head_median" in out and "ref_median" in out:
        out["head_over_ref"] = round(out["head_median"] / out["ref_median"],
                                     3)
        print(f"[ab] HEAD {out['head_median']} vs {args.ref} "
              f"{out['ref_median']} -> ratio {out['head_over_ref']}",
              flush=True)
    path = os.path.join(ROOT, "scripts", "ab_ingest.out.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=1)
    print(f"[ab] wrote {path}", flush=True)


if __name__ == "__main__":
    main()
