"""Run every bench mode and write bench_report.json at the repo root.

Each mode runs in a fresh subprocess (clean compile cache state, no
cross-mode memory pressure).  The headline driver metric stays `python
bench.py` (ingest mode); this report captures the full picture: QA latency,
multi-stream aggregate, and 7B shapes.
"""

import json
import os
import subprocess
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

MODES = [
    ("ingest", {}),
    ("ingest_kvq", {}),
    ("qa", {}),
    ("qa_host", {}),
    ("qa_host_int8", {}),
    ("qa_host_kvq", {}),
    ("qa_host_warm", {}),
    # 4 streams x 8 frames = a 14 MB per-dispatch pixel payload, which falls
    # off this relay's transfer fast path (measured 17 fps agg vs 66 at
    # 4-frame chunks); per-chunk payloads should stay <= ~7 MB
    ("multistream", {"BENCH_CHUNK_FRAMES": "4"}),
    ("multistream_staged", {"BENCH_CHUNK_FRAMES": "4"}),
    ("7b", {"BENCH_FRAMES": "48"}),
    ("qa_7b", {}),
]


def probe_link() -> float:
    """Host->device MB/s, measured in a fresh subprocess (same conditions
    as the bench runs)."""
    code = ("import bench, json; "
            "print(json.dumps({'mbps': round(bench.link_probe_mbps(), 1)}))")
    r = subprocess.run([sys.executable, "-c", code], cwd=ROOT,
                       capture_output=True, text=True, timeout=600)
    try:
        return json.loads(r.stdout.strip().splitlines()[-1])["mbps"]
    except Exception:
        return -1.0


def main():
    link = probe_link()
    print("link health:", link, "MB/s")
    report = {"link_health_mbps": link}
    for mode, extra in MODES:
        env = {**os.environ, "BENCH_MODE": mode, **extra}
        r = subprocess.run([sys.executable, os.path.join(ROOT, "bench.py")],
                           env=env, capture_output=True, text=True,
                           timeout=1800)
        line = r.stdout.strip().splitlines()[-1] if r.stdout.strip() else ""
        try:
            report[mode] = json.loads(line)
            # transfer-bound numbers are only interpretable with the link
            # state they were measured under
            report[mode]["link_health_mbps"] = link
        except json.JSONDecodeError:
            report[mode] = {"error": r.stderr.strip()[-500:]}
        print(mode, "->", report[mode])
    with open(os.path.join(ROOT, "bench_report.json"), "w") as f:
        json.dump(report, f, indent=1)


if __name__ == "__main__":
    main()
