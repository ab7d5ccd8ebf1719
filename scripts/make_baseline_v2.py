"""Produce BASELINE_BENCH_v2.json (VERDICT r9 task 4): per-query MEDIAN
across three fresh-JVM bench.py runs at sf0.1 on the round's final code,
covering the FULL registry — so every query gets a regression bar, not
just the 43 that existed in round 1. bench.py compares each future run
against this artifact (``baseline_v2`` in its output) alongside the r1
baseline (``baseline``, kept for continuity).

Usage (quiet box; ~15 min per run):
  python scripts/make_baseline_v2.py [--runs 3] [--out BASELINE_BENCH_v2.json]

Each run is a separate subprocess (fresh JVM, same shape as the round
driver's bench invocation); per-query timings are read from the
BENCH_FULL.json each run writes. The per-run compact summaries and the
calibration medians are embedded for provenance.
"""

from __future__ import annotations

import argparse
import json
import os
import statistics
import subprocess
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--runs", type=int, default=3)
    ap.add_argument("--out", default=os.path.join(REPO, "BASELINE_BENCH_v2.json"))
    ap.add_argument("--sfDir", default="/root/testdata/sf0.1")
    ns = ap.parse_args()

    full_path = os.path.join(REPO, "BENCH_FULL.json")
    runs: list[dict] = []
    for i in range(ns.runs):
        env = dict(os.environ, SPARK_GRAFT_SF_DIR=ns.sfDir)
        print(f"=== bench run {i + 1}/{ns.runs} ===", flush=True)
        proc = subprocess.run(
            [sys.executable, os.path.join(REPO, "bench.py")],
            cwd=REPO, env=env, capture_output=True, text=True,
        )
        if proc.returncode != 0:
            print(proc.stdout[-2000:], file=sys.stderr)
            print(proc.stderr[-2000:], file=sys.stderr)
            raise SystemExit(f"bench run {i + 1} failed rc={proc.returncode}")
        with open(full_path) as f:
            rec = json.load(f)
        runs.append(rec)
        print(
            f"run {i + 1}: total={rec['value']}s calib={rec['calib_sec']}s "
            f"n={len(rec['queries'])} errors={len(rec.get('errors', {}))}",
            flush=True,
        )

    names = sorted(set().union(*(r["queries"].keys() for r in runs)))
    medians = {
        q: round(statistics.median(
            r["queries"][q] for r in runs if q in r["queries"]
        ), 3)
        for q in names
    }
    # per-query noise envelope across ALL timed passes of all runs
    # ([min of run mins, max of run maxes]): bench.py's regression check
    # (round-12) only flags a query whose whole current spread sits
    # above both 2x the median AND this recorded envelope, so box-noise
    # on sub-second queries stops tripping the bar
    spreads = {
        q: [
            round(min(r["spread"][q][0] for r in runs if q in r["spread"]), 3),
            round(max(r["spread"][q][1] for r in runs if q in r["spread"]), 3),
        ]
        for q in names
        if any(q in r.get("spread", {}) for r in runs)
    }
    out = {
        "metric": "baseline_bench_v2_sf0.1",
        "provenance": (
            f"per-query median of {ns.runs} fresh-JVM bench.py runs on the "
            "round-11 final code (VERDICT r9 task 4 / r10 task 2); the r1 "
            "BASELINE_BENCH.json stays alongside for cross-round continuity"
        ),
        "sf": 0.1,
        "calib_sec": round(
            statistics.median(r["calib_sec"] for r in runs), 3
        ),
        "run_totals_sec": [r["value"] for r in runs],
        "run_calibs_sec": [r["calib_sec"] for r in runs],
        "queries": medians,
        "spread": spreads,
    }
    with open(ns.out, "w") as f:
        json.dump(out, f, indent=1)
        f.write("\n")
    print(json.dumps({k: out[k] for k in
                      ("metric", "calib_sec", "run_totals_sec")}))
    print(f"wrote {ns.out} ({len(medians)} queries)")


if __name__ == "__main__":
    main()
