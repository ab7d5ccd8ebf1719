"""Measure the incremental near-dup index's reason to exist: absorbing a
1% delta batch vs recomputing the whole corpus keep list (SCALING.md
"Incremental index", VERDICT r5 task 1).

Protocol (documents table at --sf, default the local sf1.0 replica):
1. split docs by id into base (99%) and delta (1%);
2. build the index over the base corpus (one bulk batch — the one-time
   backfill cost, reported but not the headline);
3. timed A: ``update_near_dup_index`` absorbing the delta batch —
   includes its index reads and parquet writes, i.e. the real per-batch
   wall clock;
4. timed B: full ``near_dup_keep_list`` recompute over base+delta,
   materialized with the noop sink (the cost a daily full-recompute
   pipeline would pay);
5. assert keep-list equality (``keep_list_from_index`` == batch keep
   list) so the speedup is for an IDENTICAL result, then print one JSON
   line and write it to SCALING_INCR_sf1.json at the repo root.

Usage: python scripts/bench_incremental_index.py [--sf .scaledata/sf1.0]
       [--delta-pct 1.0] [--out SCALING_INCR_sf1.json]
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    ap = argparse.ArgumentParser()
    ap.add_argument("--sf", default=os.path.join(repo, ".scaledata/sf1.0"))
    ap.add_argument("--delta-pct", type=float, default=1.0)
    ap.add_argument("--out", default=os.path.join(repo, "SCALING_INCR_sf1.json"))
    ns = ap.parse_args()

    from pyspark.sql import functions as F

    from translator_tm_provider_pipelines_spark.operators import dedup
    from translator_tm_provider_pipelines_spark.session import get_spark
    from translator_tm_provider_pipelines_spark.streaming import dedup_index as di

    spark = get_spark(app_name="bench-incremental-index")
    docs = spark.read.parquet(os.path.join(ns.sf, "documents.parquet")).select(
        "doc_id", "text"
    )
    n_docs = docs.count()
    cut = docs.approxQuantile("doc_id", [1.0 - ns.delta_pct / 100.0], 0.0)[0]
    base = docs.where(F.col("doc_id") <= cut)
    delta = docs.where(F.col("doc_id") > cut)
    n_delta = delta.count()

    work = tempfile.mkdtemp(prefix="incr_bench_")
    idx = os.path.join(work, "idx")
    try:
        t0 = time.monotonic()
        di.update_near_dup_index(spark, base, idx, batch_id=0)
        t_backfill = time.monotonic() - t0

        t0 = time.monotonic()
        di.update_near_dup_index(spark, delta, idx, batch_id=1)
        t_delta = time.monotonic() - t0

        # the per-Nth-batch maintenance gauge the in-stream auto-reconcile
        # runs (round 7): its wall is the overhead a gauge batch pays on
        # top of the ordinary absorb — the reconcile itself only runs when
        # the stranded watermark trips
        t0 = time.monotonic()
        gauge = di.index_bucket_stats(spark, idx, max_bucket_size=8)
        t_gauge = time.monotonic() - t0

        t0 = time.monotonic()
        dedup.near_dup_keep_list(docs).write.format("noop").mode(
            "overwrite"
        ).save()
        t_full = time.monotonic() - t0

        inc = di.keep_list_from_index(spark, idx)
        batch = dedup.near_dup_keep_list(docs)
        mismatch = (
            inc.unionByName(batch)
            .groupBy("doc_id", "canonical_id", "is_kept")
            .count()
            .where(F.col("count") != 2)
            .count()
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    rec = {
        "metric": "near_dup_incremental_vs_full",
        "sf_dir": ns.sf,
        "n_docs": n_docs,
        "n_delta": n_delta,
        "delta_pct": ns.delta_pct,
        "backfill_sec": round(t_backfill, 3),
        "delta_batch_sec": round(t_delta, 3),
        "gauge_sec": round(t_gauge, 3),
        "gauge_stats": gauge,
        "full_recompute_sec": round(t_full, 3),
        "speedup": round(t_full / t_delta, 2) if t_delta else None,
        "keep_list_mismatch_rows": mismatch,
    }
    line = json.dumps(rec)
    with open(ns.out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
