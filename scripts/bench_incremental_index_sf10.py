"""sf10 incremental-index measurement (VERDICT r7 tasks 2 & 6): the
maintenance-path cost of a CAPPED index at 500k docs — delta absorb +
gauge + converged auto-reconcile — against the batch comparator it must
equal, ``near_dup_keep_list(max_bucket_size=8, oversize_policy="star",
star_repair_hops=-1)`` (the converged star-repair run already measured in
SCALING_STAR_REPAIR_sf10.json). The sf1 artifact stops at 50k docs and its
gauge already showed ~15k over-cap buckets; this is the 10× run that tests
reconcile/repair at the scale where the cap actually binds everywhere
(100-member clusters, cap 8 → every cluster bucket is over-cap, so the
reconcile pass carries essentially all pair derivation).

Also proves the round-7 ``keep_best_from_index`` at this scale: after the
converged reconcile, the index keep-best must equal the batch
``near_dup_keep_best`` (same cap/star/hops) row for row.

Regenerate the slice first if missing:
    python scripts/make_scaled_data.py --copies 100 --tables documents \
           --dest .scaledata/sf10-docs

Usage: python scripts/bench_incremental_index_sf10.py
       [--sfDir .scaledata/sf10-docs] [--delta-pct 1.0] [--cap 8]
       [--out SCALING_INCR_sf10.json]

Single pass per stage (each is minutes; the committed artifact is the
authoritative number, per SCALING.md's methodology pin).
"""

from __future__ import annotations

import argparse
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfDir", default=os.path.join(repo, ".scaledata/sf10-docs"))
    ap.add_argument("--delta-pct", type=float, default=1.0)
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--out", default=os.path.join(repo, "SCALING_INCR_sf10.json"))
    ns = ap.parse_args()

    from pyspark.sql import functions as F

    from translator_tm_provider_pipelines_spark.operators import dedup
    from translator_tm_provider_pipelines_spark.session import get_spark
    from translator_tm_provider_pipelines_spark.streaming import dedup_index as di

    spark = get_spark(app_name="bench-incremental-index-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(ns.sfDir, "documents.parquet")).select(
        "doc_id", "text", "n_chars"
    )
    n_docs = docs.count()
    cut = docs.approxQuantile("doc_id", [1.0 - ns.delta_pct / 100.0], 0.0)[0]
    base = docs.select("doc_id", "text").where(F.col("doc_id") <= cut)
    delta = docs.select("doc_id", "text").where(F.col("doc_id") > cut)
    n_delta = delta.count()
    cap = ns.cap
    batch_kw = dict(
        max_bucket_size=cap, oversize_policy="star", star_repair_hops=-1
    )

    work = tempfile.mkdtemp(prefix="incr_bench_sf10_")
    idx = os.path.join(work, "idx")
    rec: dict[str, object] = {
        "metric": "near_dup_incremental_vs_full_sf10",
        "sf_dir": ns.sfDir,
        "n_docs": n_docs,
        "n_delta": n_delta,
        "delta_pct": ns.delta_pct,
        "max_bucket_size": cap,
    }
    try:
        t0 = time.monotonic()
        di.update_near_dup_index(spark, base, idx, batch_id=0, max_bucket_size=cap)
        rec["backfill_sec"] = round(time.monotonic() - t0, 1)
        print("backfill:", rec["backfill_sec"], flush=True)

        t0 = time.monotonic()
        di.update_near_dup_index(spark, delta, idx, batch_id=1, max_bucket_size=cap)
        rec["delta_batch_sec"] = round(time.monotonic() - t0, 1)
        print("delta:", rec["delta_batch_sec"], flush=True)

        t0 = time.monotonic()
        gauge = di.index_bucket_stats(spark, idx, max_bucket_size=cap)
        rec["gauge_sec"] = round(time.monotonic() - t0, 1)
        rec["gauge_stats"] = gauge
        print("gauge:", rec["gauge_sec"], gauge, flush=True)

        t0 = time.monotonic()
        di.reconcile_capped_buckets(
            spark, idx, max_bucket_size=cap, reconcile_id=0, repair_hops=-1
        )
        rec["reconcile_converged_sec"] = round(time.monotonic() - t0, 1)
        print("reconcile:", rec["reconcile_converged_sec"], flush=True)

        # batch comparator: the converged star-repair keep list (the cost a
        # daily full-recompute pipeline would pay for the same result)
        t0 = time.monotonic()
        dedup.near_dup_keep_list(docs, **batch_kw).write.format("noop").mode(
            "overwrite"
        ).save()
        rec["full_recompute_sec"] = round(time.monotonic() - t0, 1)
        print("full recompute:", rec["full_recompute_sec"], flush=True)

        maint = (
            rec["delta_batch_sec"] + rec["gauge_sec"] + rec["reconcile_converged_sec"]
        )
        rec["maintenance_total_sec"] = round(maint, 1)
        rec["speedup_delta_only"] = round(
            rec["full_recompute_sec"] / rec["delta_batch_sec"], 2
        )
        rec["speedup_incl_reconcile"] = round(rec["full_recompute_sec"] / maint, 2)

        inc = di.keep_list_from_index(spark, idx).localCheckpoint()
        batch_kl = dedup.near_dup_keep_list(docs, **batch_kw).localCheckpoint()
        rec["keep_list_mismatch_rows"] = (
            inc.unionByName(batch_kl)
            .groupBy("doc_id", "canonical_id", "is_kept")
            .count()
            .where(F.col("count") != 2)
            .count()
        )
        print("keep-list mismatch:", rec["keep_list_mismatch_rows"], flush=True)

        # round-7 keep_best_from_index at scale: quality rides in as a side
        # table (n_chars), must equal the batch keep-best row for row
        quality = docs.select("doc_id", "n_chars")
        t0 = time.monotonic()
        kb_idx = di.keep_best_from_index(
            spark, idx, quality, "n_chars"
        ).localCheckpoint()
        kept = kb_idx.where(F.col("is_kept")).count()
        rec["keep_best_index_sec"] = round(time.monotonic() - t0, 1)
        t0 = time.monotonic()
        kb_batch = dedup.near_dup_keep_best(
            docs, "n_chars", **batch_kw
        ).localCheckpoint()
        rec["keep_best_batch_sec"] = round(time.monotonic() - t0, 1)
        rec["keep_best_kept"] = kept
        rec["keep_best_mismatch_rows"] = (
            kb_idx.exceptAll(kb_batch).count() + kb_batch.exceptAll(kb_idx).count()
        )
        print(
            "keep-best idx/batch sec:",
            rec["keep_best_index_sec"],
            rec["keep_best_batch_sec"],
            "mismatch:",
            rec["keep_best_mismatch_rows"],
            flush=True,
        )
    finally:
        shutil.rmtree(work, ignore_errors=True)

    line = json.dumps(rec)
    with open(ns.out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
