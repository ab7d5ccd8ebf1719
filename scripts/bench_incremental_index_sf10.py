"""sf10 incremental-index measurement (r7 tasks 2 & 6; extended in r9 for
VERDICT r8 tasks 1 & 2): the maintenance-path cost of a CAPPED index at
500k docs — delta absorb + gauge + converged reconcile — against the
batch comparator it must equal, ``near_dup_keep_list(max_bucket_size=8,
oversize_policy="star", star_repair_hops=-1)``.

Round-9 scenario shape (watermark acceptance): TWO 1% deltas. The first
reconcile repairs the whole backlog (and records per-bucket watermarks);
the second delta then re-activates only the buckets it touches, so the
second converged reconcile must cost near delta-scale — the r8 honest
negative was 359.5 s for EVERY reconcile on the all-duplicates slice
because each run re-verified every over-cap bucket. A third reconcile
with nothing new measures the pure watermark no-op. Keep-list equality
against the batch star-repair path over the full corpus is asserted at
the END, i.e. across backfill + both deltas + all three reconciles —
watermark skipping must not change the result, only the cost.

Run on both corpora (r8 task 2):
  python scripts/make_scaled_data.py --copies 100 --tables documents \
         --dest .scaledata/sf10-docs            # all-duplicates worst case
  python scripts/make_mixed_data.py             # realistic 20% dup-rate
  python scripts/bench_incremental_index_sf10.py \
         [--sfDir .scaledata/sf10-docs] [--out SCALING_INCR_sf10.json]
  python scripts/bench_incremental_index_sf10.py \
         --sfDir .scaledata/sf10-docs-mixed --out SCALING_INCR_sf10_mixed.json

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
    d = ns.delta_pct / 100.0
    cut1, cut2 = docs.approxQuantile("doc_id", [1.0 - 2 * d, 1.0 - d], 0.0)
    base = docs.select("doc_id", "text").where(F.col("doc_id") <= cut1)
    delta1 = docs.select("doc_id", "text").where(
        (F.col("doc_id") > cut1) & (F.col("doc_id") <= cut2)
    )
    delta2 = docs.select("doc_id", "text").where(F.col("doc_id") > cut2)
    n_delta1, n_delta2 = delta1.count(), delta2.count()
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
        "n_delta1": n_delta1,
        "n_delta2": n_delta2,
        "delta_pct": ns.delta_pct,
        "max_bucket_size": cap,
    }
    try:
        t0 = time.monotonic()
        di.update_near_dup_index(spark, base, idx, batch_id=0, max_bucket_size=cap)
        rec["backfill_sec"] = round(time.monotonic() - t0, 1)
        print("backfill:", rec["backfill_sec"], flush=True)

        t0 = time.monotonic()
        di.update_near_dup_index(spark, delta1, idx, batch_id=1, max_bucket_size=cap)
        rec["delta_batch_sec"] = round(time.monotonic() - t0, 1)
        print("delta1:", rec["delta_batch_sec"], flush=True)

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
        print("reconcile1:", rec["reconcile_converged_sec"], flush=True)

        # second 1% delta AFTER a converged reconcile: the watermark
        # acceptance scenario — only the buckets this delta touches
        # re-activate, so the second converged reconcile must cost near
        # delta-scale, not reconcile1's backlog-scale
        t0 = time.monotonic()
        di.update_near_dup_index(spark, delta2, idx, batch_id=2, max_bucket_size=cap)
        rec["delta2_batch_sec"] = round(time.monotonic() - t0, 1)
        print("delta2:", rec["delta2_batch_sec"], flush=True)

        t0 = time.monotonic()
        gauge2 = di.index_bucket_stats(spark, idx, max_bucket_size=cap)
        rec["gauge2_sec"] = round(time.monotonic() - t0, 1)
        rec["gauge2_stats"] = gauge2
        print("gauge2:", rec["gauge2_sec"], gauge2, flush=True)

        t0 = time.monotonic()
        di.reconcile_capped_buckets(
            spark, idx, max_bucket_size=cap, reconcile_id=0, repair_hops=-1
        )
        rec["reconcile2_converged_sec"] = round(time.monotonic() - t0, 1)
        print("reconcile2:", rec["reconcile2_converged_sec"], flush=True)

        # nothing-new reconcile: the pure watermark no-op cost a cron pays
        # when the gauge fires on permanently stranded members
        t0 = time.monotonic()
        di.reconcile_capped_buckets(
            spark, idx, max_bucket_size=cap, reconcile_id=0, repair_hops=-1
        )
        rec["reconcile_noop_sec"] = round(time.monotonic() - t0, 1)
        print("reconcile noop:", rec["reconcile_noop_sec"], flush=True)

        # batch comparator: the converged star-repair keep list (the cost a
        # daily full-recompute pipeline would pay for the same result)
        t0 = time.monotonic()
        dedup.near_dup_keep_list(docs, **batch_kw).write.format("noop").mode(
            "overwrite"
        ).save()
        rec["full_recompute_sec"] = round(time.monotonic() - t0, 1)
        print("full recompute:", rec["full_recompute_sec"], flush=True)

        rec["speedup_delta_only"] = round(
            rec["full_recompute_sec"] / rec["delta_batch_sec"], 2
        )
        rec["speedup_delta_incl_reconcile2"] = round(
            rec["full_recompute_sec"]
            / (rec["delta2_batch_sec"] + rec["gauge2_sec"] + rec["reconcile2_converged_sec"]),
            2,
        )
        rec["reconcile2_vs_reconcile1"] = round(
            rec["reconcile2_converged_sec"] / rec["reconcile_converged_sec"], 3
        )

        # keep-list equality over the FULL history (backfill + 2 deltas +
        # 3 reconciles, watermark skipping active): must equal the batch
        # converged-star-repair keep list row for row
        inc = di.keep_list_from_index(spark, idx).localCheckpoint()
        batch_kl = dedup.near_dup_keep_list(docs, **batch_kw).localCheckpoint()
        inc_only = inc.exceptAll(batch_kl).localCheckpoint()
        batch_only = batch_kl.exceptAll(inc).localCheckpoint()
        rec["keep_list_mismatch_rows"] = inc_only.count() + batch_only.count()
        # direction matters: an index-only ATTACHMENT (is_kept=false, some
        # canonical) is backed by an exact-verified >=threshold pair by
        # construction — the batch side's bounded star promotion (the
        # documented residual: star_second_hop_pairs docstring) left a
        # genuine near-dup stranded; the reverse direction would mean the
        # index LOST a repair and must be zero when the no-skip control
        # below reports zero changed rows
        rec["keep_list_index_only_sample"] = [
            [int(r["doc_id"]), int(r["canonical_id"]), bool(r["is_kept"])]
            for r in inc_only.orderBy("doc_id").limit(20).collect()
        ]
        rec["keep_list_batch_only_sample"] = [
            [int(r["doc_id"]), int(r["canonical_id"]), bool(r["is_kept"])]
            for r in batch_only.orderBy("doc_id").limit(20).collect()
        ]
        # of the docs the two sides place differently, how many does the
        # INDEX attach to a cluster while BATCH keeps them singletons
        # (recall the batch side's bounded promotion missed) vs the
        # reverse — exact counts over the full diff, not the samples
        rec["n_index_attaches_batch_strands"] = (
            inc_only.where(~F.col("is_kept"))
            .select("doc_id")
            .join(
                batch_only.where(F.col("is_kept")).select("doc_id"), "doc_id"
            )
            .count()
        )
        rec["n_batch_attaches_index_strands"] = (
            batch_only.where(~F.col("is_kept"))
            .select("doc_id")
            .join(
                inc_only.where(F.col("is_kept")).select("doc_id"), "doc_id"
            )
            .count()
        )
        print(
            "keep-list mismatch:",
            rec["keep_list_mismatch_rows"],
            "index-only:", rec["keep_list_index_only_sample"],
            "batch-only:", rec["keep_list_batch_only_sample"],
            flush=True,
        )

        # attribution control: one more converged reconcile with ALL
        # skipping disabled (no watermarks read, no persisted failures) —
        # if the keep list is unchanged, any batch/incremental mismatch
        # above is the documented chain-attachment divergence of the star
        # policy, NOT repairs lost to watermark/failure skipping
        t0 = time.monotonic()
        di.reconcile_capped_buckets(
            spark, idx, max_bucket_size=cap, reconcile_id=0, repair_hops=-1,
            use_watermarks=False, persist_failures=False,
        )
        rec["reconcile_noskip_control_sec"] = round(time.monotonic() - t0, 1)
        inc2 = di.keep_list_from_index(spark, idx).localCheckpoint()
        rec["keep_list_changed_by_noskip_rows"] = (
            inc.unionByName(inc2)
            .groupBy("doc_id", "canonical_id", "is_kept")
            .count()
            .where(F.col("count") != 2)
            .count()
        )
        print(
            "no-skip control:",
            rec["reconcile_noskip_control_sec"],
            "changed rows:",
            rec["keep_list_changed_by_noskip_rows"],
            flush=True,
        )

        # keep_best_from_index at scale: quality rides in as a side table
        # (n_chars), must equal the batch keep-best row for row
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
