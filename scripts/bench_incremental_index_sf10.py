"""sf10 incremental-index measurement (r7 tasks 2 & 6; extended r9 for
VERDICT r8 tasks 1 & 2; extended r10 for VERDICT r9 tasks 1, 2 & 5): the
maintenance-path cost of a CAPPED index at 500k docs — delta absorb +
gauge + converged reconcile — against the batch comparator it must equal,
``near_dup_keep_list(max_bucket_size=8, oversize_policy="star",
star_repair_hops=-1, star_rescue_reps=64)``.

Round-10 scenario shape: THREE 1% deltas. The first reconcile repairs the
whole backlog (recording per-bucket watermarks and persisted failures,
and draining the untried-member rescue — buckets whose rescue backlog
exceeds the per-run bound hold their watermark, so the drain loop keeps
reconciling until the watermark-aware gauge reports zero unreconciled
buckets). Each later delta re-activates only the buckets it touches, so
reconcile2 must cost near delta-scale, and reconcile3 at-or-below
reconcile2 (the steady state a cron reaches: failures warm, each run pays
only the new members). A final reconcile with nothing new measures the
pure watermark no-op. The failed/ side table's row and file counts are
recorded after every maintenance stage and after compact_index, showing
the compaction flattening (r9 task 2).

Keep-list equality against the batch star-repair+rescue path over the
full corpus is asserted at the END, i.e. across backfill + three deltas +
all reconciles — watermark/failure skipping must not change the result,
only the cost. The r9 comparator (hops only, no rescue) is also computed
once: its mismatch count quantifies exactly what the rescue closed (the
74-row promotion-starvation divergence measured in r9).

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

RECONCILE_SETTINGS = {"repair_hops": -1}
MAX_DRAIN_RUNS = 40


def _failed_stats(spark, di, idx: str) -> dict[str, int]:
    """Row + data-file count of the failed/ side table (r9 task 2: it
    grows monotonically; compaction must flatten the file count)."""
    tab = di._read_index(spark, idx, "failed")
    rows = 0 if tab is None else tab.count()
    files = 0
    root = os.path.join(idx, "failed")
    for dirpath, _dirnames, filenames in os.walk(root):
        files += sum(1 for f in filenames if f.endswith(".parquet"))
    return {"rows": rows, "files": files}


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfDir", default=os.path.join(repo, ".scaledata/sf10-docs"))
    ap.add_argument("--delta-pct", type=float, default=1.0)
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--rescue", type=int, default=64,
                    help="fresh_reps_per_bucket / star_rescue_reps bound")
    ap.add_argument("--rescueMinBands", type=int, default=3,
                    help="deterministic band-agreement prefilter, shared "
                         "by the index reconcile and the batch comparator "
                         "(equality holds at any shared value); 3 keeps "
                         "J>=0.8 edges (~6.6 of 16 bands shared) and "
                         "kills half-overlap stranger edges (~1)")
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
    cut1, cut2, cut3 = docs.approxQuantile(
        "doc_id", [1.0 - 3 * d, 1.0 - 2 * d, 1.0 - d], 0.0
    )
    base = docs.select("doc_id", "text").where(F.col("doc_id") <= cut1)
    deltas = [
        docs.select("doc_id", "text").where(
            (F.col("doc_id") > lo) & (F.col("doc_id") <= hi)
        )
        for lo, hi in [(cut1, cut2), (cut2, cut3)]
    ] + [docs.select("doc_id", "text").where(F.col("doc_id") > cut3)]
    cap, rescue = ns.cap, ns.rescue
    batch_kw = dict(
        max_bucket_size=cap, oversize_policy="star", star_repair_hops=-1,
        star_rescue_reps=rescue, star_rescue_min_bands=ns.rescueMinBands,
    )

    work = tempfile.mkdtemp(prefix="incr_bench_sf10_")
    idx = os.path.join(work, "idx")
    rec: dict[str, object] = {
        "metric": "near_dup_incremental_vs_full_sf10",
        "sf_dir": ns.sfDir,
        "n_docs": n_docs,
        "n_deltas": [df.count() for df in deltas],
        "delta_pct": ns.delta_pct,
        "max_bucket_size": cap,
        "rescue_bound": rescue,
        "rescue_min_shared_bands": ns.rescueMinBands,
    }

    def drained_reconcile(tag: str) -> None:
        """Converged reconcile, repeated until the watermark-aware gauge
        reports zero unreconciled buckets (the untried-member rescue is
        bounded per bucket per run; overflow buckets hold their watermark
        and successive runs drain the backlog)."""
        runs: list[float] = []
        while True:
            t0 = time.monotonic()
            di.reconcile_capped_buckets(
                spark, idx, max_bucket_size=cap, reconcile_id=0,
                repair_hops=-1, fresh_reps_per_bucket=rescue,
                rescue_min_shared_bands=ns.rescueMinBands,
            )
            runs.append(round(time.monotonic() - t0, 1))
            stats = di.index_bucket_stats(
                spark, idx, max_bucket_size=cap,
                reconcile_settings=RECONCILE_SETTINGS,
            )
            if stats["n_unreconciled_buckets"] == 0 or len(runs) >= MAX_DRAIN_RUNS:
                break
        rec[f"{tag}_sec"] = runs[0]
        rec[f"{tag}_drain_secs"] = runs
        rec[f"{tag}_runs"] = len(runs)
        rec[f"{tag}_failed"] = _failed_stats(spark, di, idx)
        print(f"{tag}: {runs} failed={rec[f'{tag}_failed']}", flush=True)

    try:
        t0 = time.monotonic()
        di.update_near_dup_index(spark, base, idx, batch_id=0, max_bucket_size=cap)
        rec["backfill_sec"] = round(time.monotonic() - t0, 1)
        print("backfill:", rec["backfill_sec"], flush=True)

        t0 = time.monotonic()
        di.update_near_dup_index(
            spark, deltas[0], idx, batch_id=1, max_bucket_size=cap
        )
        rec["delta_batch_sec"] = round(time.monotonic() - t0, 1)
        print("delta1:", rec["delta_batch_sec"], flush=True)

        t0 = time.monotonic()
        gauge = di.index_bucket_stats(spark, idx, max_bucket_size=cap)
        rec["gauge_sec"] = round(time.monotonic() - t0, 1)
        rec["gauge_stats"] = gauge
        print("gauge:", rec["gauge_sec"], gauge, flush=True)

        # backlog reconcile: repairs everything accumulated since backfill,
        # drained to a fully-covered watermark table
        drained_reconcile("reconcile_converged")

        # second 1% delta AFTER a converged reconcile: the watermark
        # acceptance scenario — only the buckets this delta touches
        # re-activate, so reconcile2 must cost near delta-scale, not
        # reconcile1's backlog-scale
        t0 = time.monotonic()
        di.update_near_dup_index(
            spark, deltas[1], idx, batch_id=2, max_bucket_size=cap
        )
        rec["delta2_batch_sec"] = round(time.monotonic() - t0, 1)
        print("delta2:", rec["delta2_batch_sec"], flush=True)

        t0 = time.monotonic()
        gauge2 = di.index_bucket_stats(spark, idx, max_bucket_size=cap)
        rec["gauge2_sec"] = round(time.monotonic() - t0, 1)
        rec["gauge2_stats"] = gauge2
        print("gauge2:", rec["gauge2_sec"], gauge2, flush=True)

        drained_reconcile("reconcile2_converged")

        # third 1% delta (r9 task 5): the steady state a cron reaches —
        # failures warm, reconcile3 pays only the new members' edges and
        # must cost at-or-below reconcile2
        t0 = time.monotonic()
        di.update_near_dup_index(
            spark, deltas[2], idx, batch_id=3, max_bucket_size=cap
        )
        rec["delta3_batch_sec"] = round(time.monotonic() - t0, 1)
        print("delta3:", rec["delta3_batch_sec"], flush=True)

        t0 = time.monotonic()
        gauge3 = di.index_bucket_stats(spark, idx, max_bucket_size=cap)
        rec["gauge3_sec"] = round(time.monotonic() - t0, 1)
        rec["gauge3_stats"] = gauge3
        print("gauge3:", rec["gauge3_sec"], gauge3, flush=True)

        drained_reconcile("reconcile3_converged")

        # nothing-new reconcile: the pure watermark no-op cost a cron pays
        # when the gauge fires on permanently stranded members
        t0 = time.monotonic()
        di.reconcile_capped_buckets(
            spark, idx, max_bucket_size=cap, reconcile_id=0, repair_hops=-1,
            fresh_reps_per_bucket=rescue,
            rescue_min_shared_bands=ns.rescueMinBands,
        )
        rec["reconcile_noop_sec"] = round(time.monotonic() - t0, 1)
        print("reconcile noop:", rec["reconcile_noop_sec"], flush=True)

        # batch comparator: the converged star-repair+rescue keep list
        # (the cost a daily full-recompute pipeline would pay for the
        # same result)
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
            / (rec["delta2_batch_sec"] + rec["gauge2_sec"]
               + sum(rec["reconcile2_converged_drain_secs"])),
            2,
        )
        rec["speedup_delta_incl_reconcile3"] = round(
            rec["full_recompute_sec"]
            / (rec["delta3_batch_sec"] + rec["gauge3_sec"]
               + sum(rec["reconcile3_converged_drain_secs"])),
            2,
        )
        rec["reconcile2_vs_reconcile1"] = round(
            sum(rec["reconcile2_converged_drain_secs"])
            / sum(rec["reconcile_converged_drain_secs"]), 3
        )
        rec["reconcile3_vs_reconcile2"] = round(
            sum(rec["reconcile3_converged_drain_secs"])
            / sum(rec["reconcile2_converged_drain_secs"]), 3
        )

        # keep-list equality over the FULL history (backfill + 3 deltas +
        # all reconciles, watermark/failure skipping active): must equal
        # the batch converged-star-repair+rescue keep list row for row
        inc = di.keep_list_from_index(spark, idx).localCheckpoint()
        batch_kl = dedup.near_dup_keep_list(docs, **batch_kw).localCheckpoint()
        inc_only = inc.exceptAll(batch_kl).localCheckpoint()
        batch_only = batch_kl.exceptAll(inc).localCheckpoint()
        rec["keep_list_mismatch_rows"] = inc_only.count() + batch_only.count()
        rec["keep_list_index_only_sample"] = [
            [int(r["doc_id"]), int(r["canonical_id"]), bool(r["is_kept"])]
            for r in inc_only.orderBy("doc_id").limit(20).collect()
        ]
        rec["keep_list_batch_only_sample"] = [
            [int(r["doc_id"]), int(r["canonical_id"]), bool(r["is_kept"])]
            for r in batch_only.orderBy("doc_id").limit(20).collect()
        ]
        print(
            "keep-list mismatch:",
            rec["keep_list_mismatch_rows"],
            "index-only:", rec["keep_list_index_only_sample"],
            "batch-only:", rec["keep_list_batch_only_sample"],
            flush=True,
        )

        # the r9 comparator (hops only, NO rescue): its divergence count
        # quantifies exactly what the rescue closed — the batch-side
        # promotion starvation measured at 74 rows on the mixed corpus
        batch_norescue = dedup.near_dup_keep_list(
            docs, max_bucket_size=cap, oversize_policy="star",
            star_repair_hops=-1,
        ).localCheckpoint()
        rec["keep_list_mismatch_rows_vs_norescue_batch"] = (
            inc.exceptAll(batch_norescue).count()
            + batch_norescue.exceptAll(inc).count()
        )
        print(
            "mismatch vs no-rescue batch (the closed starvation gap):",
            rec["keep_list_mismatch_rows_vs_norescue_batch"],
            flush=True,
        )

        # attribution control: one more converged reconcile with ALL
        # skipping disabled (no watermarks read, no persisted failures) —
        # if the keep list is unchanged, no repair was lost to
        # watermark/failure skipping
        t0 = time.monotonic()
        di.reconcile_capped_buckets(
            spark, idx, max_bucket_size=cap, reconcile_id=0, repair_hops=-1,
            use_watermarks=False, persist_failures=False,
            fresh_reps_per_bucket=rescue,
            rescue_min_shared_bands=ns.rescueMinBands,
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

        # compaction flattening (r9 task 2): merge every partition —
        # including the failed/ and reconciled/ side tables — and record
        # the failed table's row/file counts before vs after
        rec["failed_before_compaction"] = _failed_stats(spark, di, idx)
        t0 = time.monotonic()
        di.compact_index(spark, idx, upto_batch=3, target_partitions=32)
        rec["compact_sec"] = round(time.monotonic() - t0, 1)
        rec["failed_after_compaction"] = _failed_stats(spark, di, idx)
        print(
            "compaction:", rec["compact_sec"],
            "failed before:", rec["failed_before_compaction"],
            "after:", rec["failed_after_compaction"],
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
