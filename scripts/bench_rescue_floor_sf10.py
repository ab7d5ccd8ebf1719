"""sf10 rescue-floor sensitivity (VERDICT r10 task 6): the untried-member
rescue's ``min_shared_bands`` band-agreement prefilter is the one knob
whose setting changes WHICH edges the rescue may propose, and SCALING.md
argues >= 2 at scale while the r10 artifact fixed 3. This run proves the
knob is safe to tune: for each floor in {1, 2, 3} it measures, on the
mixed sf10 corpus (500k docs, 20% dup-rate),

  - the batch path (``near_dup_keep_list`` with converged star repair +
    rescue at that floor): wall time + rescue rounds;
  - the incremental path (backfill 99% + 1% delta ingested once, then
    watermark-gauged reconcile runs at that floor until drained): wall
    time + drain runs;
  - index-vs-batch keep-list divergence AT THE SAME floor (the equality
    invariant must hold at ANY shared setting — the filter is a pure
    function of the two immutable documents, identical on both paths);
  - batch@floor vs batch@1 divergence (what raising the floor actually
    drops — the cost side of the knob).

Appends the ``rescue_floor_sensitivity`` key to
SCALING_STAR_REPAIR_sf10.json. Regenerate the corpus first if missing:
    python scripts/make_mixed_data.py

Usage: python scripts/bench_rescue_floor_sf10.py \
       [--sfDir .scaledata/sf10-docs-mixed] [--floors 1,2,3]

Single pass per configuration (each is minutes; the committed artifact is
the authoritative number, per SCALING.md's methodology pin).
"""

from __future__ import annotations

import argparse
import atexit
import json
import os
import shutil
import sys
import tempfile
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "SCALING_STAR_REPAIR_sf10.json")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument(
        "--sfDir", default=os.path.join(REPO, ".scaledata/sf10-docs-mixed")
    )
    ap.add_argument("--floors", default="1,2,3")
    ap.add_argument("--cap", type=int, default=8)
    ap.add_argument("--rescue", type=int, default=64)
    ap.add_argument("--delta-pct", type=float, default=1.0)
    ap.add_argument("--artifact", default=ART)
    ns = ap.parse_args()
    floors = [int(x) for x in ns.floors.split(",")]

    from pyspark.sql import functions as F

    from translator_tm_provider_pipelines_spark.operators import dedup
    from translator_tm_provider_pipelines_spark.session import get_spark
    from translator_tm_provider_pipelines_spark.streaming import dedup_index as di

    spark = get_spark(app_name="bench-rescue-floor-sf10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(
        os.path.join(ns.sfDir, "documents.parquet")
    ).select("doc_id", "text")
    n_docs = docs.count()

    def divergence(a, b) -> int:
        aa = a.select(
            "doc_id",
            F.col("canonical_id").alias("__ca"),
            F.col("is_kept").alias("__ka"),
        )
        bb = b.select(
            "doc_id",
            F.col("canonical_id").alias("__cb"),
            F.col("is_kept").alias("__kb"),
        )
        j = aa.join(bb, "doc_id", "full_outer")
        return j.where(
            F.col("__ca").isNull()
            | F.col("__cb").isNull()
            | (F.col("__ca") != F.col("__cb"))
            | (F.col("__ka") != F.col("__kb"))
        ).count()

    # backfill is floor-independent (the ingest path has no rescue):
    # build the index ONCE — 99% backfill at batch 0, 1% delta at batch 1
    # — then copy the directory per floor so each drain starts identical
    cut = docs.approxQuantile("doc_id", [1.0 - ns.delta_pct / 100.0], 0.0)[0]
    work = tempfile.mkdtemp(prefix="rescue-floor-")
    # the working dir holds the backfilled index plus one copy per floor
    # (GB-scale at sf10); clean it up on ANY exit, including a crashed
    # drain loop — these runs are minutes long and get retried
    atexit.register(shutil.rmtree, work, ignore_errors=True)
    idx0 = os.path.join(work, "idx0")
    t0 = time.time()
    di.update_near_dup_index(
        spark, docs.where(F.col("doc_id") <= cut), idx0, 0,
        max_bucket_size=ns.cap, oversize_policy="star",
    ).count()
    di.update_near_dup_index(
        spark, docs.where(F.col("doc_id") > cut), idx0, 1,
        max_bucket_size=ns.cap, oversize_policy="star",
    ).count()
    backfill_wall = round(time.time() - t0, 1)
    print(f"backfill+delta: {backfill_wall}s over {n_docs} docs", flush=True)

    rows = {}
    batch_keeps = {}
    for floor in floors:
        stats: dict = {}
        t0 = time.time()
        bk = dedup.near_dup_keep_list(
            docs, max_bucket_size=ns.cap, oversize_policy="star",
            star_repair_hops=-1, star_rescue_reps=ns.rescue,
            star_rescue_min_bands=floor, repair_stats=stats,
        ).localCheckpoint()
        batch_wall = round(time.time() - t0, 1)
        batch_keeps[floor] = bk

        idx = os.path.join(work, f"idx-f{floor}")
        shutil.copytree(idx0, idx)
        settings = dict(
            threshold=0.8, k=3, repair_hops=-1, reps_per_hop=8,
            fresh_reps_per_bucket=ns.rescue, rescue_min_shared_bands=floor,
        )
        t0 = time.time()
        drains = 0
        while drains < 20:
            g = di.index_bucket_stats(
                spark, idx, ns.cap, reconcile_settings=settings
            )
            if not di.should_reconcile(g):
                break
            di.reconcile_capped_buckets(
                spark, idx, ns.cap, repair_hops=-1,
                fresh_reps_per_bucket=ns.rescue,
                rescue_min_shared_bands=floor, reconcile_id=drains,
            )
            drains += 1
        rec_wall = round(time.time() - t0, 1)
        ik = di.keep_list_from_index(spark, idx).localCheckpoint()
        div = divergence(ik, bk)
        rows[str(floor)] = {
            "batch_wall_sec": batch_wall,
            "batch_rescue_rounds": stats.get("rescue_rounds"),
            "batch_hops_run": stats.get("hops_run"),
            "reconcile_wall_sec": rec_wall,
            "drain_runs": drains,
            "index_vs_batch_divergence": div,
        }
        print(f"floor={floor}: {rows[str(floor)]}", flush=True)

    base_floor = str(min(floors))
    for floor in floors:
        if floor == min(floors):
            continue
        div = divergence(batch_keeps[floor], batch_keeps[min(floors)])
        rows[str(floor)]["batch_vs_floor%s_divergence" % base_floor] = div
        print(
            f"floor={floor} vs floor={base_floor}: divergence={div}",
            flush=True,
        )

    art = json.load(open(ns.artifact)) if os.path.isfile(ns.artifact) else {}
    art["rescue_floor_sensitivity"] = {
        "corpus": ns.sfDir,
        "n_docs": n_docs,
        "cap": ns.cap,
        "rescue_bound": ns.rescue,
        "backfill_wall_sec": backfill_wall,
        "floors": rows,
    }
    with open(ns.artifact, "w") as f:
        json.dump(art, f, indent=1)
        f.write("\n")
    print(f"wrote {ns.artifact}", flush=True)
    shutil.rmtree(work, ignore_errors=True)


if __name__ == "__main__":
    main()
