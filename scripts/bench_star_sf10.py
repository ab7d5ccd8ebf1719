"""sf10 star-policy matrix extension (VERDICT r6 tasks 6 & 7): measure the
converged/auto-hops repair mode and the quality-aware keep-best under star
policy against the uncapped keep-best, on the same 500k-doc dedup slice as
the committed SCALING_STAR_REPAIR_sf10.json (100-member near-dup clusters).

Regenerate the slice first if missing:
    python scripts/make_scaled_data.py --copies 100 --tables documents \
           --dest .scaledata/sf10-docs

Usage: python scripts/bench_star_sf10.py [--sfDir .scaledata/sf10-docs]
       [--skip uncapped_keep_best,...]

Appends/overwrites the new keys in SCALING_STAR_REPAIR_sf10.json:
  converged            — star_repair_hops=-1 wall, hops actually run,
                         collapsed members (vs the committed uncapped row)
  keep_best_uncapped   — near_dup_keep_best with no cap (the comparator)
  keep_best_star_hops6 — keep-best composed with cap 8 + star + hops6, plus
                         row-level agreement with the uncapped keep-best
                         ((doc_id, is_kept) equality and divergence count)

Single pass per configuration (each run is minutes; the committed artifact
is the authoritative number, per SCALING.md's methodology pin).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

ART = os.path.join(
    os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
    "SCALING_STAR_REPAIR_sf10.json",
)

LSH = dict(max_bucket_size=8, oversize_policy="star")


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfDir", default=".scaledata/sf10-docs")
    ap.add_argument("--skip", default="", help="comma-separated run names to skip")
    ap.add_argument("--artifact", default=ART, help="output JSON (override for dry runs)")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from pyspark.sql import functions as F

    from translator_tm_provider_pipelines_spark.operators import dedup
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="bench_star_sf10")
    spark.sparkContext.setLogLevel("ERROR")
    docs = spark.read.parquet(os.path.join(args.sfDir, "documents.parquet"))

    art = json.load(open(args.artifact)) if os.path.isfile(args.artifact) else {}
    out: dict[str, object] = dict(art)

    if "converged" not in skip:
        stats: dict = {}
        t0 = time.perf_counter()
        kl = dedup.near_dup_keep_list(
            docs, star_repair_hops=-1, repair_stats=stats, **LSH
        )
        collapsed = kl.where(~F.col("is_kept")).count()
        sec = round(time.perf_counter() - t0, 1)
        out["converged"] = {
            "sec": sec,
            "hops_run": stats.get("hops_run"),
            "converged": stats.get("converged"),
            "collapsed": collapsed,
        }
        print("converged:", out["converged"], flush=True)

    kb_un = None
    if "uncapped_keep_best" not in skip:
        t0 = time.perf_counter()
        kb_un = dedup.near_dup_keep_best(docs, "n_chars").localCheckpoint()
        kept = kb_un.where(F.col("is_kept")).count()
        sec = round(time.perf_counter() - t0, 1)
        out["keep_best_uncapped"] = {"sec": sec, "kept": kept}
        print("keep_best_uncapped:", out["keep_best_uncapped"], flush=True)

    if "star_keep_best" not in skip:
        t0 = time.perf_counter()
        kb_star = dedup.near_dup_keep_best(
            docs, "n_chars", star_repair_hops=6, **LSH
        ).localCheckpoint()
        kept = kb_star.where(F.col("is_kept")).count()
        sec = round(time.perf_counter() - t0, 1)
        row: dict[str, object] = {"sec": sec, "kept": kept}
        if kb_un is not None:
            a = kb_un.select("doc_id", "is_kept")
            b = kb_star.select("doc_id", "is_kept")
            n_diverged = a.exceptAll(b).count() + b.exceptAll(a).count()
            row["keep_set_equals_uncapped"] = n_diverged == 0
            row["diverged_rows"] = n_diverged
        out["keep_best_star_hops6"] = row
        print("keep_best_star_hops6:", row, flush=True)

    with open(args.artifact, "w") as f:
        json.dump(out, f)
        f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
