"""High-source-cardinality mixture sampling at scale (round 8): the
broadcast plan-table rewrite's premise is that source cardinality no
longer bounds compilation — the old per-source CASE WHEN chain grew the
analyzed expression linearly in n_sources and overflowed codegen past a
few thousand. This measures both samplers on a 6M-row / 5,000-source
corpus (sf1 lineitem keyed by ``l_orderkey % 5000``) and pins exactness:
the md5-prefix boundary-slice run must equal the unfiltered full-window
run (``slack=1e9`` disables the prefilter) row for row.

Usage: python scripts/bench_mixture_sources_sf1.py
       [--sfDir .scaledata/sf1.0] [--nSources 5000]
       [--out SCALING_MIXTURE_sf1.json]

Single pass per configuration (the committed artifact is the
authoritative number, per SCALING.md's methodology pin).
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--sfDir", default=os.path.join(repo, ".scaledata/sf1.0"))
    ap.add_argument("--nSources", type=int, default=5000)
    ap.add_argument("--out", default=os.path.join(repo, "SCALING_MIXTURE_sf1.json"))
    ns = ap.parse_args()

    from pyspark.sql import functions as F

    from translator_tm_provider_pipelines_spark.operators import training as tr
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="bench-mixture-sources")
    spark.sparkContext.setLogLevel("ERROR")
    li = spark.read.parquet(os.path.join(ns.sfDir, "lineitem.parquet"))
    docs = li.select(
        F.monotonically_increasing_id().alias("doc_id"),
        F.concat(F.lit("src"), (F.col("l_orderkey") % ns.nSources)).alias("source"),
        F.col("l_quantity").cast("int").alias("n_tokens"),
    ).localCheckpoint()  # freeze ids: monotonically_increasing_id is plan-dependent
    n_rows = docs.count()

    rec: dict[str, object] = {
        "metric": "mixture_sampling_5k_sources_sf1",
        "sf_dir": ns.sfDir,
        "n_rows": n_rows,
        "n_sources": ns.nSources,
        "regimes": {},
    }

    def timed(fn):
        fn().write.format("noop").mode("overwrite").save()  # codegen warmup
        t0 = time.perf_counter()
        out = fn().localCheckpoint()
        n = out.count()
        return round(time.perf_counter() - t0, 1), n, out

    # two keep-fraction regimes: at 1/6 the rung-up slice is ~half the
    # corpus (parity expected); at 1/60 the slice is a few percent and
    # the window-sort saving shows
    for label, denom in (("keep_1_in_6", 6), ("keep_1_in_60", 60)):
        total = n_rows // denom
        budget = float(total * 25)  # ~avg 25 tokens/row
        row: dict[str, object] = {"doc_total": total, "token_budget": budget}
        sec, n, sliced = timed(lambda: tr.temperature_sample(docs, total=total))
        row["temperature_sliced"] = {"sec": sec, "rows": n}
        sec, n, full = timed(
            lambda: tr.temperature_sample(docs, total=total, slack=1e9)
        )
        row["temperature_full_window"] = {"sec": sec, "rows": n}
        row["temperature_mismatch_rows"] = (
            sliced.exceptAll(full).count() + full.exceptAll(sliced).count()
        )
        sec, n, sliced = timed(lambda: tr.token_budget_sample(docs, budget=budget))
        row["token_budget_sliced"] = {"sec": sec, "rows": n}
        sec, n, full = timed(
            lambda: tr.token_budget_sample(docs, budget=budget, slack=1e9)
        )
        row["token_budget_full_window"] = {"sec": sec, "rows": n}
        row["token_budget_mismatch_rows"] = (
            sliced.exceptAll(full).count() + full.exceptAll(sliced).count()
        )
        rec["regimes"][label] = row
        print(label, row, flush=True)

    line = json.dumps(rec)
    with open(ns.out, "w") as f:
        f.write(line + "\n")
    print(line)


if __name__ == "__main__":
    main()
