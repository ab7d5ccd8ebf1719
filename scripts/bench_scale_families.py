"""sf10 scaling exponents for the round-7 target families (VERDICT r6 task
4): dictionary NER (token-window sort over documents) and the cooccurrence
pair chain (Zipf-skewable concept keys over lineitem).

Slices (regenerate if missing — .scaledata/ is never committed):
    python scripts/make_scaled_data.py --copies 100 --tables documents \
           --dest .scaledata/sf10-docs
    python scripts/make_scaled_data.py --copies 100 --tables lineitem \
           --dest .scaledata/sf10-li

For each family the query runs (after one sf0.001 codegen warmup) at
sf0.1, sf1.0 and its sf10 slice; per-step wall and the per-decade scaling
exponent e = log10(t_hi/t_lo) are recorded (e = 1 linear, > 1 super-linear).
After the sf10 run the EXECUTED (post-AQE) plan is scraped for the skew
evidence the docs previously only asserted: join strategies actually chosen,
presence of map-side partial aggregation, and whether AQE flagged any
skew-split joins (`skew=true`).

The cooccurrence family additionally runs a deliberately Zipf-skewed sf10
variant (the FIRST lineitem of every order re-keyed to ONE hot supplier, so
that concept co-occurs with every other concept in ~every order — a true
Zipf head: its concept_count is ~the order count and it participates in a
large fraction of all pairs) to measure what a head concept does to the
chain; generated on the fly next to the sf10 slice if missing.

Usage: python scripts/bench_scale_families.py [--skip ner|cooc]
Writes SCALING_FAMILIES_sf10.json.
"""

from __future__ import annotations

import argparse
import json
import math
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ART = os.path.join(REPO, "SCALING_FAMILIES_sf10.json")


def _ensure_skewed_lineitem(src: str, dest: str) -> None:
    """Re-key the first lineitem of EVERY order to supplier 1: concept
    'S:1' then co-occurs with every other concept of every order — the
    Zipf head case (one concept in ~100% of units). Re-keying whole
    orders would instead produce degenerate single-concept units that
    generate no pairs at all."""
    if os.path.isfile(os.path.join(dest, "lineitem.parquet")):
        return
    import duckdb

    os.makedirs(dest, exist_ok=True)
    con = duckdb.connect()
    con.sql(
        f"""
        COPY (
          SELECT * REPLACE (
            CASE WHEN l_linenumber = 1 THEN 1 ELSE l_suppkey END
            AS l_suppkey)
          FROM '{src}/lineitem.parquet'
        ) TO '{dest}/lineitem.parquet' (FORMAT parquet)
        """
    )
    print(f"skewed slice written to {dest}", flush=True)


def _plan_markers(df) -> dict[str, object]:
    p = df._jdf.queryExecution().executedPlan().toString()
    return {
        "broadcast_hash_joins": p.count("BroadcastHashJoin"),
        "sort_merge_joins": p.count("SortMergeJoin"),
        "aqe_skew_split_joins": p.count("skew=true"),
        "partial_aggregation": ("partial_count" in p or "partial_sum" in p),
        "cartesian_products": p.count("CartesianProduct"),
    }


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip", default="")
    args = ap.parse_args()
    skip = set(filter(None, args.skip.split(",")))

    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="bench_scale_families")
    spark.sparkContext.setLogLevel("ERROR")

    sf10_li = os.path.join(REPO, ".scaledata/sf10-li")
    sf10_li_skew = os.path.join(REPO, ".scaledata/sf10-li-skew")
    doc_steps = [
        ("sf0.1", "/root/testdata/sf0.1"),
        ("sf1.0", os.path.join(REPO, ".scaledata/sf1.0")),
        ("sf10", os.path.join(REPO, ".scaledata/sf10-docs")),
    ]
    fams = {
        "ner": ("ontology_dictionary_ner", doc_steps),
        "cooc": (
            "cooccurrence_metrics",
            [
                ("sf0.1", "/root/testdata/sf0.1"),
                ("sf1.0", os.path.join(REPO, ".scaledata/sf1.0")),
                ("sf10", sf10_li),
                ("sf10_zipf_skew", sf10_li_skew),
            ],
        ),
        # the round-7 boundary-slice selection operators: these are the
        # plans whose pre-fix shape (full-relation single-partition
        # window) would have been the 100x bottleneck — the exponents
        # show whether the slice keeps them corpus-linear
        "dsir_select": ("dsir_top_selection", doc_steps),
        "dsir_gumbel": ("dsir_gumbel_resample", doc_steps),
        "temperature": ("temperature_mixture_sample", doc_steps),
        "token_budget": ("token_budget_mixture_sample", doc_steps),
        # two more document-driven reference families (round 7 extras):
        # the sentence layer (narrow pass + doc_id window) and the J1
        # universal input join (one OR-predicate scan + two doc_id
        # shuffles over the synthesized two-stream store)
        "sentence": ("sentence_segmentation", doc_steps),
        "uij": ("universal_input_join", doc_steps),
    }
    if "cooc" not in skip:
        _ensure_skewed_lineitem(sf10_li, sf10_li_skew)

    out = json.load(open(ART)) if os.path.isfile(ART) else {}
    for fam, (qname, steps) in fams.items():
        if fam in skip:
            continue
        fn = tq.QUERIES[qname]
        fn(spark, "/root/testdata/sf0.001").write.format("noop").mode(
            "overwrite"
        ).save()  # codegen warmup
        spark.catalog.clearCache()
        walls: dict[str, float] = {}
        markers: dict[str, object] = {}
        for label, sf_dir in steps:
            # the builder call is INSIDE the timed window: selection
            # operators run their quantile/count/quota actions eagerly
            # while building the plan (same accounting as bench.py)
            t0 = time.perf_counter()
            df = fn(spark, sf_dir)
            df.write.format("noop").mode("overwrite").save()
            walls[label] = round(time.perf_counter() - t0, 1)
            if label.startswith("sf10"):
                markers[label] = _plan_markers(df)
            spark.catalog.clearCache()
            print(f"{qname} {label}: {walls[label]} s", flush=True)
        rec: dict[str, object] = {"query": qname, "wall_sec": walls,
                                  "plan_markers_sf10": markers}
        if "sf1.0" in walls and "sf0.1" in walls:
            rec["exponent_sf0.1_to_sf1.0"] = round(
                math.log10(walls["sf1.0"] / walls["sf0.1"]), 2
            )
        if "sf10" in walls and "sf1.0" in walls:
            rec["exponent_sf1.0_to_sf10"] = round(
                math.log10(walls["sf10"] / walls["sf1.0"]), 2
            )
        if "sf10_zipf_skew" in walls and "sf10" in walls:
            rec["skew_slowdown_vs_sf10"] = round(
                walls["sf10_zipf_skew"] / walls["sf10"], 2
            )
        out[fam] = rec
        with open(ART, "w") as f:
            json.dump(out, f, indent=1)
            f.write("\n")
    print(json.dumps(out))


if __name__ == "__main__":
    main()
