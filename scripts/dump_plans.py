"""Regenerate PLANS.md: formatted physical plans for representative registry
queries, trimmed to the structurally interesting lines. Run from the repo
root: python scripts/dump_plans.py
"""

from __future__ import annotations

import os
import re
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF = "/root/testdata/sf0.001"

#: query → one-line commentary on what the plan must show
SHOWCASE = {
    "filter_documents": "predicate pushdown + column pruning reach the parquet scan",
    "regional_revenue": "dimension joins broadcast; no sort-merge join",
    "minhash_band_signatures": "zero-shuffle narrow projection (single WholeStageCodegen scan)",
    "near_duplicates": "LSH bucket shuffle + survivor-scoped Jaccard joins; no cartesian",
    "span_first_containing": "doc-keyed equi-join + map-side-combining min, no window sort",
    "cooccurrence_metrics": "pair expansion without self-join; one-row totals via broadcast",
    "language_id": "single regexp scan, pure narrow",
    "dictionary_ner": "broadcast-hash dictionary matcher",
    "semmed_cui_idf": "partial aggregation before the cui shuffle",
    "universal_input_join": "one scan for all criteria + doc_id-keyed joins",
    "drugbank_dictionary": "single-Exchange narrow rule chain (one distinct shuffle)",
    "procedure_dictionary": "broadcast procedure-id semi-join; dimension-sized aggregations",
    "paragraph_dedup": "narrow explode + min-struct hash groupBy + in-order reassembly",
    "pq_adc_topk": "codes-only scan, lookup-table distance, TakeOrderedAndProject",
    "pii_redaction": "zero-shuffle regexp chain, pure narrow",
    "benchmark_decontamination": (
        "benchmark n-gram dim broadcast; partial combine leaves one "
        "row per doc on the only exchange"
    ),
    "sequence_packing": "one hash exchange on shard; window sort parallel across shards",
    "semantic_near_duplicates": (
        "centroid assignment as a narrow broadcast-literal expression; "
        "one cluster-keyed shuffle plus the round-robin pair-explode "
        "spread (r12); survivor-scoped cosine joins"
    ),
    "repeated_kgram_spans": (
        "md5 window keys hashed before the gram shuffle; no join-back; "
        "span merge shuffles only duplicated positions"
    ),
    "curation_manifest": (
        "five curation rules fused over one corpus scan; only the "
        "dedup-hash window and the pack-shard window exchange"
    ),
    "sentence_cooccurrence_export": (
        "top-cost query of the bench: doc_id equi-joins + narrow-key "
        "aggregation; hashing happens after the aggregate, not on the "
        "shuffled rows"
    ),
    "ontology_dictionary_ner": (
        "broadcast dictionary; the tokenize->n-gram chain costs one "
        "Exchange and one Sort"
    ),
    "dsir_top_selection": (
        "round-7 boundary-slice rank: the global row_number window sits "
        "above a bracketed log_weight Filter, never the full weight table"
    ),
    "dsir_gumbel_resample": (
        "Gumbel-top-k resampling through the same boundary slice "
        "(bracketed __gkey Filter below the window)"
    ),
    "temperature_mixture_sample": (
        "per-source rank consumes only the md5-prefix survivors — the "
        "slice predicate rides the broadcast plan-table join's residual "
        "condition (round 8; no per-source CASE WHEN chain)"
    ),
    "token_budget_mixture_sample": (
        "per-source running-token cut over the md5-prefix slice; "
        "threshold+quota ride one broadcast plan-table join (round 8)"
    ),
    "near_dup_star_repaired": (
        "round-12: band/candidate/v1 tables checkpointed once; the "
        "single repair hop and second verify build on ExistingRDD scans "
        "— no per-consumer re-derivation of minhash->bands->star, no "
        "cartesian"
    ),
    "near_dup_star_rescued": (
        "round-11: band/candidate tables checkpointed once and reused by "
        "both verify stages and the rescue; the rescue enumeration is "
        "unattached x attached only — no cartesian, no all-pairs"
    ),
}

KEEP = re.compile(
    r"Scan|Exchange|Broadcast|HashAggregate|SortMergeJoin|BroadcastHashJoin|"
    r"BroadcastNestedLoop|Cartesian|WholeStageCodegen|PushedFilters|ReadSchema|"
    r"Window|Sort |TakeOrdered|Generate"
)

#: session-dependent tokens scrubbed from plan text so the committed
#: snapshot is reproducible: expression ids (#123) and codegen/plan ids
#: are assigned by a per-JVM counter, and broadcast exchange ids vary
#: with execution order. Plan SHAPE (operators, join strategies, pushed
#: filters, exchange count) survives normalization untouched.
_NORMALIZE = [
    (re.compile(r"#\d+L?"), "#N"),
    (re.compile(r"\[plan_id=\d+\]"), "[plan_id=N]"),
    (re.compile(r"\[id=#?N?\d*\]"), "[id=N]"),
    (re.compile(r"WholeStageCodegen \(\d+\)"), "WholeStageCodegen (N)"),
    # the tree-form codegen prefix `*(3) HashAggregate...`: under AQE the
    # numbering depends on which independent shuffle stage materializes
    # first, so it is run-order-dependent on a loaded box (observed *(13)
    # vs *(14) flips in test_plans_md_is_fresh)
    (re.compile(r"\*\(\d+\)"), "*(N)"),
    (re.compile(r"dynamicpruning#N?\d*"), "dynamicpruning#N"),
]


def normalize(text: str) -> str:
    for pat, rep in _NORMALIZE:
        text = pat.sub(rep, text)
    return text


def render(spark) -> str:
    """The full PLANS.md content for the current code — used by main()
    to write the file and by tests/test_plan_shapes.py to fail on drift
    (r8 VERDICT task 7: the snapshots were hand-refreshed and drifted
    mid-round)."""
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq

    out = [
        "# PLANS — physical-plan evidence for headline queries",
        "",
        "Regenerate with `python scripts/dump_plans.py`. Each block is the",
        "executed physical plan (sf0.001 inputs; plan SHAPE is scale-",
        "independent) trimmed to scans, exchanges, joins, aggregates and",
        "codegen boundaries. The full assertions live in",
        "tests/test_plan_shapes.py — this file is the human-readable view.",
        "",
    ]
    for name, note in SHOWCASE.items():
        df = tq.QUERIES[name](spark, SF)
        plan = df._jdf.queryExecution().executedPlan().toString()
        lines = [
            ln.rstrip()
            for ln in plan.splitlines()
            if KEEP.search(ln)
        ]
        shown = normalize("\n".join(lines[:40]))
        n_ex = plan.count("Exchange")
        out += [
            f"## {name}",
            "",
            f"_{note}_ — {n_ex} Exchange node(s) in the executed plan.",
            "",
            "```",
            shown,
            "```",
            "",
        ]
    return "\n".join(out)


def main() -> None:
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="dump_plans")
    spark.sparkContext.setLogLevel("ERROR")
    text = render(spark)
    with open(os.path.join(os.path.dirname(__file__), "..", "PLANS.md"), "w") as f:
        f.write(text)
    print("wrote PLANS.md")


if __name__ == "__main__":
    main()
