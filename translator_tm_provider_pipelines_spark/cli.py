"""CLI: PipelineKey dispatch + the reference's option grammar (SURVEY §3.1).

Reference: .../etl/PipelineMain.java:124-236 — ``args[0]`` selects a
PipelineKey, the rest configure it; input documents are specified with the
``TYPE|FORMAT|PIPELINE|VERSION;...`` mini-DSL
(compileInputDocumentCriteria :1065-1078) and required status flags as a
'|'-delimited list (compileRequiredProcessingStatusFlags :1080-1086).

Each pipeline here is a thin wiring function: read partitioned parquet
tables, run the operator-layer functions, write outputs. The heavy
semantics live in ``operators/``; the CLI is replaceable by any
orchestrator (Airflow, dbt, plain spark-submit).
"""

from __future__ import annotations

import argparse
from collections.abc import Callable

from pyspark.sql import SparkSession

from .operators import documents as docops
from .operators.documents import parse_criteria  # re-export for callers


def parse_flags(spec: str | None) -> list[str]:
    """'FLAG_A|FLAG_B' → list (compileRequiredProcessingStatusFlags)."""
    if not spec:
        return []
    return [f for f in spec.split("|") if f]


def _common_io_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--documents", required=True, help="documents parquet table path")
    p.add_argument("--status", required=True, help="status parquet table path")
    p.add_argument("--output", required=True, help="output path")
    p.add_argument("--failures", help="failure side-channel output path")
    p.add_argument(
        "--inputDocumentCriteria",
        required=True,
        help="TYPE|FORMAT|PIPELINE|VERSION;... (PipelineMain.java:1065-1078)",
    )
    p.add_argument("--requiredProcessingStatusFlags", default="")
    p.add_argument("--targetProcessingStatusFlag")
    p.add_argument("--collection")
    p.add_argument("--overwrite", action="store_true")


def _load_joined(spark: SparkSession, ns: argparse.Namespace):
    status = spark.read.parquet(ns.status)
    docs = spark.read.parquet(ns.documents)
    criteria = parse_criteria(ns.inputDocumentCriteria)
    joined, failures = docops.universal_input_join(
        status,
        docs,
        criteria,
        required_flags=parse_flags(ns.requiredProcessingStatusFlags),
        target_flag=ns.targetProcessingStatusFlag,
        collection=ns.collection,
        overwrite=ns.overwrite,
    )
    if ns.failures:
        failures.write.mode("overwrite").parquet(ns.failures)
    return joined, criteria


def run_sentence_segmentation(spark: SparkSession, argv: list[str]) -> None:
    """SENTENCE_SEGMENTATION: text documents → sentence annotations."""
    from pyspark.sql import functions as F

    from .operators import sentences as sentops

    p = argparse.ArgumentParser(prog="SENTENCE_SEGMENTATION")
    _common_io_args(p)
    ns = p.parse_args(argv)
    joined, criteria = _load_joined(spark, ns)
    text = joined.select(
        "doc_id", F.col("contents").getItem(criteria[0].key).alias("content")
    )
    sents = sentops.segment_sentences(text)
    sentops.sentences_as_annotations(sents).write.mode("overwrite").parquet(ns.output)


def run_concept_cooccurrence_counts(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_COOCCURRENCE_COUNTS: annotations → doc-to-concept relation."""
    from pyspark.sql import functions as F

    p = argparse.ArgumentParser(prog="CONCEPT_COOCCURRENCE_COUNTS")
    p.add_argument("--annotations", required=True)
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    annots = spark.read.parquet(ns.annotations)
    annots.where(F.col("concept_id").isNotNull()).select(
        F.col("doc_id").alias("text_id"), "concept_id"
    ).distinct().write.mode("overwrite").parquet(ns.output)


def run_concept_cooccurrence_metrics(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_COOCCURRENCE_METRICS: doc-to-concept → pair metrics table."""
    from .operators import cooccurrence as co

    p = argparse.ArgumentParser(prog="CONCEPT_COOCCURRENCE_METRICS")
    p.add_argument("--unitConcepts", required=True)
    p.add_argument("--ancestorMap", help="(concept_id, ancestor_id) parquet")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    uc = spark.read.parquet(ns.unitConcepts)
    anc = spark.read.parquet(ns.ancestorMap) if ns.ancestorMap else None
    co.cooccurrence_chain_from_rows(uc, ancestors=anc).write.mode(
        "overwrite"
    ).parquet(ns.output)


def run_concept_idf(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_IDF: doc-to-concept → per-concept IDF."""
    from .operators import cooccurrence as co

    p = argparse.ArgumentParser(prog="CONCEPT_IDF")
    p.add_argument("--unitConcepts", required=True)
    p.add_argument("--ancestorMap")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    uc = spark.read.parquet(ns.unitConcepts)
    anc = spark.read.parquet(ns.ancestorMap) if ns.ancestorMap else None
    co.concept_idf(uc, ancestors=anc).write.mode("overwrite").parquet(ns.output)


def run_medline_xml_to_text(spark: SparkSession, argv: list[str]) -> None:
    """MEDLINE_XML_TO_TEXT: PubMed XML → documents + section annotations."""
    from .sources import medline

    p = argparse.ArgumentParser(prog="MEDLINE_XML_TO_TEXT")
    p.add_argument("--xml", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--sectionsOutput")
    ns = p.parse_args(argv)
    docs = medline.medline_documents(medline.read_medline_xml(spark, ns.xml))
    docs.write.mode("overwrite").parquet(ns.output)
    if ns.sectionsOutput:
        medline.medline_section_annotations(docs).write.mode("overwrite").parquet(
            ns.sectionsOutput
        )


#: PipelineKey → runner (the implemented subset of PipelineMain.java:124-236)
PIPELINES: dict[str, Callable[[SparkSession, list[str]], None]] = {
    "SENTENCE_SEGMENTATION": run_sentence_segmentation,
    "CONCEPT_COOCCURRENCE_COUNTS": run_concept_cooccurrence_counts,
    "CONCEPT_COOCCURRENCE_METRICS": run_concept_cooccurrence_metrics,
    "CONCEPT_IDF": run_concept_idf,
    "MEDLINE_XML_TO_TEXT": run_medline_xml_to_text,
}


def main(argv: list[str] | None = None) -> int:
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if not args or args[0] in ("-h", "--help"):
        print("usage: engine <PIPELINE_KEY> [pipeline options]")
        print("pipelines: " + ", ".join(sorted(PIPELINES)))
        return 0 if args else 2
    key = args[0]
    if key not in PIPELINES:
        raise SystemExit(
            f"unknown pipeline key {key!r}; known: {', '.join(sorted(PIPELINES))}"
        )
    from .session import get_spark

    spark = get_spark(app_name=f"engine-{key.lower()}")
    PIPELINES[key](spark, args[1:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
