"""Partition-pruning proof for collection-scoped stage runs (VERDICT r6
task 5): documents/status stores written partitionBy(collection[, doc_type])
must turn a collection-scoped universal_input_join into PRUNED scans —
``PartitionFilters`` in the executed plan, not merely PushedFilters — while
returning exactly the unpartitioned path's rows.

This is the engine's answer to the reference sharding PubMed into
PUBMED_SUB_0..36 batch collections and running one pipeline per batch
(scripts/rrun-b-sentence-segmentation-batch.sh:5-15): the batch scoping is
a storage-layout property, not 37 separate launches."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import documents as docops
from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
from translator_tm_provider_pipelines_spark.sources import sinks

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def stores(spark, tmp_path_factory):
    """Partitioned variants of the synthetic document/status stores: the
    scalar `collection` partition column is the row's home collection
    (the fixtures' collections arrays are single-element)."""
    root = tmp_path_factory.mktemp("stores")
    docs = tq._synth_document_streams(spark, SF).withColumn(
        "collection", F.element_at("collections", 1)
    )
    status = tq._synth_status(spark, SF).withColumn(
        "collection", F.element_at("collections", 1)
    )
    doc_path = str(root / "documents_store")
    status_path = str(root / "status_store")
    sinks.write_table(docs, doc_path, partition_by=["collection", "doc_type"])
    sinks.write_table(status, status_path, partition_by=["collection"])
    return doc_path, status_path


def _scoped_join(spark, stores, collection):
    doc_path, status_path = stores
    joined, _failures = docops.universal_input_join(
        docops.read_partitioned_store(spark, status_path, collection=collection),
        docops.read_partitioned_store(spark, doc_path, collection=collection),
        tq._UIJ_CRITERIA,
        required_flags=["TEXT_DONE"],
        target_flag="SENT_DONE",
        collection=collection,
    )
    return joined


def test_collection_scope_prunes_both_scans(spark, stores):
    """Every parquet scan in the collection-scoped stage run must carry the
    collection equality in PartitionFilters — the listing never touches
    other collections' directories."""
    joined = _scoped_join(spark, stores, "src1")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) >= 2  # documents + status
    for line in scans:
        assert "PartitionFilters: [" in line
        pf = line.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
        assert "collection" in pf and "src1" in pf, pf


def test_doc_type_scope_prunes_within_collection(spark, stores):
    """doc_type is the second partition level: scoping a read to one type
    prunes to that type's subdirectories."""
    doc_path, _ = stores
    df = docops.read_partitioned_store(
        spark, doc_path, collection="src2", doc_types=["SECTIONS"]
    )
    plan = df._jdf.queryExecution().executedPlan().toString()
    scan = next(l for l in plan.splitlines() if "FileScan parquet" in l)
    pf = scan.split("PartitionFilters: [", 1)[1].split("]", 1)[0]
    assert "collection" in pf and "src2" in pf
    # the plan printer truncates long filter lists ("= SEC...") — match the
    # predicate prefix, the behavior is pinned by the count below anyway
    assert "doc_type" in pf and "= SEC" in pf
    assert df.where(F.col("doc_type") != "SECTIONS").count() == 0


def test_pruned_run_matches_unpartitioned_run(spark, stores):
    """Pruning is a layout optimization, never a semantic change: the
    collection-scoped join over the partitioned stores returns exactly the
    in-memory (unpartitioned) path's rows for that collection."""
    want_joined, _ = docops.universal_input_join(
        tq._synth_status(spark, SF),
        tq._synth_document_streams(spark, SF),
        tq._UIJ_CRITERIA,
        required_flags=["TEXT_DONE"],
        target_flag="SENT_DONE",
        collection="src1",
    )
    cols = ["doc_id", "pub_year", "pub_types", "collections", "contents"]

    def norm(df):
        return sorted(
            (r.doc_id, r.pub_year, tuple(r.pub_types), tuple(r.collections),
             tuple(sorted(r.contents.items())))
            for r in df.select(cols).collect()
        )

    got = norm(_scoped_join(spark, stores, "src1"))
    want = norm(want_joined)
    assert got == want and len(want) > 0
