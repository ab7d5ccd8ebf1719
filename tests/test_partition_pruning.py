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


DOC_SCHEMA = ("doc_id string, doc_type string, doc_format string, "
              "pipeline_key string, pipeline_version string, content string, "
              "chunk_id long, chunk_total long, collections array<string>")
STATUS_SCHEMA = ("doc_id string, pub_year string, pub_types array<string>, "
                 "flags map<string,boolean>, collections array<string>")


def _scoped_join(spark, stores, collection):
    doc_path, status_path = stores
    joined, _failures = docops.universal_input_join(
        docops.read_partitioned_store(
            spark, status_path, collection=collection, schema=STATUS_SCHEMA
        ),
        docops.read_partitioned_store(
            spark, doc_path, collection=collection, schema=DOC_SCHEMA
        ),
        tq._UIJ_CRITERIA,
        required_flags=["TEXT_DONE"],
        target_flag="SENT_DONE",
        collection=collection,
    )
    return joined


def _corrupt_partitions_outside(root, keep_substrings):
    """Overwrite the data files of every partition directory whose path
    does NOT contain all ``keep_substrings`` with non-parquet garbage: a
    partition-PRUNED scan never opens them and succeeds; a scan that
    merely row-filters after reading would crash. (inputFiles()/plan-text
    assertions are unreliable here: the former ignores partition filters,
    the latter truncates long filter lists once attribute ids grow.)"""
    import os

    n = 0
    for dirpath, _dirs, files in os.walk(root):
        if all(s in dirpath for s in keep_substrings):
            continue
        for fn in files:
            p = os.path.join(dirpath, fn)
            if fn.endswith(".parquet") and not fn.startswith("."):
                with open(p, "wb") as f:
                    f.write(b"not a parquet file")
                n += 1
            elif fn.endswith(".crc"):
                os.remove(p)  # stale local-FS checksums would trip first
    return n


def _copy_stores(stores, tmp_path):
    import shutil

    doc_path, status_path = stores
    d2, s2 = str(tmp_path / "docs2"), str(tmp_path / "status2")
    shutil.copytree(doc_path, d2)
    shutil.copytree(status_path, s2)
    return d2, s2


def test_collection_scope_prunes_both_scans(spark, stores, tmp_path):
    """Every parquet scan in the collection-scoped stage run must carry the
    collection equality in PartitionFilters, and the run must never OPEN
    other collections' files — proven by corrupting every out-of-scope
    partition file and running the scoped join to completion."""
    joined = _scoped_join(spark, stores, "src1")
    plan = joined._jdf.queryExecution().executedPlan().toString()
    scans = [l for l in plan.splitlines() if "FileScan parquet" in l]
    assert len(scans) >= 2  # documents + status
    for line in scans:
        assert "PartitionFilters: [" in line
        assert "collection" in line.split("PartitionFilters: [", 1)[1]

    doc2, status2 = _copy_stores(stores, tmp_path)
    assert _corrupt_partitions_outside(doc2, ["collection=src1"]) > 0
    assert _corrupt_partitions_outside(status2, ["collection=src1"]) > 0
    want = _scoped_join(spark, stores, "src1").count()
    got = _scoped_join(spark, (doc2, status2), "src1").count()
    assert got == want and want > 0


def test_doc_type_scope_prunes_within_collection(spark, stores, tmp_path):
    """doc_type is the second partition level: a (collection, doc_type)-
    scoped read must not open any other subdirectory's files."""
    doc2, _ = _copy_stores(stores, tmp_path)
    n = _corrupt_partitions_outside(doc2, ["collection=src2", "doc_type=SECTIONS"])
    assert n > 0
    df = docops.read_partitioned_store(
        spark, doc2, collection="src2", doc_types=["SECTIONS"], schema=DOC_SCHEMA
    )
    rows = df.collect()  # would crash on any corrupted file being opened
    assert rows and all(r.doc_type == "SECTIONS" for r in rows)


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
