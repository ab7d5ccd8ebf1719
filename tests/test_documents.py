"""Document substrate tests — mirrors the reference's PipelineMainTest
semantics: semantic version compare, chunk splice ordering, universal input
join presence/failure behavior, status flag updates (SURVEY §3.2)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import schemas
from translator_tm_provider_pipelines_spark.operators import documents as D
from translator_tm_provider_pipelines_spark.operators import versioning as V


def _doc(doc_id, dtype="TEXT", dformat="TEXT", pipeline="MEDLINE_XML_TO_TEXT",
         version="0.1.0", content="", chunk_id=0, chunk_total=1, collections=("PUBMED",)):
    return (doc_id, dtype, dformat, pipeline, version, content, chunk_id,
            chunk_total, list(collections))


@pytest.fixture()
def docs_df(spark):
    rows = [
        _doc("d1", version="0.1.0", content="old"),
        _doc("d1", version="0.2.0", content="new"),
        _doc("d1", version="0.10.0", content="newest"),  # 0.10 > 0.2 numerically
        _doc("d2", version="0.1.0", content="A", chunk_id=0, chunk_total=3),
        _doc("d2", version="0.1.0", content="B", chunk_id=1, chunk_total=3),
        _doc("d2", version="0.1.0", content="C", chunk_id=2, chunk_total=3),
        _doc("d3", dtype="SECTIONS", dformat="BIONLP", pipeline="SECTIONS",
             version="0.1.0", content="sec-d3"),
        _doc("d1", dtype="SECTIONS", dformat="BIONLP", pipeline="SECTIONS",
             version="0.1.0", content="sec-d1"),
    ]
    return spark.createDataFrame(rows, schema=schemas.DOCUMENT)


def test_semantic_version_ordering(spark):
    df = spark.createDataFrame(
        [("0.1.0",), ("0.2",), ("0.10.0",), ("recent",), ("2",), ("1.0.3",)],
        "pipeline_version string",
    ).select("pipeline_version", V.semantic_version("pipeline_version").alias("sv"))
    got = {r.pipeline_version: r.sv for r in df.collect()}
    assert got["0.2"] == got["0.2" if False else "0.2"]  # self-consistent
    assert got["0.1.0"] < got["0.2"] < got["0.10.0"] < got["1.0.3"] < got["2"]
    assert got["recent"] == 0  # non-numeric parts → 0 (PipelineMain.java:446-505)


def test_splice_chunks_orders_by_chunk_id(spark, docs_df):
    out = V.splice_chunks(docs_df.where(F.col("doc_id") == "d2"))
    row = out.collect()[0]
    assert row.content == "ABC"
    assert row.chunk_total == 3 and row.chunk_id == 0


def test_chunk_roundtrip(spark):
    text = "x" * 2500
    df = spark.createDataFrame(
        [_doc("big", content=text)], schema=schemas.DOCUMENT
    )
    chunked = V.chunk_content(df, max_bytes=1000)
    assert chunked.count() == 3
    spliced = V.splice_chunks(chunked)
    assert spliced.collect()[0].content == text


def test_filter_most_recent_keeps_highest(spark, docs_df):
    out = V.filter_most_recent(docs_df.where(F.col("doc_type") == "TEXT"))
    d1 = [r for r in out.collect() if r.doc_id == "d1"]
    assert len(d1) == 1 and d1[0].content == "newest"


def test_parse_criteria_roundtrip():
    cs = D.parse_criteria("TEXT|TEXT|MEDLINE_XML_TO_TEXT|0.1.0;SECTIONS|BIONLP|SECTIONS|recent")
    assert len(cs) == 2
    assert cs[0].pipeline_version == "0.1.0"
    assert cs[1].pipeline_version == V.RECENT
    with pytest.raises(ValueError):
        D.parse_criteria("TEXT|TEXT|ONLY_THREE")


def test_pinned_version_not_shadowed_by_recent(spark, docs_df):
    """An explicit 0.1.0 request must return 0.1.0 even though 0.10.0 exists
    and is selected by a parallel 'recent' criteria."""
    crits = [
        D.DocumentCriteria("TEXT", "TEXT", "MEDLINE_XML_TO_TEXT", "0.1.0"),
        D.DocumentCriteria("TEXT", "TEXT", "MEDLINE_XML_TO_TEXT", "recent"),
    ]
    tagged = D.documents_for_criteria(docs_df, crits)
    got = {r.criteria_key: r.content for r in tagged.where(F.col("doc_id") == "d1").collect()}
    assert got[crits[0].key] == "old"
    assert got[crits[1].key] == "newest"


@pytest.fixture()
def status_df(spark):
    rows = [
        ("d1", "1999", ["JournalArticle"], {"TEXT_DONE": True, "SENT_DONE": False}, ["PUBMED"]),
        ("d2", "2001", [], {"TEXT_DONE": True, "SENT_DONE": True}, ["PUBMED"]),
        ("d3", "2155", [], {"TEXT_DONE": True, "SENT_DONE": False}, ["PUBMED"]),
        ("d4", "2002", [], {"TEXT_DONE": False}, ["PUBMED"]),
        ("d5", "2003", [], {"TEXT_DONE": True, "SENT_DONE": False}, ["PMC"]),
    ]
    return spark.createDataFrame(rows, schema=schemas.STATUS)


def test_status_to_process(spark, status_df):
    out = D.status_to_process(
        status_df, ["TEXT_DONE"], target_flag="SENT_DONE", collection="PUBMED"
    )
    assert {r.doc_id for r in out.collect()} == {"d1", "d3"}
    # overwrite ignores the target flag
    out2 = D.status_to_process(
        status_df, ["TEXT_DONE"], target_flag="SENT_DONE", collection="PUBMED", overwrite=True
    )
    assert {r.doc_id for r in out2.collect()} == {"d1", "d2", "d3"}


def test_universal_input_join(spark, status_df, docs_df):
    crits = [
        D.DocumentCriteria("TEXT", "TEXT", "MEDLINE_XML_TO_TEXT", "recent"),
        D.DocumentCriteria("SECTIONS", "BIONLP", "SECTIONS", "recent"),
    ]
    joined, failures = D.universal_input_join(
        status_df, docs_df, crits,
        required_flags=["TEXT_DONE"], target_flag="SENT_DONE", collection="PUBMED",
    )
    ok = {r.doc_id: r.contents for r in joined.collect()}
    # d1 has TEXT (latest = 'newest') + SECTIONS; d3 has SECTIONS only
    assert set(ok) == {"d1"}
    assert ok["d1"][crits[0].key] == "newest"
    assert ok["d1"][crits[1].key] == "sec-d1"
    fails = {r.doc_id: r.message for r in failures.collect()}
    assert set(fails) == {"d3"}
    assert crits[0].key in fails["d3"]
    assert failures.schema == schemas.FAILURE or [f.name for f in failures.schema] == [
        "doc_id", "stage", "message", "stacktrace"
    ]


def test_update_status_flags(spark, status_df):
    done = spark.createDataFrame([("d1",), ("d3",)], "doc_id string")
    out = D.update_status_flags(
        status_df, done, "SENT_DONE", all_flags=["TEXT_DONE", "SENT_DONE", "NEW_FLAG"]
    )
    got = {r.doc_id: r.flags for r in out.collect()}
    assert got["d1"]["SENT_DONE"] is True
    assert got["d3"]["SENT_DONE"] is True
    assert got["d2"]["SENT_DONE"] is True  # untouched
    assert got["d1"]["NEW_FLAG"] is False  # backfilled
    assert got["d4"].get("SENT_DONE") in (False, None)  # not processed → unset


def test_skip_existing_documents(spark, docs_df):
    existing = spark.createDataFrame([("d1",)], "doc_id string")
    kept = D.skip_existing_documents(docs_df, existing)
    assert "d1" not in {r.doc_id for r in kept.collect()}
    assert D.skip_existing_documents(docs_df, existing, overwrite=True).count() == docs_df.count()


def test_fetch_documents(spark, docs_df):
    ids = spark.createDataFrame([("d1",), ("d3",)], "doc_id string")
    got = D.fetch_documents(docs_df, ids, doc_types=["SECTIONS"])
    assert {(r.doc_id, r.doc_type) for r in got.collect()} == {
        ("d1", "SECTIONS"), ("d3", "SECTIONS")
    }
