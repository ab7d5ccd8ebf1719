"""Collection maintenance + text/PubAnnotation export tests."""

from __future__ import annotations

import json

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import schemas
from translator_tm_provider_pipelines_spark.operators import collections as C


@pytest.fixture()
def status(spark):
    return spark.createDataFrame(
        [
            ("d1", "1999", [], {"text": True}, ["PUBMED"]),
            ("d2", None, None, {}, ["PUBMED", "REDO"]),
        ],
        schema=schemas.STATUS,
    )


def test_assign_and_remove_collection(spark, status):
    ids = spark.createDataFrame([("d1",)], "doc_id string")
    out = {r.doc_id: r.collections for r in C.assign_collection(status, ids, "REDO").collect()}
    assert out["d1"] == ["PUBMED", "REDO"]
    assert out["d2"] == ["PUBMED", "REDO"]  # untouched
    # idempotent
    again = C.assign_collection(C.assign_collection(status, ids, "REDO"), ids, "REDO")
    assert {tuple(r.collections) for r in again.where(F.col("doc_id") == "d1").collect()} == {
        ("PUBMED", "REDO")
    }
    cleared = {r.doc_id: r.collections for r in C.remove_collection(status, "REDO").collect()}
    assert cleared["d2"] == ["PUBMED"]


def test_update_medline_status(spark, status):
    med = spark.createDataFrame(
        [("d2", "2001", ["JournalArticle"])],
        "doc_id string, pub_year string, pub_types array<string>",
    )
    out = {r.doc_id: r for r in C.update_medline_status(status, med).collect()}
    assert out["d2"].pub_year == "2001" and out["d2"].pub_types == ["JournalArticle"]
    assert out["d1"].pub_year == "1999"  # no update row → unchanged


def test_text_export_lines(spark):
    docs = spark.createDataFrame(
        [("d1", "body text", ["PUBMED", "SUB_1"])],
        "doc_id string, content string, collections array<string>",
    )
    line = C.text_export_lines(docs).collect()[0].line
    assert line == "###C: DOCUMENT_ID\td1\n###C: DOCUMENT_COLLECTIONS\tPUBMED|SUB_1\nbody text"


def test_pubannotation_json(spark):
    docs = spark.createDataFrame(
        [("d1", "Aspirin treats headache.")], "doc_id string, content string"
    )
    annots = spark.createDataFrame(
        [
            ("d1", "concept", "HP:0002315", [(15, 23)], "headache"),
            ("d1", "concept", "CHEBI:15365", [(0, 7)], "Aspirin"),
        ],
        schema=schemas.ANNOTATION,
    )
    out = json.loads(C.pubannotation_json(docs, annots).collect()[0].json)
    assert out["sourceid"] == "d1" and out["text"] == "Aspirin treats headache."
    assert out["denotations"] == [
        {"id": "T1", "span": {"begin": 0, "end": 7}, "obj": "CHEBI:15365"},
        {"id": "T2", "span": {"begin": 15, "end": 23}, "obj": "HP:0002315"},
    ]


def test_update_medline_status_dedupes_parses(spark, status):
    med = spark.createDataFrame(
        [("d2", "2001", ["A"]), ("d2", "2005", ["B"]), ("d2", "1998", ["C"])],
        "doc_id string, pub_year string, pub_types array<string>",
    )
    out = C.update_medline_status(status, med)
    rows = out.where(F.col("doc_id") == "d2").collect()
    assert len(rows) == 1  # no fan-out from duplicate parse rows
    assert rows[0].pub_year == "2005" and rows[0].pub_types == ["B"]


def test_assign_collection_all_rows_no_join(spark, status):
    out = C.assign_collection(status, None, "EVERYWHERE")
    assert all("EVERYWHERE" in r.collections for r in out.collect())
    assert "Join" not in out._jdf.queryExecution().executedPlan().toString()
