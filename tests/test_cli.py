"""CLI dispatch + option-grammar tests (end-to-end through tmp parquet)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import cli, schemas


def test_parse_flags():
    assert cli.parse_flags("A|B|C") == ["A", "B", "C"]
    assert cli.parse_flags("") == []
    assert cli.parse_flags(None) == []


def test_unknown_pipeline_key():
    with pytest.raises(SystemExit):
        cli.main(["NOT_A_PIPELINE"])


def test_sentence_segmentation_pipeline(spark, tmp_path):
    docs = spark.createDataFrame(
        [
            ("d1", "TEXT", "TEXT", "MEDLINE_XML_TO_TEXT", "0.1.0",
             "One sentence. Two sentence.", 0, 1, ["PUBMED"]),
        ],
        schema=schemas.DOCUMENT,
    )
    status = spark.createDataFrame(
        [("d1", "2155", [], {"TEXT_DONE": True}, ["PUBMED"])], schema=schemas.STATUS
    )
    docs.write.parquet(str(tmp_path / "docs"))
    status.write.parquet(str(tmp_path / "status"))
    cli.run_sentence_segmentation(
        spark,
        [
            "--documents", str(tmp_path / "docs"),
            "--status", str(tmp_path / "status"),
            "--output", str(tmp_path / "out"),
            "--failures", str(tmp_path / "fail"),
            "--inputDocumentCriteria", "TEXT|TEXT|MEDLINE_XML_TO_TEXT|recent",
            "--requiredProcessingStatusFlags", "TEXT_DONE",
            "--collection", "PUBMED",
        ],
    )
    out = spark.read.parquet(str(tmp_path / "out"))
    assert out.count() == 2
    assert {r.covered_text for r in out.collect()} == {"One sentence.", "Two sentence."}
    assert spark.read.parquet(str(tmp_path / "fail")).count() == 0


def test_metrics_pipeline_roundtrip(spark, tmp_path):
    uc = spark.createDataFrame(
        [("t1", "A:1"), ("t1", "A:2"), ("t2", "A:1"), ("t2", "A:2"), ("t3", "A:1")],
        "text_id string, concept_id string",
    )
    uc.write.parquet(str(tmp_path / "uc"))
    cli.run_concept_cooccurrence_metrics(
        spark,
        ["--unitConcepts", str(tmp_path / "uc"), "--output", str(tmp_path / "metrics")],
    )
    m = spark.read.parquet(str(tmp_path / "metrics")).collect()
    assert len(m) == 1
    assert m[0].pair_count == 2 and m[0].concept1_count == 3
    cli.run_concept_idf(
        spark,
        ["--unitConcepts", str(tmp_path / "uc"), "--output", str(tmp_path / "idf")],
    )
    idf = {r.concept_id: r.idf for r in spark.read.parquet(str(tmp_path / "idf")).collect()}
    import math
    assert idf["A:1"] == pytest.approx(round(math.log(3 / 3), 8))
    assert idf["A:2"] == pytest.approx(round(math.log(3 / 2), 8))
