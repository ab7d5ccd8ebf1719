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


def test_oger_and_postprocess_pipelines(spark, tmp_path):
    docs = spark.createDataFrame(
        [("d1", "Breast cancer and the cancer spread fast.")],
        "doc_id string, content string",
    )
    dictionary = spark.createDataFrame(
        [("breast cancer", "MONDO:0007254"), ("cancer", "MONDO:0004992")],
        "term string, concept_id string",
    )
    docs.write.parquet(str(tmp_path / "docs"))
    dictionary.write.parquet(str(tmp_path / "dict"))
    cli.run_oger(
        spark,
        ["--documents", str(tmp_path / "docs"), "--dictionary", str(tmp_path / "dict"),
         "--output", str(tmp_path / "annots")],
    )
    annots = spark.read.parquet(str(tmp_path / "annots"))
    assert annots.count() == 3
    cli.run_concept_post_process(
        spark,
        ["--annotations", str(tmp_path / "annots"), "--output", str(tmp_path / "clean")],
    )
    clean = spark.read.parquet(str(tmp_path / "clean"))
    # nested 'cancer' inside 'Breast cancer' removed; standalone kept
    assert clean.count() == 2


def test_abbreviation_pipeline(spark, tmp_path):
    docs = spark.createDataFrame(
        [("d1", "The heat shock protein (HSP) family is large.")],
        "doc_id string, content string",
    )
    docs.write.parquet(str(tmp_path / "docs"))
    cli.run_abbreviation(
        spark, ["--documents", str(tmp_path / "docs"), "--output", str(tmp_path / "ab")]
    )
    out = spark.read.parquet(str(tmp_path / "ab"))
    assert {r.annot_type for r in out.collect()} == {"short_form", "long_form"}


def test_classified_storage_pipeline(spark, tmp_path):
    from translator_tm_provider_pipelines_spark import schemas

    meta = spark.createDataFrame(
        [(
            "s1", "d1", "CHEBI:1", "aspirin", [(0, 7)], "MONDO:2", "headache",
            [(15, 23)], None, "aspirin treats headache", None, "abstract",
            [], "1999", 0, [], [], [],
        )],
        schema=schemas.EXTRACTED_SENTENCE,
    )
    meta.write.parquet(str(tmp_path / "meta"))
    (tmp_path / "bert").mkdir()
    (tmp_path / "bert" / "part-0.tsv").write_text("s1\tph\t0.9\t0.05\t0.05\n")
    cli.run_classified_sentence_storage(
        spark,
        ["--bertOutput", str(tmp_path / "bert"),
         "--metadata", str(tmp_path / "meta"),
         "--association", "biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation",
         "--bertScoreInclusionMinimumThreshold", "0.5",
         "--outputDir", str(tmp_path / "out")],
    )
    assert spark.read.parquet(str(tmp_path / "out" / "assertion")).count() == 1
    assert spark.read.parquet(str(tmp_path / "out" / "evidence_score")).count() == 3
