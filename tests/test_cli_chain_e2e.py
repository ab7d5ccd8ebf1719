"""One-command reference-DAG parity: chain the reference's main workflow
end-to-end through the CLI (MEDLINE_XML_TO_TEXT → SENTENCE_SEGMENTATION →
OGER dictionary NER → CONCEPT_POST_PROCESS → CONCEPT_COOCCURRENCE_COUNTS →
CONCEPT_COOCCURRENCE_METRICS + CONCEPT_IDF → SQL_UPSERT), with status-flag
gating between stages, mirroring the reference's scripts/pipelines/*
orchestration (PipelineMain.java:124-236 dispatch + :954-1030 status
updates). Asserts the chained metrics equal the direct-operator path."""

from __future__ import annotations

import pytest

import gzip
import sqlite3

from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import cli
from translator_tm_provider_pipelines_spark.operators import conceptfilters as cf
from translator_tm_provider_pipelines_spark.operators import cooccurrence as co
from translator_tm_provider_pipelines_spark.operators import ner

ARTICLE = """  <PubmedArticle>
    <MedlineCitation>
      <PMID Version="1">{pmid}</PMID>
      <Article>
        <Journal><JournalIssue><PubDate><Year>2001</Year></PubDate></JournalIssue></Journal>
        <ArticleTitle>{title}</ArticleTitle>
        <Abstract><AbstractText>{abstract}</AbstractText></Abstract>
      </Article>
    </MedlineCitation>
  </PubmedArticle>"""

DOCS = [
    ("201", "Ethanol and the liver.", "Chronic ethanol exposure causes liver fibrosis. Fibrosis severity varies."),
    ("202", "Liver fibrosis markers.", "We measured fibrosis in liver tissue. Ethanol was not involved."),
    ("203", "Aspirin pharmacology.", "Aspirin inhibits platelet aggregation. No liver effects were seen."),
]

DICT_ROWS = [
    ("ethanol", "CHEBI:16236"),
    ("liver", "UBERON:2107"),
    ("liver fibrosis", "MONDO:5044"),
    ("fibrosis", "HP:2206"),
    ("aspirin", "CHEBI:15365"),
]


def _write_fixture_xml(tmp_path):
    xml = (
        '<?xml version="1.0"?>\n<PubmedArticleSet>\n'
        + "\n".join(ARTICLE.format(pmid=p, title=t, abstract=a) for p, t, a in DOCS)
        + "\n</PubmedArticleSet>\n"
    )
    xmldir = tmp_path / "xml"
    xmldir.mkdir()
    with gzip.open(xmldir / "batch.xml.gz", "wt") as f:
        f.write(xml)
    return str(xmldir)


@pytest.mark.slow
def test_cli_chain_matches_direct_operators(spark, tmp_path):
    xmldir = _write_fixture_xml(tmp_path)
    p = lambda name: str(tmp_path / name)
    spark.createDataFrame(DICT_ROWS, "term string, concept_id string").write.parquet(
        p("dict")
    )

    # 1. MEDLINE_XML_TO_TEXT seeds the document + status stores
    cli.main(
        [
            "MEDLINE_XML_TO_TEXT",
            "--xml", xmldir,
            "--output", p("medline"),
            "--documentsStore", p("docstore"),
            "--statusStore", p("status0"),
        ]
    )
    status0 = spark.read.parquet(p("status0"))
    assert status0.count() == 3
    assert all(r.flags["TEXT_DONE"] for r in status0.collect())

    # 2. SENTENCE_SEGMENTATION gated on TEXT_DONE
    seg_args = [
        "SENTENCE_SEGMENTATION",
        "--documents", p("docstore"),
        "--status", p("status0"),
        "--output", p("sents"),
        "--failures", p("segfail"),
        "--inputDocumentCriteria", "TEXT|TEXT|MEDLINE_XML_TO_TEXT|recent",
        "--requiredProcessingStatusFlags", "TEXT_DONE",
        "--targetProcessingStatusFlag", "SENTENCE_DONE",
        "--collection", "PUBMED",
    ]
    cli.main(seg_args)
    sents = spark.read.parquet(p("sents"))
    assert sents.count() > 3  # multiple sentences per doc
    assert spark.read.parquet(p("segfail")).count() == 0

    # 3. stage-end status maintenance, then gating actually gates:
    #    re-running the same stage against the updated status selects nothing
    cli.main(
        [
            "UPDATE_STATUS_FLAGS",
            "--status", p("status0"),
            "--processed", p("sents"),
            "--flag", "SENTENCE_DONE",
            "--output", p("status1"),
        ]
    )
    status1 = spark.read.parquet(p("status1"))
    assert all(r.flags["SENTENCE_DONE"] for r in status1.collect())
    rerun = [a if a != p("status0") else p("status1") for a in seg_args]
    rerun[rerun.index(p("sents"))] = p("sents_rerun")
    rerun[rerun.index(p("segfail"))] = p("segfail_rerun")
    cli.main(rerun)
    assert spark.read.parquet(p("sents_rerun")).count() == 0

    # 4. OGER through the gated store input (universal join path)
    cli.main(
        [
            "OGER",
            "--documents", p("docstore"),
            "--status", p("status1"),
            "--inputDocumentCriteria", "TEXT|TEXT|MEDLINE_XML_TO_TEXT|recent",
            "--requiredProcessingStatusFlags", "TEXT_DONE|SENTENCE_DONE",
            "--targetProcessingStatusFlag", "OGER_DONE",
            "--collection", "PUBMED",
            "--dictionary", p("dict"),
            "--output", p("annots"),
        ]
    )
    annots = spark.read.parquet(p("annots"))
    assert annots.where(F.col("concept_id") == "MONDO:5044").count() > 0
    cli.main(
        [
            "UPDATE_STATUS_FLAGS",
            "--status", p("status1"),
            "--processed", p("annots"),
            "--flag", "OGER_DONE",
            "--output", p("status2"),
        ]
    )

    # 5. CONCEPT_POST_PROCESS (nested 'fibrosis' inside 'liver fibrosis' drops)
    cli.main(
        [
            "CONCEPT_POST_PROCESS",
            "--annotations", p("annots"),
            "--output", p("clean"),
            "--lengthThreshold", "4",
        ]
    )
    clean = spark.read.parquet(p("clean"))
    assert clean.count() < annots.count()

    # 6. counts → metrics + idf
    cli.main(
        [
            "CONCEPT_COOCCURRENCE_COUNTS",
            "--annotations", p("clean"),
            "--output", p("uc"),
        ]
    )
    cli.main(
        [
            "CONCEPT_COOCCURRENCE_METRICS",
            "--unitConcepts", p("uc"),
            "--output", p("metrics"),
        ]
    )
    cli.main(
        ["CONCEPT_IDF", "--unitConcepts", p("uc"), "--output", p("idf")]
    )

    # 7. JDBC sink: upsert the metrics into sqlite, twice (idempotent).
    # The upsert targets a pre-created table, like the reference's
    # pre-provisioned Cloud SQL schema.
    metrics_cols = spark.read.parquet(p("metrics")).columns
    with sqlite3.connect(p("metrics.db")) as con:
        con.execute(
            "CREATE TABLE cooccurrence_metrics (%s, PRIMARY KEY (concept1, concept2))"
            % ", ".join(metrics_cols)
        )
    for _ in range(2):
        cli.main(
            [
                "SQL_UPSERT",
                "--input", p("metrics"),
                "--sqlite", p("metrics.db"),
                "--table", "cooccurrence_metrics",
                "--keys", "concept1|concept2",
            ]
        )
    metrics = spark.read.parquet(p("metrics"))
    with sqlite3.connect(p("metrics.db")) as con:
        n_db = con.execute("SELECT count(*) FROM cooccurrence_metrics").fetchone()[0]
    assert n_db == metrics.count() > 0

    # 8. the chained result equals the direct-operator path on the same raw XML
    from translator_tm_provider_pipelines_spark.sources import medline

    docs = medline.medline_documents(
        medline.read_medline_xml(spark, xmldir)
    ).select("doc_id", "content")
    direct_annots = ner.dictionary_concept_recognition(
        docs, ner.normalize_dictionary(spark.read.parquet(p("dict")))
    )
    direct_clean = cf.remove_nested_annotations(
        cf.remove_odd_bracket_matches(
            cf.remove_ncbi_stopwords(cf.remove_matches_less_than(direct_annots, 4))
        )
    )
    direct_uc = (
        direct_clean.where(F.col("concept_id").isNotNull())
        .select(F.col("doc_id").alias("text_id"), "concept_id")
        .distinct()
    )
    direct_metrics = co.cooccurrence_chain_from_rows(direct_uc)
    direct_idf = co.concept_idf(direct_uc)
    assert sorted(map(tuple, metrics.collect())) == sorted(
        map(tuple, direct_metrics.collect())
    )
    assert sorted(map(tuple, spark.read.parquet(p("idf")).collect())) == sorted(
        map(tuple, direct_idf.collect())
    )
