"""End-to-end pipeline composition tests: documents → NER → cooccurrence /
extraction, plus sink shapes."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.plans import pipelines as P
from translator_tm_provider_pipelines_spark.sources import sinks

DOCS = [
    ("d1", "Aspirin treats headache. Aspirin also helps fever."),
    ("d2", "Ibuprofen treats headache and fever."),
    ("d3", "Aspirin is unrelated to gout here."),
]

DICT = [
    ("aspirin", "CHEBI:15365"),
    ("ibuprofen", "CHEBI:5855"),
    ("headache", "HP:0002315"),
    ("fever", "HP:0001945"),
    ("gout", "HP:0001997"),
]


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame(DOCS, "doc_id string, content string")


@pytest.fixture()
def dictionary(spark):
    return spark.createDataFrame(DICT, "term string, concept_id string")


def test_doc_level_cooccurrence(spark, docs, dictionary):
    m = P.documents_to_cooccurrence_metrics(docs, dictionary)
    rows = {(r.concept1, r.concept2): r for r in m.collect()}
    asp_head = rows[("CHEBI:15365", "HP:0002315")]
    assert asp_head.pair_count == 1  # only d1 has both
    assert asp_head.concept1_count == 2  # aspirin in d1, d3
    assert asp_head.concept2_count == 2  # headache in d1, d2
    # PMI golden: ln((1/3) / ((2/3)*(2/3)))
    assert asp_head.pmi == pytest.approx(round(math.log((1 / 3) / ((2 / 3) * (2 / 3))), 8))


def test_sentence_level_cooccurrence(spark, docs, dictionary):
    m = P.documents_to_sentence_cooccurrence(docs, dictionary)
    pairs = {(r.concept1, r.concept2): r.pair_count for r in m.collect()}
    # sentence-level: aspirin+headache co-occur in d1 sentence 1 only;
    # ibuprofen+headache+fever in d2's single sentence
    assert pairs[("CHEBI:15365", "HP:0002315")] == 1
    assert pairs[("CHEBI:5855", "HP:0001945")] == 1
    assert ("CHEBI:15365", "HP:0001945") in pairs  # d1 sentence 2: aspirin+fever


def test_extraction_pipeline(spark, docs, dictionary):
    ext = P.extraction_pipeline(
        docs, dictionary,
        x_prefixes=["CHEBI"], y_prefixes=["HP"],
        x_placeholder="@CHEMICAL$", y_placeholder="@DISEASE$",
        keywords=["treats"],
    )
    rows = ext.collect()
    # 'treats' keyword gates to d1 sent 0 and d2 sent 0
    assert {r.doc_id for r in rows} == {"d1", "d2"}
    d1 = [r for r in rows if r.doc_id == "d1"][0]
    assert d1.sentence_with_placeholders == "@CHEMICAL$ treats @DISEASE$."
    d2 = {r.entity2_id for r in rows if r.doc_id == "d2"}
    assert d2 == {"HP:0002315", "HP:0001945"}


def test_write_table_dedup(spark, tmp_path, docs):
    dup = docs.unionByName(docs)
    sinks.write_table(dup, str(tmp_path / "t"), dedup_keys=["doc_id"])
    assert spark.read.parquet(str(tmp_path / "t")).count() == 3


def test_write_tsv(spark, tmp_path, docs):
    sinks.write_tsv(docs.select("doc_id"), str(tmp_path / "tsv"))
    got = spark.read.csv(str(tmp_path / "tsv"), sep="\t").count()
    assert got == 3


def test_es_bulk_lines(spark):
    df = spark.createDataFrame([("s1", '{"text":"x"}')], "sid string, json string")
    lines = [r.line for r in sinks.es_bulk_lines(df, "sentences", "sid", "json").collect()]
    assert lines == ['{"index":{"_index":"sentences","_id":"s1"}}', '{"text":"x"}']


def test_biolink_association_driven_extraction(spark, docs, dictionary):
    from translator_tm_provider_pipelines_spark.functions import biolink

    args = biolink.extraction_args("biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation")
    assert args["x_prefixes"] == ["DRUGBANK", "CHEBI"]
    assert args["y_prefixes"] == ["MONDO", "HP"]
    ext = P.extraction_pipeline(docs, dictionary, keywords=None, **args)
    assert ext.count() > 0
    r = ext.collect()[0]
    assert "@CHEMICAL$" in r.sentence_with_placeholders
    assert "@DISEASE$" in r.sentence_with_placeholders


def test_biolink_bert_columns_roundtrip(spark):
    from translator_tm_provider_pipelines_spark.functions import biolink
    from translator_tm_provider_pipelines_spark.operators import classified as CL

    assoc = biolink.ASSOCIATIONS["biolink:DiseaseToPhenotypicFeatureAssociation"]
    lines = spark.createDataFrame([("s1\tph\t0.9\t0.1",)], "value string")
    out = CL.parse_bert_output(lines, list(assoc.predicates)).collect()[0]
    assert out.scores == {"biolink:has_phenotype": 0.9, "false": 0.1}


def test_medline_to_cooccurrence_full_chain(spark, tmp_path, dictionary):
    """The complete ingest→analytics path: Medline XML → documents →
    dictionary NER → document-level cooccurrence metrics."""
    from translator_tm_provider_pipelines_spark.sources import medline

    xml = """<?xml version="1.0"?>
    <PubmedArticleSet>
      <PubmedArticle><MedlineCitation><PMID>1</PMID><Article>
        <ArticleTitle>Aspirin and headache.</ArticleTitle>
        <Abstract><AbstractText>Aspirin treats headache.</AbstractText></Abstract>
      </Article></MedlineCitation></PubmedArticle>
      <PubmedArticle><MedlineCitation><PMID>2</PMID><Article>
        <ArticleTitle>Ibuprofen for fever.</ArticleTitle>
        <Abstract><AbstractText>Ibuprofen treats fever and headache.</AbstractText></Abstract>
      </Article></MedlineCitation></PubmedArticle>
    </PubmedArticleSet>"""
    (tmp_path / "m.xml").write_text(xml)
    docs = medline.medline_documents(medline.read_medline_xml(spark, str(tmp_path / "m.xml")))
    m = P.documents_to_cooccurrence_metrics(
        docs.select("doc_id", "content"), dictionary, min_match_len=4
    )
    pairs = {(r.concept1, r.concept2): r.pair_count for r in m.collect()}
    assert pairs[("CHEBI:15365", "HP:0002315")] == 1  # aspirin+headache in PMID:1
    assert pairs[("CHEBI:5855", "HP:0001945")] == 1   # ibuprofen+fever in PMID:2


def test_register_views_sql_surface(spark, docs):
    from translator_tm_provider_pipelines_spark.sources.tables import register_views

    register_views(spark, {"docs_view": docs})
    n = spark.sql("SELECT count(*) AS n FROM docs_view").collect()[0].n
    assert n == 3


def test_write_upsert_sqlite(spark, tmp_path):
    """K3 upsert semantics (ConceptCooccurrenceMetricsPipeline.java:316-355):
    executor-side batched INSERT..ON CONFLICT DO UPDATE through a DB-API
    factory — batches smaller than the row count, updates not duplicates."""
    import functools
    import sqlite3

    db = str(tmp_path / "scores.db")
    conn = sqlite3.connect(db)
    conn.execute(
        "CREATE TABLE cooccurrence_scores ("
        "cooccurrence_id TEXT, level TEXT, pair_count INTEGER, ngd REAL, "
        "PRIMARY KEY (cooccurrence_id, level))"
    )
    conn.commit()
    conn.close()

    rows = [(f"id{i}", "document", i, float(i) / 10) for i in range(10)]
    df = spark.createDataFrame(
        rows, "cooccurrence_id string, level string, pair_count long, ngd double"
    )
    connect = functools.partial(sqlite3.connect, db, timeout=30)
    # batchsize 3 < 10 rows → multiple executemany batches per partition
    sinks.write_upsert(
        df, connect, "cooccurrence_scores", ["cooccurrence_id", "level"],
        batchsize=3, num_partitions=1,
    )
    # second load with changed values must UPDATE in place, not append
    updated = df.selectExpr(
        "cooccurrence_id", "level", "pair_count + 100 AS pair_count", "ngd + 1.0 AS ngd"
    )
    sinks.write_upsert(
        updated, connect, "cooccurrence_scores", ["cooccurrence_id", "level"],
        batchsize=3, num_partitions=1,
    )

    conn = sqlite3.connect(db)
    got = conn.execute(
        "SELECT cooccurrence_id, pair_count, ngd FROM cooccurrence_scores ORDER BY cooccurrence_id"
    ).fetchall()
    conn.close()
    assert len(got) == 10
    assert all(pc >= 100 for _, pc, _ in got)
    assert got[0] == ("id0", 100, 1.0)


def test_upsert_sql_all_key_columns():
    sql = sinks._upsert_sql("t", ["a", "b"], ["a", "b"])
    assert sql.endswith("DO NOTHING")


def test_upsert_sql_mysql_dialect():
    """MySQL flavor reproduces the reference's exact statement shape:
    ON DUPLICATE KEY UPDATE col = VALUES(col) for EVERY column, keys
    included, no conflict-target list
    (ClassifiedSentenceStoragePipeline.java:458-461)."""
    sql = sinks._upsert_sql(
        "assertion",
        ["assertion_id", "subject_curie", "object_curie", "association_curie"],
        ["assertion_id"],
        dialect="mysql",
    )
    assert sql == (
        "INSERT INTO assertion (assertion_id, subject_curie, object_curie, "
        "association_curie) VALUES (?, ?, ?, ?) ON DUPLICATE KEY UPDATE "
        "assertion_id = VALUES(assertion_id), "
        "subject_curie = VALUES(subject_curie), "
        "object_curie = VALUES(object_curie), "
        "association_curie = VALUES(association_curie)"
    )
    assert "ON CONFLICT" not in sql


def test_upsert_dialect_from_url():
    assert sinks.upsert_dialect_from_url("jdbc:mysql://host:3306/db") == "mysql"
    assert sinks.upsert_dialect_from_url("mysql://u@h/db") == "mysql"
    assert sinks.upsert_dialect_from_url("jdbc:mariadb://h/db") == "mysql"
    assert sinks.upsert_dialect_from_url("jdbc:postgresql://h/db") == "ansi"
    assert sinks.upsert_dialect_from_url("sqlite:///tmp/x.db") == "ansi"


def test_upsert_unknown_dialect_rejected():
    import pytest as _pytest

    with _pytest.raises(ValueError):
        sinks._upsert_sql("t", ["a"], ["a"], dialect="oracle")
