"""Classified-sentence storage (J2) + export family tests."""

from __future__ import annotations

import hashlib
import json

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import schemas
from translator_tm_provider_pipelines_spark.operators import classified as CL
from translator_tm_provider_pipelines_spark.operators import exports as EX


def _meta_row(sentence_id, doc="d1", e1=("CHEBI:1", "aspirin", [(0, 7)]),
              e2=("MONDO:2", "headache", [(15, 23)]), sentence="aspirin treats headache"):
    return (
        sentence_id, doc,
        e1[0], e1[1], e1[2], e2[0], e2[1], e2[2],
        None, sentence, None, "abstract", ["JournalArticle"], "1999", 0,
        [], [], [],
    )


@pytest.fixture()
def tables(spark):
    meta = spark.createDataFrame(
        [
            _meta_row("s1"),
            _meta_row("s2", e1=("CHEBI:9|CHEBI:10", "drug", [(0, 4)])),  # spliced
            _meta_row("s3"),  # below threshold
        ],
        schema=schemas.EXTRACTED_SENTENCE,
    )
    scores = spark.createDataFrame(
        [
            ("s1", {"biolink:treats": 0.9, "false": 0.1}),
            ("s2", {"biolink:treats": 0.7, "false": 0.3}),
            ("s3", {"biolink:treats": 0.2, "false": 0.8}),
            ("s9", {"biolink:treats": 0.99, "false": 0.0}),  # no metadata → dropped
        ],
        "sentence_id string, scores map<string,double>",
    )
    return CL.classified_sentence_tables(
        scores, meta,
        association_id="biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation",
        subject_placeholder="@CHEMICAL$",
        entity1_placeholder="@CHEMICAL$",
        threshold=0.5,
    )


def test_threshold_and_join_gate(tables):
    ev = tables["evidence"].collect()
    # s1 (1 pair) + s2 (2 spliced subjects) = 3 evidence rows; s3/s9 gone
    assert len(ev) == 3


def test_spliced_curies_unspliced(tables):
    subs = {r.subject_curie for r in tables["assertion"].collect()}
    assert subs == {"CHEBI:1", "CHEBI:9", "CHEBI:10"}


def test_assertion_id_hash(tables):
    rows = {r.subject_curie: r for r in tables["assertion"].collect()}
    expect = hashlib.sha256(
        b"CHEBI:1MONDO:2biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation"
    ).hexdigest()
    assert rows["CHEBI:1"].assertion_id == expect


def test_evidence_scores_per_predicate(tables):
    sc = tables["evidence_score"].collect()
    assert {(r.predicate_curie) for r in sc} == {"biolink:treats", "false"}
    # 3 evidence rows × 2 predicates
    assert len(sc) == 6


def test_subject_object_swap(spark):
    meta = spark.createDataFrame([_meta_row("s1")], schema=schemas.EXTRACTED_SENTENCE)
    scores = spark.createDataFrame(
        [("s1", {"biolink:treats": 0.9, "false": 0.0})],
        "sentence_id string, scores map<string,double>",
    )
    out = CL.classified_sentence_tables(
        scores, meta, "assoc", subject_placeholder="@DISEASE$",
        entity1_placeholder="@CHEMICAL$", threshold=0.5,
    )["assertion"].collect()[0]
    # entity1 (@CHEMICAL$) is NOT the subject → swapped
    assert out.subject_curie == "MONDO:2" and out.object_curie == "CHEBI:1"


def test_parse_bert_output(spark):
    lines = spark.createDataFrame(
        [("sid\tplaceholder text\t0.25\t0.75",)], "value string"
    )
    out = CL.parse_bert_output(lines, ["biolink:treats", "false"]).collect()[0]
    assert out.sentence_id == "sid"
    assert out.scores == {"biolink:treats": 0.25, "false": 0.75}


# ---------------------------------------------------------------------------
# exports
# ---------------------------------------------------------------------------


def test_concept_count_distribution(spark):
    uc = spark.createDataFrame(
        [("t1", "C:1"), ("t2", "C:1"), ("t1", "C:2")], "text_id string, concept_id string"
    )
    labels = spark.createDataFrame([("C:1", "one")], "concept_id string, label string")
    out = {r.concept_id: (r["count"], r.label) for r in
           EX.concept_count_distribution(uc, labels).collect()}
    assert out == {"C:1": (2, "one"), "C:2": (1, "UKNOWN")}


@pytest.fixture()
def bq_tables(spark):
    concepts = spark.createDataFrame(
        [("d1", "concept", "CHEBI:1", [(5, 10)], "apple")], schema=schemas.ANNOTATION
    )
    sections = spark.createDataFrame(
        [("d1", "sentence", None, [(0, 20)], "whole sentence here.")],
        schema=schemas.ANNOTATION,
    )
    ct = EX.bigquery_annotation_table(concepts, layer="concept_cs")
    st = EX.bigquery_annotation_table(sections, layer="sentence")
    return ct, st


def test_bigquery_annotation_table(bq_tables):
    ct, _ = bq_tables
    r = ct.collect()[0]
    assert r.annotation_type == "CHEBI:1"
    assert (r.span_start, r.span_end) == (5, 10)
    assert r.annotation_layer == "concept_cs"
    assert len(r.annotation_id) == 64


def test_bigquery_in_section(bq_tables):
    ct, st = bq_tables
    rows = EX.bigquery_in_section_table(ct, st).collect()
    assert len(rows) == 1
    assert rows[0].inner_annot_id == ct.collect()[0].annotation_id
    assert rows[0].outer_annot_id == st.collect()[0].annotation_id


def test_kgx_export(spark, tables):
    labels = spark.createDataFrame(
        [("CHEBI:1", "aspirin")], "concept_id string, label string"
    )
    nodes = EX.kgx_nodes(
        tables["assertion"].select(F.col("subject_curie").alias("concept_id")),
        labels, "biolink:ChemicalEntity",
    )
    got = {r.id: r.name for r in nodes.collect()}
    assert got["CHEBI:1"] == "aspirin" and got["CHEBI:9"] == "UKNOWN"
    edges = EX.kgx_edges(
        tables["assertion"], tables["evidence"],
        edge_label="biolink:treats", relation_curie="RO:0002606",
        association_type="biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation",
    )
    e = {r.subject: r for r in edges.collect()}
    assert e["CHEBI:1"].evidence_count == 1
    line = EX.kgx_edge_tsv(edges).collect()[0].line
    assert line.count("\t") == 7
    padded = EX.kgx_node_tsv(nodes, column_count=5).collect()[0].line
    assert padded.count("\t") == 4


def test_es_sentence_json_escaping(spark):
    df = spark.createDataFrame(
        [("s1", "d1", "50% of cases = many", 0, 19, [("CHEBI:1", 0, 3)])],
        "sentence_id string, doc_id string, sentence string, start int, end int, "
        "concepts array<struct<concept_id:string,start:int,end:int>>",
    )
    out = EX.es_sentence_json(df).collect()[0].json
    assert "%25" in out and "%3D" in out and "=" not in out.replace("%3D", "")
    decoded = json.loads(out.replace("%3D", "=").replace("%25", "%"))
    assert decoded["text"] == "50% of cases = many"
    assert decoded["annotations"][0]["concept_id"] == "CHEBI:1"
