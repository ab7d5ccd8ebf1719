"""Dictionary concept-recognition tests (the OGER-equivalent backend)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import ner

TEXT = "Breast cancer and breast-cancer cells; the cancer spread."


@pytest.fixture()
def docs(spark):
    return spark.createDataFrame([("d1", TEXT)], "doc_id string, content string")


def test_tokenize_offsets_exact(spark, docs):
    toks = ner.tokenize_with_offsets(docs).collect()
    for t in toks:
        assert TEXT[t.start:t.end] == t.token
    assert [t.token for t in sorted(toks, key=lambda t: t.tok_idx)][:4] == [
        "Breast", "cancer", "and", "breast",
    ]


def test_dictionary_matching_multiword(spark, docs):
    dictionary = spark.createDataFrame(
        [("breast cancer", "MONDO:0007254"), ("cancer", "MONDO:0004992")],
        "term string, concept_id string",
    )
    out = ner.dictionary_concept_recognition(docs, dictionary).collect()
    got = sorted(
        (r.concept_id, r.spans[0].start, r.spans[0].end, r.covered_text) for r in out
    )
    # 'Breast cancer' (case-insensitive), 'breast-cancer' (punct normalized),
    # and three bare 'cancer' occurrences
    assert got == [
        ("MONDO:0004992", 7, 13, "cancer"),
        ("MONDO:0004992", 25, 31, "cancer"),
        ("MONDO:0004992", 43, 49, "cancer"),
        ("MONDO:0007254", 0, 13, "Breast cancer"),
        ("MONDO:0007254", 18, 31, "breast cancer"),
    ]
    for cid, s, e, text in got:
        if cid == "MONDO:0004992":
            assert TEXT[s:e] == "cancer"


def test_case_sensitive_mode(spark, docs):
    dictionary = spark.createDataFrame(
        [("Breast cancer", "MONDO:0007254")], "term string, concept_id string"
    )
    out = ner.dictionary_concept_recognition(
        docs, dictionary, case_insensitive=False
    ).collect()
    assert len(out) == 1 and out[0].spans[0].start == 0


def test_normalize_dictionary(spark):
    raw = spark.createDataFrame(
        [("breast-cancer  cells", "X:1"), ("...", "X:2")],
        "term string, concept_id string",
    )
    rows = ner.normalize_dictionary(raw).collect()
    assert len(rows) == 1
    assert rows[0].term == "breast cancer cells"


def test_nested_cleanup_composes(spark, docs):
    from translator_tm_provider_pipelines_spark.operators import conceptfilters as cf

    dictionary = spark.createDataFrame(
        [("breast cancer", "MONDO:0007254"), ("cancer", "MONDO:0004992")],
        "term string, concept_id string",
    )
    annots = ner.dictionary_concept_recognition(docs, dictionary)
    cleaned = cf.remove_nested_annotations(annots).collect()
    got = sorted((r.concept_id, r.spans[0].start) for r in cleaned)
    # nested 'cancer' at 7 and 25 removed; the standalone one at 43 survives
    assert got == [
        ("MONDO:0004992", 43),
        ("MONDO:0007254", 0),
        ("MONDO:0007254", 18),
    ]
