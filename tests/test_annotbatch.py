"""Tests for operators/annotbatch.py — the annotation-repo batch tooling
(RepoStatsCommand / BatchCreateCommand / OneOffAnnotationFileFixer ports)."""

import hashlib

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import annotbatch as ab


def sha(s: str) -> str:
    return hashlib.sha256(s.encode()).hexdigest()


@pytest.fixture(scope="module")
def lines(spark):
    rows = [
        # annotator1/batch1: 2 sentences + DONE + blank
        ("annotator1", "batch1", "Sentence one."),
        ("annotator1", "batch1", "Sentence two."),
        ("annotator1", "batch1", "DONE"),
        ("annotator1", "batch1", "   "),
        # annotator2/batch1 shares one sentence with annotator1/batch1
        ("annotator2", "batch1", "Sentence two."),
        ("annotator2", "batch1", "Sentence three."),
        # annotator2/batch2 disjoint
        ("annotator2", "batch2", "Sentence four."),
    ]
    return spark.createDataFrame(rows, "annotator string, batch string, line string")


def test_batch_sentence_counts(lines):
    got = {
        (r.annotator, r.batch): r.n_sentences
        for r in ab.batch_sentence_counts(lines).collect()
    }
    assert got == {
        ("annotator1", "batch1"): 2,
        ("annotator2", "batch1"): 2,
        ("annotator2", "batch2"): 1,
    }


def test_batch_overlap_matrix_full_grid(lines):
    rows = ab.batch_overlap_matrix(lines).collect()
    got = {(r.batch_a, r.batch_b): r.n_overlap for r in rows}
    # full 3x3 grid, diagonal = batch size, shared sentence counted once
    assert len(got) == 9
    assert got[("annotator1_batch1", "annotator1_batch1")] == 2
    assert got[("annotator1_batch1", "annotator2_batch1")] == 1
    assert got[("annotator2_batch1", "annotator1_batch1")] == 1
    assert got[("annotator1_batch1", "annotator2_batch2")] == 0
    assert got[("annotator2_batch2", "annotator2_batch2")] == 1


def test_batch_sentence_ids_hash_parity(lines):
    ids = {
        (r.batch_key, r.sentence_id)
        for r in ab.batch_sentence_ids(lines).collect()
    }
    assert ("annotator1_batch1", sha("Sentence one.")) in ids
    # DONE / blank excluded
    assert all(sid != sha("DONE") for _, sid in ids)


@pytest.fixture(scope="module")
def idf(spark):
    rows = [
        ("CHEBI:1", "document", 2.5),
        ("CHEBI:2", "document", 0.5),
        ("CHEBI:3", "sentence", 9.0),
        ("GO:1", "document", 4.0),
        ("PR:1", "document", 3.0),
    ]
    return spark.createDataFrame(rows, "concept_id string, level string, idf double")


def test_allowed_concepts_prefix_and_threshold(idf):
    got = {
        (r.prefix, r.concept_id)
        for r in ab.allowed_concepts_by_idf(
            idf, 1.0, ontology_prefixes=["CHEBI", "GO"]
        ).collect()
    }
    # CHEBI:2 fails threshold, CHEBI:3 wrong level, PR:1 wrong prefix
    assert got == {("CHEBI", "CHEBI:1"), ("GO", "GO:1")}


def test_allowed_concepts_class_list_negative_threshold(idf):
    got = {
        r.concept_id
        for r in ab.allowed_concepts_by_idf(
            idf, -1.0, input_class_ids=["CHEBI:2", "CHEBI:3", "GO:1"]
        ).collect()
    }
    # threshold < 0 with a class list: no IDF/level filtering at all
    assert got == {"CHEBI:2", "CHEBI:3", "GO:1"}


def test_allowed_concepts_class_list_with_threshold(idf):
    got = {
        r.concept_id
        for r in ab.allowed_concepts_by_idf(
            idf, 1.0, input_class_ids=["CHEBI:1", "CHEBI:2", "CHEBI:3"]
        ).collect()
    }
    # CHEBI:2 under threshold; CHEBI:3 not document level
    assert got == {"CHEBI:1"}


def test_allowed_concepts_no_filtering_is_empty(idf):
    assert ab.allowed_concepts_by_idf(idf, -1.0, ontology_prefixes=["CHEBI"]).count() == 0


def test_allowed_concepts_dataframe_class_list(idf, spark):
    cls = spark.createDataFrame([("GO:1",), ("PR:1",)], "concept_id string")
    got = {
        r.concept_id
        for r in ab.allowed_concepts_by_idf(idf, 3.5, input_class_ids=cls).collect()
    }
    assert got == {"GO:1"}  # PR:1 idf 3.0 <= 3.5


def test_already_used_sentence_ids(lines):
    ids = {r.sentence_id for r in ab.already_used_sentence_ids(lines).collect()}
    assert ids == {
        sha("Sentence one."),
        sha("Sentence two."),
        sha("Sentence three."),
        sha("Sentence four."),
    }


def test_overlap_sentences_two_batches_intersection(spark):
    rows = [("a1_b1", "s1"), ("a1_b1", "s2"), ("a2_b1", "s2"), ("a2_b1", "s3")]
    batches = spark.createDataFrame(rows, "batch_key string, sentence_id string")
    got = {r.sentence_id for r in ab.overlap_sentences(batches, 0.5).collect()}
    assert got == {"s2"}


def test_overlap_sentences_single_batch_deterministic(spark):
    rows = [("a1_b1", f"s{i}") for i in range(10)]
    batches = spark.createDataFrame(rows, "batch_key string, sentence_id string")
    got1 = sorted(r.sentence_id for r in ab.overlap_sentences(batches, 0.3).collect())
    got2 = sorted(r.sentence_id for r in ab.overlap_sentences(batches, 0.3).collect())
    assert len(got1) == 3  # round(10 * 0.3)
    assert got1 == got2  # deterministic
    assert set(got1) <= {f"s{i}" for i in range(10)}


def test_overlap_sentences_empty(spark):
    batches = spark.createDataFrame([], "batch_key string, sentence_id string")
    assert ab.overlap_sentences(batches, 0.5).count() == 0


def test_remove_pmid_references_text_only(spark):
    text = "First sentence. -- PMID:12345\nSecond sentence.\nThird. -- PMID:9"
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    fixed = ab.remove_pmid_references(docs)
    assert fixed.collect()[0].text == "First sentence.\nSecond sentence.\nThird."


def test_remove_pmid_references_span_shift(spark):
    # line 0: "AAAA -- PMID:11" (len 15, cleaned len 4, removed 11, end 15)
    # line 1: "BBBB"            (starts at 16, end 20)
    # line 2: "CCCC -- PMID:22" (starts at 21, end 36, removed 11)
    # line 3: "DDDD"            (starts at 37)
    text = "AAAA -- PMID:11\nBBBB\nCCCC -- PMID:22\nDDDD"
    docs = spark.createDataFrame([("d1", text)], "doc_id string, text string")
    annots = spark.createDataFrame(
        [
            ("d1", "a_line0", [Row(start=0, end=4)]),     # inside line 0: no shift
            ("d1", "b_line1", [Row(start=16, end=20)]),   # after line 0: shift 11
            ("d1", "d_line3", [Row(start=37, end=41)]),   # after lines 0+2: shift 22
        ],
        "doc_id string, annot_id string, spans array<struct<start:int,end:int>>",
    )
    fixed_docs, fixed_annots = ab.remove_pmid_references(docs, annots)
    assert fixed_docs.collect()[0].text == "AAAA\nBBBB\nCCCC\nDDDD"
    got = {r.annot_id: [(s.start, s.end) for s in r.spans] for r in fixed_annots.collect()}
    assert got["a_line0"] == [(0, 4)]
    assert got["b_line1"] == [(5, 9)]    # "BBBB" now at 5..9
    assert got["d_line3"] == [(15, 19)]  # "DDDD" now at 15..19
    # verify shifted spans cover the same covered text in the fixed document
    new_text = fixed_docs.collect()[0].text
    assert new_text[5:9] == "BBBB" and new_text[15:19] == "DDDD"
