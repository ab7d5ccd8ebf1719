"""Tests for operators/semmed.py and operators/craftprep.py (SemMedDB +
CRAFT corpus-preparation ports)."""

import math

import pytest
from pyspark.sql import Row
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import craftprep, semmed


# ---------------------------------------------------------------------------
# SemmedDbIdf chain
# ---------------------------------------------------------------------------


def test_cui_to_pmid_join(spark):
    ents = spark.createDataFrame(
        [("s1", "C1"), ("s1", "C2"), ("s2", "C1"), ("s3", "C9")],
        "sentence_id string, cui string",
    )
    sents = spark.createDataFrame(
        [("s1", "p1"), ("s2", "p2")], "sentence_id string, pmid string"
    )
    got = {(r.cui, r.pmid) for r in semmed.cui_to_pmid(ents, sents).collect()}
    # s3 has no sentence row -> dropped (reference logs 'missing sentence id')
    assert got == {("C1", "p1"), ("C2", "p1"), ("C1", "p2")}


def test_isa_edges_parse(spark):
    lines = spark.createDataFrame(
        [("P1|x|x|x|C1|x|x|isa|", ), ("P2|x|x|x|C1|x|x|isa|",)], "line string"
    )
    got = {(r.child_cui, r.parent_cui) for r in semmed.isa_edges(lines).collect()}
    assert got == {("C1", "P1"), ("C1", "P2")}


def test_ancestor_closure_and_counts(spark):
    # C1 -> P1 -> G1 chain plus C2 -> P1
    edges = spark.createDataFrame(
        [("C1", "P1"), ("C2", "P1"), ("P1", "G1")],
        "child_cui string, parent_cui string",
    )
    closure = semmed.ancestor_closure(edges)
    got = {(r.cui, r.ancestor_cui) for r in closure.collect()}
    assert got == {
        ("C1", "P1"), ("C1", "G1"), ("C2", "P1"), ("C2", "G1"), ("P1", "G1"),
    }
    pmids = spark.createDataFrame(
        [("C1", "p1"), ("C1", "p2"), ("C2", "p2"), ("P1", "p3")],
        "cui string, pmid string",
    )
    counts = {
        r.cui: r.pmid_count
        for r in semmed.ancestor_pmid_counts(pmids, closure).collect()
    }
    # P1 inherits p1,p2 and observes p3; G1 inherits everything
    assert counts == {"C1": 2, "C2": 1, "P1": 3, "G1": 3}
    flat = {
        r.cui: r.pmid_count for r in semmed.ancestor_pmid_counts(pmids).collect()
    }
    assert flat == {"C1": 2, "C2": 1, "P1": 1}


def test_semmed_idf_formula_and_order(spark):
    counts = spark.createDataFrame(
        [("C1", 100), ("C2", 10)], "cui string, pmid_count long"
    )
    labels = spark.createDataFrame([("C1", "alpha")], "cui string, name string")
    rows = semmed.semmed_idf(counts, labels).collect()
    # reference formula: ln(count / TOTAL) — negative, larger count = larger idf
    assert rows[0].cui == "C1" and rows[1].cui == "C2"
    assert rows[0].idf == round(math.log(100 / semmed.TOTAL_PMIDS), 3)
    assert rows[0].name == "alpha" and rows[1].name is None


def test_umls_hpo_xrefs(spark):
    mk = lambda cui, src, code: "|".join(  # noqa: E731
        [cui, "x", "x", "x", "x", "x", "x", "x", "x", "x", "x", src, "x", code, "x"]
    )
    lines = spark.createDataFrame(
        [(mk("C1", "HPO", "HP:0000001"),), (mk("C2", "MSH", "D000001"),)],
        "line string",
    )
    got = {(r.cui, r.hpo_id) for r in semmed.umls_hpo_xrefs(lines).collect()}
    assert got == {("C1", "HP:0000001")}


# ---------------------------------------------------------------------------
# SemmedDbFileParser analysis
# ---------------------------------------------------------------------------


@pytest.mark.parametrize(
    "text,expected",
    [
        ("a b c", 3),
        ("a b ", 2),     # trailing empties dropped (Java split semantics)
        (" a", 2),       # leading empty kept
        ("", 1),         # "".split(" ") -> [""]
        ("   ", 0),      # all-separator -> []
        ("a  b", 3),     # interior empty kept
    ],
)
def test_java_space_token_count(spark, text, expected):
    df = spark.createDataFrame([(text,)], "t string")
    got = df.select(semmed.java_space_token_count(F.col("t")).alias("n")).collect()
    assert got[0].n == expected


def test_subj_obj_pmid_counts_sums_semtype_variants(spark):
    rows = [
        ("TREATS\tC1\tn\tt1\tD1\tn\tt2\tp1,p2,p3",),
        ("TREATS\tC1\tn\tt9\tD1\tn\tt8\tp4",),      # same pair, other semtypes
        ("CAUSES\tC1\tn\tt1\tD1\tn\tt2\tp1",),       # wrong predicate
    ]
    lines = spark.createDataFrame(rows, "line string")
    got = {
        (r.subject_cui, r.object_cui): r.pmid_count
        for r in semmed.subj_obj_pmid_counts(lines).collect()
    }
    assert got == {("C1", "D1"): 4}


@pytest.fixture(scope="module")
def predications(spark):
    # sentence-relative spans: subj "aspirin" at 0..7, obj "headache" at 15..23
    sent = "aspirin treats headache quickly"
    rows = [
        Row(
            predication_id="pr1", sentence=sent, sent_start_index=100,
            subject_text="aspirin", subject_cui="C1", subject_semtype="phsu",
            subject_start_index=100, subject_end_index=107,
            object_text="headache", object_cui="D1", object_semtype="sosy",
            object_start_index=115, object_end_index=123,
        ),
        # object precedes subject -> segment between obj end and subj start
        Row(
            predication_id="pr2", sentence=sent, sent_start_index=0,
            subject_text="headache", subject_cui="C2", subject_semtype="dsyn",
            subject_start_index=15, subject_end_index=23,
            object_text="aspirin", object_cui="D1", object_semtype="phsu",
            object_start_index=0, object_end_index=7,
        ),
        # recorded subject text does not match the span -> error channel
        Row(
            predication_id="pr3", sentence=sent, sent_start_index=0,
            subject_text="ibuprofen", subject_cui="C3", subject_semtype="phsu",
            subject_start_index=0, subject_end_index=7,
            object_text="headache", object_cui="D1", object_semtype="sosy",
            object_start_index=15, object_end_index=23,
        ),
        # no pair count registered -> no_cui_key error
        Row(
            predication_id="pr4", sentence=sent, sent_start_index=0,
            subject_text="aspirin", subject_cui="C9", subject_semtype="phsu",
            subject_start_index=0, subject_end_index=7,
            object_text="headache", object_cui="D9", object_semtype="sosy",
            object_start_index=15, object_end_index=23,
        ),
    ]
    return spark.createDataFrame(rows)


def test_intervening_token_stats(spark, predications):
    pair_counts = spark.createDataFrame(
        [("C1", "D1", 3), ("C2", "D1", 12)],
        "subject_cui string, object_cui string, pmid_count long",
    )
    stats, errors = semmed.intervening_token_stats(predications, pair_counts)
    got = {r.predication_id: r for r in stats.collect()}
    assert set(got) == {"pr1", "pr2"}
    # segment between subj end 7 and obj start 15 = " treats " -> 2 tokens
    # (leading empty + "treats"; trailing empties dropped)
    assert got["pr1"].intervening_token_count == 2
    assert got["pr1"].sentence_token_count == 4
    assert got["pr1"].sem_types == "phsu_sosy"
    assert got["pr1"].pmid_count_bucket == "PMID_2_4"
    assert got["pr1"].intervening_token_count_bucket == "TOKEN_2_4"
    assert got["pr2"].sem_types == "dsyn_phsu"
    assert got["pr2"].pmid_count_bucket == "PMID_10_19"
    errs = {(r.predication_id, r.error) for r in errors.collect()}
    assert errs == {("pr3", "text_mismatch"), ("pr4", "no_cui_key")}


def test_semtype_pair_counts(spark, predications):
    got = {
        (r.subject_semtype, r.object_semtype): r.n
        for r in semmed.semtype_pair_counts(predications).collect()
    }
    assert got[("phsu", "sosy")] == 3
    assert got[("dsyn", "phsu")] == 1


# ---------------------------------------------------------------------------
# CRAFT preparation
# ---------------------------------------------------------------------------


def _annots(spark, rows):
    return spark.createDataFrame(
        rows, "doc_id string, concept_id string, spans array<struct<start:int,end:int>>"
    )


def test_revert_go_mf_ext(spark):
    orig = _annots(spark, [("d1", "GO:0001", [Row(start=0, end=4)])])
    ext = _annots(
        spark,
        [
            ("d1", "GO_EXT:0002", [Row(start=5, end=9)]),   # reverts to GO:0002
            ("d1", "GO_EXT:9999", [Row(start=10, end=14)]),  # not in ontology
        ],
    )
    ont = spark.createDataFrame([("GO:0001",), ("GO:0002",)], "term_id string")
    got = {r.concept_id for r in craftprep.revert_go_mf_ext(orig, ext, ont).collect()}
    assert got == {"GO:0001", "GO:0002"}


def test_exclude_concepts_by_ontology_id(spark):
    annots = _annots(
        spark,
        [
            ("d1", "GO:0001", [Row(start=0, end=4)]),
            ("d1", "GO:0002", [Row(start=5, end=9)]),
        ],
    )
    kept = craftprep.exclude_concepts_by_ontology_id(annots, ["GO:0002"])
    assert {r.concept_id for r in kept.collect()} == {"GO:0001"}
    ids_df = spark.createDataFrame([("GO:0001",)], "id string")
    kept2 = craftprep.exclude_concepts_by_ontology_id(annots, ids_df)
    assert {r.concept_id for r in kept2.collect()} == {"GO:0002"}
    # empty exclusion list is a no-op
    assert craftprep.exclude_concepts_by_ontology_id(annots, []).count() == 2


def test_choose_one_exact_overlap(spark):
    annots = _annots(
        spark,
        [
            ("d1", "PR:0001", [Row(start=0, end=4)]),
            ("d1", "GO:0005", [Row(start=0, end=4)]),   # same span: GO < PR kept
            ("d1", "CL:0009", [Row(start=10, end=14)]),  # unique span survives
            ("d2", "PR:0001", [Row(start=0, end=4)]),    # other doc untouched
        ],
    )
    got = {(r.doc_id, r.concept_id) for r in craftprep.choose_one_exact_overlap(annots).collect()}
    assert got == {("d1", "GO:0005"), ("d1", "CL:0009"), ("d2", "PR:0001")}


# ---------------------------------------------------------------------------
# Relay results compilation (SemmedDbFebRelayResultsCompiler)
# ---------------------------------------------------------------------------


@pytest.fixture(scope="module")
def results(spark):
    C, I = semmed.ASSERTION_CORRECT, semmed.ASSERTION_INCORRECT
    rows = [
        # pr1 reviewed twice: one correct, one incorrect -> incorrect wins
        ("f1", "pr1", "a1", C, "TRUE"),
        ("f2", "pr1", "a2", I, "TRUE"),
        ("f2", "pr1", "a3", "Entity boundary wrong", "TRUE"),
        # pr2 correct, with an improvement checkbox in the same session
        ("f3", "pr2", "a4", C, "TRUE"),
        ("f3", "pr2", "a5", "Could be more specific", "TRUE"),
        # pr3 incorrect only
        ("f4", "pr3", "a6", I, "TRUE"),
        # test record -> excluded entirely
        ("f5", "10595361", "a7", C, "TRUE"),
    ]
    return spark.createDataFrame(
        rows,
        "feedback_id string, predication_id string, answer_id string, "
        "answer string, response string",
    )


TEST_IDS = ("10595361", "10612762")


def test_resolved_answers_any_incorrect_wins(results):
    got = {
        r.predication_id: r.answer
        for r in semmed.resolved_answers(results, TEST_IDS).collect()
    }
    assert got == {
        "pr1": semmed.ASSERTION_INCORRECT,
        "pr2": semmed.ASSERTION_CORRECT,
        "pr3": semmed.ASSERTION_INCORRECT,
    }


def test_overall_accuracy(results):
    row = semmed.overall_accuracy(results, TEST_IDS).collect()[0]
    assert row.n_reviews == 4  # f1..f4 (f5 only carries the test record)
    assert row.n_unique == 3
    assert row.n_correct == 1 and row.n_incorrect == 2
    assert row.accuracy == round(1 / 3, 8)


def test_incorrect_reason_distribution(results):
    got = {r.answer: (r.n, r.fraction) for r in
           semmed.incorrect_reason_distribution(results, TEST_IDS).collect()}
    # designated sessions: pr1 -> f2, pr3 -> f4; their rows: I, boundary, I
    assert got[semmed.ASSERTION_INCORRECT] == (2, 1.0)
    assert got["Entity boundary wrong"] == (1, 0.5)


def test_incorrect_reason_designated_only_from_incorrect_rows(spark):
    # Conflicting reviews where the CORRECT-marking session has the larger
    # feedback_id: the reference's put only fires on incorrect rows
    # (computeIncorrectReasonDistribution:171-175), so f1 must stay the
    # designated session and f9's improvement checkbox must NOT count.
    C, I = semmed.ASSERTION_CORRECT, semmed.ASSERTION_INCORRECT
    rows = [
        ("f1", "pr1", "a1", I, "TRUE"),
        ("f1", "pr1", "a2", "Entity boundary wrong", "TRUE"),
        ("f9", "pr1", "a3", C, "TRUE"),
        ("f9", "pr1", "a4", "Could be more specific", "TRUE"),
    ]
    results = spark.createDataFrame(
        rows,
        "feedback_id string, predication_id string, answer_id string, "
        "answer string, response string",
    )
    got = {r.answer: (r.n, r.fraction) for r in
           semmed.incorrect_reason_distribution(results).collect()}
    assert got == {I: (1, 1.0), "Entity boundary wrong": (1, 1.0)}


def test_improvement_distribution(results):
    got = {r.answer: (r.n, r.fraction) for r in
           semmed.improvement_distribution(results, TEST_IDS).collect()}
    assert got[semmed.ASSERTION_CORRECT] == (1, 1.0)
    assert got["Could be more specific"] == (1, 1.0)


def test_accuracy_by_subject_type_unknown_group(spark, results):
    # A subject semtype in neither list makes the reference throw
    # IllegalStateException; the engine surfaces it as UNKNOWN.
    resolved = semmed.resolved_answers(results, TEST_IDS)
    meta = spark.createDataFrame(
        [("pr2", 1, 5, 2, "zzzz_dsyn")],
        "predication_id string, intervening_token_count int, "
        "sentence_token_count int, pmid_count long, sem_types string",
    )
    by_type = {r.subject_group: r for r in
               semmed.accuracy_by_subject_type(resolved, meta).collect()}
    assert set(by_type) == {"UNKNOWN"}
    assert by_type["UNKNOWN"].n_correct == 1


def test_accuracy_by_subject_type_and_complexity(spark, results):
    resolved = semmed.resolved_answers(results, TEST_IDS)
    meta = spark.createDataFrame(
        [
            ("pr1", 2, 10, 3, "phsu_sosy"),   # chemical subject
            ("pr2", 15, 30, 5, "topp_dsyn"),  # treatment subject, high complexity
            ("pr3", 1, 8, 2, "phsu_dsyn"),    # chemical subject
        ],
        "predication_id string, intervening_token_count int, "
        "sentence_token_count int, pmid_count long, sem_types string",
    )
    by_type = {r.subject_group: r for r in
               semmed.accuracy_by_subject_type(resolved, meta).collect()}
    assert by_type["CHEMICAL"].n_incorrect == 2
    assert by_type["CHEMICAL"].accuracy == 0.0
    assert by_type["TREATMENT"].n_correct == 1
    assert by_type["TREATMENT"].accuracy == 1.0
    by_cx = {r.complexity: r for r in
             semmed.accuracy_by_complexity(resolved, meta).collect()}
    assert by_cx["LOW"].n_total == 2 and by_cx["LOW"].n_incorrect == 2
    assert by_cx["HIGH"].n_total == 1 and by_cx["HIGH"].accuracy == 1.0


# ---------------------------------------------------------------------------
# Metadata enrichment + BERT input (SemmedDbMetadataRetriever)
# ---------------------------------------------------------------------------


def test_bert_input_sentences(spark, predications):
    out, errors = semmed.bert_input_sentences(predications)
    got = {r.predication_id: r.sentence for r in out.collect()}
    # subject first in pr1, object first in pr2 — both orders must land
    # the placeholders on the right entities
    assert got["pr1"] == "@CHEMICAL$ treats @DISEASE$ quickly"
    assert got["pr2"] == "@DISEASE$ treats @CHEMICAL$ quickly"
    assert {r.predication_id for r in errors.collect()} == {"pr3"}


def _overlapping_predication(spark):
    # subject 0..14 "aspirin treats", object 8..23 "treats headache":
    # spans overlap, seg_end (8) < seg_start (14)
    sent = "aspirin treats headache quickly"
    return spark.createDataFrame([Row(
        predication_id="pov", sentence=sent, sent_start_index=0,
        subject_text="aspirin treats", subject_cui="C1", subject_semtype="phsu",
        subject_start_index=0, subject_end_index=14,
        object_text="treats headache", object_cui="D1", object_semtype="sosy",
        object_start_index=8, object_end_index=23,
    )])


def test_intervening_token_stats_overlap_errors(spark):
    pred = _overlapping_predication(spark)
    pair_counts = spark.createDataFrame(
        [("C1", "D1", 3)],
        "subject_cui string, object_cui string, pmid_count long",
    )
    stats, errors = semmed.intervening_token_stats(pred, pair_counts)
    assert stats.count() == 0
    assert [(r.predication_id, r.error) for r in errors.collect()] == [
        ("pov", "span_overlap")
    ]


def test_bert_input_sentences_overlap_errors(spark):
    out, errors = semmed.bert_input_sentences(_overlapping_predication(spark))
    assert out.count() == 0
    assert [(r.predication_id, r.error) for r in errors.collect()] == [
        ("pov", "span_overlap")
    ]


def test_enriched_metadata(spark):
    existing = spark.createDataFrame(
        [("pr1", "x"), ("pr2", "y")], "predication_id string, extra string"
    )
    meta = spark.createDataFrame(
        [
            ("pr1", "title", "901", "888", "C1", "D1"),
            ("pr2", "abstract", "700", "650", "C2", "D9"),
        ],
        "predication_id string, zone string, subject_score string, "
        "object_score string, subject_cui string, object_cui string",
    )
    treats = spark.createDataFrame(
        [("pr1", True), ("pr2", False)], "predication_id string, tmkp_treats boolean"
    )
    ic = spark.createDataFrame([("C1", 83.2), ("D1", 55.0)], "cui string, value double")
    idf = spark.createDataFrame([("C1", -4.1)], "cui string, value double")
    rows = {
        r.predication_id: r
        for r in semmed.enriched_metadata(existing, meta, treats, ic, idf).collect()
    }
    r1 = rows["pr1"]
    assert r1.zone == "title" and r1.tmkp_treats is True
    assert r1.subj_nodenorm_ic == 83.2 and r1.obj_nodenorm_ic == 55.0
    assert r1.subj_idf == -4.1 and r1.obj_idf is None
    r2 = rows["pr2"]
    # CUIs absent from the lookup relations stay null (reference emits null)
    assert r2.subj_nodenorm_ic is None and r2.obj_nodenorm_ic is None
    assert r2.tmkp_treats is False and r2.extra == "y"
