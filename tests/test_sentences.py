"""Sentence segmentation + extraction tests — mirrors the reference's
OpenNLPSentenceSegmentFnTest (line-break splitting, exact spans) and
SentenceExtractionFnTest (pair expansion, keyword gate, placeholders,
overlap drop)."""

from __future__ import annotations

import hashlib

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import schemas
from translator_tm_provider_pipelines_spark.operators import sentences as S

TEXT = "The quick fox jumps. It trips!\nA new line starts here. Tail"


@pytest.fixture()
def seg(spark):
    df = spark.createDataFrame([("d1", TEXT)], "doc_id string, content string")
    return S.segment_sentences(df).collect()


def test_segmentation_spans_are_exact(seg):
    for r in seg:
        assert TEXT[r.start:r.end] == r.sentence


def test_segmentation_boundaries(seg):
    got = [r.sentence for r in sorted(seg, key=lambda r: r.sent_idx)]
    assert got == [
        "The quick fox jumps.",
        "It trips!",
        "A new line starts here.",
        "Tail",
    ]
    # line break splits even without punctuation (splitSentencesOnLineBreaks)
    starts = [r.start for r in sorted(seg, key=lambda r: r.sent_idx)]
    assert starts == [0, 21, 31, 55]


def test_segmentation_no_boundary_single_sentence(spark):
    df = spark.createDataFrame([("d", "no boundary here")], "doc_id string, content string")
    rows = S.segment_sentences(df).collect()
    assert len(rows) == 1 and rows[0].sentence == "no boundary here"
    assert rows[0].start == 0 and rows[0].end == 16


def test_placeholder_substitution(spark):
    sent = "CHEM affects the DISEASE badly."
    df = spark.createDataFrame([(sent,)], "s string")
    out = df.select(
        S.sentence_with_placeholders(
            F.col("s"), F.lit(0), F.lit(4), F.lit("@CHEMICAL$"),
            F.lit(17), F.lit(24), F.lit("@DISEASE$"),
        ).alias("p"),
        # reversed argument order must give the same result (end-first logic)
        S.sentence_with_placeholders(
            F.col("s"), F.lit(17), F.lit(24), F.lit("@DISEASE$"),
            F.lit(0), F.lit(4), F.lit("@CHEMICAL$"),
        ).alias("q"),
    ).collect()[0]
    assert out.p == "@CHEMICAL$ affects the @DISEASE$ badly."
    assert out.q == out.p


def _annot(doc, cid, start, end, text):
    return (doc, "concept", cid, [(start, end)], text)


@pytest.fixture()
def extraction_inputs(spark):
    #             0123456789012345678901234567890123456789
    text = "Chemical X treats disease Y. Unrelated tail."
    docs = spark.createDataFrame([("d1", text)], "doc_id string, content string")
    sents = S.segment_sentences(docs)
    concepts = spark.createDataFrame(
        [
            _annot("d1", "CHEBI:1", 0, 10, "Chemical X"),
            _annot("d1", "HP:2", 18, 27, "disease Y"),
            _annot("d1", "PR:3", 11, 17, "treats"),  # other entity (not X/Y class)
        ],
        schema=schemas.ANNOTATION,
    )
    return sents, concepts


def test_extract_sentences_end_to_end(spark, extraction_inputs):
    sents, concepts = extraction_inputs
    out = S.extract_sentences(
        sents, concepts,
        x_prefixes=["CHEBI"], y_prefixes=["HP"],
        x_placeholder="@CHEMICAL$", y_placeholder="@DISEASE$",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.entity1_id == "CHEBI:1" and r.entity2_id == "HP:2"
    assert r.sentence_text == "Chemical X treats disease Y."
    assert r.sentence_with_placeholders == "@CHEMICAL$ treats @DISEASE$."
    assert [tuple(s) for s in r.entity1_spans] == [(0, 10)]
    assert [tuple(s) for s in r.entity2_spans] == [(18, 27)]
    # other-entity lists include the pair entities themselves
    # (getAllConceptsInSentence, SentenceExtractionFn.java:341-350)
    assert r.other_entity_ids == ["CHEBI:1", "HP:2", "PR:3"]
    assert r.pub_year == "2155"  # default (MedlineXmlToTextFn.java:62)
    assert r.sentence_span_start == 0
    # id = sha256(doc + zone + e1 + e1span + e2 + e2span + sentence)
    expect = hashlib.sha256(
        b"d1Unknown" b"CHEBI:1[0..10]" b"HP:2[18..27]" b"Chemical X treats disease Y."
    ).hexdigest()
    assert r.sentence_id == expect


def test_keyword_gate(spark, extraction_inputs):
    sents, concepts = extraction_inputs
    hit = S.extract_sentences(
        sents, concepts, ["CHEBI"], ["HP"], "@C$", "@D$", keywords=["treats"]
    )
    miss = S.extract_sentences(
        sents, concepts, ["CHEBI"], ["HP"], "@C$", "@D$", keywords=["cures"]
    )
    assert hit.count() == 1 and hit.collect()[0].keyword == "treats"
    assert miss.count() == 0


def test_overlapping_entities_dropped(spark):
    text = "Overlapping entity pair here."
    docs = spark.createDataFrame([("d1", text)], "doc_id string, content string")
    concepts = docs.sparkSession.createDataFrame(
        [
            _annot("d1", "CHEBI:1", 0, 18, "Overlapping entity"),
            _annot("d1", "HP:2", 12, 23, "entity pair"),
        ],
        schema=schemas.ANNOTATION,
    )
    out = S.extract_sentences(
        S.segment_sentences(docs), concepts, ["CHEBI"], ["HP"], "@C$", "@D$"
    )
    assert out.count() == 0


def test_exclusion_list(spark, extraction_inputs):
    sents, concepts = extraction_inputs
    excl = spark.createDataFrame([("CHEBI:1",)], "concept_id string")
    out = S.extract_sentences(
        sents, concepts, ["CHEBI"], ["HP"], "@C$", "@D$", excluded_ids=excl
    )
    assert out.count() == 0


def test_document_zone(spark, extraction_inputs):
    sents, _ = extraction_inputs
    sections = spark.createDataFrame(
        [
            ("d1", "title", None, [(0, 28)], "Chemical X treats disease Y."),
            ("d1", "abstract", None, [(29, 44)], "Unrelated tail."),
        ],
        schema=schemas.ANNOTATION,
    )
    out = {r.sent_idx: r.zone for r in S.document_zone(sents, sections).collect()}
    assert out[0] == "title" and out[1] == "abstract"
    # no sections at all → Unknown
    empty = sections.where(F.lit(False))
    out2 = {r.sent_idx: r.zone for r in S.document_zone(sents, empty).collect()}
    assert set(out2.values()) == {"Unknown"}


# ---------------------------------------------------------------------------
# Golden cases mirroring SentenceExtractionFnTest.java — the 4-sentence
# document (:59-79) with X/Y concept annotations.
# ---------------------------------------------------------------------------

_S1 = "This sentence has conceptX1 and conceptX2."
_S2 = "ConceptX1 is in this sentence, and so is conceptY1."
_S3 = "There are no concepts in this sentence."
_S4 = "ConceptX1 is in this sentence."
_DOC = f"{_S1} {_S2} {_S3} {_S4}"


def _ref_sents(spark):
    docs = spark.createDataFrame([("PMID:12345", _DOC)], "doc_id string, content string")
    return S.segment_sentences(docs)


def _ref_concepts(spark, extra=()):
    rows = [
        _annot("PMID:12345", "X:000001", 18, 27, "conceptX1"),
        _annot("PMID:12345", "X:000002", 32, 41, "conceptX2"),
        _annot("PMID:12345", "X:000001", 43, 52, "ConceptX1"),
        _annot("PMID:12345", "X:000001", 135, 144, "ConceptX1"),
        _annot("PMID:12345", "Y:000001", 84, 93, "conceptY1"),
        *extra,
    ]
    return spark.createDataFrame(rows, schema=schemas.ANNOTATION)


def test_ref_catalog_extracted_sentences(spark):
    # testCatalogExtractedSentences: only sentence 2 has an X and a Y
    out = S.extract_sentences(
        _ref_sents(spark), _ref_concepts(spark), ["X"], ["Y"],
        "@CONCEPTX$", "@CONCEPTY$", keywords=["sentence"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.entity1_id == "X:000001" and r.entity2_id == "Y:000001"
    assert r.sentence_text == _S2
    assert [tuple(s) for s in r.entity1_spans] == [(0, 9)]
    assert [tuple(s) for s in r.entity2_spans] == [(41, 50)]
    assert r.keyword == "sentence"
    assert r.sentence_span_start == 43
    assert sorted(r.other_entity_ids) == ["X:000001", "Y:000001"]


def test_ref_concept_synonym_merged(spark):
    # testCatalogExtractedSentencesWithConceptSynonym: same-span ids are
    # '|'-joined; the other-entity list shows the merged id once and the
    # swallowed annotation under its own id
    extra = [_annot("PMID:12345", "X:000001_SYN", 43, 52, "ConceptX1")]
    out = S.extract_sentences(
        _ref_sents(spark), _ref_concepts(spark, extra), ["X"], ["Y"],
        "@CONCEPTX$", "@CONCEPTY$", keywords=["sentence"],
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.entity1_id == "X:000001|X:000001_SYN"
    assert r.entity2_id == "Y:000001"
    assert sorted(r.other_entity_ids) == [
        "X:000001_SYN", "X:000001|X:000001_SYN", "Y:000001",
    ]


def test_ref_prevent_duplicates(spark):
    # testCatalogExtractedSentencesPreventDuplicates: a concept matching
    # both prefix classes must never be paired with itself
    out = S.extract_sentences(
        _ref_sents(spark), _ref_concepts(spark), ["X", "Y"], ["Y"],
        "@CONCEPTX$", "@CONCEPTY$", keywords=["sentence"],
    ).collect()
    assert len(out) == 1
    assert out[0].entity1_id == "X:000001" and out[0].entity2_id == "Y:000001"


def test_ref_no_keyword_and_keyword_not_found(spark):
    # testCatalogExtractedSentencesNoKeyword / KeywordNotFound
    none = S.extract_sentences(
        _ref_sents(spark), _ref_concepts(spark), ["X"], ["Y"], "@X$", "@Y$"
    ).collect()
    assert len(none) == 1 and none[0].keyword is None
    missing = S.extract_sentences(
        _ref_sents(spark), _ref_concepts(spark), ["X"], ["Y"], "@X$", "@Y$",
        keywords=["notfound"],
    )
    assert missing.count() == 0


def test_ref_single_prefix_duplicate_placeholder(spark):
    # testCatalogExtractedSentencesNoKeyword_DuplicatePlaceholder: X paired
    # with X (e.g. PR regulates PR) yields ONE row per unordered pair
    out = S.extract_sentences(
        _ref_sents(spark), _ref_concepts(spark), ["X"], ["X"],
        "@CONCEPTX$", "@CONCEPTX$",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.entity1_id == "X:000001" and r.entity2_id == "X:000002"
    assert r.sentence_text == _S1
    assert r.sentence_with_placeholders == "This sentence has @CONCEPTX$ and @CONCEPTX$."


def test_ref_keyword_case_insensitive_whole_word(spark):
    # testSentenceContainsKeyword: case-insensitive whole-word match
    # returning the keyword as given; substrings do not match
    text = "This sentence discusses increasing and decreasing rates."
    docs = spark.createDataFrame([("d", text)], "doc_id string, content string")
    sents = S.segment_sentences(docs)
    concepts = spark.createDataFrame(
        [_annot("d", "X:1", 0, 4, "This"), _annot("d", "Y:1", 24, 34, "increasing")],
        schema=schemas.ANNOTATION,
    )
    run = lambda kw: S.extract_sentences(  # noqa: E731
        sents, concepts, ["X"], ["Y"], "@X$", "@Y$", keywords=kw
    ).collect()
    assert run(["DECREasing"])[0].keyword == "DECREasing"
    assert run(["increas"]) == []


def test_entity_order_normalized_by_span(spark):
    # ExtractedSentence ctor :68-90: entity1 is the leftmost entity and
    # keeps its own placeholder, even when the Y concept comes first
    text = "diseaseA hurts chemB today."
    docs = spark.createDataFrame([("d", text)], "doc_id string, content string")
    concepts = spark.createDataFrame(
        [_annot("d", "HP:1", 0, 8, "diseaseA"), _annot("d", "CHEBI:2", 15, 20, "chemB")],
        schema=schemas.ANNOTATION,
    )
    out = S.extract_sentences(
        S.segment_sentences(docs), concepts, ["CHEBI"], ["HP"],
        "@CHEMICAL$", "@DISEASE$",
    ).collect()
    assert len(out) == 1
    r = out[0]
    assert r.entity1_id == "HP:1" and r.entity2_id == "CHEBI:2"
    assert r.sentence_with_placeholders == "@DISEASE$ hurts @CHEMICAL$ today."
    expect = hashlib.sha256(
        b"dUnknown" b"HP:1[0..8]" b"CHEBI:2[15..20]" + text.encode()
    ).hexdigest()
    assert r.sentence_id == expect


def test_tsv_layout(spark, extraction_inputs):
    sents, concepts = extraction_inputs
    ext = S.extract_sentences(
        sents, concepts, ["CHEBI"], ["HP"], "@CHEMICAL$", "@DISEASE$"
    )
    line = S.extracted_sentence_tsv(ext).collect()[0].line
    cols = line.split("\t")
    assert len(cols) == 20  # 19 fields + the blank column
    assert cols[1] == "@CHEMICAL$ treats @DISEASE$."
    assert cols[2] == "d1"
    assert cols[5] == "0 10" and cols[8] == "18 27"
    assert cols[10] == str(len("Chemical X treats disease Y."))
