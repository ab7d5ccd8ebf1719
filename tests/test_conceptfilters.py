"""Concept post-processing chain tests — mirrors OgerPostProcessingFnTest
(spurious-match rules) and ConceptPostProcessingFnTest (stopwords, brackets,
nesting, HP/MONDO dedup, taxon promotion, unactionable truncation)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark import schemas
from translator_tm_provider_pipelines_spark.operators import conceptfilters as CF


def _a(doc, cid, start, end, text):
    return (doc, "concept", cid, [(start, end)], text)


def _ids(df):
    return {(r.concept_id, r.covered_text) for r in df.collect()}


@pytest.fixture()
def spurious_inputs(spark):
    annots = spark.createDataFrame(
        [
            _a("d1", "PR:1", 0, 3, "per"),        # trap: dict has 'per1' (digit suffix)
            _a("d1", "PR:2", 0, 7, "protein"),    # exact match → keep
            _a("d1", "PR:3", 0, 8, "proteine"),   # 1 edit vs 'protein' (7) = 0.14 → keep
            _a("d1", "PR:4", 0, 4, "1234"),       # digits only → drop
            _a("d1", "PR:5", 0, 6, "ab/cde"),     # slash + not exact → drop
            _a("d1", "PR:6", 0, 6, "abcdef"),     # far from dict entry → drop
            _a("d1", "PR:7", 0, 5, "nodict"),     # id not in dict → pass through
        ],
        schema=schemas.ANNOTATION,
    )
    entries = spark.createDataFrame(
        [
            ("PR:1", "per1"),
            ("PR:2", "protein"),
            ("PR:3", "protein"),
            ("PR:4", "1234"),
            ("PR:5", "ab/cdx"),
            ("PR:6", "zzzzzzzzzz"),
        ],
        "concept_id string, dict_entry string",
    )
    return annots, entries


def test_spurious_match_filter(spark, spurious_inputs):
    annots, entries = spurious_inputs
    kept = _ids(CF.remove_spurious_matches(annots, entries))
    assert kept == {("PR:2", "protein"), ("PR:3", "proteine"), ("PR:7", "nodict")}


def test_spurious_slash_exact_match_kept(spark):
    annots = spark.createDataFrame(
        [_a("d1", "PR:5", 0, 6, "ab/cde")], schema=schemas.ANNOTATION
    )
    entries = spark.createDataFrame(
        [("PR:5", "ab/cde")], "concept_id string, dict_entry string"
    )
    assert _ids(CF.remove_spurious_matches(annots, entries)) == {("PR:5", "ab/cde")}


def test_remove_matches_less_than(spark):
    annots = spark.createDataFrame(
        [_a("d1", "X:1", 0, 3, "abc"), _a("d1", "X:2", 0, 4, "abcd")],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_matches_less_than(annots, 4)) == {("X:2", "abcd")}


def test_remove_ncbi_stopwords(spark):
    annots = spark.createDataFrame(
        [
            _a("d1", "X:1", 0, 4, "That"),   # stopword → drop
            _a("d1", "X:2", 0, 2, "ok"),     # ≤2 chars → drop
            _a("d1", "X:3", 0, 7, "keratin"),
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_ncbi_stopwords(annots)) == {("X:3", "keratin")}


def test_id_text_exclusion_pairs(spark):
    annots = spark.createDataFrame(
        [_a("d1", "X:1", 0, 4, "Mole"), _a("d1", "X:1", 5, 9, "mole rat")],
        schema=schemas.ANNOTATION,
    )
    pairs = spark.createDataFrame([("X:1", "mole")], "concept_id string, text string")
    assert _ids(CF.remove_id_text_exclusion_pairs(annots, pairs)) == {("X:1", "mole rat")}


def test_id_text_exclusion_default_map(spark):
    # mirrors testRemoveIdToTextExclusionPairs: built-in map, equalsIgnoreCase
    annots = spark.createDataFrame(
        [
            _a("d1", "CL:0000540", 0, 8, "neuronal"),       # in map → drop
            _a("d1", "CL:0000540", 23, 29, "neuron"),       # not in map → keep
            _a("d1", "UBERON:0012131", 38, 47, "Centrally"),  # case-insensitive → drop
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_id_text_exclusion_pairs(annots)) == {("CL:0000540", "neuron")}


def test_promote_pr_annots(spark):
    # mirrors testPromoteAnnots: promoted annotation collides with an
    # existing identical one and collapses
    annots = spark.createDataFrame(
        [
            _a("d1", "PR:00000000022", 25, 35, "some text"),
            _a("d1", "PR:00000000000", 25, 35, "some text"),
            _a("d1", "PR:00000000025", 0, 5, "some text"),
            _a("d1", "PR:00000000020", 0, 5, "some text"),
        ],
        schema=schemas.ANNOTATION,
    )
    pm = spark.createDataFrame(
        [("PR:00000000025", "PR:00000000020")], "concept_id string, promoted_id string"
    )
    out = CF.promote_pr_annots(annots, pm)
    assert out.count() == 3
    assert _ids(out) == {
        ("PR:00000000022", "some text"),
        ("PR:00000000000", "some text"),
        ("PR:00000000020", "some text"),
    }


def test_convert_extension_to_obo(spark):
    # mirrors testConvertExtensionToObo: one-to-many extension classes fan
    # out; unmapped annotations pass through
    annots = spark.createDataFrame(
        [
            _a("d1", "PR_EXT:00000000022", 25, 35, "some text"),
            _a("d1", "PR:some_extension_cls", 25, 35, "some text"),
            _a("d1", "PR:00000000025", 0, 5, "some text"),
            _a("d1", "PR:00000000020", 0, 5, "some text"),
        ],
        schema=schemas.ANNOTATION,
    )
    em = spark.createDataFrame(
        [
            ("PR_EXT:00000000022", "PR:00000000022"),
            ("PR:some_extension_cls", "PR:00000000123"),
            ("PR:some_extension_cls", "PR:00000000456"),
        ],
        "extension_id string, obo_id string",
    )
    out = CF.convert_extension_to_obo(annots, em)
    assert out.count() == 5
    assert _ids(out) == {
        ("PR:00000000022", "some text"),
        ("PR:00000000123", "some text"),
        ("PR:00000000456", "some text"),
        ("PR:00000000025", "some text"),
        ("PR:00000000020", "some text"),
    }


def test_odd_bracket_filter(spark):
    annots = spark.createDataFrame(
        [
            _a("d1", "X:1", 0, 4, "PP{V"),      # unbalanced → drop
            _a("d1", "X:2", 0, 6, "(full)"),    # balanced → keep
            _a("d1", "X:3", 0, 5, "ab[c]"),     # balanced → keep
            _a("d1", "X:4", 0, 4, "ab)c"),      # unbalanced → drop
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_odd_bracket_matches(annots)) == {
        ("X:2", "(full)"), ("X:3", "ab[c]")
    }


def test_hp_mondo_same_span_dedup(spark):
    annots = spark.createDataFrame(
        [
            _a("d1", "HP:1", 0, 5, "ataxy"),     # same span as MONDO:9 → drop
            _a("d1", "MONDO:9", 0, 5, "ataxy"),
            _a("d1", "HP:2", 10, 15, "other"),   # no MONDO twin → keep
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.dedup_same_span_hp_mondo(annots)) == {
        ("MONDO:9", "ataxy"), ("HP:2", "other")
    }


def test_taxon_promotion(spark):
    annots = spark.createDataFrame(
        [
            _a("d1", "NCBITaxon:9606", 0, 5, "human"),   # specific → dropped
            _a("d1", "NCBITaxon:9605", 0, 5, "human"),   # ancestor (genus) → kept
            _a("d1", "NCBITaxon:10090", 9, 14, "mouse"), # alone on its span → kept
            _a("d1", "GO:1", 0, 5, "human"),             # non-taxon untouched
        ],
        schema=schemas.ANNOTATION,
    )
    anc = spark.createDataFrame(
        [("NCBITaxon:9606", "NCBITaxon:9605")], "concept_id string, ancestor_id string"
    )
    assert _ids(CF.promote_ncbitaxon_annots(annots, anc)) == {
        ("NCBITaxon:9605", "human"), ("NCBITaxon:10090", "mouse"), ("GO:1", "human")
    }


def test_remove_nested_annotations(spark):
    annots = spark.createDataFrame(
        [
            _a("d1", "GO:0000725", 428, 450, "recombinational repair"),
            _a("d1", "SNOMEDCT:4365001", 444, 450, "repair"),  # nested → drop
            _a("d1", "CL:1", 428, 450, "recombinational repair"),  # identical span → keep
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_nested_annotations(annots)) == {
        ("GO:0000725", "recombinational repair"),
        ("CL:1", "recombinational repair"),
    }


def test_partial_overlap_keeps_first(spark):
    # mirrors testHandlingOfPartialOverlapOfConcepts: neither annotation
    # contains the other — keep the one appearing first in the document
    annots = spark.createDataFrame(
        [
            _a("d1", "UBERON:1", 2700, 2721, "Brca1-/- embryonic stem"),
            _a("d1", "CL:0002322", 2709, 2734, "embryonic stem      cells"),
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_nested_annotations(annots)) == {
        ("UBERON:1", "Brca1-/- embryonic stem")
    }


def test_exact_overlap_keeps_both(spark):
    # mirrors testHandlingOfExactOverlapOfConcepts
    annots = spark.createDataFrame(
        [
            _a("d1", "UBERON:1", 2709, 2734, "embryonic stem      cells"),
            _a("d1", "CL:0002322", 2709, 2734, "embryonic stem      cells"),
        ],
        schema=schemas.ANNOTATION,
    )
    assert CF.remove_nested_annotations(annots).count() == 2


def test_nested_knockout_from_dropped_annotation(spark):
    # existence is tested against the ORIGINAL set: [5,20) is dropped by
    # [0,10), and still knocks out [15,30) even though it was dropped
    annots = spark.createDataFrame(
        [
            _a("d1", "A:1", 0, 10, "aaaaaaaaaa"),
            _a("d1", "B:2", 5, 20, "bbbbbbbbbbbbbbb"),
            _a("d1", "C:3", 15, 30, "ccccccccccccccc"),
        ],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.remove_nested_annotations(annots)) == {("A:1", "aaaaaaaaaa")}


def test_augmented_section_filter(spark):
    text = "real text here " + CF.DOCUMENT_END_MARKER + " augmented tail"
    docs = spark.createDataFrame([("d1", text)], "doc_id string, content string")
    annots = spark.createDataFrame(
        [_a("d1", "X:1", 0, 4, "real"), _a("d1", "X:2", 20, 29, "augmented")],
        schema=schemas.ANNOTATION,
    )
    assert _ids(CF.filter_annots_in_augmented_section(annots, docs)) == {("X:1", "real")}


def test_filter_unactionable_text(spark):
    #       0         1         2         3
    #       0123456789012345678901234567890123456789
    text = "intro body text refs ack tail padding!!"
    docs = spark.createDataFrame([("d1", text), ("d2", "no sections at all")],
                                 "doc_id string, content string")
    sections = spark.createDataFrame(
        [
            ("d1", "introduction", None, [(0, 10)], None),
            ("d1", "results", None, [(11, 15)], None),
            ("d1", "references", None, [(16, 24)], None),
            ("d1", "acknowledgements", None, [(25, 40)], None),
        ],
        schema=schemas.ANNOTATION,
    )
    out = {r.doc_id: r.content for r in CF.filter_unactionable_text(docs, sections).collect()}
    assert out["d1"] == "intro body text"
    assert out["d2"] == "no sections at all"


def test_unactionable_run_interrupted(spark):
    text = "aaaa refs bbbb ack!"
    docs = spark.createDataFrame([("d1", text)], "doc_id string, content string")
    sections = spark.createDataFrame(
        [
            ("d1", "references", None, [(5, 9)], None),   # interrupted → kept
            ("d1", "results", None, [(10, 14)], None),
            ("d1", "acknowledgements", None, [(15, 19)], None),  # trailing → cut
        ],
        schema=schemas.ANNOTATION,
    )
    out = CF.filter_unactionable_text(docs, sections).collect()[0].content
    assert out == "aaaa refs bbbb"


def test_filter_via_crf(spark):
    concepts = spark.createDataFrame(
        [
            _a("d1", "PR:1", 10, 20, "confirmed"),   # overlaps CRF → keep
            _a("d1", "PR:2", 30, 40, "unconfirmed"), # no overlap → drop
            _a("d1", "DRUGBANK:3", 50, 60, "nocrf"), # pass-through type
        ],
        schema=schemas.ANNOTATION,
    )
    crf = spark.createDataFrame(
        [_a("d1", None, 15, 25, "crf span")], schema=schemas.ANNOTATION
    )
    assert _ids(CF.filter_via_crf(concepts, crf)) == {
        ("PR:1", "confirmed"), ("DRUGBANK:3", "nocrf")
    }
