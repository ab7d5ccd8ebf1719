"""Elasticsearch→brat selection client: query building, annotated-text
parsing, scroll paging, and the end-to-end mock-ES → .ann/.txt batch."""

from __future__ import annotations

import json

import pytest

from translator_tm_provider_pipelines_spark.functions import biolink
from translator_tm_provider_pipelines_spark.operators import relext
from translator_tm_provider_pipelines_spark.sources import elastic

ASSOC = biolink.ASSOCIATIONS["biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation"]


def test_build_sentence_query_matches_reference():
    """Byte parity (modulo whitespace, as the reference test compares)
    with ElasticsearchToBratExporterTest.testBuildSentenceQuery."""
    q = elastic.build_sentence_query([{"DRUGBANK", "CHEBI"}, {"UBERON", "CL"}, {"GO"}])
    expected = (
        '{ "bool": { "must": [ '
        '{ "match": { "annotatedText": { "query": "_CHEBI _DRUGBANK", "operator": "or" } } }, '
        '{ "match": { "annotatedText": { "query": "_CL _UBERON", "operator": "or" } } }, '
        '{ "match": { "annotatedText": { "query": "_GO" } } } ] } }'
    )
    strip = lambda s: "".join(s.split())  # noqa: E731
    assert strip(q) == strip(expected)
    json.loads(q)  # and it must be valid JSON


def test_match_stanza_single_prefix_drops_operator():
    s = elastic.create_annotated_text_match_stanza("_GO")
    assert "operator" not in s
    assert '"query": "_GO"' in s
    s2 = elastic.create_annotated_text_match_stanza("_CHEBI _DRUGBANK")
    assert '"operator": "or"' in s2


def test_parse_annotated_text_spans_and_filters():
    markup = "(aspirin)[CHEBI_15365&_CHEBI] reduces (fever)[HP_0001945&MONDO_1&_HP_MONDO]."
    text, annots = elastic.parse_annotated_text(markup, {"CHEBI", "HP", "MONDO"})
    assert text == "aspirin reduces fever."
    got = {(a["concept_id"], a["start"], a["end"], a["text"]) for a in annots}
    assert got == {
        ("CHEBI:15365", 0, 7, "aspirin"),
        ("HP:0001945", 16, 21, "fever"),
        ("MONDO:1", 16, 21, "fever"),
    }
    # prefix filter: MONDO excluded
    _, annots2 = elastic.parse_annotated_text(markup, {"CHEBI", "HP"})
    assert {a["concept_id"] for a in annots2} == {"CHEBI:15365", "HP:0001945"}
    # allowable-id map filters within a prefix, leaves other prefixes alone
    _, annots3 = elastic.parse_annotated_text(
        markup, {"CHEBI", "HP", "MONDO"}, {"MONDO": {"MONDO:999"}}
    )
    assert {a["concept_id"] for a in annots3} == {"CHEBI:15365", "HP:0001945"}


def test_parse_annotated_text_decodes_encoded_parens():
    markup = "%28note%29 (aspirin)[CHEBI_15365&_CHEBI] works"
    text, annots = elastic.parse_annotated_text(markup, {"CHEBI"})
    assert text == "(note) aspirin works"
    assert annots[0]["start"] == 7 and annots[0]["end"] == 14


def test_filter_entity_annotations_requires_both_classes():
    fever = {"start": 0, "end": 5, "text": "fever", "concept_id": "HP:0001945"}
    asp = {"start": 10, "end": 17, "text": "aspirin", "concept_id": "CHEBI:15365"}
    protein = {"start": 0, "end": 7, "text": "protein", "concept_id": "CHEBI:36080"}
    assert elastic.filter_entity_annotations([fever, asp], ASSOC) == [fever, asp]
    # chemical side present only via an excluded id → sentence drops
    assert elastic.filter_entity_annotations([fever, protein], ASSOC) is None
    # single-entity sentence drops (testExcludeBasedOnEntityIdsOnlySingleEntity)
    assert elastic.filter_entity_annotations([asp], ASSOC) is None


class MockTransport:
    def __init__(self, pages):
        self.pages = pages
        self.calls = []
        self.query = None

    def search(self, index, query, size, scroll):
        self.calls.append(("search", index, size, scroll))
        self.query = query
        hits = self.pages[0] if self.pages else []
        return {"_scroll_id": "s0", "hits": {"hits": hits}}

    def scroll(self, scroll_id, scroll):
        self.calls.append(("scroll", scroll_id, scroll))
        i = int(scroll_id[1:]) + 1
        hits = self.pages[i] if i < len(self.pages) else []
        return {"_scroll_id": f"s{i}", "hits": {"hits": hits}}


def _hit(markup):
    return {"_source": {"annotatedText": markup}}


def test_scroll_paging_and_early_break():
    pages = [
        [_hit("(aspirin)[CHEBI_1&_CHEBI] vs (fever)[HP_1&_HP]")],
        [_hit("(ibuprofen)[CHEBI_2&_CHEBI] vs (pain)[HP_2&_HP]")],
        [_hit("(x)[CHEBI_3&_CHEBI] vs (y)[HP_3&_HP]")],
    ]
    t = MockTransport(pages)
    # max_return=2 → initial search + ONE scroll, page 3 never fetched
    out = elastic.search_sentences(t, "sentences", ASSOC, max_return=2)
    assert len(out) == 2
    assert [c[0] for c in t.calls] == ["search", "scroll"]
    # query sent to the index is the built boolean query for the assoc
    assert '"_CHEBI _DRUGBANK"' in t.query and '"_HP _MONDO"' in t.query
    # exhausting hits ends the loop without error
    t2 = MockTransport(pages)
    out2 = elastic.search_sentences(t2, "sentences", ASSOC, max_return=99)
    assert len(out2) == 3
    assert [c[0] for c in t2.calls] == ["search", "scroll", "scroll", "scroll"]


def test_search_filters_already_assigned_and_duplicates():
    markup = "(aspirin)[CHEBI_1&_CHEBI] vs (fever)[HP_1&_HP]"
    pages = [[_hit(markup), _hit(markup)]]  # duplicate in-page
    t = MockTransport(pages)
    out = elastic.search_sentences(t, "sentences", ASSOC, max_return=10)
    assert len(out) == 1
    already = {elastic.compute_sentence_identifier("aspirin vs fever")}
    t2 = MockTransport(pages)
    out2 = elastic.search_sentences(
        t2, "sentences", ASSOC, max_return=10, already_assigned_ids=already
    )
    assert out2 == []


def test_end_to_end_mock_es_to_brat(spark):
    """Mock-ES hits → selection → extracted rows → the brat batch writer:
    .ann/.txt page with correct spans, T numbering and DONE line."""
    pages = [
        [
            _hit("(aspirin)[CHEBI_1&_CHEBI] treats (fever)[HP_1&_HP]"),
            # survives parsing but dies in entity filtering (excluded id)
            _hit("(protein)[CHEBI_36080&_CHEBI] and (fever)[HP_1&_HP]"),
        ]
    ]
    t = MockTransport(pages)
    sentences = elastic.search_sentences(t, "sentences", ASSOC, max_return=10)
    assert len(sentences) == 1
    rows = elastic.extracted_sentence_rows(spark, sentences, ASSOC)
    out = relext.brat_annotation_batch(rows, ASSOC, batch_size=10).collect()
    txt = sorted((r.line_no, r.line) for r in out if r.kind == "txt")
    ann = sorted((r.line_no, r.line) for r in out if r.kind == "ann")
    assert txt[0][1] == "aspirin treats fever"
    assert txt[-1][1] == "DONE"
    assert ann[0][1] == "T1\tchemical 0 7\taspirin"
    assert ann[1][1] == "T2\tdisease 15 20\tfever"


def test_http_transport_request_shape():
    captured = {}

    class _Resp:
        def __enter__(self):
            return self

        def __exit__(self, *a):
            return False

        def read(self):
            return b'{"hits": {"hits": []}}'

    def opener(req):
        captured["url"] = req.full_url
        captured["headers"] = dict(req.header_items())
        captured["body"] = json.loads(req.data.decode())
        return _Resp()

    t = elastic.HttpTransport("https://es.example:9200", api_key="KEY", opener=opener)
    q = elastic.build_sentence_query([{"GO"}])
    t.search(index="sentences", query=q, size=10000, scroll="1m")
    assert captured["url"] == "https://es.example:9200/sentences/_search?scroll=1m"
    assert captured["headers"].get("Authorization") == "ApiKey KEY"
    assert captured["body"]["size"] == 10000
    assert "bool" in captured["body"]["query"]
    t.scroll(scroll_id="abc", scroll="1m")
    assert captured["url"] == "https://es.example:9200/_search/scroll"
    assert captured["body"] == {"scroll": "1m", "scroll_id": "abc"}


def test_catalog_sentence_ids(spark, tmp_path):
    (tmp_path / "batch1").mkdir()
    (tmp_path / "batch1" / "a.txt").write_text("sent one\nsent two\nDONE\n")
    (tmp_path / "b.txt").write_text("sent two\nsent three\nDONE\n")
    (tmp_path / "ignore.ann").write_text("sent four\n")
    got = {r.id for r in elastic.catalog_sentence_ids(spark, str(tmp_path)).collect()}
    expect = {
        elastic.compute_sentence_identifier(s)
        for s in ("sent one", "sent two", "sent three")
    }
    assert got == expect


def test_allowable_concept_ids_map(spark):
    idf = spark.createDataFrame(
        [
            ("CHEBI:1", "document", 5.0),
            ("CHEBI:2", "document", 0.5),
            ("CHEBI:3", "sentence", 9.0),   # wrong level
            ("MONDO:1", "document", 4.0),
            ("GO:1", "document", 3.0),
            ("GO:2", "document", 0.1),
            ("GO:9", "document", 8.0),      # not in the BP list
        ],
        "concept_id string, level string, idf double",
    )
    assoc = biolink.ASSOCIATIONS["biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation"]
    # subject thresholded by prefix+idf+level; object unfiltered (negative)
    m = elastic.allowable_concept_ids_map(idf, assoc, subject_idf_threshold=1.0)
    assert m == {"CHEBI": {"CHEBI:1"}}
    # GO-backed side restricts to the namespace list; negative threshold
    # keeps every listed id regardless of idf/level
    bp_assoc = biolink.ASSOCIATIONS["biolink:GeneToBiologicalProcessAssociation"]
    m2 = elastic.allowable_concept_ids_map(
        idf, bp_assoc, object_idf_threshold=-1.0, go_bp_ids={"GO:1", "GO:2"}
    )
    assert m2 == {"GO": {"GO:1", "GO:2"}}
    # ...and a positive threshold prunes within the list
    m3 = elastic.allowable_concept_ids_map(
        idf, bp_assoc, object_idf_threshold=1.0, go_bp_ids={"GO:1", "GO:2"}
    )
    assert m3 == {"GO": {"GO:1"}}


def test_allowable_map_rejects_go_go_pairing(spark):
    import pytest as _pytest

    idf = spark.createDataFrame([("GO:1", "document", 1.0)], "concept_id string, level string, idf double")
    assoc = biolink.BiolinkAssociation(
        "x", biolink.CELLULAR_COMPONENT, biolink.BIOLOGICAL_PROCESS, ("biolink:occurs_in",)
    )
    with _pytest.raises(ValueError):
        elastic.allowable_concept_ids_map(idf, assoc)


def test_create_brat_batch_end_to_end(spark):
    pages = [[_hit("(aspirin)[CHEBI_1&_CHEBI] treats (fever)[HP_1&_HP]")]]
    t = MockTransport(pages)
    out = elastic.create_brat_batch(
        spark, t, "sentences", ASSOC, batch_size=10
    ).collect()
    lines = {r.line for r in out}
    assert "aspirin treats fever" in lines and "DONE" in lines


def test_build_sentence_text_query():
    q = elastic.build_sentence_text_query("TRPM4 protects hearts")
    assert '"query": "TRPM4 protects hearts"' in q
    assert '"operator": "and"' in q
    json.loads(q)
