"""Pluggable sentence-segmentation backends (X1): adapter contract,
native-path equivalence, and measured divergence between the rule-based
and abbreviation-aware (model-class) backends."""

from __future__ import annotations

from translator_tm_provider_pipelines_spark.operators import sentences as sentops

DOCS = [
    ("d1", "One sentence. Two sentence.\nThird line."),
    ("d2", "Chronic exposure, e.g. to ethanol, causes damage. See Fig. 3 for "
           "details. Values were 3.5 and 4.2 in each arm."),
    ("d3", "Dr. Smith measured J. Doe's samples. The mean was 7.1."),
    ("d4", "No trailing punctuation at all"),
    ("d5", "  Leading spaces. And trailing.   "),
]


def _native(spark, docs):
    return {
        (r.doc_id, r.start, r.end)
        for r in sentops.segment_sentences(docs).collect()
    }


def test_adapter_reproduces_native_path(spark):
    """The regex backend routed through the mapInPandas adapter returns
    exactly the native column-expression spans — the adapter adds no
    divergence of its own."""
    docs = spark.createDataFrame(DOCS, "doc_id string, content string")
    native = _native(spark, docs)
    adapted = {
        (r.doc_id, r.start, r.end)
        for r in sentops.segment_sentences_with_backend(
            docs, sentops.regex_segmenter
        ).collect()
    }
    assert adapted == native


def test_adapter_contract(spark):
    """Backends return in-order, in-bounds, non-overlapping spans; the
    engine derives sentence text from spans (never trusts backend text)."""
    docs = spark.createDataFrame(DOCS, "doc_id string, content string")
    texts = dict(DOCS)
    for name, backend in sentops.SEGMENTER_BACKENDS.items():
        out = sentops.segment_sentences_with_backend(docs, backend).collect()
        by_doc: dict[str, list] = {}
        for r in sorted(out, key=lambda r: (r.doc_id, r.sent_idx)):
            by_doc.setdefault(r.doc_id, []).append(r)
        for did, rows in by_doc.items():
            prev_end = -1
            for i, r in enumerate(rows):
                assert r.sent_idx == i, name
                assert 0 <= r.start < r.end <= len(texts[did]), name
                assert r.start >= prev_end, f"{name}: overlapping spans"
                assert r.sentence == texts[did][r.start : r.end], name
                prev_end = r.end


def test_abbrev_backend_diverges_where_expected(spark):
    """The abbreviation-aware backend merges exactly the false boundaries
    (e.g., Fig., Dr., single initials); agreement elsewhere is total."""
    docs = spark.createDataFrame(DOCS, "doc_id string, content string")
    ab = {
        (r.doc_id, r.start, r.end)
        for r in sentops.segment_sentences_with_backend(
            docs, sentops.abbrev_aware_segmenter
        ).collect()
    }
    # d2: 'e.g.' and 'Fig.' boundaries merge -> whole doc is 3 sentences
    d2 = sorted((s, e) for d, s, e in ab if d == "d2")
    assert len(d2) == 3
    sents_d2 = [dict(DOCS)["d2"][s:e] for s, e in d2]
    assert sents_d2[0].startswith("Chronic") and sents_d2[0].endswith("damage.")
    assert sents_d2[1] == "See Fig. 3 for details."
    # d3: 'Dr.' and 'J.' merge -> 2 sentences
    d3 = sorted((s, e) for d, s, e in ab if d == "d3")
    assert len(d3) == 2
    # d1/d4/d5 have no abbreviation boundaries: identical to native
    native = _native(spark, docs)
    for did in ("d1", "d4", "d5"):
        assert {t for t in ab if t[0] == did} == {t for t in native if t[0] == did}


def measure_agreement(spark, docs):
    """Span-level precision/recall/F1 of abbrev_aware against native_regex
    (exact span match), used to produce the COVERAGE.md table."""
    a = _native(spark, docs)
    b = {
        (r.doc_id, r.start, r.end)
        for r in sentops.segment_sentences_with_backend(
            docs, sentops.abbrev_aware_segmenter
        ).collect()
    }
    inter = len(a & b)
    return {
        "native_spans": len(a),
        "abbrev_spans": len(b),
        "exact_matches": inter,
        "precision": inter / len(b) if b else 1.0,
        "recall": inter / len(a) if a else 1.0,
    }


def test_pysbd_adapter_logic_via_api_stand_in(spark, monkeypatch):
    """pysbd cannot be installed in this environment (installs are
    prohibited), so _pysbd_segmenter's adapter logic — char_span
    consumption, leading/trailing whitespace trimming, empty-segment
    filtering — is exercised against a spec-faithful stand-in of the
    pysbd.Segmenter(char_span=True) API (TextSpan objects with
    .sent/.start/.end where .sent INCLUDES surrounding whitespace, as
    pysbd emits). The stand-in is registered in sys.modules only for this
    test; when real pysbd is present it auto-registers in
    SEGMENTER_BACKENDS and the same assertions apply."""
    import sys
    import types

    class _TextSpan:
        def __init__(self, sent, start, end):
            self.sent, self.start, self.end = sent, start, end

    class _Segmenter:
        def __init__(self, language="en", clean=False, char_span=False):
            assert char_span and not clean

        def segment(self, content):
            # naive split at '. ' keeping the trailing space INSIDE the
            # span (pysbd's char_span behavior) + an all-space segment
            spans, start = [], 0
            for i, ch in enumerate(content):
                if ch == "." and (i + 1 == len(content) or content[i + 1] == " "):
                    end = min(i + 2, len(content))
                    spans.append(_TextSpan(content[start:end], start, end))
                    start = end
            if start < len(content):
                spans.append(_TextSpan(content[start:], start, len(content)))
            return spans

    fake = types.ModuleType("pysbd")
    fake.Segmenter = _Segmenter
    monkeypatch.setitem(sys.modules, "pysbd", fake)

    backend = sentops._pysbd_segmenter()
    docs = spark.createDataFrame(
        [("p1", "First one. Second here.   "), ("p2", "   "), ("p3", "Tail")],
        "doc_id string, content string",
    )
    got = {
        (r.doc_id, r.start, r.end, r.sentence)
        for r in sentops.segment_sentences_with_backend(docs, backend).collect()
    }
    # whitespace trimmed OFF the spans, all-space segments dropped
    assert got == {
        ("p1", 0, 10, "First one."),
        ("p1", 11, 23, "Second here."),
        ("p3", 0, 4, "Tail"),
    }


def test_custom_backend_divergence_harness(spark):
    """Third-party backend injection: register a deliberately coarser
    segmenter (paragraph-level) into SEGMENTER_BACKENDS and run the same
    precision/recall divergence measurement COVERAGE.md records for the
    built-ins — the harness is backend-agnostic."""
    def paragraph_segmenter(content):
        spans, start = [], 0
        for i, ch in enumerate(content):
            if ch == "\n":
                if content[start:i].strip():
                    spans.append((start, i))
                start = i + 1
        if content[start:].strip():
            t = content[start:]
            lead = len(t) - len(t.lstrip())
            trail = len(t) - len(t.rstrip())
            spans.append((start + lead, len(content) - trail))
        return spans

    sentops.SEGMENTER_BACKENDS["paragraph"] = paragraph_segmenter
    try:
        docs = spark.createDataFrame(DOCS, "doc_id string, content string")
        native = _native(spark, docs)
        alt = {
            (r.doc_id, r.start, r.end)
            for r in sentops.segment_sentences_with_backend(
                docs, sentops.SEGMENTER_BACKENDS["paragraph"]
            ).collect()
        }
        exact = len(native & alt)
        precision = exact / len(alt)
        recall = exact / len(native)
        # multi-sentence lines diverge, single-sentence lines agree
        assert 0 < precision < 1 and 0 < recall < 1
        assert ("d1", 28, 39) in (native & alt)  # 'Third line.' agrees
    finally:
        sentops.SEGMENTER_BACKENDS.pop("paragraph", None)
