from __future__ import annotations

from translator_tm_provider_pipelines_spark.operators import dedup


def test_repeated_kgram_spans(spark):
    shared = "0123456789" * 4  # 40 shared chars
    docs = spark.createDataFrame(
        [
            (1, "AAAA" + shared + "BBBB"),
            (2, "CCCCCC" + shared + "DDDD"),
            (3, "totally unique text with no repeats anywhere at all ok"),
            (4, "xy" * 40),  # self-repetition within one document
        ],
        "doc_id int, text string",
    )
    out = dedup.repeated_kgram_spans(docs, k=10, stride=5)
    spans = {}
    for r in out.collect():
        spans.setdefault(r.doc_id, []).append((r.span_start, r.span_end))
    # the 40 shared chars sit at [4, 44) in doc 1 and [6, 46) in doc 2:
    # stride-5 windows inside them collide across docs (and "0123456789"
    # repeats internally), so both docs report one merged span covering
    # the shared region
    assert 1 in spans and 2 in spans
    (s1, e1), = spans[1]
    assert s1 <= 9 and e1 >= 39  # window resolution: within k of the edges
    assert 3 not in spans
    # doc 4 is one periodic string: every window repeats -> one full span
    (s4, e4), = spans[4]
    assert s4 == 0 and e4 == 80

    # a corpus with no cross- or self-repetition yields nothing
    clean = spark.createDataFrame(
        [(1, "abcdefghijklmnopqrstuvwxyz")], "doc_id int, text string"
    )
    assert dedup.repeated_kgram_spans(clean, k=10, stride=5).count() == 0

    # NOTE: with stride > 1 detection needs the two occurrences to share
    # window alignment mod stride; this fixture is caught because the
    # shared block is internally periodic (26-char period), so stride-10
    # windows in one doc collide with differently-aligned windows in the
    # other. See the operator docstring for the exact recall contract.
    long_shared = "qwertyuiopasdfghjklzxcvbnm" * 3
    pair = spark.createDataFrame(
        [(1, "PAD1" + long_shared), (2, long_shared + "PAD2")],
        "doc_id int, text string",
    )
    assert dedup.repeated_kgram_spans(pair, k=20, stride=10).count() >= 2


def test_repeated_kgram_spans_stride1_alignment_free(spark):
    """stride=1 restores the alignment-free guarantee: a repeat whose two
    occurrences sit at incommensurate offsets (4 vs 7, not congruent mod
    any stride>1 that divides neither) is missed at stride=5 but caught
    at stride=1."""
    shared = "The quick brown fox jumps over the lazy dog 0123456789"  # 54 aperiodic chars
    docs = spark.createDataFrame(
        [(1, "PAD_" + shared + "!X"), (2, "padpad0" + shared + "?Y")],
        "doc_id int, text string",
    )
    # offsets 4 and 7 differ mod 5 -> stride-5 windows never collide
    assert dedup.repeated_kgram_spans(docs, k=10, stride=5).count() == 0
    out = dedup.repeated_kgram_spans(docs, k=10, stride=1)
    spans = {r.doc_id: (r.span_start, r.span_end) for r in out.collect()}
    assert spans[1] == (4, 4 + len(shared)) and spans[2] == (7, 7 + len(shared))
