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

    # guarantee: any repeat of length >= 2k contains a marked window
    long_shared = "qwertyuiopasdfghjklzxcvbnm" * 3
    pair = spark.createDataFrame(
        [(1, "PAD1" + long_shared), (2, long_shared + "PAD2")],
        "doc_id int, text string",
    )
    assert dedup.repeated_kgram_spans(pair, k=20, stride=10).count() >= 2
