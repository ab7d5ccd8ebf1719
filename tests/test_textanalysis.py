from __future__ import annotations

from translator_tm_provider_pipelines_spark.operators import textanalysis as ta


def test_pii_redaction(spark):
    docs = spark.createDataFrame(
        [
            (1, "mail a.b+c@x-corp.io or Bob_99@sub.example.org today"),
            (2, "call 303-555-0147 from 10.1.2.3 or 192.168.0.1"),
            (3, "clean text, no identifiers here"),
            (4, "edge: 1234-555-0147 is not a phone, 1.2.3.4.5 leads with an ip"),
        ],
        "doc_id int, text string",
    )
    rows = {r.doc_id: r for r in ta.pii_redaction(docs).collect()}
    assert (rows[1].n_emails, rows[1].n_phones, rows[1].n_ips) == (2, 0, 0)
    assert rows[1].redacted_text == "mail <EMAIL> or <EMAIL> today"
    assert (rows[2].n_emails, rows[2].n_phones, rows[2].n_ips) == (0, 1, 2)
    assert rows[2].redacted_text == "call <PHONE> from <IP> or <IP>"
    assert rows[3].pii_free
    assert rows[3].redacted_text == "clean text, no identifiers here"
    # \b guards: 4-digit prefix breaks the phone match; the 5-octet string
    # still contains a valid leading IPv4 (same as Java regex semantics)
    assert rows[4].n_phones == 0 and rows[4].n_ips == 1
    assert not rows[4].pii_free


def test_benchmark_decontamination(spark):
    corpus = spark.createDataFrame(
        [
            (1, "the quick brown fox jumps over the lazy dog"),
            (2, "completely novel words appear in this sentence only"),
            (3, "too short"),  # below n -> zero n-grams, still reported
            (4, "quick brown fox jumps over and over again here"),
        ],
        "doc_id int, text string",
    )
    benchmark = spark.createDataFrame(
        [(100, "a benchmark holds the quick brown fox jumps over its fence")],
        "doc_id int, text string",
    )
    out = {
        r.doc_id: r
        for r in ta.benchmark_decontamination(corpus, benchmark, n=5).collect()
    }
    assert set(out) == {1, 2, 3, 4}
    # doc 1 shares 'the quick brown fox jumps' and 'quick brown fox jumps over'
    assert out[1].n_contaminated == 2 and out[1].contaminated
    assert out[1].n_ngrams == 5
    assert abs(out[1].contaminated_frac - 0.4) < 1e-9
    assert out[2].n_contaminated == 0 and not out[2].contaminated
    assert out[3].n_ngrams == 0 and out[3].n_contaminated == 0
    assert out[3].contaminated_frac == 0.0
    assert out[4].n_contaminated == 1  # only 'quick brown fox jumps over'

    # min_hits raises the drop threshold
    strict = {
        r.doc_id: r.contaminated
        for r in ta.benchmark_decontamination(
            corpus, benchmark, n=5, min_hits=2
        ).collect()
    }
    assert strict[1] and not strict[4]


def test_benchmark_decontamination_plan_broadcasts(spark):
    corpus = spark.createDataFrame(
        [(i, f"w{i} x y z a b c d e f") for i in range(20)],
        "doc_id int, text string",
    )
    benchmark = spark.createDataFrame([(99, "x y z a b c")], "doc_id int, text string")
    plan = (
        ta.benchmark_decontamination(corpus, benchmark, n=5)
        ._jdf.queryExecution()
        .executedPlan()
        .toString()
    )
    # the benchmark dim must broadcast; the corpus text must never sort-merge
    assert "BroadcastHashJoin" in plan
    assert "SortMergeJoin" not in plan


def test_c4_line_filters(spark):
    docs = spark.createDataFrame(
        [
            (1, 'a good long sentence here.\nshort.\nno punctuation line\nends with quote said "ok."'),
            (2, "fine first line stays here.\nbut lorem ipsum poisons the doc."),
            (3, "clean enough to keep entirely!\nand a second proper line too?"),
            (4, "function f() { return 1; }\nthe brace blocks this document."),
        ],
        "doc_id int, text string",
    )
    out = {r.doc_id: r for r in ta.c4_line_filters(docs).collect()}
    # line rules: terminal punctuation AND >= 3 words
    assert out[1].n_lines == 4 and out[1].n_kept_lines == 2
    assert out[1].clean_text == 'a good long sentence here.\nends with quote said "ok."'
    assert not out[1].doc_blocked
    # lorem ipsum blocks the whole document
    assert out[2].doc_blocked and out[2].clean_text == ""
    assert out[3].n_kept_lines == 2 and out[3].clean_text == docs.collect()[2].text
    # curly brace blocks code-ish docs
    assert out[4].doc_blocked and out[4].clean_text == ""


def test_tfidf_terms_and_topk(spark):
    import math

    docs = spark.createDataFrame(
        [
            (0, "apple banana apple"),
            (1, "apple banana cherry"),
            (2, "dog dog dog dog"),
        ],
        "doc_id int, text string",
    )
    w = {
        (r.doc_id, r.term): (r.tf, r.idf, r.weight)
        for r in ta.tfidf_terms(docs).collect()
    }
    # N=3; df(apple)=2 -> idf = ln(4/3)+1; tf(doc0, apple)=2
    idf_apple = math.log(4 / 3) + 1
    assert w[(0, "apple")][0] == 2
    assert abs(w[(0, "apple")][1] - round(idf_apple, 8)) < 1e-8
    assert abs(w[(0, "apple")][2] - round(2 * idf_apple, 8)) < 1e-8
    # df(dog)=1 -> rarer term, higher idf
    assert w[(2, "dog")][1] > w[(0, "apple")][1]

    top = ta.tfidf_topk_similar(docs, query_doc_id=0, k=5).collect()
    # doc 1 shares apple+banana with doc 0; doc 2 shares nothing
    assert [r.doc_id for r in top] == [1]
    assert 0 < top[0].cosine < 1


def test_chunk_documents(spark):
    import pytest as _pytest

    docs = spark.createDataFrame(
        [
            (1, "a b c d e f g h i j"),  # 10 words
            (2, "only three words"),
            (3, ""),  # empty: no chunks
        ],
        "doc_id int, text string",
    )
    out = {}
    for r in ta.chunk_documents(docs, chunk_tokens=4, overlap=1).collect():
        out.setdefault(r.doc_id, []).append(r)
    # doc 1: step 3 -> starts 0,3,6 cover 0..10 (ceil((10-4)/3)+1 = 3 chunks)
    c1 = sorted(out[1], key=lambda r: r.chunk_idx)
    assert [(r.start_token, r.end_token, r.chunk_text) for r in c1] == [
        (0, 4, "a b c d"),
        (3, 7, "d e f g"),
        (6, 10, "g h i j"),
    ]
    # overlap: each chunk repeats the last token of the previous one
    assert c1[0].chunk_text.split()[-1] == c1[1].chunk_text.split()[0]
    # short doc: one chunk, full text
    assert len(out[2]) == 1 and out[2][0].chunk_text == "only three words"
    assert out[2][0].n_chunk_tokens == 3
    # empty doc emits nothing
    assert 3 not in out
    with _pytest.raises(ValueError):
        ta.chunk_documents(docs, chunk_tokens=4, overlap=4)


def test_corpus_report(spark):
    docs = spark.createDataFrame(
        [
            (1, "web", "the quick brown fox and the lazy dog in a field of dreams"),
            (2, "web", "the quick brown fox and the lazy dog in a field of dreams"),  # dup
            (3, "web", "der hund und die katze und das haus und nicht mehr"),
            (4, "curated", "a tale of two cities and the best of times in the spring"),
        ],
        "doc_id int, source string, text string",
    )
    out = {r.stratum: r for r in ta.corpus_report(docs).collect()}
    assert out["web"].n_docs == 3 and out["curated"].n_docs == 1
    assert out["web"].total_tokens == 13 + 13 + 11
    assert abs(out["web"].dup_share - 1 / 3) < 1e-8  # doc 2 repeats doc 1
    assert abs(out["web"].en_share - 2 / 3) < 1e-8  # doc 3 is German
    assert out["curated"].dup_share == 0.0 and out["curated"].en_share == 1.0
    assert 0 < out["curated"].mean_quality <= 1


def test_tfidf_topk_similar_query_errors(spark):
    import pytest

    docs = spark.createDataFrame(
        [(0, "alpha beta gamma"), (1, "alpha beta delta")], "doc_id int, text string"
    )
    with pytest.raises(ValueError, match="not found"):
        ta.tfidf_topk_similar(docs, query_doc_id=99, k=3)


# ---------------------------------------------------------------------------
# CCNet-style unigram-LM quality
# ---------------------------------------------------------------------------


def test_unigram_logprob_ranks_fluent_over_gibberish(spark):
    """Docs made of corpus-frequent words score higher than a doc of
    hapax gibberish under the self-estimated unigram LM."""
    common = "the model trains on data and the data flows through the model"
    rows = [(i, common) for i in range(8)] + [
        (100, "zxqv wvvk pqzzt mnnbx qqrst zzl kkjh wwwq"),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string")
    w = {r.doc_id: r.mean_logprob for r in ta.unigram_logprob(docs).collect()}
    assert all(w[i] > w[100] for i in range(8))


def test_unigram_logprob_oov_with_external_reference(spark):
    """With an external reference LM, out-of-vocabulary tokens take the
    smoothed zero-count probability instead of being skipped."""
    import math

    ref = spark.createDataFrame([(1, "alpha beta gamma")], "doc_id int, text string")
    docs = spark.createDataFrame([(2, "alpha unseen")], "doc_id int, text string")
    r = ta.unigram_logprob(docs, reference=ref).first()
    # ref: 3 tokens, vocab 3, alpha 1 -> p(alpha)=(1+1)/6, p(unseen)=1/6
    expect = (math.log(2 / 6) + math.log(1 / 6)) / 2
    assert abs(r.mean_logprob - round(expect, 6)) < 1e-9
    assert r.n_tokens == 2


def test_perplexity_buckets_split_terciles(spark):
    docs = spark.read.parquet("/root/testdata/sf0.001/documents.parquet")
    out = ta.perplexity_buckets(docs)
    counts = {r.bucket: r.n for r in out.groupBy("bucket").agg(
        __import__("pyspark.sql.functions", fromlist=["count"]).count("*").alias("n")
    ).collect()}
    n = docs.count()
    # terciles within one row of each other
    assert abs(counts["head"] - n / 3) <= 2
    assert abs(counts["middle"] - n / 3) <= 2
    assert abs(counts["tail"] - n / 3) <= 2
    # token-less doc lands in tail
    extra = docs.limit(0).sparkSession.createDataFrame(
        [(999999, "???")], "doc_id long, text string"
    )
    docs2 = docs.select("doc_id", "text").unionByName(extra)
    b = {r.doc_id: r.bucket for r in ta.perplexity_buckets(docs2).collect()}
    assert b[999999] == "tail"
