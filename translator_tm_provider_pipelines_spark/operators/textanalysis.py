"""Text analysis operators (LLM-data-pipeline extension): token counting,
quality scoring, language identification, document fingerprinting.

All deterministic, all native column expressions (no UDFs): the hot path of
a 100 TB text pipeline must stay inside whole-stage codegen.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.staging import stage

WORD_RE = r"([a-z0-9]+)"
# BPE-ish subword pieces: runs of letters, runs of digits, single other chars
BPE_ISH_RE = r"([A-Za-z]+|[0-9]+|[^A-Za-z0-9\s])"

EN_STOPWORDS = ("the", "a", "of", "and", "to", "in", "is")

# tiny per-language marker profiles for the n-gram/stopword language-ID
# heuristic (extend freely; scoring is data-driven)
DEFAULT_LANG_PROFILES: dict[str, tuple[str, ...]] = {
    "en": ("the", "and", "of", "to", "a"),
    "de": ("der", "die", "das", "und", "nicht"),
    "es": ("el", "la", "los", "que", "y"),
    "fr": ("le", "la", "les", "et", "que"),
}


def _words(text_col: Column) -> Column:
    return F.regexp_extract_all(F.lower(text_col), F.lit(WORD_RE), 1)


def _count_words(text_col: Column, words: tuple[str, ...]) -> Column:
    pat = "\\b(" + "|".join(words) + ")\\b"
    return F.size(F.regexp_extract_all(F.lower(text_col), F.lit(f"({pat})"), 1))


def token_stats(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document token statistics: whitespace-word and BPE-ish subword
    counts, type count, char length, stopword count. Foundation for quality
    scoring and corpus accounting."""
    text = F.col(text_col)
    words = _words(text)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        F.length(text).cast("long").alias("n_chars"),
        F.size(words).cast("long").alias("n_tokens"),
        F.size(F.array_distinct(words)).cast("long").alias("n_types"),
        F.size(F.regexp_extract_all(text, F.lit(BPE_ISH_RE), 1)).cast("long").alias("n_subwords"),
        _count_words(text, EN_STOPWORDS).cast("long").alias("n_stopwords"),
    )


def _quality_blend(nt: Column, n_types: Column, n_stopwords: Column):
    """(ttr, stop_ratio, score) columns from raw counts — the single
    source of the blend formula, shared by :func:`quality_scores` and the
    fused curation pass."""
    nt = nt.cast("double")
    ttr = F.when(nt > 0, n_types / nt).otherwise(F.lit(0.0))
    stop_ratio = F.when(nt > 0, n_stopwords / nt).otherwise(F.lit(0.0))
    len_sat = F.least(nt / F.lit(100.0), F.lit(1.0))
    score = F.lit(0.4) * len_sat + F.lit(0.3) * ttr + F.lit(0.3) * F.least(
        stop_ratio * 5.0, F.lit(1.0)
    )
    return ttr, stop_ratio, score


def quality_scores(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Heuristic quality score in [0,1]: blend of length saturation,
    type/token ratio, and stopword presence — the standard cheap pre-filter
    shape for web/corpus text (cf. C4/Gopher rules). Deterministic column
    arithmetic; weights documented in the expression."""
    stats = token_stats(docs, text_col=text_col, id_col=id_col)
    ttr, stop_ratio, score = _quality_blend(
        F.col("n_tokens"), F.col("n_types"), F.col("n_stopwords")
    )
    return stats.select(
        "doc_id",
        "n_tokens",
        F.round(ttr, 8).alias("type_token_ratio"),
        F.round(stop_ratio, 8).alias("stopword_ratio"),
        F.round(score, 8).alias("quality_score"),
    )


def language_id(
    docs: DataFrame,
    profiles: dict[str, tuple[str, ...]] | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Stopword-profile language ID: score = marker-word hits per language;
    prediction = argmax with lexicographic tie-break (deterministic). A
    'und' (undetermined) prediction is emitted when no profile scores."""
    profiles = profiles or DEFAULT_LANG_PROFILES
    text = F.col(text_col)
    # scanning once for all profiles instead of len(profiles) times is
    # ~2.6x at sf0.1 and the gap widens with more profiles
    matches = lang_marker_matches(text, profiles)
    staged = docs.select(F.col(id_col).alias("doc_id"), matches.alias("__m"))
    best_lang, best_score = _lang_argmax(F.col("__m"), profiles)
    return staged.select(
        "doc_id",
        best_lang.alias("pred_lang"),
        best_score.cast("long").alias("lang_score"),
    )


def lang_marker_matches(text: Column, profiles: dict[str, tuple[str, ...]]) -> Column:
    """ONE full-text regex scan over the union of all marker words (the
    text is the 100 TB side; the marker sets are tiny) — stage this as
    its own projection, then score per profile with array ops."""
    import re as _re

    union = sorted({w for ws in profiles.values() for w in ws})
    pat = r"\b(" + "|".join(_re.escape(w) for w in union) + r")\b"
    return F.regexp_extract_all(F.lower(text), F.lit(f"({pat})"), 1)


def _lang_argmax(matches: Column, profiles: dict[str, tuple[str, ...]]):
    """(pred_lang, best_score) from a staged marker-match array — the
    single source of the argmax + lexicographic tie-break, shared by
    :func:`language_id` and the fused curation pass."""
    scored = F.array(
        *[
            F.struct(
                F.size(F.filter(matches, lambda w: w.isin(*words))).alias("score"),
                F.lit(lang).alias("lang"),
            )
            for lang, words in sorted(profiles.items())
        ]
    )
    # array_max on struct(score, lang) orders by score then lang; to make
    # ties deterministic toward the *lexicographically smallest* lang we
    # invert: take max score, then min lang among maxima.
    best_score = F.array_max(F.transform(scored, lambda s: s["score"]))
    best_lang = F.array_min(F.filter(scored, lambda s: s["score"] == best_score))[
        "lang"
    ]
    return (
        F.when(best_score > 0, best_lang).otherwise(F.lit("und")),
        best_score,
    )


def doc_fingerprints(
    docs: DataFrame, k: int = 3, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Winnowing-style fingerprint: the minimum 31-bit affine shingle hash
    (a 1-permutation MinHash). Equal fingerprints ⇒ shared rarest shingle
    — a cheap clustering key for near-dup triage.

    Zero-shuffle AND zero shingle strings: runs on
    :func:`~.dedup.shingle_hash_frame` (one md5 per word), so min +
    distinct-count are per-row array expressions — ~12× cheaper than
    hashing every shingle string (measured at sf0.1). ``n_shingles``
    counts distinct hashes (31-bit collisions are ~n²/2³² per doc)."""
    from .dedup import shingle_hash_frame

    d = shingle_hash_frame(docs, k=k, text_col=text_col, id_col=id_col)
    return d.select(
        "doc_id",
        F.array_min("shv").alias("fingerprint"),
        F.size(F.array_distinct("shv")).cast("bigint").alias("n_shingles"),
    )


def repetition_metrics(
    docs: DataFrame,
    text_col: str = "text",
    id_col: str = "doc_id",
    ngram: int = 3,
) -> DataFrame:
    """Gopher-style repetition signals per document (Rae et al. 2021 §A1.1
    quality filters) — the standard pre-training repetition screens,
    entirely as per-row array expressions (no shuffle, no UDF; per-doc
    cost is O(words²) on the bigram count, bounded by document length):

    - ``dup_line_frac``: 1 − distinct lines / lines — fraction of line
      occurrences that repeat an earlier line.
    - ``dup_line_char_frac``: characters inside those repeated line
      occurrences / characters in all lines.
    - ``top_bigram_char_frac``: characters covered by occurrences of the
      single most frequent word bigram / all word characters
      (lexicographically-smallest bigram breaks count ties).
    - ``dup_ngram_frac``: 1 − distinct word ``ngram``-grams / ``ngram``-grams.

    Documents exceeding typical thresholds (e.g. dup_line_frac > 0.3,
    top_bigram_char_frac > 0.18) are repetition-dominated and usually
    dropped from training corpora."""
    text = F.col(text_col)
    # stage the arrays as their own projections: every later lambda
    # references a COLUMN, not the construction expression — inlining the
    # bigram build into later lambdas re-evaluates it per element
    base = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(text, "\n").alias("__lines"),
        _words(text).alias("__words"),
    )
    base = base.select(
        "doc_id",
        "__lines",
        "__words",
        _ngrams(F.col("__words"), 2).alias("__bigrams"),
        _ngrams(F.col("__words"), ngram).alias("__ngrams"),
    )
    # argmax bigram count: sort the bigrams, then ONE linear run-length
    # pass — O(B log B) per document instead of the nested count-each
    # filter's O(B²) interpreted work (measured 2.4× on the whole query at
    # sf1.0, and it's the asymptotic guard for long documents). Only a
    # strictly-greater run replaces the best, so the FIRST maximal run in
    # ascending order wins = the lexicographically-smallest bigram among
    # count ties, the same tie-break as before.
    run_step = lambda acc, x: F.struct(  # noqa: E731
        x.alias("prev"),
        F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)).alias("run"),
        F.when(
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            > acc["best_cnt"],
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1)),
        )
        .otherwise(acc["best_cnt"])
        .alias("best_cnt"),
        F.when(
            F.when(x == acc["prev"], acc["run"] + 1).otherwise(F.lit(1))
            > acc["best_cnt"],
            x,
        )
        .otherwise(acc["best_val"])
        .alias("best_val"),
    )
    best = F.aggregate(
        F.array_sort("__bigrams"),
        F.struct(
            F.lit("").alias("prev"),
            F.lit(0).alias("run"),
            F.lit(0).alias("best_cnt"),
            F.lit(None).cast("string").alias("best_val"),
        ),
        run_step,
    )
    base = base.select(
        "doc_id",
        "__lines",
        "__words",
        "__ngrams",
        best["best_cnt"].alias("__top_count"),
        best["best_val"].alias("__top_bigram"),
    )

    lines, words, ngrams = F.col("__lines"), F.col("__words"), F.col("__ngrams")
    n_lines = F.size(lines)
    n_dist_lines = F.size(F.array_distinct(lines))
    chars = lambda arr: F.aggregate(  # noqa: E731
        F.transform(arr, F.length), F.lit(0), lambda a, x: a + x
    )
    top_bigram_chars = F.col("__top_count") * (F.length("__top_bigram") - 1)

    frac = lambda num, den: F.round(  # noqa: E731
        F.when(den > 0, num.cast("double") / den).otherwise(F.lit(0.0)), 8
    )
    return base.select(
        "doc_id",
        frac(n_lines - n_dist_lines, n_lines).alias("dup_line_frac"),
        frac(chars(lines) - chars(F.array_distinct(lines)), chars(lines)).alias(
            "dup_line_char_frac"
        ),
        frac(top_bigram_chars, chars(words)).alias("top_bigram_char_frac"),
        frac(F.size(ngrams) - F.size(F.array_distinct(ngrams)), F.size(ngrams)).alias(
            "dup_ngram_frac"
        ),
    )


def _ngrams(words: Column, n: int) -> Column:
    """Space-joined word n-grams (empty below n words) — same guard as
    dedup.shingle_strings."""
    idx = F.when(
        F.size(words) >= n, F.sequence(F.lit(1), F.size(words) - F.lit(n - 1))
    ).otherwise(F.array().cast("array<int>"))
    return F.transform(
        idx, lambda i: F.concat_ws(" ", *[F.element_at(words, i + j) for j in range(n)])
    )


# PII patterns chosen to parse identically under Java regex (Spark) and
# RE2 (DuckDB oracle): no lookaround, no backreferences. The phone shape
# is the NANP dashed form; broaden per-deployment as needed.
PII_EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
PII_PHONE_RE = r"\b\d{3}-\d{3}-\d{4}\b"
PII_IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"


def pii_redaction(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Per-document PII scrub (LLM-data-pipeline extension): counts of
    email / dashed-phone / IPv4 literals plus the text with each match
    replaced by a typed placeholder — the standard C4-style pre-training
    hygiene pass.

    Counts are taken on the ORIGINAL text (each pattern independently);
    redaction applies email → phone → IPv4 in that order (the shapes are
    mutually exclusive, so order only matters for pathological inputs).
    Pure ``regexp_replace``/``regexp_extract_all`` column expressions —
    zero shuffle, whole-stage codegen, linear in corpus bytes."""
    text = F.col(text_col)
    n_of = lambda pat: F.size(  # noqa: E731
        F.regexp_extract_all(text, F.lit(f"({pat})"), 1)
    ).cast("long")
    redacted = F.regexp_replace(
        F.regexp_replace(
            F.regexp_replace(text, PII_EMAIL_RE, "<EMAIL>"),
            PII_PHONE_RE,
            "<PHONE>",
        ),
        PII_IPV4_RE,
        "<IP>",
    )
    n_email, n_phone, n_ip = n_of(PII_EMAIL_RE), n_of(PII_PHONE_RE), n_of(PII_IPV4_RE)
    return docs.select(
        F.col(id_col).alias("doc_id"),
        n_email.alias("n_emails"),
        n_phone.alias("n_phones"),
        n_ip.alias("n_ips"),
        (n_email + n_phone + n_ip == 0).alias("pii_free"),
        redacted.alias("redacted_text"),
    )


def benchmark_decontamination(
    corpus: DataFrame,
    benchmark: DataFrame,
    n: int = 8,
    min_hits: int = 1,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Benchmark decontamination (LLM-data-pipeline extension): for every
    corpus document, how many of its DISTINCT word ``n``-grams appear
    anywhere in the benchmark/eval set, the contaminated fraction, and a
    drop flag at ``min_hits`` — the n-gram-overlap rule used to keep eval
    data out of training corpora (GPT-3 §C / PaLM-style, typically n=8..13).

    Scale shape: the benchmark side (eval sets — small by construction)
    is reduced to a distinct n-gram dimension and BROADCAST; the corpus
    side never shuffles its text. Per-doc n-grams explode in place
    (explode preserves partitioning, so the doc_id hash-aggregate's
    partial combine emits ONE row per doc per partition) — the only
    exchange carries one row per corpus document."""
    text = F.col(text_col)
    # stage the word array as its OWN projection before n-gram assembly:
    # _ngrams references its input 5+ times per position, and inlining
    # the regexp_extract_all would re-run the full-text scan for every
    # element_at (same trap repetition_metrics documents) — measured 17×
    # on this query at sf0.1 (16.1 s → 0.9 s)
    per_doc = (
        corpus.select(F.col(id_col).alias("doc_id"), _words(text).alias("__w"))
        .select("doc_id", F.array_distinct(_ngrams(F.col("__w"), n)).alias("__g"))
        .select("doc_id", F.size("__g").cast("long").alias("n_ngrams"), "__g")
    )
    bench = (
        benchmark.select(_words(text).alias("__w"))
        .select(F.explode(F.array_distinct(_ngrams(F.col("__w"), n))).alias("__gram"))
        .distinct()
        .withColumn("__hit", F.lit(1))
    )
    exploded = per_doc.select(
        "doc_id", "n_ngrams", F.explode_outer("__g").alias("__gram")
    )
    agg = (
        exploded.join(F.broadcast(bench), "__gram", "left")
        .groupBy("doc_id")
        .agg(
            F.first("n_ngrams").alias("n_ngrams"),
            F.count("__hit").alias("n_contaminated"),
        )
    )
    frac = F.when(
        F.col("n_ngrams") > 0, F.col("n_contaminated") / F.col("n_ngrams")
    ).otherwise(F.lit(0.0))
    return agg.select(
        "doc_id",
        "n_ngrams",
        "n_contaminated",
        F.round(frac, 8).alias("contaminated_frac"),
        (F.col("n_contaminated") >= min_hits).alias("contaminated"),
    )


def c4_line_filters(
    docs: DataFrame,
    min_line_words: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """C4-style line-level cleaning (Raffel et al. 2020 §2.2): keep only
    lines that end in terminal punctuation (. ! ? ") and carry at least
    ``min_line_words`` words; flag-and-drop whole documents containing
    "lorem ipsum" or a curly brace (code/boilerplate tell). Emits the
    cleaned text plus the per-document accounting a curation report
    needs. Pure per-row array expressions — zero shuffle, one scan."""
    text = F.col(text_col)
    # STAGE the line array, the kept-line array and the block flag as
    # bound attributes (r12): each is referenced twice downstream
    # (n_lines/kept, n_kept_lines/clean_text, doc_blocked/clean_text) and
    # inlined they re-run the split + per-line regex chain once PER
    # REFERENCE (the _dsir_features re-inline trap; the kept filter is
    # two regexes per line). CollapseProject keeps non-cheap
    # multiply-referenced aliases staged, so the regex pass runs once.
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.split(text, "\n").alias("__lines"),
        (F.lower(text).contains("lorem ipsum") | text.contains("{")).alias(
            "doc_blocked"
        ),
    ).select(
        "doc_id",
        "__lines",
        "doc_blocked",
        F.filter(
            F.col("__lines"),
            lambda ln: F.trim(ln).rlike(r'[.!?"]$')
            & (
                F.size(F.regexp_extract_all(F.lower(ln), F.lit(WORD_RE), 1))
                >= min_line_words
            ),
        ).alias("__kept"),
    )
    return staged.select(
        "doc_id",
        F.size("__lines").cast("long").alias("n_lines"),
        F.size("__kept").cast("long").alias("n_kept_lines"),
        "doc_blocked",
        F.when(F.col("doc_blocked"), F.lit(""))
        .otherwise(F.concat_ws("\n", F.col("__kept")))
        .alias("clean_text"),
    )


def tfidf_terms(
    docs: DataFrame, text_col: str = "text", id_col: str = "doc_id"
) -> DataFrame:
    """Sparse TF-IDF document vectors as (doc_id, term, tf, idf, weight)
    rows — the classic IR weighting (smoothed idf
    ``ln((N+1)/(df+1)) + 1``, the scikit-learn convention). Two keyed
    shuffles, both map-side combinable: per-(doc, term) counts, then the
    term document-frequency dimension, which is vocabulary-sized and
    BROADCAST back onto the term rows."""
    text = F.col(text_col)
    terms = docs.select(
        F.col(id_col).alias("doc_id"), F.explode(_words(text)).alias("term")
    )
    tf = terms.groupBy("doc_id", "term").agg(F.count("*").cast("long").alias("tf"))
    # corpus size as a one-row broadcast instead of a docs.count() driver
    # action — the action was a whole extra pass over the corpus per call
    # (r12, guide §1.2); (N+1)/(df+1) sees the identical double either way
    n_docs = F.broadcast(docs.agg(F.count(F.lit(1)).alias("__n_docs")))
    df = tf.groupBy("term").agg(F.count("*").cast("long").alias("df"))
    idf = F.log((F.col("__n_docs") + 1).cast("double") / (F.col("df") + 1)) + 1.0
    return tf.join(F.broadcast(df), "term").crossJoin(n_docs).select(
        "doc_id",
        "term",
        "tf",
        F.round(idf, 8).alias("idf"),
        F.round(F.col("tf") * idf, 8).alias("weight"),
    )


def tfidf_topk_similar(
    docs: DataFrame,
    query_doc_id,
    k: int = 10,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Top-``k`` documents by TF-IDF cosine against one query document
    (excluded from its own results): the query's sparse vector collects
    to a broadcast dimension (bounded by one document's vocabulary), so
    scoring is a broadcast join on ``term`` + one doc-keyed aggregate —
    the corpus side never joins itself. Rounded score + id ordering keeps
    ranking engine-stable."""
    w = tfidf_terms(docs, text_col=text_col, id_col=id_col)
    qvec = w.where(F.col("doc_id") == query_doc_id).select(
        "term", F.col("weight").alias("qw")
    )
    norms = w.groupBy("doc_id").agg(
        F.sqrt(F.sum(F.col("weight") * F.col("weight"))).alias("norm")
    )
    # cheap pushdown existence probe (r12, guide §1.2): the old qnorm
    # collect evaluated the WHOLE tf-idf tower as an extra driver pass;
    # "present with extractable words" needs only the query doc's row
    text = F.col(text_col)
    present = not (
        docs.where(F.col(id_col) == query_doc_id)
        .where(F.size(_words(text)) > 0)
        .limit(1)
        .isEmpty()
    )
    if not present:
        raise ValueError(
            f"query_doc_id {query_doc_id!r} not found in the corpus (or has no "
            "extractable words)"
        )
    # the query norm rides the plan as a one-row broadcast; it cannot be
    # zero (smoothed idf = ln((N+1)/(df+1)) + 1 >= 1 for df <= N), and the
    # in-plan guard keeps the old contract if the weighting ever changes
    qn = norms.where(F.col("doc_id") == query_doc_id).select(
        F.when(
            F.col("norm") == 0.0,
            F.raise_error(
                F.lit(
                    f"query_doc_id {query_doc_id!r} has a zero TF-IDF vector "
                    "(every term appears in all documents); cosine similarity "
                    "is undefined"
                )
            ),
        ).otherwise(F.col("norm")).alias("__qnorm")
    )
    dots = (
        w.where(F.col("doc_id") != query_doc_id)
        .join(F.broadcast(qvec), "term")
        .groupBy("doc_id")
        .agg(F.sum(F.col("weight") * F.col("qw")).alias("dot"))
    )
    scored = dots.join(norms, "doc_id").crossJoin(F.broadcast(qn)).select(
        "doc_id",
        F.round(F.col("dot") / (F.col("norm") * F.col("__qnorm")), 6).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), "doc_id").limit(k)


def chunk_documents(
    docs: DataFrame,
    chunk_tokens: int = 256,
    overlap: int = 32,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Overlapping fixed-token chunking — the standard embedding/RAG prep
    step: the word stream splits into windows of ``chunk_tokens`` words
    advancing by ``chunk_tokens - overlap``; the last window is shorter
    and always reaches the end of the document. Chunk text is the
    space-joined word window (whitespace-normalized, like tokenized
    retrieval corpora). Emits (doc_id, chunk_idx, start_token, end_token,
    n_chunk_tokens, chunk_text); empty documents emit nothing. Pure
    per-row array expressions — zero shuffle."""
    if not 0 <= overlap < chunk_tokens:
        raise ValueError("need 0 <= overlap < chunk_tokens")
    step = chunk_tokens - overlap
    text = F.col(text_col)
    staged = docs.select(F.col(id_col).alias("doc_id"), _words(text).alias("__w"))
    n = F.size("__w")
    n_chunks = F.when(n <= 0, F.lit(0)).otherwise(
        F.when(n <= chunk_tokens, F.lit(1)).otherwise(
            F.ceil((n - chunk_tokens) / F.lit(float(step))).cast("int") + 1
        )
    )
    chunk = F.explode(
        F.when(
            n_chunks > 0,
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.struct(
                    i.cast("long").alias("chunk_idx"),
                    (i * step).cast("long").alias("start_token"),
                    F.least(i * step + chunk_tokens, n).cast("long").alias("end_token"),
                    F.concat_ws(
                        " ", F.slice(F.col("__w"), i * step + 1, chunk_tokens)
                    ).alias("chunk_text"),
                ),
            ),
        ).otherwise(
            F.array().cast(
                "array<struct<chunk_idx:bigint,start_token:bigint,end_token:bigint,chunk_text:string>>"
            )
        )
    )
    return staged.select("doc_id", chunk.alias("c")).select(
        "doc_id",
        F.col("c.chunk_idx").alias("chunk_idx"),
        F.col("c.start_token").alias("start_token"),
        F.col("c.end_token").alias("end_token"),
        (F.col("c.end_token") - F.col("c.start_token")).alias("n_chunk_tokens"),
        F.col("c.chunk_text").alias("chunk_text"),
    )


def corpus_report(
    docs: DataFrame,
    stratum_col: str = "source",
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """Per-stratum corpus accounting — the dataset-card table: document
    and token counts, mean quality score, predicted-English share, and
    exact-duplicate share per ``stratum_col`` value. One fused corpus
    scan (the same single-source rules as :func:`quality_scores` /
    :func:`language_id`) + the dedup-hash window + one stratum
    aggregate."""
    from pyspark.sql import Window

    profiles = profiles or DEFAULT_LANG_PROFILES
    text = F.col(text_col)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(stratum_col).alias("stratum"),
        _words(text).alias("__w"),
        lang_marker_matches(text, profiles).alias("__m"),
        F.md5(text).alias("__h"),
        _count_words(text, EN_STOPWORDS).alias("__nstop"),
    )
    nt = F.size("__w")
    _, _, score = _quality_blend(nt, F.size(F.array_distinct("__w")), F.col("__nstop"))
    pred_lang, _ = _lang_argmax(F.col("__m"), profiles)
    scored = staged.select(
        "doc_id",
        "stratum",
        nt.cast("long").alias("__nt"),
        score.alias("__q"),
        pred_lang.alias("__lang"),
        (F.min("doc_id").over(Window.partitionBy("__h")) != F.col("doc_id")).alias(
            "__dup"
        ),
    )
    return scored.groupBy("stratum").agg(
        F.count("*").cast("long").alias("n_docs"),
        F.sum("__nt").cast("long").alias("total_tokens"),
        F.round(F.avg("__q"), 8).alias("mean_quality"),
        F.round(F.avg((F.col("__lang") == "en").cast("double")), 8).alias("en_share"),
        F.round(F.avg(F.col("__dup").cast("double")), 8).alias("dup_share"),
    )


# ---------------------------------------------------------------------------
# CCNet-style unigram-LM quality buckets (Wenzek et al. 2020)
# ---------------------------------------------------------------------------


def unigram_logprob(
    docs: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 6,
) -> DataFrame:
    """Per-document mean token log-probability under a unigram language
    model estimated from ``reference`` (default: the corpus itself) with
    Laplace-``alpha`` smoothing over the observed vocabulary — the
    engine-native stand-in for CCNet's Wikipedia-LM perplexity score
    (Wenzek et al. 2020): fluent in-domain text scores high (frequent
    words), gibberish and boilerplate-with-rare-junk score low. Output:
    (doc_id, mean_logprob rounded to ``scale``, n_tokens); token-less
    docs carry NULL mean_logprob.

    Scale shape: the LM estimate is one groupBy over vocabulary-sized
    keys (map-side combined); scoring is explode + a broadcast join
    against the vocabulary logprob table + one doc-keyed average —
    corpus-linear, no wide relation. At 100 TB hash the vocabulary into
    buckets first if it outgrows broadcast range (the DSIR feature
    hasher in ``training.py`` is exactly that)."""
    ref = reference if reference is not None else docs
    words = F.expr(f"regexp_extract_all(lower({text_col}), '([a-z0-9]+)', 1)")
    # explode_outer keeps token-less documents as one NULL-token row, so
    # the aggregate covers every document directly and the old re-scan of
    # ``docs`` + left join to reattach them disappears (r12, guide §2.4;
    # doc ids are unique per the corpus contract)
    tok = docs.select(F.col(id_col).alias("__did"), F.explode_outer(words).alias("w"))
    ref_tok = ref.select(F.explode(words).alias("w"))
    counts = ref_tok.groupBy("w").agg(F.count(F.lit(1)).alias("n"))
    # total/vocab as a one-row aggregate of the vocabulary frame instead of
    # two driver count() actions (r12, guide §1.2: each action was a full
    # extra pass over the exploded reference corpus). sum(n) is the same
    # integer count(); the per-term log arithmetic sees identical doubles.
    stats = F.broadcast(
        counts.agg(
            F.sum("n").alias("__total"), F.count(F.lit(1)).alias("__vocab")
        )
    )
    denom = F.col("__total") + alpha * F.col("__vocab")
    lp = counts.crossJoin(stats).select(
        "w", F.log((F.col("n") + alpha) / denom).alias("lp")
    )
    # out-of-vocabulary tokens (possible only with an external reference)
    # take the smoothed zero-count probability
    unk = F.log(F.lit(alpha) / denom)
    scored = (
        tok.join(F.broadcast(lp), "w", "left")
        .crossJoin(stats)
        .groupBy("__did")
        .agg(
            # NULL token rows (token-less docs) stay out of the average —
            # avg over the empty set is NULL, like the old left join
            F.avg(
                F.when(F.col("w").isNotNull(), F.coalesce(F.col("lp"), unk))
            ).alias("__mlp"),
            F.count("w").alias("n_tokens"),
        )
    )
    return scored.select(
        F.col("__did").alias("doc_id"),
        F.round("__mlp", scale).alias("mean_logprob"),
        F.col("n_tokens"),
    )


def perplexity_buckets(
    docs: DataFrame,
    reference: DataFrame | None = None,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """CCNet's head/middle/tail split: documents bucketed by the terciles
    of their mean unigram log-probability (head = most-fluent third —
    CCNet keeps head+middle for pretraining). Tercile thresholds come
    from ``percentile_cont`` over the scored corpus (one tiny aggregate);
    the bucket label is then a pure projection. Docs without tokens land
    in 'tail'."""
    # LAZY localCheckpoint (r12, guide §1.2): the scored frame feeds both
    # the tercile aggregate and the bucket projection — without it the
    # whole tokenize+LM tower runs twice per query
    w = stage(
        unigram_logprob(
            docs, reference=reference, alpha=alpha, text_col=text_col, id_col=id_col
        ),
        eager=False,
    )
    thr = w.agg(
        F.expr("percentile_cont(0.3333333333) WITHIN GROUP (ORDER BY mean_logprob)").alias("t1"),
        F.expr("percentile_cont(0.6666666667) WITHIN GROUP (ORDER BY mean_logprob)").alias("t2"),
    )
    j = w.crossJoin(F.broadcast(thr))
    bucket = (
        F.when(F.col("mean_logprob").isNull(), F.lit("tail"))
        .when(F.col("mean_logprob") >= F.col("t2"), F.lit("head"))
        .when(F.col("mean_logprob") >= F.col("t1"), F.lit("middle"))
        .otherwise(F.lit("tail"))
    )
    return j.select("doc_id", "mean_logprob", "n_tokens", bucket.alias("bucket"))
