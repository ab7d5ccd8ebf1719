"""Concept recognition (X2/X3 replacement): exact dictionary matching with
character-accurate spans, fully native.

The reference calls OGER / CRF HTTP services per document
(.../etl/fn/OgerFn.java:77-160, .../etl/fn/CrfNerFn.java:49-143). Those are
external model backends; the Spark-first equivalent ships a deterministic
DICTIONARY matcher as the default backend (exact multi-word term lookup —
the core of OGER's case-sensitive mode) with the same output shape
(schemas.ANNOTATION), so a real model service can drop in behind the same
interface via ``mapInPandas``.

Design for scale:
- tokenization with offsets uses the same marker-insert/split/cumulative-
  length construction as sentence segmentation — exact spans, no UDF;
- n-gram candidates come from ``lead`` windows over the per-document token
  stream (bounded by the dictionary's max term length, measured not
  guessed);
- the dictionary joins BROADCAST on the normalized term — the corpus-side
  relation never shuffles (this is what the reference's side-input dict
  wanted to be; at 100 TB the corpus stays partition-local).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

_RS = "\x1e"
_TOKEN = r"[A-Za-z0-9]+"


def tokenize_with_offsets(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "content"
) -> DataFrame:
    """(doc_id, text) → (doc_id, part_idx, tok_idx, start, end, token),
    spans exact.

    Marker characters are inserted around every ``[A-Za-z0-9]+`` run; the
    split parts concatenate back to the original text, so offsets are the
    cumulative part lengths; token rows are the parts that are token runs.

    ``part_idx`` is the physical order column the offset windows sorted
    by; downstream windows that order by it (instead of the derived
    ``tok_idx``) reuse that sort, so the whole tokenize→n-gram chain
    costs ONE Exchange and ONE Sort of the token relation."""
    marked = F.regexp_replace(F.col(text), f"({_TOKEN})", _RS + "$1" + _RS)
    parts = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.posexplode(F.split(marked, _RS)).alias("part_idx", "part"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("part_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    toks = (
        parts.withColumn("off", F.coalesce(F.sum(F.length("part")).over(w), F.lit(0)))
        .where(F.col("part").rlike(f"^{_TOKEN}$"))
        .select(
            "doc_id",
            "part_idx",
            F.col("off").cast("int").alias("start"),
            (F.col("off") + F.length("part")).cast("int").alias("end"),
            F.col("part").alias("token"),
        )
    )
    w2 = Window.partitionBy("doc_id").orderBy("part_idx")
    return toks.select(
        "doc_id",
        "part_idx",
        (F.row_number().over(w2) - 1).alias("tok_idx"),
        "start",
        "end",
        "token",
    )


def dictionary_concept_recognition(
    docs: DataFrame,
    dictionary: DataFrame,
    max_term_tokens: int = 3,
    case_insensitive: bool = True,
    doc_id: str = "doc_id",
    text: str = "content",
) -> DataFrame:
    """Exact dictionary NER → schemas.ANNOTATION rows.

    ``dictionary`` = (term, concept_id) rows; terms are tokenized with the
    same ``[A-Za-z0-9]+`` rule and matched as token n-grams (1 ≤ n ≤
    ``max_term_tokens``), so punctuation/whitespace variation inside a term
    is normalized away exactly as OGER's tokenizer does. Longest-match is
    NOT enforced here — overlapping matches emerge like the reference's
    raw OGER output and are cleaned by
    ``conceptfilters.remove_nested_annotations``."""
    toks = tokenize_with_offsets(docs, doc_id=doc_id, text=text)
    norm = (lambda c: F.lower(c)) if case_insensitive else (lambda c: c)

    # order by part_idx (same order as tok_idx): the tokenizer's windows
    # sorted on it already, so this window adds NO extra Sort
    w = Window.partitionBy("doc_id").orderBy("part_idx")
    grams = toks.select(
        "doc_id",
        "start",
        *[F.lead("token", i).over(w).alias(f"t{i}") for i in range(max_term_tokens)],
        *[F.lead("end", i).over(w).alias(f"e{i}") for i in range(max_term_tokens)],
    )
    # all n-gram candidates in ONE pass: the window runs once and the ≤k
    # grams per position explode from an array (a union of k selections
    # would recompute the tokenize+window chain k times)
    gram_structs = F.array_compact(
        F.array(
            *[
                F.when(
                    F.col(f"t{n-1}").isNotNull(),
                    F.struct(
                        F.col(f"e{n-1}").alias("end"),
                        F.concat_ws(" ", *[F.col(f"t{i}") for i in range(n)]).alias("gram"),
                    ),
                )
                for n in range(1, max_term_tokens + 1)
            ]
        )
    )
    candidates = grams.select(
        "doc_id", "start", F.explode(gram_structs).alias("g")
    ).select("doc_id", "start", F.col("g.end").alias("end"), F.col("g.gram").alias("gram"))

    d = dictionary.select(
        norm(F.col("term")).alias("gram_key"), "concept_id"
    ).distinct()
    matched = candidates.withColumn("gram_key", norm(F.col("gram"))).join(
        F.broadcast(d), "gram_key"
    )
    return matched.select(
        "doc_id",
        F.lit("concept").alias("annot_type"),
        "concept_id",
        F.array(
            F.struct(F.col("start").alias("start"), F.col("end").alias("end"))
        ).alias("spans"),
        F.col("gram").alias("covered_text"),
    )


def normalize_dictionary(raw_terms: DataFrame) -> DataFrame:
    """(term, concept_id) → token-normalized terms (whitespace-single,
    token runs joined by single spaces) so dictionary-side normalization
    matches the matcher's n-gram text."""
    toks = F.regexp_extract_all(F.col("term"), F.lit(f"({_TOKEN})"), 1)
    return raw_terms.select(
        F.array_join(toks, " ").alias("term"), "concept_id"
    ).where(F.col("term") != "")
