"""Abbreviation detection + document text augmentation (X4 / P11 / parts
of P8).

Reference: the Ab3P subprocess pipeline (.../etl/AbbreviationAb3pPipeline.
java:42-132, .../etl/fn/AbbreviationFn.java:49-128 — short-form/long-form
annotation pairs) and document text augmentation
(.../etl/fn/DocumentTextAugmentationFn.java:76-160 — abbreviation
definition sentences appended after DOCUMENT_END_MARKER with the
short-form portion blanked).

Ab3P is an external binary; the pluggable default backend here is the
Schwartz–Hearst algorithm (Schwartz & Hearst, PSB 2003) — the standard
public abbreviation-pair extractor, implemented from the paper: a
parenthesized candidate short form is matched right-to-left against the
preceding text, requiring the first short-form character to start a word.

Spark shape: ONE ``mapInPandas`` stage (Arrow batches, pure-python inner
loop per document — the per-doc algorithm is inherently sequential);
everything downstream (annotations, augmentation, propagation) is native.
"""

from __future__ import annotations

import re
from collections.abc import Iterator

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import types as T

from .conceptfilters import DOCUMENT_END_MARKER

ABBREV_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("short_form", T.StringType(), False),
        T.StructField("long_form", T.StringType(), False),
        T.StructField("sf_start", T.IntegerType(), False),
        T.StructField("sf_end", T.IntegerType(), False),
        T.StructField("lf_start", T.IntegerType(), False),
        T.StructField("lf_end", T.IntegerType(), False),
        T.StructField("blanked_sentence", T.StringType(), True),
    ]
)

_PAREN = re.compile(r"\(([^()]{1,80})\)")


def _find_best_long_form(candidate: str, short: str) -> int | None:
    """Schwartz–Hearst findBestLongForm: right-to-left character match;
    the first short-form character must start a word in the long form.
    Returns the long form's start index within ``candidate`` or None."""
    s_idx = len(short) - 1
    l_idx = len(candidate) - 1
    while s_idx >= 0:
        c = short[s_idx].lower()
        if not c.isalnum():
            s_idx -= 1
            continue
        while l_idx >= 0 and (
            candidate[l_idx].lower() != c
            or (s_idx == 0 and l_idx > 0 and candidate[l_idx - 1].isalnum())
        ):
            l_idx -= 1
        if l_idx < 0:
            return None
        l_idx -= 1
        s_idx -= 1
    start = candidate.rfind(" ", 0, l_idx + 1) + 1
    return start


def _extract_pairs(doc_id: str, text: str) -> list[dict]:
    out = []
    for m in _PAREN.finditer(text):
        sf = m.group(1).strip()
        if not (2 <= len(sf) <= 10 and any(c.isalpha() for c in sf) and len(sf.split()) <= 2):
            continue
        # candidate long form: preceding text back to sentence-ish boundary,
        # capped at min(|sf|+5, |sf|*2) words (the paper's length rule)
        prefix = text[: m.start()].rstrip()
        boundary = max(prefix.rfind(". "), prefix.rfind("\n"), prefix.rfind("; "))
        window = prefix[boundary + 1 :].lstrip() if boundary >= 0 else prefix
        max_words = min(len(sf) + 5, len(sf) * 2)
        words = window.split(" ")
        candidate = " ".join(words[-max_words:]) if words else ""
        if not candidate:
            continue
        lf_rel = _find_best_long_form(candidate, sf)
        if lf_rel is None:
            continue
        long_form = candidate[lf_rel:].strip()
        if not long_form or len(long_form) <= len(sf) or sf.lower() in long_form.lower().split():
            continue
        lf_start = text.rfind(long_form, 0, m.start())
        if lf_start < 0:
            continue
        # definition sentence with the "(SF)" portion blanked (equal-length
        # spaces keep every other offset stable) — DocumentTextAugmentationFn
        sent_start = max(text.rfind(". ", 0, lf_start) + 2, 0) if text.rfind(". ", 0, lf_start) >= 0 else 0
        sent_end_candidates = [i for i in (text.find(". ", m.end()), text.find("\n", m.end())) if i >= 0]
        sent_end = min(sent_end_candidates) + 1 if sent_end_candidates else len(text)
        sentence = text[sent_start:sent_end]
        rel_s, rel_e = m.start() - sent_start, m.end() - sent_start
        blanked = sentence[:rel_s] + " " * (rel_e - rel_s) + sentence[rel_e:]
        out.append(
            {
                "doc_id": doc_id,
                "short_form": sf,
                "long_form": long_form,
                "sf_start": m.start(1),
                "sf_end": m.end(1),
                "lf_start": lf_start,
                "lf_end": lf_start + len(long_form),
                "blanked_sentence": blanked.rstrip(),
            }
        )
    return out


def detect_abbreviations(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "content"
) -> DataFrame:
    """(doc_id, text) → ABBREV_SCHEMA rows via mapInPandas (Arrow-batched;
    one python call per batch of documents)."""
    import pandas as pd

    def run(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows: list[dict] = []
            for _, r in pdf.iterrows():
                if r[text]:
                    rows.extend(_extract_pairs(str(r[doc_id]), r[text]))
            yield pd.DataFrame(rows, columns=[f.name for f in ABBREV_SCHEMA.fields])

    return docs.select(doc_id, text).mapInPandas(run, schema=ABBREV_SCHEMA)


def abbreviation_annotations(abbrevs: DataFrame) -> DataFrame:
    """Short-form/long-form pairs → schemas.ANNOTATION rows
    (annot_type 'short_form'/'long_form', AbbreviationFn.java:56-58)."""
    mk = lambda typ, s, e, txt: abbrevs.select(  # noqa: E731
        "doc_id",
        F.lit(typ).alias("annot_type"),
        F.lit(None).cast("string").alias("concept_id"),
        F.array(
            F.struct(F.col(s).cast("int").alias("start"), F.col(e).cast("int").alias("end"))
        ).alias("spans"),
        F.col(txt).alias("covered_text"),
    )
    return mk("long_form", "lf_start", "lf_end", "long_form").unionByName(
        mk("short_form", "sf_start", "sf_end", "short_form")
    )


def augment_document_text(
    docs: DataFrame,
    abbrevs: DataFrame,
    doc_id: str = "doc_id",
    text: str = "content",
) -> DataFrame:
    """P11 (DocumentTextAugmentationFn): append the blanked
    abbreviation-definition sentences after DOCUMENT_END_MARKER. Documents
    with no abbreviations pass through unchanged. One aggregation keyed on
    doc_id + a left join."""
    extra = abbrevs.groupBy(doc_id).agg(
        F.array_join(
            F.transform(
                F.array_sort(F.collect_list(F.struct("lf_start", "blanked_sentence"))),
                lambda s: s["blanked_sentence"],
            ),
            "\n",
        ).alias("__aug")
    )
    return (
        docs.join(extra, doc_id, "left")
        .withColumn(
            text,
            F.when(
                F.col("__aug").isNotNull(),
                F.concat(
                    F.col(text), F.lit("\n" + DOCUMENT_END_MARKER + "\n"), F.col("__aug")
                ),
            ).otherwise(F.col(text)),
        )
        .drop("__aug")
    )


def propagate_long_form_concepts(
    concepts: DataFrame, abbrevs: DataFrame
) -> DataFrame:
    """P8 abbreviation propagation: a concept annotation whose span matches
    an abbreviation's long form is copied onto the short form's span (the
    definition's "(SF)" occurrence). Equi-join on (doc_id, span)."""
    lf = abbrevs.select(
        "doc_id",
        F.col("lf_start").alias("__s"),
        F.col("lf_end").alias("__e"),
        "sf_start",
        "sf_end",
        "short_form",
    )
    keyed = concepts.select(
        "*",
        F.array_min(F.transform("spans", lambda s: s["start"])).alias("__s"),
        F.array_max(F.transform("spans", lambda s: s["end"])).alias("__e"),
    )
    propagated = keyed.join(lf, ["doc_id", "__s", "__e"]).select(
        "doc_id",
        F.col("annot_type"),
        "concept_id",
        F.array(
            F.struct(
                F.col("sf_start").cast("int").alias("start"),
                F.col("sf_end").cast("int").alias("end"),
            )
        ).alias("spans"),
        F.col("short_form").alias("covered_text"),
    )
    return concepts.unionByName(propagated.select(*concepts.columns))
