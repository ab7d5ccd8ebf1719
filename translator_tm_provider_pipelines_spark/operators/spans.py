"""Span/interval join operators (SURVEY §2.3 J3-J5, §2.2 P9/P13).

The reference does interval matching in-memory per document with sorted
lists and early breaks (matchConceptsToLevelAnnots,
.../etl/fn/ConceptCooccurrenceCountsFn.java:227-260; filterViaCrf,
.../etl/PipelineMain.java:1297-1324). Here they are relational joins:
equi-join on doc_id plus range predicates — Catalyst turns the doc_id
equality into the shuffle key, so each document's intervals meet on one
partition and the range predicate is evaluated there; per-document interval
counts are small, so the within-key product is bounded. No UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window


def containment_join(
    outer: DataFrame,
    inner: DataFrame,
    on: tuple[str, ...] = ("doc_id",),
    outer_prefix: str = "outer_",
    inner_prefix: str = "inner_",
    first_containing_only: bool = False,
) -> DataFrame:
    """J3: assign each inner span to containing outer spans
    (inner.start >= outer.start AND inner.end <= outer.end, same doc).

    Frames carry (on..., id, start, end). With ``first_containing_only``
    each inner span keeps only the first containing outer by (start, end,
    id) order — the reference's sort + early-break tie-break
    (ConceptCooccurrenceCountsFn.java:242-258)."""
    o = outer.select(
        *on,
        F.col("id").alias(f"{outer_prefix}id"),
        F.col("start").alias(f"{outer_prefix}start"),
        F.col("end").alias(f"{outer_prefix}end"),
    )
    i = inner.select(
        *on,
        F.col("id").alias(f"{inner_prefix}id"),
        F.col("start").alias(f"{inner_prefix}start"),
        F.col("end").alias(f"{inner_prefix}end"),
    )
    joined = o.join(i, list(on)).where(
        (F.col(f"{inner_prefix}start") >= F.col(f"{outer_prefix}start"))
        & (F.col(f"{inner_prefix}end") <= F.col(f"{outer_prefix}end"))
    )
    if first_containing_only:
        w = Window.partitionBy(*on, f"{inner_prefix}id").orderBy(
            f"{outer_prefix}start", f"{outer_prefix}end", f"{outer_prefix}id"
        )
        joined = joined.withColumn("_rn", F.row_number().over(w)).where(F.col("_rn") == 1).drop("_rn")
    return joined


def overlap_semi_join(
    annots: DataFrame,
    filters: DataFrame,
    on: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """J4: keep annotation spans overlapping ANY filter span on the same
    keys (overlap = a.start < f.end AND f.start < a.end) — the CRF
    confirmation filter (PipelineMain.filterConceptAnnotations:1250-1286).
    Left-semi join: output columns are exactly the annotation's."""
    f_ = filters.select(
        *on,
        F.col("start").alias("_fstart"),
        F.col("end").alias("_fend"),
    )
    cond = [annots[c] == f_[c] for c in on]
    return annots.join(
        f_,
        cond
        + [
            annots["start"] < f_["_fend"],
            f_["_fstart"] < annots["end"],
        ],
        "left_semi",
    )


def offset_spans(spans: Column, offset: Column) -> Column:
    """P9: rebase spans (array<struct<start,end>>) by -offset — document →
    sentence coordinates (SentenceExtractionFn.offsetSpan:399-407)."""
    return F.transform(
        spans,
        lambda s: F.struct(
            (s["start"] - offset).cast("int").alias("start"),
            (s["end"] - offset).cast("int").alias("end"),
        ),
    )


def document_zone(
    sentences: DataFrame,
    sections: DataFrame,
    on: tuple[str, ...] = ("doc_id",),
) -> DataFrame:
    """P13: resolve each sentence's document zone = name of the first
    overlapping section annotation by span order, else 'Unknown'
    (SentenceExtractionFn.determineDocumentZone:375-388). ``sections``
    carries (on..., name, start, end)."""
    sec = sections.select(
        *on,
        F.col("name").alias("_zone"),
        F.col("start").alias("_sstart"),
        F.col("end").alias("_send"),
    )
    cond = [sentences[c] == sec[c] for c in on]
    joined = sentences.join(
        sec,
        cond + [sentences["start"] < sec["_send"], sec["_sstart"] < sentences["end"]],
        "left",
    ).drop(*[sec[c] for c in on])
    w = Window.partitionBy(*on, "id").orderBy(
        F.col("_sstart").asc_nulls_last(), F.col("_send").asc_nulls_last()
    )
    return (
        joined.withColumn("_rn", F.row_number().over(w))
        .where(F.col("_rn") == 1)
        .withColumn("doc_zone", F.coalesce(F.col("_zone"), F.lit("Unknown")))
        .drop("_rn", "_zone", "_sstart", "_send")
    )
