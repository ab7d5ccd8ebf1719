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
    bin_width: int | None = None,
) -> DataFrame:
    """J3: assign each inner span to containing outer spans
    (inner.start >= outer.start AND inner.end <= outer.end, same doc).

    Frames carry (on..., id, start, end). With ``first_containing_only``
    each inner span keeps only the first containing outer by (start, end,
    id) order — the reference's sort + early-break tie-break
    (ConceptCooccurrenceCountsFn.java:242-258) — computed as a
    ``min(struct(start, end, id))`` aggregation (map-side partial combine),
    not a window sort.

    ``bin_width`` enables the binned interval join for dense documents:
    outer spans are exploded into the fixed-width bins they overlap and
    the join key becomes (on..., bin(inner.start)) — each inner span lives
    in exactly one bin so no post-join dedup is needed, and the within-key
    candidate product shrinks from |outer|×|inner| per doc to per-bin
    neighborhoods. This is the 100 TB path; None keeps the plain key join
    (fine when per-doc span counts are small, as in the reference corpus).

    ``first_containing_only`` takes a different physical route: outer
    spans collect into a per-key sorted array and each inner row takes
    ``array_min(filter(...))`` — the |outer|×|inner| candidate product and
    the post-join aggregation disappear (1.5× measured at sf0.1; this is
    exactly the reference's per-document sorted-list + early-break,
    expressed as array expressions instead of a shuffle). ``bin_width``
    is ignored on this route — the array is already per-key-local; if a
    single key's outer-span count cannot fit one row, pre-split the key
    upstream."""
    if first_containing_only:
        o_arr = outer.groupBy(*on).agg(
            F.array_sort(F.collect_list(F.struct("start", "end", "id"))).alias("_outers")
        )
        # one output row per DISTINCT inner span (duplicate annotations
        # collapse — the relational route did this implicitly via its
        # post-join aggregation). The explicit repartition on the join key
        # BEFORE dedup makes one exchange serve dedup (subset rule: hash
        # on `on` clusters the wider dedup key) and the join — dedup on
        # its full key would otherwise partition incompatibly with the
        # join and force a second shuffle (measured 25% on the query)
        j = (
            inner.select(
                *on,
                F.col("id").alias(f"{inner_prefix}id"),
                F.col("start").alias(f"{inner_prefix}start"),
                F.col("end").alias(f"{inner_prefix}end"),
            )
            .repartition(*[F.col(c) for c in on])
            .dropDuplicates([*on, f"{inner_prefix}id", f"{inner_prefix}start", f"{inner_prefix}end"])
            .join(o_arr, list(on))
        )
        first = F.array_min(
            F.filter(
                "_outers",
                lambda x: (F.col(f"{inner_prefix}start") >= x["start"])
                & (F.col(f"{inner_prefix}end") <= x["end"]),
            )
        )
        return (
            j.select(
                *on,
                f"{inner_prefix}id",
                f"{inner_prefix}start",
                f"{inner_prefix}end",
                first.alias("_first"),
            )
            .where(F.col("_first").isNotNull())
            .select(
                *on,
                f"{inner_prefix}id",
                f"{inner_prefix}start",
                f"{inner_prefix}end",
                F.col("_first.start").alias(f"{outer_prefix}start"),
                F.col("_first.end").alias(f"{outer_prefix}end"),
                F.col("_first.id").alias(f"{outer_prefix}id"),
            )
        )
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
    keys = list(on)
    if bin_width is not None:
        o = o.withColumn(
            "_bin",
            F.explode(
                F.sequence(
                    F.floor(F.col(f"{outer_prefix}start") / bin_width),
                    F.floor(F.col(f"{outer_prefix}end") / bin_width),
                )
            ),
        )
        i = i.withColumn("_bin", F.floor(F.col(f"{inner_prefix}start") / bin_width))
        keys = keys + ["_bin"]
    joined = o.join(i, keys).where(
        (F.col(f"{inner_prefix}start") >= F.col(f"{outer_prefix}start"))
        & (F.col(f"{inner_prefix}end") <= F.col(f"{outer_prefix}end"))
    )
    if bin_width is not None:
        joined = joined.drop("_bin")
    return joined


def overlap_semi_join(
    annots: DataFrame,
    filters: DataFrame,
    on: tuple[str, ...] = ("doc_id",),
    bin_width: int | None = None,
) -> DataFrame:
    """J4: keep annotation spans overlapping ANY filter span on the same
    keys (overlap = a.start < f.end AND f.start < a.end) — the CRF
    confirmation filter (PipelineMain.filterConceptAnnotations:1250-1286).
    Left-semi join: output columns are exactly the annotation's.

    ``bin_width`` switches to the binned variant (scale path): both sides
    explode into the bins their span overlaps and the semi-join adds the
    bin key (overlapping intervals always share a bin); exploded annot rows
    are de-duplicated afterwards."""
    if bin_width is None:
        f_ = filters.select(
            *on, F.col("start").alias("_fstart"), F.col("end").alias("_fend")
        )
        cond = [annots[c] == f_[c] for c in on]
        return annots.join(
            f_,
            cond + [annots["start"] < f_["_fend"], f_["_fstart"] < annots["end"]],
            "left_semi",
        )
    bins = lambda s, e: F.explode(  # noqa: E731
        F.sequence(F.floor(s / bin_width), F.floor(e / bin_width))
    )
    a = annots.withColumn("_bin", bins(F.col("start"), F.col("end")))
    f_ = filters.select(
        *on,
        bins(F.col("start"), F.col("end")).alias("_bin"),
        F.col("start").alias("_fstart"),
        F.col("end").alias("_fend"),
    )
    cond = [a[c] == f_[c] for c in on] + [a["_bin"] == f_["_bin"]]
    kept = a.join(
        f_,
        cond + [a["start"] < f_["_fend"], f_["_fstart"] < a["end"]],
        "left_semi",
    ).drop("_bin")
    return kept.distinct()


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
