"""Concept cooccurrence analytics chain (SURVEY §2.4 A1-A9, §3.3).

Reference pipelines:
- counts:  .../etl/ConceptCooccurrenceCountsPipeline.java +
           .../etl/fn/ConceptCooccurrenceCountsFn.java
- metrics: .../etl/ConceptCooccurrenceMetricsPipeline.java:150-401
- idf:     .../etl/ConceptIdfPipeline.java:97-203

Scale design
------------
Input is a ``text unit → concept set`` relation (one row per (unit, concept)
after normalization). All aggregations are shuffle-by-key with map-side
partial aggregation; nothing is collected to the driver. Where the reference
broadcast side-input maps (singleton counts — a documented stall risk at
.../etl/PipelineMain.java:1357-1364), we use real joins: pair→count joined
twice against concept→count. Concept counts are Zipf-skewed in practice;
AQE skew-join splitting handles the hot keys, and the two scalar totals are
cross-joined as literal one-row frames (broadcast, not collected).

Pair generation avoids a self-join entirely: concepts are collected per unit
into a sorted array (one shuffle), then unordered pairs are expanded with
nested JVM-side array ``transform`` — O(k²) per unit on arrays that are
small by construction (concepts in one sentence/document), with no second
shuffle. Canonical pair order = lexicographic, matching the reference's
ConceptPair constructor (ConceptCooccurrenceCountsFn.java:365-392).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions import metrics as M
from ..functions.hashing import concept_pair_id

# ---------------------------------------------------------------------------
# Normalization
# ---------------------------------------------------------------------------


def unit_concept_rows(units: DataFrame, text_id: str = "text_id", concept_ids: str = "concept_ids") -> DataFrame:
    """(text_id, concept_ids ARRAY) → distinct (text_id, concept_id) rows —
    the exploded form every aggregation below consumes."""
    return (
        units.select(text_id, F.explode(concept_ids).alias("concept_id"))
        .where(F.col("concept_id") != "")
        .distinct()
    )


# ---------------------------------------------------------------------------
# A2/A3/A4 — singleton + total counts
# ---------------------------------------------------------------------------


def concept_counts(unit_concepts: DataFrame) -> DataFrame:
    """A2: per concept, number of distinct text units containing it
    (countConceptObservations, ConceptCooccurrenceMetricsPipeline.java:652-693).
    Input must already be distinct (unit_concept_rows), so a plain count
    suffices — cheaper than count_distinct at scale."""
    return unit_concepts.groupBy("concept_id").agg(F.count("*").alias("concept_count"))


def total_document_count(unit_concepts: DataFrame) -> DataFrame:
    """A3: distinct text-unit count (countTotalDocuments:611-619) as a
    one-row frame, suitable for broadcast cross-join."""
    return unit_concepts.agg(F.count_distinct("text_id").alias("total_docs"))


def total_concept_count(counts: DataFrame) -> DataFrame:
    """A4: sum of per-concept observation counts (countTotalConcepts:634-640)."""
    return counts.agg(F.sum("concept_count").alias("total_concepts"))


# ---------------------------------------------------------------------------
# J6 — ancestor augmentation
# ---------------------------------------------------------------------------


def add_ancestor_concepts(unit_concepts: DataFrame, ancestors: DataFrame) -> DataFrame:
    """J6: add ancestor concept ids per (unit, concept), same-prefix only
    (addAncestorConceptIds, ConceptCooccurrenceMetricsPipeline.java:704-755):
    an ancestor is kept iff its CURIE prefix (text before ':') equals the
    descendant's prefix. ``ancestors`` = (concept_id, ancestor_id) rows.

    The ontology ancestor table is small relative to the corpus → broadcast
    join; original rows are unioned back and the result de-duplicated per
    unit (a concept and its ancestor may both occur)."""
    prefix = lambda c: F.split(c, ":").getItem(0)  # noqa: E731
    anc = ancestors.where(prefix(F.col("concept_id")) == prefix(F.col("ancestor_id")))
    via_anc = (
        unit_concepts.join(F.broadcast(anc), "concept_id")
        .select("text_id", F.col("ancestor_id").alias("concept_id"))
    )
    return unit_concepts.select("text_id", "concept_id").unionByName(via_anc).distinct()


# ---------------------------------------------------------------------------
# A6/A5 — pair generation + pair counts
# ---------------------------------------------------------------------------


def _pair_expand(concepts_sorted: Column) -> Column:
    """All unordered pairs (a<b) of a sorted array, as structs — JVM-side
    nested transform, no join, no UDF."""
    return F.flatten(
        F.transform(
            concepts_sorted,
            lambda x, i: F.transform(
                F.slice(concepts_sorted, i + F.lit(2), F.greatest(F.size(concepts_sorted) - i - 1, F.lit(0))),
                lambda y: F.struct(x.alias("concept1"), y.alias("concept2")),
            ),
        )
    )


def concept_pairs(unit_concepts: DataFrame, excluded_pairs: DataFrame | None = None) -> DataFrame:
    """A6: per text unit, every unordered concept pair (identical ids
    impossible by construction; canonical order lexicographic —
    computeConceptPairs, ConceptCooccurrenceMetricsPipeline.java:470-583).

    ``excluded_pairs`` (optional, e.g. ancestor-related pairs) = frame with
    (concept1, concept2) in canonical order; removed with a broadcast
    anti-join. Returns (text_id, concept1, concept2)."""
    per_unit = (
        unit_concepts.groupBy("text_id")
        .agg(F.sort_array(F.collect_set("concept_id")).alias("cs"))
        .where(F.size("cs") >= 2)
        .select("text_id", F.explode(_pair_expand(F.col("cs"))).alias("p"))
        .select("text_id", "p.concept1", "p.concept2")
    )
    if excluded_pairs is not None:
        per_unit = per_unit.join(
            F.broadcast(excluded_pairs), ["concept1", "concept2"], "left_anti"
        )
    return per_unit


def ancestor_excluded_pairs(ancestors: DataFrame) -> DataFrame:
    """Pairs (canonical order) where one concept is the other's ancestor —
    excluded from pair generation (computeConceptPairs ancestor check)."""
    return ancestors.select(
        F.least("concept_id", "ancestor_id").alias("concept1"),
        F.greatest("concept_id", "ancestor_id").alias("concept2"),
    ).distinct()


def pair_counts(pairs: DataFrame) -> DataFrame:
    """A5: pair → distinct-unit count (groupByPairId:442-468). Pairs are
    unique per unit by construction → plain count."""
    return pairs.groupBy("concept1", "concept2").agg(F.count("*").alias("pair_count"))


def pair_publications(
    pairs: DataFrame, max_per_pair: int = 25, salt_buckets: int = 64
) -> DataFrame:
    """A7: keep ≤ N publication (text-unit) records per pair
    (limitPublicationsByPairId:411-440; cap constant :60 = 25). The
    reference keeps an arbitrary subset; we keep the first N by text_id for
    determinism. Document id to store = text_id up to the first '_'
    (doc-level ids are bare; sub-document unit ids are docId_LEVEL_hash —
    :497-536)."""
    # Aggregation instead of a row_number window (r12, guide §2.3/§2.4):
    # the window needed Exchange + full Sort of the pair relation; the
    # hash aggregate drops the sort — the ≤N smallest text_ids per pair
    # come from a sorted-array slice, and (concept1, concept2, text_id) is
    # unique by construction so row_number tie behavior cannot differ.
    #
    # Two-level salted top-k (r13, guide §2.5/§5): a single
    # collect_list keyed by the pair alone buffers EVERY text_id of a hot
    # pair (a common concept co-mention can carry millions of
    # publications at 100 TB) in one aggregation row before the slice.
    # Level 1 splits each pair over ``salt_buckets`` deterministic salts
    # (pmod(xxhash64(text_id)) — never rand(), which breaks under task
    # retry) and keeps only that salt's ≤N smallest; level 2 merges
    # ≤ salt_buckets × N ids per pair — a bounded buffer. The global ≤N
    # smallest are each among their own salt's ≤N smallest (at most N-1
    # other ids precede them anywhere), so the merged slice is exactly
    # the old slice. Row multiset is identical to the window form.
    salt = F.pmod(F.xxhash64("text_id"), F.lit(salt_buckets)).alias("__salt")
    partial = pairs.groupBy("concept1", "concept2", salt).agg(
        F.slice(F.array_sort(F.collect_list("text_id")), 1, max_per_pair).alias(
            "__part"
        )
    )
    return (
        partial.groupBy("concept1", "concept2")
        .agg(
            F.slice(
                F.array_sort(F.flatten(F.collect_list("__part"))), 1, max_per_pair
            ).alias("__ids")
        )
        .select(
            "concept1",
            "concept2",
            F.explode("__ids").alias("text_id"),
        )
        .select(
            "concept1",
            "concept2",
            F.split("text_id", "_").getItem(0).alias("document_id"),
        )
    )


# ---------------------------------------------------------------------------
# A8 — metrics
# ---------------------------------------------------------------------------


def cooccurrence_metrics(
    pair_counts_df: DataFrame,
    concept_counts_df: DataFrame,
    total_docs_df: DataFrame,
    total_concepts_df: DataFrame,
    with_pair_id: bool = True,
) -> DataFrame:
    """A8: NGD/PMI/NPMI/NPMI-max/MD/LFMD per pair
    (getConceptIdPairToCooccurrenceMetrics:772-863), scores rounded to 8
    HALF_UP. Marginal counts come from two joins against the concept-count
    table (not a broadcast map — §4 scale note); the two global totals are
    one-row frames cross-joined (Catalyst broadcasts them)."""
    c1 = concept_counts_df.select(
        F.col("concept_id").alias("concept1"), F.col("concept_count").alias("concept1_count")
    )
    c2 = concept_counts_df.select(
        F.col("concept_id").alias("concept2"), F.col("concept_count").alias("concept2_count")
    )
    df = (
        pair_counts_df.join(c1, "concept1")
        .join(c2, "concept2")
        .crossJoin(F.broadcast(total_docs_df))
        .crossJoin(F.broadcast(total_concepts_df))
    )
    fx, fy, fxy = F.col("concept1_count"), F.col("concept2_count"), F.col("pair_count")
    n_docs, n_concepts = F.col("total_docs"), F.col("total_concepts")
    out = df.select(
        "concept1",
        "concept2",
        "pair_count",
        "concept1_count",
        "concept2_count",
        M.round8(M.ngd(fx, fy, fxy, n_concepts)).alias("ngd"),
        M.round8(M.pmi(n_docs, fx, fy, fxy)).alias("pmi"),
        M.round8(M.npmi(n_docs, fx, fy, fxy)).alias("npmi"),
        M.round8(M.npmi_max_denom(n_docs, fx, fy, fxy)).alias("npmi_max"),
        M.round8(M.mutual_dependence(n_docs, fx, fy, fxy)).alias("md"),
        M.round8(M.lfmd(n_docs, fx, fy, fxy)).alias("lfmd"),
    )
    if with_pair_id:
        out = out.select(
            concept_pair_id(F.col("concept1"), F.col("concept2")).alias("pair_id"), "*"
        )
    return out


def concept_idf(unit_concepts: DataFrame, ancestors: DataFrame | None = None) -> DataFrame:
    """A9: IDF per concept at DOCUMENT level, ancestors always added
    (ConceptIdfPipeline.java:123-148, getConceptIdf:184-203):
    idf = ln(totalDocs / docsWithConcept), rounded to 8.

    Both aggregates (per-concept doc count, total distinct docs) derive
    from the shared per-unit concept-set frame. NOTE (r13, measured): for
    THIS operator the optimizer does NOT reuse the exchange — column
    pruning rewrites the totals branch into a bare distinct-unit count
    whose subtree no longer matches the collect_set tower
    (plans/r13/concept_idf_after_aqe_off.txt: 2 scan towers, 0
    ReusedExchange; forcing the cs column into the totals aggregate was
    A/B'd a wash at sf0.1 and still did not canonicalize to a reuse).
    The pruned second tower carries only unit ids — cheaper than
    materializing the set tower twice would be. The reuse claim DOES
    hold for :func:`cooccurrence_chain_from_rows` (6 ReusedExchange refs,
    plans/r13/cooccurrence_metrics_after_aqe_off.txt)."""
    uc = unit_concepts
    if ancestors is not None:
        uc = add_ancestor_concepts(uc, ancestors)
    per_unit = _per_unit_concept_sets(uc)
    counts = per_unit.select(F.explode("cs").alias("concept_id")).groupBy(
        "concept_id"
    ).agg(F.count("*").alias("concept_count"))
    totals = per_unit.agg(F.count(F.lit(1)).alias("total_docs"))
    return counts.crossJoin(F.broadcast(totals)).select(
        "concept_id",
        "concept_count",
        M.round8(M.idf(F.col("total_docs"), F.col("concept_count"))).alias("idf"),
    )


# ---------------------------------------------------------------------------
# End-to-end chain
# ---------------------------------------------------------------------------


def cooccurrence_chain(
    units: DataFrame,
    ancestors: DataFrame | None = None,
    exclude_ancestor_pairs: bool = True,
    with_pair_id: bool = True,
) -> DataFrame:
    """doc-to-concept units → full pair-metrics table (§3.3 entry point 3)."""
    return cooccurrence_chain_from_rows(
        unit_concept_rows(units), ancestors, exclude_ancestor_pairs, with_pair_id
    )


def _per_unit_concept_sets(unit_concepts: DataFrame) -> DataFrame:
    """(text_id, cs ARRAY<concept_id> sorted distinct) — ONE corpus-wide
    aggregation every chain branch below derives from narrowly. All
    consumers build this with the byte-identical expression so Catalyst's
    ReuseExchange collapses their shuffles into a single exchange (the r11
    chain evaluated the distinct unit-concept relation once per branch —
    five parquet scans + five corpus-wide shuffles in the
    cooccurrence_metrics plan; guide §2.4 "two operations keyed the same
    way can share one exchange")."""
    return unit_concepts.groupBy("text_id").agg(
        F.sort_array(F.collect_set("concept_id")).alias("cs")
    )


def cooccurrence_chain_from_rows(
    unit_concepts: DataFrame,
    ancestors: DataFrame | None = None,
    exclude_ancestor_pairs: bool = True,
    with_pair_id: bool = True,
    persist: bool = False,
) -> DataFrame:
    """Chain entry for inputs already in (text_id, concept_id) row form
    (must be distinct, with non-null concept ids — the form
    :func:`unit_concept_rows` emits).

    Scale shape (r12): every branch — pair expansion, concept counts,
    both global totals — derives from ONE shared per-unit aggregation
    (:func:`_per_unit_concept_sets`), expressed identically so
    ReuseExchange materializes the corpus shuffle once and the other
    branches read its output. The r11 form computed the distinct
    unit-concept relation independently per branch: 5 parquet scans and
    5 corpus-wide exchanges in the measured plan, now 1 (plan diff in
    plans/r12/cooccurrence_metrics_{before,after}.txt). Branch
    equivalences: per-concept count = explode of the per-unit distinct
    sets (sets ARE the distinct relation regrouped); total_docs = row
    count of the per-unit frame (one row per distinct text_id);
    total_concepts = sum of per-concept counts, as before.

    ``persist`` additionally caches the per-unit frame (useful when the
    unit-concept relation comes from an expensive upstream chain, e.g.
    NER over raw text, where even one evaluation per downstream exchange
    is worth avoiding); at cluster scale prefer materializing it to a
    table between stages."""
    uc = unit_concepts
    if ancestors is not None:
        uc = add_ancestor_concepts(uc, ancestors)
    per_unit = _per_unit_concept_sets(uc)
    if persist:
        from pyspark.storagelevel import StorageLevel

        per_unit = per_unit.persist(StorageLevel.MEMORY_AND_DISK)
    excluded = (
        ancestor_excluded_pairs(ancestors)
        if (ancestors is not None and exclude_ancestor_pairs)
        else None
    )
    counts = per_unit.select(F.explode("cs").alias("concept_id")).groupBy(
        "concept_id"
    ).agg(F.count("*").alias("concept_count"))
    pairs = (
        per_unit.where(F.size("cs") >= 2)
        .select("text_id", F.explode(_pair_expand(F.col("cs"))).alias("p"))
        .select("text_id", "p.concept1", "p.concept2")
    )
    if excluded is not None:
        pairs = pairs.join(
            F.broadcast(excluded), ["concept1", "concept2"], "left_anti"
        )
    total_docs = per_unit.agg(F.count(F.lit(1)).alias("total_docs"))
    return cooccurrence_metrics(
        pair_counts(pairs),
        counts,
        total_docs,
        total_concept_count(counts),
        with_pair_id=with_pair_id,
    )
