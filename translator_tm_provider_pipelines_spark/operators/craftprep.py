"""CRAFT gold-standard preparation operators: GO_MF extension-class
reversion, ontology-id exclusion, and the exact-overlap consolidation mode
of the nested-concept exclusion.

Reference (corpora/craft/):
- ``CraftGoMfExtReverter.java:1`` — turn ``GO_EXT:`` extension-class
  annotations back into normal GO classes and merge them into the original
  GO_MF annotation set, keeping only classes present in the ontology
  (revertExt:33-73).
- ``ExcludeCraftConceptsByOntologyId.java:1`` — remove gold-standard
  annotations whose concept is individually excluded or a descendant of an
  excluded root (excludeClasses:61-124), mirroring the OGER dictionary
  factories' exclusion lists.
- ``ExcludeCraftNestedConcepts.java:1`` — the NO-exact-overlap mode is
  :func:`..conceptfilters.remove_nested_annotations` (sweep-line); here
  lives the CHOOSE_ONE_SEMI_RANDOMLY mode
  (identifyNestedAnnotations:238-295: same aggregate span → drop the
  alphabetically-last concept id, i.e. keep the alphabetically first).

The reference walks BioNLP files one at a time through the OWL API; here
annotations are the standard exploded annotations frame
(doc_id, concept_id, spans ARRAY<STRUCT<start,end>>), ontology membership
is a broadcast semi-join, and exclusion closures reuse
:func:`..operators.ogerdict.transitive_descendants`.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F


def revert_go_mf_ext(
    orig_annots: DataFrame, ext_annots: DataFrame, ontology_ids: DataFrame
) -> DataFrame:
    """Merge reverted extension-class annotations into the original set:
    every ``GO_EXT:`` id loses its ``_EXT`` suffix, and only annotations
    whose (reverted) concept exists in the ontology are added
    (CraftGoMfExtReverter.revertExt:33-73 — the OWL class-presence check
    becomes a broadcast semi-join on the term-id relation, expected column
    ``term_id``)."""
    reverted = ext_annots.withColumn(
        "concept_id", F.regexp_replace("concept_id", "_EXT", "")
    )
    present = reverted.join(
        F.broadcast(
            ontology_ids.select(F.col("term_id").alias("concept_id")).distinct()
        ),
        "concept_id",
        "left_semi",
    )
    return orig_annots.unionByName(present)


def exclude_concepts_by_ontology_id(
    annots: DataFrame,
    excluded_ids: DataFrame | Iterable[str],
) -> DataFrame:
    """Drop annotations whose concept id is in the exclusion set
    (ExcludeCraftConceptsByOntologyId.excludeClasses:61-124). Build the set
    with :func:`..operators.ogerdict.transitive_descendants` over the
    individual ids + excluded roots, exactly as the reference unions
    individually-excluded classes with root descendants. Accepts a
    one-column DataFrame (``id``) or a plain iterable."""
    if isinstance(excluded_ids, DataFrame):
        return annots.join(
            F.broadcast(excluded_ids.select(F.col("id").alias("concept_id"))),
            "concept_id",
            "left_anti",
        )
    ids = sorted(set(excluded_ids))
    if not ids:
        return annots
    return annots.where(~F.col("concept_id").isin(*ids))


def choose_one_exact_overlap(annots: DataFrame) -> DataFrame:
    """Consolidate annotations sharing an identical aggregate span within a
    document by keeping the alphabetically-FIRST concept id — the
    CHOOSE_ONE_SEMI_RANDOMLY branch of
    ExcludeCraftNestedConcepts.identifyNestedAnnotations:238-265 (the
    pairwise scan drops the alphabetically-last id of every same-span pair,
    which collapses to min-id-wins). One window over (doc, span) — no
    self-join."""
    keyed = annots.select(
        "*",
        F.aggregate(
            F.col("spans"), F.lit(2147483647), lambda a, s: F.least(a, s["start"])
        ).alias("__s"),
        F.aggregate(
            F.col("spans"), F.lit(-2147483648), lambda a, s: F.greatest(a, s["end"])
        ).alias("__e"),
    )
    w = Window.partitionBy("doc_id", "__s", "__e")
    return (
        keyed.withColumn("__min_id", F.min("concept_id").over(w))
        .where(F.col("concept_id") == F.col("__min_id"))
        .drop("__s", "__e", "__min_id")
    )
