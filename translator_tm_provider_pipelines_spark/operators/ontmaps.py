"""Ontology-derived side-table factories.

The reference builds several TSV side maps offline and reads them back as
pipeline side inputs; the engine computes the same relations directly from
the parsed ontology dimension (``sources/obo.read_obo_terms``):

- ``ontology_ancestor_map`` — class → is_a ancestor set. One relation
  covers three reference factories byte-for-byte in semantics:
  ``etl/util/NcbiTaxonPromotionMapFactory.java:20-38`` (every class with
  ≥1 ancestor, pipe-joined), ``etl/util/OntologyClassAncestorMapFactory``
  (same shape, generic), and the ontology path of
  ``oger/util/AncestorTableFileFactory``. It is the relation
  ``conceptfilters.promote_ncbitaxon_annots`` consumes.
- ``pr_promotion_map`` — non-gene PR class → its gene-level ancestor
  (``etl/util/PrPromotionMapFactory.java:15-55``): gene-level = a class
  whose comment contains ``Category=gene.``; with several gene-level
  ancestors the reference walks pairs and keeps one that is a descendant
  of the current pick — i.e. a DEEPEST gene-level ancestor, with the tie
  between incomparable branches falling to HashSet order. The engine
  picks deterministically: most gene-level ancestors first (= deepest
  along its chain), then minimum id. Feeds
  ``conceptfilters.promote_pr_annots``.
- ``hp_to_mondo_map`` — HP ↔ MONDO equivalence rows
  (``etl/util/MondoToHpEquivalenceMapFileFactory.java:38-165``): direct
  MONDO-side ``HP:`` xrefs plus indirect bridges through MeSH / UMLS /
  SNOMED identifiers that appear both in a MONDO ``skos:exactMatch`` and
  an HP xref; indicator ``**`` marks any direct connection, ``####`` any
  case-insensitive exact label match, in that precedence.
- ``id_to_dict_entries`` — concept id → its OGER dictionary entries
  (``etl/util/IdToOgerDictEntryMapFileFactory.java:20-52``): in the
  engine the dictionary IS a relation already, so this is the grouped
  projection; the pair form is what
  ``conceptfilters.remove_spurious_matches`` consumes.

Label and biolink-category maps (OntologyClassLabelMapFactory,
OntologyClassBiolinkCategoryMapFactory) are the ``(term_id, label)``
projection of the term dimension and ``kgxontology.ontology_kgx_nodes``'s
category column respectively — no separate operator needed.

Scale: ontologies are dimension tables; the ancestor walk reuses
``ogerdict.ancestor_pairs_for`` (scale-adaptive: driver fast path /
fully distributed frontier loop).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..sources.obo import curie
from .ogerdict import ancestor_pairs_for


def ontology_ancestor_map(terms: DataFrame) -> DataFrame:
    """(concept_id, ancestor_id): every class paired with each of its
    is_a ancestors; classes without ancestors are absent, as the
    reference skips them (NcbiTaxonPromotionMapFactory.java:28-35). The
    reference's pipe-joined TSV line is ``array_join(collect_set(...))``
    of this relation."""
    ids = terms.select(curie(F.col("term_id")).alias("id")).distinct()
    pairs = ancestor_pairs_for(terms, ids)
    return pairs.select(
        F.col("id").alias("concept_id"), F.col("anc").alias("ancestor_id")
    )


def _gene_level(terms: DataFrame) -> DataFrame:
    """CURIE ids of gene-level classes — comment contains
    ``Category=gene.`` (PrPromotionMapFactory.isGeneLevel:70-80)."""
    return (
        terms.where(F.coalesce(F.col("comment"), F.lit("")).contains("Category=gene."))
        .select(curie(F.col("term_id")).alias("gid"))
        .distinct()
    )


def pr_promotion_map(terms: DataFrame) -> DataFrame:
    """(concept_id, promoted_id): each NON-gene-level class mapped to a
    deepest gene-level ancestor (PrPromotionMapFactory.java:15-55).
    Depth among a class's gene-level ancestors is measured as each
    candidate's own gene-level-ancestor count (a strict descendant has
    strictly more); ties between incomparable branches — where the
    reference's pick depends on HashSet order — break to the minimum id,
    documented deviation."""
    gene = _gene_level(terms)
    anc = ancestor_pairs_for(
        terms, terms.select(curie(F.col("term_id")).alias("id")).distinct()
    )
    non_gene = anc.join(
        gene, anc.id == gene.gid, "left_anti"
    )  # drop gene-level classes as map KEYS (reference `continue`s them)
    gla = non_gene.join(gene, non_gene.anc == gene.gid, "left_semi").select(
        "id", F.col("anc").alias("g")
    )
    # candidate depth = how many OTHER gene-level classes are ancestors
    # of the candidate itself
    gene_anc = anc.join(gene, anc.id == gene.gid, "left_semi").join(
        gene, anc.anc == gene.gid, "left_semi"
    ).select(F.col("id").alias("g"), F.col("anc").alias("g_anc"))
    depth = gene_anc.groupBy("g").agg(F.count("*").alias("__depth"))
    ranked = (
        gla.join(depth, "g", "left")
        .na.fill({"__depth": 0})
        .groupBy("id")
        .agg(
            F.min(
                F.struct(
                    (-F.col("__depth")).alias("nd"), F.col("g").alias("g")
                )
            ).alias("best")
        )
    )
    return ranked.select(
        F.col("id").alias("concept_id"), F.col("best.g").alias("promoted_id")
    )


#: skos:exactMatch URL prefixes the reference normalizes to CURIEs
#: (MondoToHpEquivalenceMapFileFactory.java:48-62).
_BRIDGE_PREFIXES = (
    ("http://identifiers.org/mesh/", "MSH:"),
    ("http://linkedlifedata.com/resource/umls/id/", "UMLS:"),
    ("http://identifiers.org/snomedct/", "SNOMEDCT_US:"),
)


def hp_to_mondo_map(mondo_terms: DataFrame, hp_terms: DataFrame) -> DataFrame:
    """(indicator, hp_id, mondo_ids, hp_label, mondo_labels) — the HP→
    MONDO equivalence file (MondoToHpEquivalenceMapFileFactory.java
    :38-165). Direct rows come from MONDO-side ``HP:`` xrefs; indirect
    rows bridge a MeSH/UMLS/SNOMED identifier that appears both as a
    MONDO ``skos:exactMatch`` target and an HP xref. Ids and labels are
    pipe-joined in sorted-id order (the reference joins HashSet order);
    ``hp_label`` is NULL when the HP id has no class in the HP file (the
    reference prints the null through ``%s``). Indicator precedence:
    ``**`` (any direct link) over ``####`` (any case-insensitive exact
    label match) over ``''``."""
    mondo = mondo_terms.where(F.col("term_id").contains("MONDO")).select(
        curie(F.col("term_id")).alias("mondo_id"),
        F.col("label").alias("mondo_label"),
        "xrefs",
        "property_values",
    )
    hp = hp_terms.where(F.col("term_id").contains("HP")).select(
        curie(F.col("term_id")).alias("hp_id"),
        F.col("label").alias("hp_label"),
        "xrefs",
    )
    direct = mondo.select(
        "mondo_id", F.explode("xrefs").alias("x")
    ).where(F.col("x").contains("HP:")).select(
        F.col("x").alias("hp_id"), "mondo_id", F.lit(True).alias("is_direct")
    )
    bridge_curie = None
    val = F.col("pv.value")
    for url, prefix in _BRIDGE_PREFIXES:
        cand = F.when(
            val.contains(url), F.concat(F.lit(prefix), F.replace(val, F.lit(url)))
        )
        bridge_curie = cand if bridge_curie is None else F.coalesce(bridge_curie, cand)
    mondo_bridges = (
        mondo.select("mondo_id", F.explode("property_values").alias("pv"))
        .where(F.col("pv.prop").contains("exactMatch"))
        .select(bridge_curie.alias("key"), "mondo_id")
        .where(F.col("key").isNotNull())
        .distinct()
    )
    hp_bridges = (
        hp.select("hp_id", F.explode("xrefs").alias("x"))
        .select(F.col("x").alias("key"), "hp_id")
        .distinct()
    )
    bridged = mondo_bridges.join(hp_bridges, "key").select(
        "hp_id", "mondo_id", F.lit(False).alias("is_direct")
    )
    pairs = direct.unionByName(bridged)
    labeled = (
        pairs.join(
            F.broadcast(mondo.select("mondo_id", "mondo_label")), "mondo_id", "left"
        )
        .join(F.broadcast(hp.select("hp_id", "hp_label")), "hp_id", "left")
    )
    per_hp = labeled.groupBy("hp_id").agg(
        F.array_sort(
            F.collect_set(F.struct(F.col("mondo_id"), F.col("mondo_label")))
        ).alias("ms"),
        F.max("is_direct").alias("any_direct"),
        F.max(
            F.lower(F.coalesce("hp_label", F.lit("\x00")))
            == F.lower(F.coalesce("mondo_label", F.lit("\x01")))
        ).alias("any_exact"),
        F.first("hp_label").alias("hp_label"),
    )
    indicator = (
        F.when(F.col("any_direct"), "**")
        .when(F.col("any_exact"), "####")
        .otherwise("")
    )
    return per_hp.select(
        indicator.alias("indicator"),
        "hp_id",
        F.array_join(F.transform("ms", lambda m: m["mondo_id"]), "|").alias(
            "mondo_ids"
        ),
        "hp_label",
        F.array_join(
            F.transform("ms", lambda m: F.coalesce(m["mondo_label"], F.lit("null"))),
            "|",
        ).alias("mondo_labels"),
    )


def id_to_dict_entries(dictionary: DataFrame) -> DataFrame:
    """(concept_id, dict_entries): every dictionary term of a concept,
    pipe-joined sorted (IdToOgerDictEntryMapFileFactory.java:20-52 —
    the reference reads dict TSV column 2/3, i.e. exactly the
    (concept_id, term) columns of the built dictionary). Explode the
    pair form for ``conceptfilters.remove_spurious_matches``."""
    return (
        dictionary.select("concept_id", "term")
        .groupBy("concept_id")
        .agg(F.array_join(F.array_sort(F.collect_set("term")), "|").alias("dict_entries"))
    )
