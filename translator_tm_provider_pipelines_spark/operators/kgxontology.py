"""Ontology → KGX export (kg/ontology_kg/OntologyToKgx.java parity).

The reference walks an ontology with the OWL API, assigns biolink
categories per concept (prefix map + GO-namespace + SO-gene-ancestry
rules), and serializes KGX node/edge TSVs with base64-sha1 edge ids
(``KgxNode.java``, ``KgxEdge.java``, ``KgxUtil.java``).

Spark-first shape: the ontology arrives as the distributed term dimension
from ``sources/obo.read_obo_terms``; categories are pure column
expressions over literal maps; the gene flag is a broadcast semi-join
against the SO:0001217 descendant closure; edges are an explode of
``is_a`` + ``relationship`` lines joined (broadcast, dimension-size)
against node categories for the association lookup. Everything stays
JVM-side; the only shuffles are the final per-id dedups.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from ..functions.hashing import sha1_base64
from .ogerdict import ISIN_LITERAL_CAP, transitive_descendant_ids, transitive_descendants

BIOLINK_THING = "biolink:Thing"

#: prefix → biolink category (getCategory switch, OntologyToKgx.java:572-625)
PREFIX_CATEGORIES = {
    "CHEBI": "biolink:ChemicalSubstance",
    "CL": "biolink:Cell",
    "HGNC": "biolink:Gene",
    "HP": "biolink:PhenotypicFeature",
    "MONDO": "biolink:Disease",
    "MOP": "biolink:MolecularActivity",
    "NCBITaxon": "biolink:OrganismTaxon",
    "PR": "biolink:GeneProduct",
    "SO": "biolink:SequenceFeature*",
    "UBERON": "biolink:AnatomicalEntity",
}

#: GO namespace → category (getGoCategory, OntologyToKgx.java:659-676)
GO_NAMESPACE_CATEGORIES = {
    "biological_process": "biolink:BiologicalProcess",
    "cellular_component": "biolink:CellularComponent",
    "molecular_function": "biolink:MolecularActivity",
}

#: SO 'gene' — ancestry of this class marks biolink:Gene for prefixes not
#: covered by the prefix switch (isGene, OntologyToKgx.java:627-631)
SO_GENE = "SO:0001217"

#: OBI 'organism' special case (OntologyToKgx.java:268-270)
OBI_ORGANISM = "OBI:0100026"
BIOLINK_ORGANISMAL_ENTITY = "biolink:OrganismalEntity"

SUBCLASS_OF = "SUBCLASS_OF"

#: relation → (biolink edge label, relation CURIE); keys are the CURIE /
#: OBO-name forms of the reference's IRI-keyed maps
#: (getRelationToBiolinkMap / getRelationToCurieMap,
#: OntologyToKgx.java:121-160). OBO flat files write well-known relations
#: by name (part_of, has_part, …), so those aliases map too.
RELATION_MAP: dict[str, tuple[str, str]] = {
    SUBCLASS_OF: ("biolink:subClassOf", "rdfs:subClassOf"),
    "RO:0002180": ("biolink:has_component*", "RO:0002180"),
    "has_component": ("biolink:has_component*", "RO:0002180"),
    "RO:0002160": ("biolink:in_taxon", "RO:0002160"),
    "only_in_taxon": ("biolink:in_taxon", "RO:0002160"),
    "PR:lacks_part": ("biolink:lacks_part*", "PR:lacks_part"),
    "lacks_part": ("biolink:lacks_part*", "PR:lacks_part"),
    "PR:non_covalently_bound_to": (
        "biolink:non_covalently_bound_to*",
        "PR:non_covalently_bound_to",
    ),
    "non_covalently_bound_to": (
        "biolink:non_covalently_bound_to*",
        "PR:non_covalently_bound_to",
    ),
    "RO:0002353": ("biolink:output_of*", "RO:0002353"),
    "output_of": ("biolink:output_of*", "RO:0002353"),
    "RO:0001000": ("biolink:derives_from", "RO:0001000"),
    "derives_from": ("biolink:derives_from", "RO:0001000"),
    "RO:0002331": ("biolink:participates_in", "RO:0002331"),
    "involved_in": ("biolink:participates_in", "RO:0002331"),
    "RO:0000086": ("biolink:has_quality*", "RO:0000086"),
    "has_quality": ("biolink:has_quality*", "RO:0000086"),
    "PR:has_gene_template": ("biolink:has_gene_template*", "PR:has_gene_template"),
    "has_gene_template": ("biolink:has_gene_template*", "PR:has_gene_template"),
    "BFO:0000050": ("biolink:part_of", "BFO:0000050"),
    "part_of": ("biolink:part_of", "BFO:0000050"),
    "RO:0001025": ("biolink:located_in", "RO:0001025"),
    "located_in": ("biolink:located_in", "RO:0001025"),
    "RO:0002215": ("biolink:capable_of", "RO:0002215"),
    "capable_of": ("biolink:capable_of", "RO:0002215"),
    "BFO:0000051": ("biolink:has_part", "BFO:0000051"),
    "has_part": ("biolink:has_part", "BFO:0000051"),
}

_GENE_TO_GENE = "biolink:GeneToGeneAssociation"
_GENE_TO_THING = "biolink:GeneToThingAssociation"
_GENE_TO_GENE_PRODUCT = "biolink:GeneToGeneProductRelationship"
_CHEM_TO_GENE = "biolink:ChemicalToGeneAssociation"
_ASSOC = "biolink:Association"

#: (source category, target category, relation CURIE) → association type
#: (getAssociationMap, OntologyToKgx.java:162-231; IRI relations rewritten
#: to their CURIEs)
ASSOCIATION_MAP: dict[tuple[str, str, str], str] = {
    ("biolink:GeneProduct", "biolink:Thing", "PR:lacks_part"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:GeneProduct", "RO:0002180"): _GENE_TO_GENE,
    ("biolink:GeneProduct", "biolink:OrganismTaxon", "RO:0002160"): _GENE_TO_THING,
    ("biolink:Thing", "biolink:GeneProduct", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:SequenceFeature*", "biolink:Thing", SUBCLASS_OF): _ASSOC,
    ("biolink:GeneProduct", "biolink:GeneProduct", "PR:has_gene_template"): _GENE_TO_GENE_PRODUCT,
    ("biolink:GeneProduct", "biolink:ChemicalSubstance", "BFO:0000051"): _CHEM_TO_GENE,
    ("biolink:GeneProduct", "biolink:SequenceFeature*", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:Gene", "PR:has_gene_template"): _GENE_TO_GENE_PRODUCT,
    ("biolink:GeneProduct", "biolink:SequenceFeature*", "PR:has_gene_template"): _GENE_TO_THING,
    ("biolink:BiologicalProcess", "biolink:Thing", SUBCLASS_OF): _ASSOC,
    ("biolink:Cell", "biolink:Cell", SUBCLASS_OF): _ASSOC,
    ("biolink:OrganismTaxon", "biolink:OrganismalEntity", SUBCLASS_OF): _ASSOC,
    ("biolink:GeneProduct", "biolink:BiologicalProcess", "RO:0002353"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:BiologicalProcess", "RO:0002331"): _GENE_TO_THING,
    ("biolink:OrganismalEntity", "biolink:Thing", SUBCLASS_OF): _ASSOC,
    ("biolink:SequenceFeature*", "biolink:GeneProduct", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:GeneProduct", "PR:lacks_part"): _GENE_TO_GENE,
    ("biolink:BiologicalProcess", "biolink:BiologicalProcess", SUBCLASS_OF): _ASSOC,
    ("biolink:Gene", "biolink:OrganismTaxon", "RO:0002160"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:CellularComponent", "BFO:0000050"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:ChemicalSubstance", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:Gene", "biolink:SequenceFeature*", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:CellularComponent", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:ChemicalSubstance", "PR:non_covalently_bound_to"): _CHEM_TO_GENE,
    ("biolink:CellularComponent", "biolink:CellularComponent", SUBCLASS_OF): _ASSOC,
    ("biolink:GeneProduct", "biolink:GeneProduct", "BFO:0000050"): _GENE_TO_GENE,
    ("biolink:Thing", "biolink:Thing", SUBCLASS_OF): _ASSOC,
    ("biolink:CellularComponent", "biolink:Thing", SUBCLASS_OF): _ASSOC,
    ("biolink:GeneProduct", "biolink:SequenceFeature*", "PR:lacks_part"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:GeneProduct", "RO:0001000"): _GENE_TO_GENE,
    ("biolink:GeneProduct", "biolink:GeneProduct", SUBCLASS_OF): _GENE_TO_GENE,
    ("biolink:OrganismTaxon", "biolink:OrganismTaxon", SUBCLASS_OF): _ASSOC,
    ("biolink:GeneProduct", "biolink:SequenceFeature*", "BFO:0000051"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:GeneProduct", "BFO:0000051"): _GENE_TO_GENE,
    ("biolink:GeneProduct", "biolink:Thing", "BFO:0000051"): _GENE_TO_THING,
    ("biolink:ChemicalSubstance", "biolink:GeneProduct", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:Cell", "BFO:0000050"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:ChemicalSubstance", "RO:0002180"): _CHEM_TO_GENE,
    ("biolink:ChemicalSubstance", "biolink:Thing", SUBCLASS_OF): _ASSOC,
    ("biolink:SequenceFeature*", "biolink:SequenceFeature*", "RO:0000086"): _ASSOC,
    ("biolink:GeneProduct", "biolink:MolecularActivity", "RO:0002215"): _GENE_TO_THING,
    ("biolink:SequenceFeature*", "biolink:SequenceFeature*", SUBCLASS_OF): _ASSOC,
    ("biolink:GeneProduct", "biolink:CellularComponent", "RO:0001025"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:Thing", "RO:0002180"): _GENE_TO_THING,
    ("biolink:GeneProduct", "biolink:Thing", SUBCLASS_OF): _GENE_TO_THING,
    ("biolink:ChemicalSubstance", "biolink:ChemicalSubstance", SUBCLASS_OF): _ASSOC,
}


def _category(prefix: Column, namespace: Column, is_gene: Column) -> Column:
    """getCategory (OntologyToKgx.java:572-625): the prefix switch
    overrides the gene flag for listed prefixes (GO resolves through its
    namespace and may yield NULL there); unresolved → biolink:Thing."""
    go_cat = F.create_map(
        *[F.lit(x) for kv in GO_NAMESPACE_CATEGORIES.items() for x in kv]
    )[namespace]
    switch = F.create_map(
        *[F.lit(x) for kv in PREFIX_CATEGORIES.items() for x in kv]
    )[prefix]
    in_switch = prefix.isin(list(PREFIX_CATEGORIES) + ["GO"])
    resolved = F.when(prefix == "GO", go_cat).otherwise(switch)
    gene_cat = F.when(is_gene, F.lit("biolink:Gene"))
    return F.coalesce(
        F.when(in_switch, resolved).otherwise(gene_cat), F.lit(BIOLINK_THING)
    )


def _with_categories(terms: DataFrame) -> DataFrame:
    """term dimension + (prefix, category, uniprot_id) attribute columns
    (addAttributes, OntologyToKgx.java:525-558)."""
    gene_id_list = transitive_descendant_ids(terms, [SO_GENE])
    if gene_id_list is not None and len(gene_id_list) <= ISIN_LITERAL_CAP:
        # dimension-size closure → literal predicate, no broadcast-join
        # round (r12, guide §2.4)
        flagged = terms.withColumn("__gene", F.col("term_id").isin(gene_id_list))
    else:
        gene_ids = (
            terms.sparkSession.createDataFrame(
                [(r,) for r in gene_id_list], "id string"
            )
            if gene_id_list is not None
            else transitive_descendants(terms, [SO_GENE])
        )
        flagged = terms.join(
            F.broadcast(
                gene_ids.select(F.col("id").alias("term_id"), F.lit(True).alias("__gene"))
            ),
            "term_id",
            "left",
        )
    prefix = F.split(F.col("term_id"), ":").getItem(0)
    cat = _category(prefix, F.col("namespace"), F.coalesce(F.col("__gene"), F.lit(False)))
    # OBI 'organism' special case (:268-270)
    cat = F.when(
        (F.col("term_id") == OBI_ORGANISM) & (cat == BIOLINK_THING),
        F.lit(BIOLINK_ORGANISMAL_ENTITY),
    ).otherwise(cat)
    # deterministic pick of the UniProtKB xref (the reference takes an
    # arbitrary set element; we take the minimum for reproducibility)
    uniprot = F.array_min(F.filter(F.col("xrefs"), lambda x: x.startswith("UniProtKB:")))
    return flagged.select(
        "term_id",
        "label",
        "parents",
        "relationships",
        cat.alias("category"),
        uniprot.alias("uniprot_id"),
    )


def ontology_kgx_nodes(terms: DataFrame, attrs: DataFrame | None = None) -> DataFrame:
    """KGX node rows (id, name, category) for every ontology class, plus
    biolink:GeneProduct nodes for UniProtKB same-as cross-references
    (writeNode + serializeUniprotPrSameAs, OntologyToKgx.java:316-330,
    352-364). One distinct-by-id shuffle.

    ``attrs`` lets one program share a single :func:`_with_categories`
    derivation (gene-closure collect + category columns) between the node
    and edge exports instead of re-deriving it per export (r12)."""
    if attrs is None:
        attrs = _with_categories(terms)
    class_nodes = attrs.select(
        F.col("term_id").alias("id"), F.col("label").alias("name"), "category"
    )
    uniprot_nodes = attrs.where(F.col("uniprot_id").isNotNull()).select(
        F.col("uniprot_id").alias("id"),
        F.col("label").alias("name"),
        F.lit("biolink:GeneProduct").alias("category"),
    )
    return class_nodes.unionByName(uniprot_nodes).dropDuplicates(["id"])


def ontology_kgx_edges(terms: DataFrame, attrs: DataFrame | None = None) -> DataFrame:
    """KGX edge rows (subject, edge_label, object, relation, id,
    association_type): SUBCLASS_OF from ``is_a`` + typed ``relationship``
    lines + UniProt same-as; edge id = base64-sha1 of
    'subject|edge_label|object|relation|association' (KgxEdge.getId).
    Association types resolve from (source cat, target cat, relation);
    unmapped combinations keep the reference's literal 'null'.

    ``attrs`` shares one :func:`_with_categories` derivation with the
    node export (r12)."""
    if attrs is None:
        attrs = _with_categories(terms)
    cats = F.broadcast(
        attrs.select(F.col("term_id").alias("__t"), F.col("category").alias("__cat"))
    )

    rels = F.concat(
        F.transform(
            F.col("parents"),
            lambda p: F.struct(F.lit(SUBCLASS_OF).alias("rel"), p.alias("target")),
        ),
        F.col("relationships"),
    )
    raw = attrs.select(
        F.col("term_id").alias("subject"),
        F.col("category").alias("subject_category"),
        F.explode(rels).alias("r"),
    ).select(
        "subject",
        "subject_category",
        F.col("r.rel").alias("rel"),
        F.col("r.target").alias("object"),
    )

    rel_map = F.create_map(
        *[
            F.lit(x)
            for rel, (lbl, cur) in RELATION_MAP.items()
            for x in (rel, lbl + "\t" + cur)
        ]
    )
    assoc_map = F.create_map(
        *[
            F.lit(x)
            for (sc, tc, rel), assoc in ASSOCIATION_MAP.items()
            for x in (sc + "\t" + tc + "\t" + rel, assoc)
        ]
    )

    typed = (
        raw.join(cats, raw.object == cats.__t)
        .withColumn("__lblcur", rel_map[F.col("rel")])
        .select(
            "subject",
            # relations absent from RELATION_MAP serialize as the literal
            # "null" — KgxEdge.getId / toKgxString use String.format("%s")
            # on null fields (KgxEdge.java:28-30,61-62)
            F.coalesce(F.split("__lblcur", "\t").getItem(0), F.lit("null")).alias(
                "edge_label"
            ),
            "object",
            F.coalesce(F.split("__lblcur", "\t").getItem(1), F.lit("null")).alias(
                "relation"
            ),
            F.coalesce(
                assoc_map[
                    F.concat_ws(
                        "\t",
                        "subject_category",
                        F.col("__cat"),
                        # association lookup uses the relation CURIE form
                        F.when(F.col("rel") == SUBCLASS_OF, F.lit(SUBCLASS_OF)).otherwise(
                            F.split("__lblcur", "\t").getItem(1)
                        ),
                    )
                ],
                F.lit("null"),  # reference String.format of a missing key
            ).alias("association_type"),
        )
    )

    uniprot = (
        attrs.where(F.col("uniprot_id").isNotNull())
        .select(
            F.col("term_id").alias("subject"),
            F.lit("biolink:same_as").alias("edge_label"),
            F.col("uniprot_id").alias("object"),
            F.lit("owl:equivalentClass").alias("relation"),
            F.lit(_GENE_TO_GENE).alias("association_type"),
        )
    )

    edges = typed.unionByName(uniprot)
    return edges.withColumn(
        "id",
        sha1_base64(
            F.concat_ws(
                "|", "subject", "edge_label", "object", "relation", "association_type"
            )
        ),
    ).dropDuplicates(["id"]).select(
        "subject", "edge_label", "object", "relation", "id", "association_type"
    )
