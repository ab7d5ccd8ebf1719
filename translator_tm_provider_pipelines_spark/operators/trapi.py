"""TRAPI backend serialization: KGX tables → N-triples lines.

Parity with the reference's ``trapi/*.java``: the Blazegraph-backed
text-mining TRAPIs load N-triples generated from KGX node/edge files by
``OntologyKgTrapiBackendSerializer`` (ontology subclass hierarchies) and
``AssocKgTrapiBackendSerializer`` (text-mined association KGs with
evidence blank nodes).

Spark-first shape: every serializer is a projection — per input row an
ARRAY of formatted triple strings exploded to a one-column ``line``
relation (write with ``df.write.text``). No UDFs, no driver loops; the
triple text is built with ``concat``/``format_string`` inside codegen, so
serializing a 100 TB KG is a narrow scan.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

OBO = "http://purl.obolibrary.org/obo/"

#: CURIE prefix → IRI prefix (getFullySpecifiedUri switch,
#: OntologyKgTrapiBackendSerializer.java:70-129). UBERON/CHEBI-style OBO
#: prefixes expand to purl + PREFIX_; others to their registry URLs.
URI_PREFIXES: dict[str, str] = {
    "BFO": OBO + "BFO_",
    "CGNC": "http://birdgenenames.org/cgnc/",
    "CHEBI": OBO + "CHEBI_",
    "CL": OBO + "CL_",
    "EcoGene": OBO + "ECO_",
    "Ensembl": "http://ensembl.org/id/",
    "EnsemblGene": "http://ensembl.org/id/",
    "EnsembleBacteria": "http://bacteria.ensembl.org/",
    "FlyBase": "http://flybase.org/",
    "GO": OBO + "GO_",
    "HGNC": "http://www.genenames.org/cgi-bin/gene_symbol_report?hgnc_id=",
    "MOD": OBO + "MOD_",
    "NCBIGene": "http://www.ncbi.nlm.nih.gov/gene/",
    "NCBITaxon": OBO + "NCBITaxon_",
    "OBI": OBO + "OBI_",
    "PR": OBO + "PR_",
    "PomBase": "https://www.pombase.org/spombe/result/",
    "RGD": "http://rgd.mcw.edu/",
    "SGD": "https://www.yeastgenome.org/locus/",
    "SO": OBO + "SO_",
    "TAIR": "http://www.arabidopsis.org/",
    "WormBase": "http://identifiers.org/wb/",
    "ZFIN": "http://zfin.org/",
    "dictyBase": "http://dictybase.org/gene/",
    "UniProtKB": "http://purl.uniprot.org/uniprot/",
    "MGI": "http://www.informatics.jax.org/MGI_",
}

RDFS_LABEL = "<http://www.w3.org/2000/01/rdf-schema#label>"
RDFS_SUBCLASSOF = "<http://www.w3.org/2000/01/rdf-schema#subClassOf>"
RDF_TYPE = "<http://www.w3.org/1999/02/22-rdf-syntax-ns#type>"
DIRECT_TYPE = "<http://www.openrdf.org/schema/sesame#directType>"
BIOLINK = "https://w3id.org/biolink/vocab/"
XSD_DECIMAL = "<http://www.w3.org/2001/XMLSchema#decimal>"

#: association edge relations the reference serializer handles
#: (AssocKgTrapiBackendSerializer.java:188-199)
ASSOC_RELATION_URIS = {
    "RO:0002212": f"<{OBO}RO_0002212>",  # negatively regulates
    "RO:0002213": f"<{OBO}RO_0002213>",  # positively regulates
}


def full_uri(id_col: Column, strict: bool = True) -> Column:
    """``<…>``-wrapped IRI for a CURIE via :data:`URI_PREFIXES`. With
    ``strict`` unmapped prefixes raise (the reference throws
    IllegalArgumentException); otherwise they yield NULL for the caller
    to filter.

    The suffix is element 1 of the colon split — for multi-colon CURIEs
    (``MGI:MGI:97490``) this yields the segment between the first and
    second colon, matching the reference's ``id.split(":")[1]``
    (OntologyKgTrapiBackendSerializer.java:69-71), which splits on every
    colon too. Deliberately NOT substring-after-first-colon."""
    prefix = F.split(id_col, ":").getItem(0)
    suffix = F.split(id_col, ":").getItem(1)
    m = F.create_map(*[F.lit(x) for kv in URI_PREFIXES.items() for x in kv])
    uri = F.when(
        m[prefix].isNotNull(), F.concat(F.lit("<"), m[prefix], suffix, F.lit(">"))
    )
    if strict:
        uri = F.when(uri.isNotNull(), uri).otherwise(
            F.raise_error(F.concat(F.lit("Unhandled id type: "), id_col))
        )
    return uri


def biolink_uri(label_col: Column) -> Column:
    """biolink:X → <https://w3id.org/biolink/vocab/X>."""
    return F.concat(
        F.lit("<"), F.replace(label_col, F.lit("biolink:"), F.lit(BIOLINK)), F.lit(">")
    )


def _lines(df: DataFrame, triples: list[Column]) -> DataFrame:
    return df.select(F.explode(F.array(*triples)).alias("line"))


def _t(s: Column, p: str | Column, o: Column) -> Column:
    pred = F.lit(p) if isinstance(p, str) else p
    return F.concat_ws(" ", s, pred, o, F.lit("."))


def _lit_en(c: Column) -> Column:
    return F.concat(F.lit('"'), c, F.lit('"@en'))


def ontology_nodes_nt(nodes: DataFrame, strict: bool = True) -> DataFrame:
    """KGX ontology nodes (id, name, category) → three triples per node:
    biolink id, rdfs label, rdfs subClassOf the biolink category
    (serializeNodes, OntologyKgTrapiBackendSerializer.java:21-67)."""
    df = nodes.withColumn("__uri", full_uri(F.col("id"), strict))
    if not strict:
        df = df.where(F.col("__uri").isNotNull())
    return _lines(
        df,
        [
            _t(F.col("__uri"), f"<{BIOLINK}id>", _lit_en(F.col("id"))),
            _t(F.col("__uri"), RDFS_LABEL, _lit_en(F.col("name"))),
            _t(F.col("__uri"), RDFS_SUBCLASSOF, biolink_uri(F.col("category"))),
        ],
    )


def ontology_edges_nt(edges: DataFrame, strict: bool = True) -> DataFrame:
    """KGX ontology edges → one ``subj <edge_label-as-biolink-uri> obj``
    triple each (serializeEdges, OntologyKgTrapiBackendSerializer.java:
    132-166)."""
    df = edges.withColumn("__s", full_uri(F.col("subject"), strict)).withColumn(
        "__o", full_uri(F.col("object"), strict)
    )
    if not strict:
        df = df.where(F.col("__s").isNotNull() & F.col("__o").isNotNull())
    return _lines(df, [_t(F.col("__s"), biolink_uri(F.col("edge_label")), F.col("__o"))])


def assoc_entity_nodes_nt(nodes: DataFrame) -> DataFrame:
    """Text-mined-KG entity nodes → obo-purl subjects with biolink id /
    label / subClassOf-category triples; PR: entities are GeneProduct +
    GeneOrGeneProduct, everything else ChemicalSubstance
    (serializeNodes 3-column branch, AssocKgTrapiBackendSerializer.java:
    38-71)."""
    uri = F.concat(F.lit("<" + OBO), F.replace(F.col("id"), F.lit(":"), F.lit("_")), F.lit(">"))
    is_pr = F.col("id").startswith("PR:")
    cat1 = F.when(is_pr, F.lit(f"<{BIOLINK}GeneProduct>")).otherwise(
        F.lit(f"<{BIOLINK}ChemicalSubstance>")
    )
    df = nodes.withColumn("__uri", uri)
    base = [
        _t(F.col("__uri"), f"<{BIOLINK}id>", _lit_en(F.col("id"))),
        _t(F.col("__uri"), RDFS_LABEL, _lit_en(F.col("name"))),
        _t(F.col("__uri"), RDFS_SUBCLASSOF, cat1),
    ]
    second = F.when(
        is_pr, _t(F.col("__uri"), RDFS_SUBCLASSOF, F.lit(f"<{BIOLINK}GeneOrGeneProduct>"))
    )
    return df.select(
        F.explode(F.array_compact(F.array(*base, second))).alias("line")
    )


def assoc_evidence_nodes_nt(evidence: DataFrame) -> DataFrame:
    """Evidence nodes (KGX_NODE_WITH_EVIDENCE_HEADER columns: id, name,
    category, publications, score, sentence, subject_spans,
    relation_spans, object_spans, provided_by) → blank-node triples
    (serializeNodes evidence branch, AssocKgTrapiBackendSerializer.java:
    72-150)."""
    ev = F.concat(F.lit("<_:"), F.col("id"), F.lit("_evidence>"))
    df = evidence.withColumn("__ev", ev)
    return _lines(
        df,
        [
            _t(F.col("__ev"), RDF_TYPE, F.lit(f"<{BIOLINK}InformationContentEntity>")),
            _t(F.col("__ev"), RDF_TYPE, F.lit(f"<{BIOLINK}TextMinedEvidence>")),
            _t(F.col("__ev"), f"<{BIOLINK}id>", _lit_en(F.col("id"))),
            _t(F.col("__ev"), f"<{BIOLINK}name>", _lit_en(F.col("name"))),
            _t(F.col("__ev"), f"<{BIOLINK}publications>", _lit_en(F.col("publications"))),
            _t(F.col("__ev"), f"<{BIOLINK}sentence>", _lit_en(F.col("sentence"))),
            _t(F.col("__ev"), f"<{BIOLINK}subject_spans>", _lit_en(F.col("subject_spans"))),
            _t(F.col("__ev"), f"<{BIOLINK}object_spans>", _lit_en(F.col("object_spans"))),
            _t(F.col("__ev"), f"<{BIOLINK}provided_by>", _lit_en(F.col("provided_by"))),
            _t(
                F.col("__ev"),
                f"<{BIOLINK}score>",
                F.concat(F.lit('"'), F.col("score"), F.lit('"^^' + XSD_DECIMAL)),
            ),
        ],
    )


def assoc_edges_nt(edges: DataFrame) -> DataFrame:
    """Association edges (kgx_edges columns incl. ``evidence_ids``
    '|'-joined) → subj/obj/assoc blank-node triple blocks + one evidence
    link per evidence id (serializeEdges,
    AssocKgTrapiBackendSerializer.java:156-295). Relations outside the
    RO:0002212/0002213 switch raise, like the reference."""
    rel_map = F.create_map(
        *[F.lit(x) for kv in ASSOC_RELATION_URIS.items() for x in kv]
    )
    rel_uri = rel_map[F.col("relation")]
    rel_uri = F.when(rel_uri.isNotNull(), rel_uri).otherwise(
        F.raise_error(F.concat(F.lit("Unhandled relation ("), F.col("relation"), F.lit(")")))
    )
    subj_i = F.concat(F.lit("<_:"), F.col("id"), F.lit("_subj>"))
    obj_i = F.concat(F.lit("<_:"), F.col("id"), F.lit("_obj>"))
    assoc_i = F.concat(F.lit("<_:"), F.col("id"), F.lit("_assoc>"))
    subj_uri = F.concat(
        F.lit("<" + OBO), F.replace(F.col("subject"), F.lit(":"), F.lit("_")), F.lit(">")
    )
    obj_uri = F.concat(
        F.lit("<" + OBO), F.replace(F.col("object"), F.lit(":"), F.lit("_")), F.lit(">")
    )
    df = (
        edges.withColumn("__rel", rel_uri)
        .withColumn("__subj_i", subj_i)
        .withColumn("__obj_i", obj_i)
        .withColumn("__assoc_i", assoc_i)
        .withColumn("__subj_uri", subj_uri)
        .withColumn("__obj_uri", obj_uri)
    )
    ev_links = F.transform(
        F.split(F.col("evidence_ids"), r"\|"),
        lambda e: _t(
            F.col("__assoc_i"),
            F.lit(f"<{BIOLINK}evidence>"),
            F.concat(F.lit("<_:"), e, F.lit("_evidence>")),
        ),
    )
    fixed = F.array(
        _t(F.col("__subj_i"), RDF_TYPE, F.lit(f"<{BIOLINK}ChemicalSubstance>")),
        _t(F.col("__subj_i"), RDF_TYPE, F.col("__subj_uri")),
        _t(F.col("__subj_i"), DIRECT_TYPE, F.col("__subj_uri")),
        _t(F.col("__obj_i"), RDF_TYPE, F.lit(f"<{BIOLINK}GeneProduct>")),
        _t(F.col("__obj_i"), RDF_TYPE, F.lit(f"<{BIOLINK}GeneOrGeneProduct>")),
        _t(F.col("__obj_i"), RDF_TYPE, F.col("__obj_uri")),
        _t(F.col("__obj_i"), DIRECT_TYPE, F.col("__obj_uri")),
        _t(F.col("__subj_i"), F.col("__rel"), F.col("__obj_i")),
        _t(F.col("__assoc_i"), RDF_TYPE, F.lit(f"<{BIOLINK}ChemicalToGeneAssociation>")),
        _t(F.col("__assoc_i"), RDF_TYPE, F.lit(f"<{BIOLINK}Association>")),
        _t(F.col("__assoc_i"), f"<{BIOLINK}subject>", F.col("__subj_i")),
        _t(F.col("__assoc_i"), f"<{BIOLINK}object>", F.col("__obj_i")),
        _t(F.col("__assoc_i"), f"<{BIOLINK}id>", _lit_en(F.col("id"))),
        _t(F.col("__assoc_i"), f"<{BIOLINK}relation>", F.col("__rel")),
    )
    return df.select(F.explode(F.concat(fixed, ev_links)).alias("line"))


# ---------------------------------------------------------------------------
# PR → UniProt map (trapi/PrToUniProtMapFileCreator.java)
# ---------------------------------------------------------------------------

#: the only_in_taxon object property (PrToUniProtMapFileCreator.java:31);
#: OBO flat files write the relationship under either shorthand
ONLY_IN_TAXON_RELS = ("only_in_taxon", "RO:0002160")
HUMAN_TAXON = "NCBITaxon:9606"


def pr_to_uniprot_map(terms: DataFrame) -> DataFrame:
    """(pr_id, uniprot_id, taxon_id) — PrToUniProtMapFileCreator
    .createPrToUniProtMapFile:34-66 over the PR term dimension:

    - a non-gene class with a ``UniProtKB:`` xref maps directly
      (retrieveUniProtMappingDirect:84-97), taxon from its
      ``only_in_taxon`` relationship when present;
    - a gene-level class (comment contains ``Category=gene.`` —
      isGeneLevel:130-140) IGNORES its own xrefs and walks at most two
      subclass levels for a HUMAN class carrying a UniProtKB xref
      (findHumanSubclassWithUniprotXref:99-128); its pr_id is emitted with
      the found descendant's uniprot/taxon. Children beat grandchildren;
      the reference breaks remaining ties by HashSet iteration order, so
      the engine picks the minimum (child, grandchild) id path —
      deterministic under any partitioning.

    Plan shape: the term dimension joins itself twice on the ``is_a`` edge
    list (ontologies are dimension-sized; these are broadcast-scale
    equi-joins) and a per-gene window picks the winning path."""
    from pyspark.sql import Window

    taxon_of = F.array_min(
        F.filter(
            F.col("relationships"),
            lambda r: r["rel"].isin(*ONLY_IN_TAXON_RELS),
        )
    )["target"]
    base = terms.select(
        F.col("term_id"),
        F.array_min(
            F.filter(F.col("xrefs"), lambda x: x.startswith("UniProtKB:"))
        ).alias("uniprot_id"),
        taxon_of.alias("taxon_id"),
        F.coalesce(F.col("comment").contains("Category=gene."), F.lit(False)).alias(
            "__is_gene"
        ),
        F.col("parents"),
    )
    edges = base.select(
        F.explode("parents").alias("parent"), F.col("term_id").alias("child")
    )
    direct = base.where(~F.col("__is_gene") & F.col("uniprot_id").isNotNull()).select(
        F.col("term_id").alias("pr_id"), "uniprot_id", "taxon_id"
    )

    qualifying = base.where(
        (F.col("taxon_id") == HUMAN_TAXON) & F.col("uniprot_id").isNotNull()
    ).select(
        F.col("term_id").alias("__q"), "uniprot_id", "taxon_id"
    )
    genes = base.where(F.col("__is_gene")).select(F.col("term_id").alias("pr_id"))
    level1 = (
        genes.join(edges, genes.pr_id == edges.parent)
        .join(qualifying, F.col("child") == F.col("__q"))
        .select(
            "pr_id",
            "uniprot_id",
            "taxon_id",
            F.lit(1).alias("__lvl"),
            F.col("child").alias("__path"),
        )
    )
    grand = edges.select(
        F.col("parent").alias("gp"), F.col("child").alias("mid")
    ).join(edges, F.col("mid") == edges.parent)
    level2 = (
        genes.join(grand, genes.pr_id == F.col("gp"))
        .join(qualifying, F.col("child") == F.col("__q"))
        .select(
            "pr_id",
            "uniprot_id",
            "taxon_id",
            F.lit(2).alias("__lvl"),
            F.concat_ws("|", "mid", "child").alias("__path"),
        )
    )
    w = Window.partitionBy("pr_id").orderBy("__lvl", "__path")
    via_descendants = (
        level1.unionByName(level2)
        .withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .select("pr_id", "uniprot_id", "taxon_id")
    )
    return direct.unionByName(via_descendants)
