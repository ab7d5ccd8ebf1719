"""TRAPI N-triples serializers: URI mapping, strict mode, triple shapes."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import trapi


def test_ontology_nodes_triples(spark):
    nodes = spark.createDataFrame(
        [("CHEBI:3215", "bupivacaine", "biolink:ChemicalSubstance")],
        "id string, name string, category string",
    )
    lines = sorted(r.line for r in trapi.ontology_nodes_nt(nodes).collect())
    assert lines == [
        '<http://purl.obolibrary.org/obo/CHEBI_3215> '
        '<http://www.w3.org/2000/01/rdf-schema#label> "bupivacaine"@en .',
        '<http://purl.obolibrary.org/obo/CHEBI_3215> '
        '<http://www.w3.org/2000/01/rdf-schema#subClassOf> '
        '<https://w3id.org/biolink/vocab/ChemicalSubstance> .',
        '<http://purl.obolibrary.org/obo/CHEBI_3215> '
        '<https://w3id.org/biolink/vocab/id> "CHEBI:3215"@en .',
    ]


def test_non_obo_prefix_uris(spark):
    nodes = spark.createDataFrame(
        [("HGNC:1100", "BRCA1", "biolink:Gene")], "id string, name string, category string"
    )
    lines = [r.line for r in trapi.ontology_nodes_nt(nodes).collect()]
    assert any(
        l.startswith("<http://www.genenames.org/cgi-bin/gene_symbol_report?hgnc_id=1100>")
        for l in lines
    )


def test_strict_raises_on_unknown_prefix(spark):
    nodes = spark.createDataFrame(
        [("NOPE:1", "x", "biolink:Thing")], "id string, name string, category string"
    )
    with pytest.raises(Exception, match="Unhandled id type"):
        trapi.ontology_nodes_nt(nodes, strict=True).collect()
    assert trapi.ontology_nodes_nt(nodes, strict=False).count() == 0


def test_assoc_entity_pr_gets_two_categories(spark):
    nodes = spark.createDataFrame(
        [("PR:000031567", "LRRC3B"), ("CHEBI:3215", "bupivacaine")],
        "id string, name string",
    )
    lines = [r.line for r in trapi.assoc_entity_nodes_nt(nodes).collect()]
    pr = [l for l in lines if "PR_000031567" in l]
    assert len(pr) == 4  # id, label, GeneProduct, GeneOrGeneProduct
    assert any("GeneOrGeneProduct" in l for l in pr)
    chebi = [l for l in lines if "CHEBI_3215" in l]
    assert len(chebi) == 3 and any("ChemicalSubstance" in l for l in chebi)


def test_assoc_edges_relation_switch(spark):
    edges = spark.createDataFrame(
        [("CHEBI:1", "biolink:negatively_regulates", "PR:2", "RO:0002212", "E1", "a", 2, "ev1|ev2")],
        "subject string, edge_label string, object string, relation string, "
        "id string, biolink_association_type string, evidence_count long, evidence_ids string",
    )
    lines = [r.line for r in trapi.assoc_edges_nt(edges).collect()]
    assert len(lines) == 16  # 14 fixed + 2 evidence links
    assert sum("RO_0002212" in l for l in lines) == 2  # subj->obj + relation
    assert any(l.endswith("<_:ev2_evidence> .") for l in lines)
    bad = edges.withColumn("relation", F.lit("RO:9999999"))
    with pytest.raises(Exception, match="Unhandled relation"):
        trapi.assoc_edges_nt(bad).collect()


def test_pr_to_uniprot_map(spark):
    """PrToUniProtMapFileCreator semantics: direct xrefs, gene-level walk
    (children before grandchildren, human + UniProtKB required), gene's own
    xref ignored, no-match genes absent."""
    import os

    from translator_tm_provider_pipelines_spark.operators import trapi
    from translator_tm_provider_pipelines_spark.sources import obo

    fixture = os.path.join(os.path.dirname(__file__), "fixtures", "sample_pr.obo")
    terms = obo.read_obo_terms(spark, fixture)
    got = {r.pr_id: (r.uniprot_id, r.taxon_id) for r in trapi.pr_to_uniprot_map(terms).collect()}
    assert got["PR:000004803"] == ("UniProtKB:P38398", "NCBITaxon:9606")
    # multiple xrefs -> deterministic min (reference iterates a HashSet)
    assert got["PR:000004804"] == ("UniProtKB:A12345", None)
    # gene-level: own xref (ZZZZZZ) ignored, human child's mapping wins
    assert got["PR:000010000"] == ("UniProtKB:P04637", "NCBITaxon:9606")
    # gene-level with human match only at grandchild depth
    assert got["PR:000020000"] == ("UniProtKB:O15350", "NCBITaxon:9606")
    # gene-level with no human descendant emits nothing
    assert "PR:000030000" not in got
    # class without any xref emits nothing
    assert "PR:000040000" not in got
    # non-gene descendants still map directly on their own
    assert got["PR:000010002"] == ("UniProtKB:P02340", "NCBITaxon:10090")
