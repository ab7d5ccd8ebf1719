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
