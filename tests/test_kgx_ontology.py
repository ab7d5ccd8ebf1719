"""Ontology → KGX export: categories, edges, associations, sha1 edge ids."""

from __future__ import annotations

import base64
import hashlib
import os

import pytest

from translator_tm_provider_pipelines_spark.operators import kgxontology as kg
from translator_tm_provider_pipelines_spark.sources import obo

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample_kg.obo")


@pytest.fixture(scope="module")
def terms(spark):
    return obo.read_obo_terms(spark, FIXTURE)


@pytest.fixture(scope="module")
def nodes(spark, terms):
    return {r.id: r for r in kg.ontology_kgx_nodes(terms).collect()}


@pytest.fixture(scope="module")
def edges(spark, terms):
    return kg.ontology_kgx_edges(terms).collect()


def test_categories(nodes):
    assert nodes["GO:0008152"].category == "biolink:BiologicalProcess"
    assert nodes["GO:0005634"].category == "biolink:CellularComponent"
    assert nodes["CL:0000540"].category == "biolink:Cell"
    assert nodes["UBERON:0000062"].category == "biolink:AnatomicalEntity"
    assert nodes["NCBITaxon:9606"].category == "biolink:OrganismTaxon"
    assert nodes["SO:0001217"].category == "biolink:SequenceFeature*"
    # HGNC via the prefix switch; MGI only via SO-gene ancestry
    assert nodes["HGNC:1100"].category == "biolink:Gene"
    assert nodes["MGI:104537"].category == "biolink:Gene"


def test_uniprot_nodes_and_edges(nodes, edges):
    assert nodes["UniProtKB:P38398"].category == "biolink:GeneProduct"
    assert nodes["UniProtKB:P38398"].name == "BRCA1 protein"
    same_as = [e for e in edges if e.edge_label == "biolink:same_as"]
    assert len(same_as) == 1
    e = same_as[0]
    assert (e.subject, e.object) == ("PR:000004803", "UniProtKB:P38398")
    assert e.relation == "owl:equivalentClass"
    assert e.association_type == "biolink:GeneToGeneAssociation"


def test_association_resolution(edges):
    by = {(e.subject, e.object): e for e in edges}
    assert by[("GO:0008152", "GO:0008150")].association_type == "biolink:Association"
    assert by[("PR:000004803", "PR:000000001")].association_type == "biolink:GeneToGeneAssociation"
    assert (
        by[("PR:000004803", "HGNC:1100")].association_type
        == "biolink:GeneToGeneProductRelationship"
    )
    assert by[("PR:000004803", "NCBITaxon:9606")].edge_label == "biolink:in_taxon"
    # unmapped (Cell -- AnatomicalEntity -- part_of) keeps the reference's
    # literal 'null' association string
    assert by[("CL:0000000", "UBERON:0000062")].association_type == "null"


def test_edge_ids_are_base64_sha1(edges):
    for e in edges:
        payload = "|".join(
            [e.subject, e.edge_label, e.object, e.relation, e.association_type]
        )
        expected = base64.b64encode(hashlib.sha1(payload.encode()).digest()).decode()
        assert e.id == expected


def test_edges_deduplicate_by_id(spark, terms):
    df = kg.ontology_kgx_edges(terms)
    assert df.count() == df.select("id").distinct().count()


def test_unmapped_relation_serializes_literal_null(edges):
    """Relations absent from RELATION_MAP (develops_from here) still emit
    an edge, with the literal 'null' label/curie baked into the TSV cells
    AND the sha1 id — KgxEdge.getId / toKgxString String.format("%s") of
    null fields (KgxEdge.java:28-30,61-62)."""
    null_edges = [
        e
        for e in edges
        if e.subject == "CL:0000540" and e.object == "CL:0000000" and e.edge_label == "null"
    ]
    assert len(null_edges) == 1
    e = null_edges[0]
    assert e.relation == "null"
    assert e.association_type == "null"
    payload = "CL:0000540|null|CL:0000000|null|null"
    expected = base64.b64encode(hashlib.sha1(payload.encode()).digest()).decode()
    assert e.id == expected
