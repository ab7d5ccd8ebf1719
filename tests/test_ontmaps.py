"""Ontology side-table factories (etl/util map factories parity)."""

from __future__ import annotations

import os

import pytest

from translator_tm_provider_pipelines_spark.operators import ontmaps
from translator_tm_provider_pipelines_spark.sources import obo

TAXON_FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample_taxon.obo")


def test_ontology_ancestor_map(spark):
    terms = obo.read_obo_terms(spark, TAXON_FIXTURE)
    got = {}
    for r in ontmaps.ontology_ancestor_map(terms).collect():
        got.setdefault(r.concept_id, set()).add(r.ancestor_id)
    # known chain: 63221 -> 9606 -> 9605 -> 1
    assert got["NCBITaxon:63221"] == {"NCBITaxon:9606", "NCBITaxon:9605", "NCBITaxon:1"}
    assert got["NCBITaxon:9606"] == {"NCBITaxon:9605", "NCBITaxon:1"}
    # the root has no ancestors -> absent, like the reference's skip
    assert "NCBITaxon:1" not in got


@pytest.fixture()
def pr_like(spark, tmp_path):
    p = tmp_path / "pr.obo"
    p.write_text(
        "format-version: 1.2\n\n"
        "[Term]\nid: PR:000000001\nname: protein\n\n"
        # gene-level chain: g1 (shallow) -> g2 (deeper, still gene-level)
        "[Term]\nid: PR:G1\nname: gene one\nis_a: PR:000000001\n"
        "comment: Category=gene.\n\n"
        "[Term]\nid: PR:G2\nname: gene two\nis_a: PR:G1\n"
        "comment: Category=gene.\n\n"
        # species-specific leaf under g2: must promote to g2 (deepest)
        "[Term]\nid: PR:L1\nname: leaf one\nis_a: PR:G2\n\n"
        # leaf under g1 only
        "[Term]\nid: PR:L2\nname: leaf two\nis_a: PR:G1\n\n"
        # leaf with no gene-level ancestor -> absent from the map
        "[Term]\nid: PR:L3\nname: leaf three\nis_a: PR:000000001\n"
    )
    return obo.read_obo_terms(spark, str(p))


def test_pr_promotion_map(spark, pr_like):
    got = {r.concept_id: r.promoted_id for r in ontmaps.pr_promotion_map(pr_like).collect()}
    assert got["PR:L1"] == "PR:G2"  # deepest gene-level ancestor wins
    assert got["PR:L2"] == "PR:G1"
    assert "PR:L3" not in got       # no gene-level ancestor
    assert "PR:G1" not in got and "PR:G2" not in got  # gene-level keys skipped


def test_hp_to_mondo_map(spark, tmp_path):
    (tmp_path / "mondo.obo").write_text(
        "format-version: 1.2\n\n"
        # direct HP xref + an exact (case-insensitive) label match
        "[Term]\nid: MONDO:0000001\nname: Night Blindness\n"
        "xref: HP:0000662\n\n"
        # bridged through a MeSH exactMatch
        "[Term]\nid: MONDO:0000002\nname: some disease\n"
        "property_value: skos:exactMatch http://identifiers.org/mesh/D000012\n\n"
        # bridged through UMLS
        "[Term]\nid: MONDO:0000003\nname: other disease\n"
        "property_value: skos:exactMatch http://linkedlifedata.com/resource/umls/id/C0001\n\n"
        # unrelated exactMatch target -> no bridge
        "[Term]\nid: MONDO:0000004\nname: lonely disease\n"
        "property_value: skos:exactMatch http://example.org/nothing\n"
    )
    (tmp_path / "hp.obo").write_text(
        "format-version: 1.2\n\n"
        "[Term]\nid: HP:0000662\nname: night blindness\n\n"
        "[Term]\nid: HP:0000111\nname: phenotype a\nxref: MSH:D000012\n\n"
        "[Term]\nid: HP:0000222\nname: phenotype b\nxref: UMLS:C0001\n"
        "xref: MSH:D000012\n"
    )
    mondo = obo.read_obo_terms(spark, str(tmp_path / "mondo.obo"))
    hp = obo.read_obo_terms(spark, str(tmp_path / "hp.obo"))
    rows = {r.hp_id: r for r in ontmaps.hp_to_mondo_map(mondo, hp).collect()}
    # direct xref; no class-level label for the direct key unless HP has it
    assert rows["HP:0000662"].indicator == "**"
    assert rows["HP:0000662"].mondo_ids == "MONDO:0000001"
    assert rows["HP:0000662"].hp_label == "night blindness"
    # MeSH bridge reaches both HP classes carrying the MSH xref
    assert rows["HP:0000111"].mondo_ids == "MONDO:0000002"
    assert rows["HP:0000111"].indicator == ""
    # one HP class bridged to two MONDOs -> sorted pipe join, labels aligned
    assert rows["HP:0000222"].mondo_ids == "MONDO:0000002|MONDO:0000003"
    assert rows["HP:0000222"].mondo_labels == "some disease|other disease"
    assert "MONDO:0000004" not in {m for r in rows.values() for m in r.mondo_ids.split("|")}


def test_id_to_dict_entries(spark):
    d = spark.createDataFrame(
        [("C1", "aspirin"), ("C1", "ASA"), ("C2", "fever")],
        "concept_id string, term string",
    )
    got = {r.concept_id: r.dict_entries for r in ontmaps.id_to_dict_entries(d).collect()}
    assert got == {"C1": "ASA|aspirin", "C2": "fever"}
