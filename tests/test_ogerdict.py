"""OGER dictionary builders: OBO parsing, rule chain, per-ontology configs."""

from __future__ import annotations

import os

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import ner, ogerdict
from translator_tm_provider_pipelines_spark.sources import obo

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "sample.obo")


@pytest.fixture(scope="module")
def terms(spark):
    return obo.read_obo_terms(spark, FIXTURE)


@pytest.fixture(scope="module")
def built(spark, terms):
    from translator_tm_provider_pipelines_spark.plans.testdata_queries import (
        _TEST_DICT_CONFIG,
    )

    rows = ogerdict.build_oger_dictionary(terms, _TEST_DICT_CONFIG).collect()
    return {(r.concept_id, r.term, r.case_sensitive) for r in rows}, rows


def test_obo_parse_fields(terms):
    t = {r.term_id: r for r in terms.collect()}
    assert t["TEST:0001"].label == "merge sort"
    assert t["TEST:0001"].exact_synonyms == ["merge-sort"]
    assert t["TEST:0001"].related_synonyms == ["external merge"]
    assert t["TEST:0002"].parents == ["TEST:0001"]
    assert t["TEST:0006"].is_obsolete
    # escaped quote in synonym is unescaped at parse time
    assert 'seq" scan' in t["TEST:0003"].exact_synonyms


def test_transitive_descendants(spark, terms):
    ids = {r.id for r in ogerdict.transitive_descendants(terms, ["TEST:0008"]).collect()}
    assert ids == {"TEST:0008", "TEST:0004"}
    ids = {r.id for r in ogerdict.transitive_descendants(terms, ["TEST:0001"]).collect()}
    assert ids == {"TEST:0001", "TEST:0002"}
    # the distributed level-walk (driver_threshold=0) must agree with the
    # one-job driver walk
    dist = {
        r.id
        for r in ogerdict.transitive_descendants(
            terms, ["TEST:0001"], driver_threshold=0
        ).collect()
    }
    assert dist == ids


def test_builder_rule_chain(built):
    keyed, rows = built
    # label + EXACT + RELATED synonyms, plus config addition
    for term in ("merge sort", "merge-sort", "external merge", "sort merge join"):
        assert ("TEST:0001", term, False) in keyed
    # stopword 'the' and short 'ab' pruned
    assert not any(r.term in ("the", "ab") for r in rows)
    # case-sensitive split + all-caps alternate
    assert ("TEST:0002", "HASH1", True) in keyed
    assert ("TEST:0002", "Hash1", True) in keyed
    assert ("TEST:0002", "hash join", False) in keyed
    # trailing parenthetical stripped from the label
    assert ("TEST:0003", "table scan", False) in keyed
    assert all(r.primary_label == "table scan" for r in rows if r.concept_id == "TEST:0003")
    # per-class removal
    assert not any(r.term == "full scan" for r in rows)
    # virus + formerly augments
    assert ("TEST:0005", "query virus", False) in keyed
    assert ("TEST:0005", "batch stream", False) in keyed
    # excluded root, its descendant, obsolete and excluded class emit nothing
    assert not any(
        r.concept_id in ("TEST:0004", "TEST:0006", "TEST:0008", "TEST:0009") for r in rows
    )
    # prefix filter
    assert not any(r.concept_id.startswith("OTHER") for r in rows)
    # mixed-case and >40%-uppercase terms are case-sensitive
    assert ("TEST:0007", "slowDown", True) in keyed
    assert ("TEST:0007", "BIG data", True) in keyed


def test_id_add_on(spark, terms):
    cfg = ogerdict.OgerDictConfig(
        ont_key="TEST_X", main_type="t", id_prefix="TEST", id_add_on="_X"
    )
    ids = {
        r.concept_id
        for r in ogerdict.build_oger_dictionary(terms, cfg).collect()
    }
    assert ids and all(i.startswith("TEST_X:") for i in ids)


def test_activity_stripped(spark):
    t = spark.createDataFrame(
        [("GO:1", "kinase activity", [], [], [], [], [], [], False)],
        "term_id string, label string, exact_synonyms array<string>, "
        "related_synonyms array<string>, broad_synonyms array<string>, "
        "narrow_synonyms array<string>, parents array<string>, xrefs array<string>, "
        "is_obsolete boolean",
    )
    cfg = ogerdict.OgerDictConfig(
        ont_key="GO_MF", main_type="molecular_function", id_prefix="GO",
        id_add_on="_MF", add_activity_stripped=True,
    )
    terms_out = {r.term for r in ogerdict.build_oger_dictionary(t, cfg).collect()}
    assert terms_out == {"kinase activity", "kinase"}


def test_reference_configs_registered():
    for key in ("CL", "GO_BP", "GO_CC", "GO_MF", "HP", "MONDO", "UBERON", "NCBITaxon", "SO"):
        cfg = ogerdict.CONFIGS[key]
        assert cfg.ont_key == key and cfg.main_type
    assert ogerdict.CONFIGS["MONDO"].min_term_length == 4
    assert ogerdict.CONFIGS["GO_BP"].id_add_on == "_BP"


def test_dictionary_feeds_ner(spark, terms):
    from translator_tm_provider_pipelines_spark.plans.testdata_queries import (
        _TEST_DICT_CONFIG,
    )

    d = ogerdict.build_oger_dictionary(terms, _TEST_DICT_CONFIG)
    dictionary = ner.normalize_dictionary(
        d.where(~F.col("case_sensitive")).select("term", "concept_id")
    )
    docs = spark.createDataFrame(
        [("d1", "the table scan beats a batch stream merge sort today")],
        "doc_id string, content string",
    )
    found = {
        (r.concept_id, r.covered_text)
        for r in ner.dictionary_concept_recognition(docs, dictionary).collect()
    }
    assert ("TEST:0003", "table scan") in found
    assert ("TEST:0005", "batch stream") in found
    assert ("TEST:0001", "merge sort") in found


def test_taxon_promotion(spark):
    taxon_fixture = os.path.join(os.path.dirname(__file__), "fixtures", "sample_taxon.obo")
    terms = obo.read_obo_terms(spark, taxon_fixture)
    cfg = ogerdict.OgerDictConfig(ont_key="NCBITaxon", main_type="organism")
    d = ogerdict.build_oger_dictionary(terms, cfg)
    out = ogerdict.promote_taxon_dictionary(d, terms)
    by_term = {}
    for r in out.collect():
        by_term.setdefault(r.term, set()).add(r.concept_id)
    # 'homo' maps to genus+species+subspecies → promotes to the genus
    assert by_term["homo"] == {"NCBITaxon:9605"}
    # 'human' maps to unrelated taxa → both kept
    assert by_term["human"] == {"NCBITaxon:9606", "NCBITaxon:10090"}
    # unique terms untouched
    assert by_term["mouse"] == {"NCBITaxon:10090"}


def test_taxon_promotion_large_group_cap(spark):
    taxon_fixture = os.path.join(os.path.dirname(__file__), "fixtures", "sample_taxon.obo")
    terms_df = obo.read_obo_terms(spark, taxon_fixture)
    rows = [("NCBITaxon", f"NCBITaxon:{i}", "shared", "x", "organism", False) for i in range(25)]
    d = spark.createDataFrame(
        rows,
        "ont_key string, concept_id string, term string, primary_label string, "
        "main_type string, case_sensitive boolean",
    )
    out = ogerdict.promote_taxon_dictionary(d, terms_df, large_group_cap=20).collect()
    # >20 unrelated ids for one term → deterministic single survivor (min id)
    assert {r.concept_id for r in out} == {"NCBITaxon:0"}


def test_ancestor_pairs_for(spark):
    taxon_fixture = os.path.join(os.path.dirname(__file__), "fixtures", "sample_taxon.obo")
    terms = obo.read_obo_terms(spark, taxon_fixture)
    ids = spark.createDataFrame([("NCBITaxon:63221",)], "id string")
    anc = {(r.id, r.anc) for r in ogerdict.ancestor_pairs_for(terms, ids).collect()}
    assert anc == {
        ("NCBITaxon:63221", "NCBITaxon:9606"),
        ("NCBITaxon:63221", "NCBITaxon:9605"),
        ("NCBITaxon:63221", "NCBITaxon:1"),
    }
    dist = {
        (r.id, r.anc)
        for r in ogerdict.ancestor_pairs_for(terms, ids, driver_threshold=0).collect()
    }
    assert dist == anc


def test_chebi_formula_and_complexity_filter(spark):
    t = spark.createDataFrame(
        [
            (
                "CHEBI:26710", "sodium chloride",
                ["1,2,3,4-tetra-chloro-thing-x-y", "salt"],
                [], [], [], [], [], ["ClNa"], False,
            )
        ],
        "term_id string, label string, exact_synonyms array<string>, "
        "related_synonyms array<string>, broad_synonyms array<string>, "
        "narrow_synonyms array<string>, parents array<string>, xrefs array<string>, "
        "formulas array<string>, is_obsolete boolean",
    )
    cfg = ogerdict.OgerDictConfig(
        ont_key="CHEBI", main_type="chemical",
        add_formulas=True, max_hyphen_tokens=5, max_comma_tokens=4,
        added_synonyms=(("CHEBI:26710", "NaCl"),),
    )
    terms_out = {r.term for r in ogerdict.build_oger_dictionary(t, cfg).collect()}
    # complex name dropped (5 hyphen tokens / 4 comma tokens), formula kept
    assert terms_out == {"sodium chloride", "salt", "ClNa", "NaCl"}


def test_english_word_exclusions(spark):
    d = spark.createDataFrame(
        [
            ("PR", "PR:1", "lead", "l", "protein", False),   # english word, CI → drop
            ("PR", "PR:2", "LEAD", "l", "protein", True),    # CS survives
            ("PR", "PR:3", "kinase", "k", "protein", False),
        ],
        "ont_key string, concept_id string, term string, primary_label string, "
        "main_type string, case_sensitive boolean",
    )
    words = spark.createDataFrame([("lead",), ("the",)], "word string")
    out = {r.concept_id for r in ogerdict.english_word_exclusions(d, words).collect()}
    assert out == {"PR:2", "PR:3"}


def test_hgnc_dictionary(spark):
    hgnc = spark.createDataFrame(
        [("HGNC:1100", "BRCA1", "BRCA1 DNA repair associated", "RNF53", None)],
        "hgnc_id string, approved_symbol string, approved_name string, "
        "alias_name string, alias_symbol string",
    )
    rows = ogerdict.hgnc_dictionary(hgnc).collect()
    terms = {r.term for r in rows}
    assert terms == {"BRCA1", "BRCA1 DNA repair associated", "RNF53"}
    assert all(r.primary_label == "BRCA1" and r.main_type == "gene" for r in rows)


def test_chemical_label_dictionary(spark):
    labels = spark.createDataFrame(
        [
            ("PUBCHEM.COMPOUND:1", "acid, acetic"),        # single comma → flipped
            ("PUBCHEM.COMPOUND:2", "a,b,c"),               # too many commas → drop
            ("PUBCHEM.COMPOUND:3", "ab!"),                 # <4 chars no punct → drop
            ("PUBCHEM.COMPOUND:4", "C1H2O3N4P5"),          # >30% digits → drop
            ("PUBCHEM.COMPOUND:5", "[aspirin]"),           # brackets stripped
            ("PUBCHEM.COMPOUND:444212", "Acid"),           # enumerated exclusion
        ],
        "pubchem_id string, label string",
    )
    rows = {r.concept_id: r.term for r in ogerdict.chemical_label_dictionary(labels).collect()}
    assert rows == {
        "PUBCHEM.COMPOUND:1": " acetic acid",
        "PUBCHEM.COMPOUND:5": "aspirin",
    }


def test_taxonomic_rank_exclusion(spark, tmp_path):
    """NCBITAXON_CONFIG's excluded root 'NCBITaxon#:taxonomic_rank' must
    match curie('NCBITaxon#_taxonomic_rank') — only the FIRST underscore
    is the prefix separator (NcbiTaxonOgerDictFileFactory.java:34-36
    excludes the raw IRI ...NCBITaxon#_taxonomic_rank and descendants)."""
    p = tmp_path / "rank.obo"
    p.write_text(
        "format-version: 1.2\n\n"
        "[Term]\nid: NCBITaxon#_taxonomic_rank\nname: taxonomic rank\n\n"
        "[Term]\nid: NCBITaxon:species\nname: species epithet\n"
        "is_a: NCBITaxon#_taxonomic_rank\n\n"
        "[Term]\nid: NCBITaxon:9606\nname: Homo sapiens\n"
    )
    terms = obo.read_obo_terms(spark, str(p))
    rows = ogerdict.build_oger_dictionary(terms, ogerdict.NCBITAXON_CONFIG).collect()
    ids = {r.concept_id for r in rows}
    assert "NCBITaxon:9606" in ids
    # rank subtree excluded via the (now matchable) excluded root
    assert "NCBITaxon:species" not in ids


def test_drugbank_dictionary(spark):
    syn = lambda *xs: list(xs)
    rows_in = [
        # plain drug: name + synonyms, 'Xy' too short (<3), 'the'
        # stopworded, all-caps+digit synonym gets a Brca1-style alternate
        ("DB00945", "Aspirin", "pain reliever",
         syn("Acetylsalicylic acid", "Xy", "the", "BAY1019036")),
        # description-based allergy rejection
        ("DB99901", "Timothy grass", "allergenic extract of pollen", syn()),
        ("DB99902", "Cow milk", "animal extract for testing", syn("milk")),
        # record-level regex rejection: ANY synonym matching drops ALL
        ("DB99903", "Bee venom", None, syn("apitoxin")),
        ("DB99904", "Cod", None, syn("Cod liver oil")),
        ("DB99905", "Ragweed", None, syn("Ragweed extract")),
        # antivenom has no word boundary before 'venom' -> survives
        ("DB99906", "Antivenom", None, syn("antivenom preparation")),
        # excluded individual class
        ("DB09145", "Water", None, syn("dihydrogen oxide")),
    ]
    drugs = spark.createDataFrame(
        rows_in,
        "drugbank_id string, name string, description string, synonyms array<string>",
    )
    out = ogerdict.drugbank_dictionary(drugs)
    rows = {(r.concept_id, r.term): r for r in out.collect()}
    terms_by_id = {}
    for (cid, term), r in rows.items():
        terms_by_id.setdefault(cid, set()).add(term)
    assert terms_by_id["DRUGBANK:DB00945"] == {
        "Aspirin", "Acetylsalicylic acid", "BAY1019036", "Bay1019036"
    }
    assert rows[("DRUGBANK:DB00945", "BAY1019036")].case_sensitive
    assert rows[("DRUGBANK:DB00945", "Bay1019036")].case_sensitive
    assert not rows[("DRUGBANK:DB00945", "Aspirin")].case_sensitive
    assert rows[("DRUGBANK:DB00945", "Aspirin")].primary_label == "Aspirin"
    assert rows[("DRUGBANK:DB00945", "Aspirin")].ont_key == "DrugBank"
    assert rows[("DRUGBANK:DB00945", "Aspirin")].main_type == "drug"
    assert terms_by_id.get("DRUGBANK:DB99906") == {"Antivenom", "antivenom preparation"}
    for gone in ("DB99901", "DB99902", "DB99903", "DB99904", "DB99905", "DB09145"):
        assert f"DRUGBANK:{gone}" not in terms_by_id


def test_procedure_dictionary(spark):
    rels = spark.createDataFrame(
        [
            (ogerdict.PROCEDURE_SNOMED_ID, "80146002"),   # appendectomy
            (ogerdict.PROCEDURE_SNOMED_ID, "387713003"),  # excluded class
            (ogerdict.PROCEDURE_SNOMED_ID, "363779003"),  # specific-filter target
            ("138875005", "12345678"),                    # not under procedure root
        ],
        "supertype_id string, subtype_id string",
    )
    descs = spark.createDataFrame(
        [
            ("80146002", "Appendectomy"),
            ("80146002", "Appendicectomy"),
            ("80146002", "at"),           # stopword/short -> pruned
            ("387713003", "operation"),   # excluded individual class
            ("363779003", "genotype"),
            ("363779003", "genotype determination"),
            ("12345678", "not a procedure"),
        ],
        "concept_id string, term string",
    )
    out = ogerdict.procedure_dictionary(descs, rels)
    got = {(r.concept_id, r.term) for r in out.collect()}
    assert ("SNOMEDCT:80146002", "Appendectomy") in got
    assert ("SNOMEDCT:80146002", "Appendicectomy") in got
    assert not any(cid == "SNOMEDCT:387713003" for cid, _ in got)
    assert not any(cid == "SNOMEDCT:12345678" for cid, _ in got)
    assert ("SNOMEDCT:363779003", "genotype") in got  # specific filter OFF by default
    # primary label = deterministic min over the raw synonym set
    labels = {r.concept_id: r.primary_label for r in out.collect()}
    assert labels["SNOMEDCT:80146002"] == "Appendectomy"

    filtered = ogerdict.procedure_dictionary(descs, rels, apply_specific_filter=True)
    got_f = {(r.concept_id, r.term) for r in filtered.collect()}
    assert ("SNOMEDCT:363779003", "genotype") not in got_f
    assert ("SNOMEDCT:363779003", "genotype determination") in got_f


def test_distributed_closure_never_collects_to_driver(spark, terms, monkeypatch):
    """Above the driver threshold the closure walk must be fully
    distributed: no DataFrame.collect / toPandas of frontier rows
    (VERDICT r3 item 4 — per-level driver roundtrips don't survive
    NCBITaxon-scale inputs). Only the isEmpty termination probe and the
    final caller-side collect are allowed."""
    from pyspark.sql import DataFrame

    real_collect = DataFrame.collect

    def forbidden(self):
        raise AssertionError("driver-side collect inside distributed closure")

    monkeypatch.setattr(DataFrame, "collect", forbidden)
    monkeypatch.setattr(DataFrame, "toPandas", forbidden, raising=False)
    try:
        desc = ogerdict.transitive_descendants(terms, ["TEST:0001"], driver_threshold=0)
        ids = spark.createDataFrame([("TEST:0002",)], "id string")
        anc = ogerdict.ancestor_pairs_for(terms, ids, driver_threshold=0)
    finally:
        monkeypatch.setattr(DataFrame, "collect", real_collect)
    assert {r.id for r in desc.collect()} == {"TEST:0001", "TEST:0002"}
    assert {(r.id, r.anc) for r in anc.collect()} == {("TEST:0002", "TEST:0001")}
