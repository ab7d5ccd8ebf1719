"""End-to-end cooccurrence chain tests on the reference's 4-doc triangular
fixture (src/test/resources/cooccurrence-count-sample-files/
document-to-concept.PUBMED_SUB_31-*.tsv):

    PMID:1  ZZ:1..4 + AA:1..4
    PMID:2  ZZ:2..4 + AA:2..4
    PMID:3  ZZ:3..4 + AA:3..4
    PMID:4  ZZ:4    + AA:4

→ N_docs = 4; concept AA:4/ZZ:4 in 4 docs; pair (AA:4, ZZ:4) in 4 docs;
pmi(4,4,4,4) = 0 and npmi = 0 (ConceptCooccurrenceMetricsTest
testPointwiseMutualInformation2/testNormalizedPointwiseMutualInformation2).
"""

from __future__ import annotations

import base64
import hashlib
import math

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import cooccurrence as co

FIXTURE = {
    "PMID:1": ["ZZ:1", "ZZ:2", "ZZ:3", "ZZ:4", "AA:1", "AA:2", "AA:3", "AA:4"],
    "PMID:2": ["ZZ:2", "ZZ:3", "ZZ:4", "AA:2", "AA:3", "AA:4"],
    "PMID:3": ["ZZ:3", "ZZ:4", "AA:3", "AA:4"],
    "PMID:4": ["ZZ:4", "AA:4"],
}


@pytest.fixture(scope="module")
def units(spark):
    return spark.createDataFrame(
        [(k, v) for k, v in FIXTURE.items()], "text_id string, concept_ids array<string>"
    )


def test_concept_counts(spark, units):
    uc = co.unit_concept_rows(units)
    counts = {r["concept_id"]: r["concept_count"] for r in co.concept_counts(uc).collect()}
    assert counts["ZZ:4"] == 4 and counts["AA:4"] == 4
    assert counts["ZZ:1"] == 1 and counts["AA:2"] == 2 and counts["ZZ:3"] == 3


def test_totals(spark, units):
    uc = co.unit_concept_rows(units)
    assert co.total_document_count(uc).collect()[0]["total_docs"] == 4
    # 8+6+4+2 = 20 total concept observations
    counts = co.concept_counts(uc)
    assert co.total_concept_count(counts).collect()[0]["total_concepts"] == 20


def test_pair_expansion_counts(spark, units):
    uc = co.unit_concept_rows(units)
    pairs = co.concept_pairs(uc)
    # PMID:1 has C(8,2)=28 pairs, PMID:2 C(6,2)=15, PMID:3 C(4,2)=6, PMID:4 C(2,2)=1
    per_doc = {r["text_id"]: r["n"] for r in pairs.groupBy("text_id").agg(F.count("*").alias("n")).collect()}
    assert per_doc == {"PMID:1": 28, "PMID:2": 15, "PMID:3": 6, "PMID:4": 1}
    pc = {(r["concept1"], r["concept2"]): r["pair_count"] for r in co.pair_counts(pairs).collect()}
    assert pc[("AA:4", "ZZ:4")] == 4
    assert pc[("AA:3", "ZZ:3")] == 3
    assert pc[("AA:1", "ZZ:1")] == 1
    # canonical order is lexicographic
    assert all(a < b for (a, b) in pc)


def test_chain_metrics_golden(spark, units):
    out = co.cooccurrence_chain(units).collect()
    rows = {(r["concept1"], r["concept2"]): r for r in out}
    r = rows[("AA:4", "ZZ:4")]
    # fx=fy=fxy=N=4 → pmi=0, npmi=0, md=0, lfmd=ln(1)+0=0... md=ln(1)=0? pxy=1 →
    # md = ln(1^2/(1*1)) = 0; lfmd = 0 + ln(1) = 0
    assert r["pmi"] == pytest.approx(0.0, abs=1e-9)
    assert r["npmi"] == pytest.approx(0.0, abs=1e-9)
    assert r["md"] == pytest.approx(0.0, abs=1e-9)
    assert r["lfmd"] == pytest.approx(0.0, abs=1e-9)
    # ngd with fx=fy=fxy=4, N_concepts=20: (log4 - log4)/(log20 - log4) = 0
    assert r["ngd"] == pytest.approx(0.0, abs=1e-9)
    # pair id = base64(sha1("AA:4|ZZ:4"))
    expected = base64.b64encode(hashlib.sha1(b"AA:4|ZZ:4").digest()).decode()
    assert r["pair_id"] == expected


def test_pair_id_matches_java_scheme(spark):
    # order-insensitivity: (b,a) canonicalizes to (a,b)
    df = spark.createDataFrame([("ZZ:4", "AA:4")], "a string, b string")
    from translator_tm_provider_pipelines_spark.functions.hashing import concept_pair_id

    v = df.select(concept_pair_id(F.col("a"), F.col("b")).alias("p")).collect()[0]["p"]
    assert v == base64.b64encode(hashlib.sha1(b"AA:4|ZZ:4").digest()).decode()


def test_idf(spark, units):
    uc = co.unit_concept_rows(units)
    idf = {r["concept_id"]: r["idf"] for r in co.concept_idf(uc).collect()}
    assert idf["ZZ:4"] == pytest.approx(0.0, abs=1e-9)  # ln(4/4)
    assert idf["ZZ:2"] == pytest.approx(round(math.log(2.0), 8), abs=1e-9)
    assert idf["AA:1"] == pytest.approx(round(math.log(4.0), 8), abs=1e-9)


def test_ancestor_augmentation(spark, units):
    # ZZ:0 is ancestor of ZZ:1 (same prefix, kept); XX:9 cross-prefix (dropped)
    anc = spark.createDataFrame(
        [("ZZ:1", "ZZ:0"), ("ZZ:1", "XX:9")], "concept_id string, ancestor_id string"
    )
    uc = co.add_ancestor_concepts(co.unit_concept_rows(units), anc)
    concepts = {r["concept_id"] for r in uc.where(F.col("text_id") == "PMID:1").collect()}
    assert "ZZ:0" in concepts and "XX:9" not in concepts
    # ancestor-related pair (ZZ:0, ZZ:1) excluded from pair generation
    pairs = co.concept_pairs(uc, co.ancestor_excluded_pairs(anc))
    pc = {(r["concept1"], r["concept2"]) for r in pairs.collect()}
    assert ("ZZ:0", "ZZ:1") not in pc
    assert ("AA:1", "ZZ:0") in pc


def test_pair_publications_cap(spark):
    rows = [(f"PMID:{i}_sentence_abc", ["A:1", "B:1"]) for i in range(40)]
    units = spark.createDataFrame(rows, "text_id string, concept_ids array<string>")
    pairs = co.concept_pairs(co.unit_concept_rows(units))
    pubs = co.pair_publications(pairs, max_per_pair=25)
    out = pubs.collect()
    assert len(out) == 25
    assert all(r["document_id"].startswith("PMID:") and "_" not in r["document_id"] for r in out)


def test_pair_publications_hot_pair_bounded(spark):
    """r13 (VERDICT r12 task 3): a hot pair carrying >=100k publications
    flows through the salted two-level top-k — level 1 groups by
    (pair, __salt) so no aggregation row ever buffers the full pair, and
    the merged level-2 buffer is <= salt_buckets x max_per_pair ids. The
    output must equal the old single-level slice exactly: the globally
    smallest N text_ids."""
    n = 120_000
    hot = spark.range(n).selectExpr(
        "'A:1' AS concept1",
        "'B:1' AS concept2",
        "format_string('PMID:%07d_sentence_x', id) AS text_id",
    )
    df = co.pair_publications(hot, max_per_pair=25)
    # plan shape: the ONLY collect_list sits under the 3-key salted
    # aggregate; the pair-keyed level merges pre-sliced arrays
    plan = df._jdf.queryExecution().optimizedPlan().toString()
    row_collects = [
        ln for ln in plan.splitlines() if "collect_list(text_id" in ln
    ]
    # the salt alias is inlined by the optimizer: the level-1 aggregate
    # that collects raw text_ids must group by the pmod(xxhash64) salt
    assert "pmod(xxhash64(text_id" in plan, plan
    assert row_collects and all(
        "__salt" in ln or "_groupingexpression" in ln for ln in row_collects
    ), plan
    out = df.collect()
    assert sorted(r["document_id"] for r in out) == [
        f"PMID:{i:07d}" for i in range(25)
    ]


def test_reference_fixture_files_roundtrip(spark):
    """Read the reference's OWN golden fixture TSVs through the S7 source
    and verify the chain's counts match the triangular design (and the
    inline FIXTURE used above)."""
    import os

    from translator_tm_provider_pipelines_spark.sources.tsv import doc_to_concept_tsv

    path = (
        "/root/reference/src/test/resources/cooccurrence-count-sample-files/"
        "document-to-concept.PUBMED_SUB_31-00000-of-00001.tsv"
    )
    if not os.path.exists(path):
        pytest.skip("reference fixtures not available")
    units = doc_to_concept_tsv(spark, path)
    loaded = {r.text_id: sorted(r.concept_ids) for r in units.collect()}
    assert loaded == {k: sorted(v) for k, v in FIXTURE.items()}
    m = co.cooccurrence_chain(units)
    rows = {(r.concept1, r.concept2): r for r in m.collect()}
    assert len(rows) == 28  # C(8,2) unordered pairs
    top = rows[("AA:4", "ZZ:4")]
    assert top.pair_count == 4 and top.concept1_count == 4 and top.concept2_count == 4
    assert top.pmi == 0.0 and top.npmi == 0.0
