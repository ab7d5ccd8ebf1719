"""Star-policy second-hop repair (operators/dedup.py:star_second_hop_pairs):
recovers over-cap-bucket members stranded because their Jaccard to the
minimum-id representative fell below threshold while a genuine ≥-threshold
path existed (the 0.5% member-recall gap measured at sf10, SCALING.md).

Reference analogue: the reference caps cooccurrence publication lists and
redoes failed stages via status flags (PipelineMain.java:555-610); this is
the equivalent repair loop for the star-reduced LSH buckets."""

from __future__ import annotations

from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import dedup

# Cumulative-drift chain: doc i replaces the first 2*i words of a shared
# 60-word base with a SHARED replacement prefix, so doc i and doc j differ
# only in words [2*min(i,j), 2*max(i,j)) — Jaccard decays with |i-j|
# (adjacent ≈ 0.87-0.93, distance 2 ≈ 0.81) while the long common suffix
# keeps all docs colliding in LSH buckets. At threshold 0.85 the true
# near-dup graph is exactly the chain 0-1-2-3-4.
BASE = (
    "alpha bravo charlie delta echo foxtrot golf hotel india juliet "
    "kilo lima mike november oscar papa quebec romeo sierra tango "
    "uniform victor whiskey xray yankee zulu amber birch cedar dune "
    "ember fjord grove heath iris jade knoll lotus maple nectar "
    "onyx pearl quartz reef slate topaz umber vale willow zenith "
    "arbor basin cliff ridge marsh glen fen moor crag peak"
).split()
REPL = "one two three four five six seven eight nine ten".split()


def _chain_df(spark, n=5):
    rows = [(i, " ".join(REPL[: 2 * i] + BASE[2 * i :])) for i in range(n)]
    return spark.createDataFrame(rows, "doc_id int, text string")


# With num_perms=8, rows_per_band=1 the chain corpus buckets as
# {0,1} x5, {2,3,4} x8 (verified by the assertions below, deterministic —
# the minhash is seedless affine hashing). max_bucket_size=2 stars the
# {2,3,4} bucket from rep 2: edge 2-3 verifies (0.871 >= 0.85), edge 2-4
# fails (0.812 < 0.85) and doc 4 strands with no other co-bucket.
LSH = dict(
    threshold=0.85,
    k=3,
    num_perms=8,
    rows_per_band=1,
    max_bucket_size=2,
    oversize_policy="star",
)


def _pairset(df):
    return {(r.doc_a, r.doc_b) for r in df.select("doc_a", "doc_b").collect()}


def test_chain_member_stranded_without_repair(spark):
    docs = _chain_df(spark)
    got = _pairset(dedup.near_duplicates(docs, **LSH))
    # doc 4's only multi-doc bucket is the over-cap {2,3,4}; the star edge
    # 2-4 fails verification, so 4 appears in no pair at all
    assert got == {(0, 1), (2, 3)}


def test_one_repair_hop_recovers_stranded_chain_member(spark):
    docs = _chain_df(spark)
    got = _pairset(dedup.near_duplicates(docs, star_repair_hops=1, **LSH))
    # repair: unattached={4}, new rep 4 stars against ALL bucket members;
    # (2,4) was already attempted (anti-joined away), (3,4) is fresh and
    # verifies at 0.871 — the stranded member reattaches through its
    # genuine neighbor, not the failed first representative
    assert got == {(0, 1), (2, 3), (3, 4)}


def test_extra_hops_are_noops_once_converged(spark):
    docs = _chain_df(spark)
    one = _pairset(dedup.near_duplicates(docs, star_repair_hops=1, **LSH))
    many = _pairset(dedup.near_duplicates(docs, star_repair_hops=5, **LSH))
    assert one == many
    # verified pairs all clear the threshold (repair edges included)
    v = dedup.near_duplicates(docs, star_repair_hops=5, **LSH)
    assert v.where(F.col("jaccard") < 0.85).count() == 0


def test_repair_restores_keep_list_equality_with_uncapped(spark):
    docs = _chain_df(spark)
    uncapped = dedup.near_dup_keep_list(
        docs, threshold=0.85, k=3, num_perms=8, rows_per_band=1
    )
    repaired = dedup.near_dup_keep_list(
        docs, star_repair_hops=2, **LSH
    )
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, repaired.collect())
    )


def _bands(spark, rows):
    return spark.createDataFrame(rows, "doc_id int, band int, band_sig string")


def _pairs(spark, rows):
    return spark.createDataFrame(rows, "doc_a int, doc_b int")


def test_second_hop_unit_two_clusters_one_bucket(spark):
    # one over-cap bucket holding two distinct clusters {1,2} and {3,4}:
    # first-pass star from rep 1 verified only 1-2; repair rep = 3 (min
    # unattached) stars against every member, normalized doc_a < doc_b,
    # with the already-attempted rep edges removed
    bands = _bands(spark, [(d, 0, "b0") for d in (1, 2, 3, 4)])
    verified = _pairs(spark, [(1, 2)])
    attempted = _pairs(spark, [(1, 2), (1, 3), (1, 4)])
    out = dedup.star_second_hop_pairs(bands, verified, 3, attempted=attempted)
    # both unattached members (3, 4) promote (reps_per_hop default covers
    # them); (1,3)/(1,4) already attempted → anti-joined away; the rest
    # are fresh CANDIDATES — downstream Jaccard verification keeps 3-4
    # and drops the cross-cluster 2-3/2-4, so only genuine edges reach
    # connected components
    assert _pairset(out) == {(2, 3), (2, 4), (3, 4)}
    # reps_per_hop=1: only member 3 promotes this hop
    out1 = dedup.star_second_hop_pairs(
        bands, verified, 3, attempted=attempted, reps_per_hop=1
    )
    assert _pairset(out1) == {(2, 3), (3, 4)}


def test_second_hop_unit_under_cap_bucket_ignored(spark):
    bands = _bands(spark, [(1, 0, "b0"), (2, 0, "b0")])
    verified = _pairs(spark, [])
    out = dedup.star_second_hop_pairs(bands, verified, 3)
    assert out.count() == 0


def test_second_hop_unit_all_attached_yields_nothing(spark):
    bands = _bands(spark, [(d, 0, "b0") for d in (1, 2, 3)])
    verified = _pairs(spark, [(1, 2), (1, 3)])
    out = dedup.star_second_hop_pairs(bands, verified, 2)
    assert out.count() == 0


def test_keep_best_same_clusters_better_representatives(spark):
    """near_dup_keep_best forms the SAME clusters as near_dup_keep_list
    (canonical_id unchanged) but keeps the highest-quality member."""
    base = " ".join(BASE[:50])
    rows = [
        (1, base, 10),          # cluster {1,2,3}: 3 has best quality
        (2, base + " one", 20),
        (3, base + " two", 90),
        (7, "a totally different document about broadcast joins windows "
            "and shuffle partitions in spark", 5),
    ]
    docs = spark.createDataFrame(rows, "doc_id int, text string, quality int")
    from translator_tm_provider_pipelines_spark.operators import dedup as dd

    kl = {r.doc_id: r for r in dd.near_dup_keep_list(docs).collect()}
    kb = {r.doc_id: r for r in dd.near_dup_keep_best(docs, "quality").collect()}
    assert {d: r.canonical_id for d, r in kl.items()} == {
        d: r.canonical_id for d, r in kb.items()
    }
    assert kl[1].is_kept and not kl[3].is_kept          # min-id keeps 1
    assert kb[3].is_kept and not kb[1].is_kept          # keep-best keeps 3
    assert kb[1].kept_id == kb[2].kept_id == kb[3].kept_id == 3
    assert kb[7].is_kept and kb[7].kept_id == 7
    # exactly one kept member per cluster
    from collections import Counter

    per = Counter(r.canonical_id for r in kb.values() if r.is_kept)
    assert all(v == 1 for v in per.values())


def test_negative_hops_repairs_until_converged(spark):
    docs = _chain_df(spark)
    conv = _pairset(dedup.near_duplicates(docs, star_repair_hops=-1, **LSH))
    many = _pairset(dedup.near_duplicates(docs, star_repair_hops=5, **LSH))
    assert conv == many == {(0, 1), (2, 3), (3, 4)}


def test_second_hop_unit_promotion_starvation_rescued(spark):
    """r9 documented the promotion-starvation residual; r10 closes it
    with star_rescue_pairs. With reps_per_hop=1 the hop loop always
    picks the bucket's SMALLEST unattached member; when its edges are
    exhausted the loop terminates — member 4, ranked below the stalled
    member, is never promoted, so its genuine edge to the ATTACHED
    member 3 is never proposed (the mechanism behind the 74-row
    index-vs-batch keep-list divergence on the mixed sf10 corpus,
    SCALING.md). The rescue ranks by HAS-AN-UNTRIED-EDGE instead, so
    the stalled stranger drops out of the ranking and member 4 gets its
    turn — (3, 4) is proposed and the member attaches."""
    # bucket {1,2,3,4}, cap 3 (over-cap); 3 is attached (pair with 99
    # from another bucket); 1, 2, 4 unattached; ground truth: 4's only
    # genuine neighbor is 3
    bands = _bands(spark, [(d, 0, "b0") for d in (1, 2, 3, 4)])
    verified = _pairs(spark, [(3, 99)])
    # hop 1: smallest unattached (1) promotes, stars against everyone
    hop1 = dedup.star_second_hop_pairs(bands, verified, 3, reps_per_hop=1)
    assert _pairset(hop1) == {(1, 2), (1, 3), (1, 4)}
    # every hop-1 edge fails verification (1 is genuinely alone):
    # attempted grows, verified does not
    attempted = _pairs(spark, [(1, 2), (1, 3), (1, 4)])
    hop2 = dedup.star_second_hop_pairs(
        bands, verified, 3, attempted=attempted, reps_per_hop=1
    )
    # the hop loop ALONE starves: member 1 is STILL the smallest
    # unattached, its proposals are all anti-joined away, and (3, 4) —
    # genuine, never attempted — is not proposed; the caller's
    # empty-candidate check ends the loop here with 4 stranded
    assert hop2.count() == 0
    # the rescue excludes fully-attempted member 1 from the ranking and
    # targets only ATTACHED co-bucket members (3 is the lone attached
    # member — stranger-to-stranger edges like (2, 4) are out of scope,
    # the 100 TB cost fence): bound 1 picks member 2 (smallest with an
    # untried qualifying edge)
    r1 = dedup.star_rescue_pairs(
        bands, verified, 3, attempted=attempted, reps_per_bucket=1
    )
    assert _pairset(r1) == {(2, 3)}
    # round 2 ((2, 3) failed → attempted): member 4's turn — (3, 4),
    # the starved genuine edge, is finally proposed
    attempted2 = _pairs(spark, [(1, 2), (1, 3), (1, 4), (2, 3)])
    r2 = dedup.star_rescue_pairs(
        bands, verified, 3, attempted=attempted2, reps_per_bucket=1
    )
    assert _pairset(r2) == {(3, 4)}
    # and once every unattached member has tried all its attached
    # targets, the rescue converges (empty) — the caller's loop ends
    attempted3 = attempted2.unionByName(_pairs(spark, [(3, 4)]))
    r3 = dedup.star_rescue_pairs(
        bands, verified, 3, attempted=attempted3, reps_per_bucket=1
    )
    assert r3.count() == 0
    # a wide bound proposes both members' qualifying edges in one round
    r_wide = dedup.star_rescue_pairs(
        bands, verified, 3, attempted=attempted, reps_per_bucket=3
    )
    assert _pairset(r_wide) == {(2, 3), (3, 4)}
    # band-agreement prefilter: these fixture pairs share exactly ONE
    # bucket, so a floor of 2 filters them all out (deterministically —
    # the same filter applies on the index side, preserving equality)
    r_floor = dedup.star_rescue_pairs(
        bands, verified, 3, attempted=attempted, reps_per_bucket=3,
        min_shared_bands=2,
    )
    assert r_floor.count() == 0


def test_near_duplicates_star_rescue_attaches_without_hops(spark):
    """End-to-end: star_rescue_reps alone (no repair hops) reattaches the
    stranded chain member — the rescue subsumes the hop loop's recall
    repair and closes its starvation residual, converging to the same
    pair set as converged hops on this fixture."""
    docs = _chain_df(spark)
    stats = {}
    got = _pairset(dedup.near_duplicates(
        docs, star_rescue_reps=1, repair_stats=stats, **LSH
    ))
    assert got == {(0, 1), (2, 3), (3, 4)}
    assert stats["rescue_converged"] and stats["rescue_rounds"] >= 1
    # keep-list parity with the uncapped run, via rescue instead of hops
    uncapped = dedup.near_dup_keep_list(
        docs, threshold=0.85, k=3, num_perms=8, rows_per_band=1
    )
    rescued = dedup.near_dup_keep_list(docs, star_rescue_reps=1, **LSH)
    assert sorted(map(tuple, uncapped.collect())) == sorted(
        map(tuple, rescued.collect())
    )
