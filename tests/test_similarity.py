"""Similarity-search operators: exact top-k, IVF-flat and LSH ANN."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import similarity

SF = "/root/testdata/sf0.001"


@pytest.fixture(scope="module")
def emb(spark):
    return spark.read.parquet(f"{SF}/embeddings.parquet")


@pytest.fixture(scope="module")
def qvec(spark, emb):
    return [r[0] for r in emb.where(F.col("vec_id") == 0).select(F.explode("embedding")).collect()]


def test_knn_self_first_and_deterministic(spark, emb, qvec):
    top = similarity.knn_brute_force(emb, qvec, k=5).collect()
    assert top[0].vec_id == 0 and top[0].cosine == 1.0
    again = similarity.knn_brute_force(emb, qvec, k=5).collect()
    assert [tuple(r) for r in top] == [tuple(r) for r in again]


def test_ann_ivf_prunes_and_recalls(spark, emb, qvec):
    cents = similarity.seed_centroids(emb, n_lists=8)
    assert [c[0] for c in cents] == list(range(8))
    # assignment is total: every vector lands in exactly one list
    assigned = emb.withColumn("l", similarity.ivf_list_id(F.col("embedding"), cents))
    assert assigned.where(F.col("l").isNull()).count() == 0
    n_total = emb.count()
    # nprobe < n_lists must scan a strict subset of the corpus
    probed = similarity.ann_ivf(emb, qvec, k=n_total, n_lists=8, nprobe=2, centroids=cents)
    n_probed = probed.count()
    assert 0 < n_probed < n_total
    # the query's own list is always probed, so vec 0 is recalled at rank 1
    top = similarity.ann_ivf(emb, qvec, k=5, n_lists=8, nprobe=2, centroids=cents).collect()
    assert top[0].vec_id == 0 and top[0].cosine == 1.0
    # full probing degenerates to exact knn
    exact = [tuple(r) for r in similarity.knn_brute_force(emb, qvec, k=10).collect()]
    full = [
        tuple(r)
        for r in similarity.ann_ivf(emb, qvec, k=10, n_lists=8, nprobe=8, centroids=cents).collect()
    ]
    assert full == exact


def test_ann_lsh_bucket_contains_query(spark, emb, qvec):
    top = similarity.ann_lsh(emb, qvec, k=5, n_planes=4).collect()
    assert top and top[0].vec_id == 0 and top[0].cosine == 1.0


def test_seed_centroids_sparse_ids(spark, emb):
    # ids not starting at 0 must still yield n_lists centroids
    shifted = emb.selectExpr("vec_id + 1000 as vec_id", "embedding")
    cents = similarity.seed_centroids(shifted, n_lists=4)
    assert len(cents) == 4 and cents[0][0] == 1000


def test_topk_pairs_lsh_matches_exact(spark, emb):
    sub = emb.where(F.col("vec_id") < 200)
    exact = [tuple(r) for r in similarity.topk_similar_pairs(sub, k=20).collect()]
    lsh = [tuple(r) for r in similarity.topk_similar_pairs_lsh(sub, k=20).collect()]
    assert lsh == exact


def test_topk_pairs_lsh_bucket_cap(spark, emb):
    # a cap of 1 drops every bucket → no candidates survive
    capped = similarity.topk_similar_pairs_lsh(emb, k=20, max_bucket_size=1)
    assert capped.count() == 0


def test_embedding_near_duplicates_matches_exact(spark, emb):
    # 24 bands give total recall on this corpus (recall is corpus-dependent;
    # the registered query's 16-band setting is verified at sf0.01/sf0.1)
    lsh = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in similarity.embedding_near_duplicates(emb, threshold=0.3, n_bands=24).collect()
    }
    a = emb.select(F.col("vec_id").alias("vec_a"), F.col("embedding").alias("ea"))
    b = emb.select(F.col("vec_id").alias("vec_b"), F.col("embedding").alias("eb"))
    exact = {
        (r.vec_a, r.vec_b, r.cosine)
        for r in a.join(b, F.col("vec_a") < F.col("vec_b"))
        .select(
            "vec_a", "vec_b",
            F.round(similarity.cosine(F.col("ea"), F.col("eb")), 6).alias("cosine"),
        )
        .where(F.col("cosine") >= 0.3)
        .collect()
    }
    assert lsh == exact and lsh


def test_ivf_index_partition_pruning(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "ivf")
    cents = similarity.write_ivf_index(emb, path, n_lists=8)
    top = similarity.ann_ivf_from_index(spark, path, cents, qvec, k=10, nprobe=2)
    # identical results to the in-memory IVF path with the same centroids
    mem = similarity.ann_ivf(emb, qvec, k=10, n_lists=8, nprobe=2, centroids=cents)
    assert [tuple(r) for r in top.collect()] == [tuple(r) for r in mem.collect()]
    # the probed-lists predicate must prune partitions at scan time
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_list" in plan


def test_lsh_index_partition_pruning(spark, emb, qvec, tmp_path):
    path = str(tmp_path / "lsh")
    similarity.write_lsh_index(emb, path, n_planes=4)
    top = similarity.ann_lsh_from_index(spark, path, qvec, k=5, n_planes=4)
    mem = similarity.ann_lsh(emb, qvec, k=5, n_planes=4)
    assert [tuple(r) for r in top.collect()] == [tuple(r) for r in mem.collect()]
    assert top.collect()[0].vec_id == 0


def _planted_corpus(rng, cosines, m, dims):
    """2*m*len(cosines) vectors; pair (2i, 2i+1) has EXACT cosine
    cosines[i // m]: v = cos(a)*u + sin(a)*w with w ⟂ u, all unit norm."""
    import math

    import numpy as np

    rows = []
    vid = 0
    for c in cosines:
        a = math.acos(c)
        for _ in range(m):
            u = rng.normal(size=dims)
            u /= np.linalg.norm(u)
            w = rng.normal(size=dims)
            w -= w.dot(u) * u
            w /= np.linalg.norm(w)
            v = math.cos(a) * u + math.sin(a) * w
            rows.append((vid, [float(x) for x in u]))
            rows.append((vid + 1, [float(x) for x in v]))
            vid += 2
    return rows


def _measured_recall(spark, rows, cosines, m, dims, n_bands, band_planes):
    df = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    cands = similarity.banded_lsh_candidate_pairs(
        df, n_dims=dims, n_bands=n_bands, band_planes=band_planes
    )
    got = {(r.vec_a, r.vec_b) for r in cands.collect()}
    recall = []
    for ci in range(len(cosines)):
        hit = sum(
            1 for j in range(m) if (2 * (ci * m + j), 2 * (ci * m + j) + 1) in got
        )
        recall.append(hit / m)
    return recall


def test_lsh_recall_meets_analytic_bound(spark):
    """Measured banded-LSH recall on planted exact-cosine pairs must meet
    1-(1-(1-θ/π)^r)^b minus binomial sampling slack — both at the
    registered near-dup parameters (bound ≈ 1) and at a deliberately
    weak 4×4 banding where the bound is far from 1 and the inequality
    actually bites."""
    import math

    import numpy as np

    from translator_tm_provider_pipelines_spark.plans.testdata_queries import (
        EMB_NEARDUP_PARAMS,
    )

    dims, m = 16, 60
    cosines = [0.95, 0.8, 0.6, 0.4, 0.3]
    rng = np.random.default_rng(7)
    rows = _planted_corpus(rng, cosines, m, dims)

    for n_bands, band_planes in [
        (EMB_NEARDUP_PARAMS["n_bands"], EMB_NEARDUP_PARAMS["band_planes"]),
        (4, 4),
    ]:
        recall = _measured_recall(spark, rows, cosines, m, dims, n_bands, band_planes)
        for c, rec in zip(cosines, recall):
            bound = similarity.lsh_recall_bound(c, n_bands, band_planes)
            slack = 3.0 * math.sqrt(bound * (1.0 - bound) / m) + 1.0 / m
            assert rec >= bound - slack, (
                f"bands={n_bands}x{band_planes} cos={c}: measured {rec:.3f} "
                f"< bound {bound:.3f} - slack {slack:.3f}"
            )


def test_registered_band_count_satisfies_bound():
    """The registered embedding_near_duplicates banding must keep the
    analytic recall at its own threshold ≥ 0.999 — lowering n_bands below
    the requirement fails here before it silently costs recall on a new
    corpus."""
    from translator_tm_provider_pipelines_spark.plans.testdata_queries import (
        EMB_NEARDUP_PARAMS,
    )

    p = EMB_NEARDUP_PARAMS
    bound = similarity.lsh_recall_bound(p["threshold"], p["n_bands"], p["band_planes"])
    assert bound >= 0.999, f"registered banding only guarantees recall {bound:.4f}"
    # and the margin is not accidental: one band fewer must still be
    # checked against the same floor by whoever edits the parameters
    weakest_ok = min(
        b
        for b in range(1, p["n_bands"] + 1)
        if similarity.lsh_recall_bound(p["threshold"], b, p["band_planes"]) >= 0.999
    )
    assert p["n_bands"] >= weakest_ok


def _clustered_corpus(spark, n_clusters=8, per_cluster=40, dims=16, seed=11):
    """Near-orthogonal clusters: cluster k sits on basis axis k with small
    noise. Ids are cluster-major, so first-n-ids seeding degenerates to
    cluster 0."""
    import numpy as np

    rng = np.random.default_rng(seed)
    rows = []
    vid = 0
    for k in range(n_clusters):
        for _ in range(per_cluster):
            v = rng.normal(scale=0.05, size=dims)
            v[k] += 1.0
            rows.append((vid, [float(x) for x in v]))
            vid += 1
    return spark.createDataFrame(rows, "vec_id long, embedding array<double>")


def _recall_at_10(spark, emb, qvec, centroids):
    bf = {r.vec_id for r in similarity.knn_brute_force(emb, qvec, k=10).collect()}
    ann = {
        r.vec_id
        for r in similarity.ann_ivf(
            emb, qvec, k=10, n_lists=8, nprobe=2, centroids=centroids
        ).collect()
    }
    return len(bf & ann) / 10


def test_trained_centroids_improve_recall(spark):
    """Farthest-first init + Lloyd iterations must beat degenerate
    first-n-ids seeding on a clustered corpus, and reach full recall@10
    with nprobe=2 of 8 lists."""
    emb = _clustered_corpus(spark).persist()
    qvec = [r[0] for r in emb.where("vec_id = 130").selectExpr("explode(embedding)").collect()]
    seed_c = similarity.seed_centroids(emb, n_lists=8)
    trained = similarity.train_centroids(emb, n_lists=8, n_iters=3)
    r_seed = _recall_at_10(spark, emb, qvec, seed_c)
    r_trained = _recall_at_10(spark, emb, qvec, trained)
    assert r_trained >= r_seed
    assert r_trained == 1.0
    # trained quantizer spreads one centroid per cluster: every cluster's
    # dominant axis appears as some centroid's dominant axis
    import numpy as np

    axes = {int(np.argmax(np.abs(cv))) for _, cv in trained}
    assert axes == set(range(8))
    emb.unpersist()


def test_train_centroids_deterministic_and_objective(spark):
    """Re-training reproduces identical centroids, and the spherical
    objective (mean cosine to assigned centroid) does not decrease from
    the farthest-first init."""
    from pyspark.sql import functions as SF

    emb = _clustered_corpus(spark, n_clusters=4, per_cluster=25).persist()

    def objective(cents):
        assigned = emb.withColumn("__l", similarity.ivf_list_id(SF.col("embedding"), cents))
        # per-row cosine of the ASSIGNED centroid
        expr = None
        for cid, cv in cents:
            c = SF.array(*[SF.lit(float(x)) for x in cv])
            cos = similarity.cosine(SF.col("embedding"), c)
            expr = SF.when(SF.col("__l") == cid, cos) if expr is None else expr.when(
                SF.col("__l") == cid, cos
            )
        return assigned.select(SF.avg(expr).alias("o")).collect()[0].o

    init = similarity.farthest_first_centroids(emb, n_lists=4)
    t1 = similarity.train_centroids(emb, n_lists=4, n_iters=3, init=init)
    t2 = similarity.train_centroids(emb, n_lists=4, n_iters=3, init=init)
    assert t1 == t2
    assert objective(t1) >= objective(init) - 1e-9
    emb.unpersist()


def test_pq_encode_deterministic_and_narrow(spark, emb):
    books = similarity.pq_seed_codebooks(emb, m=8, n_codes=16)
    assert len(books) == 8 and len(books[0]) == 16 and len(books[0][0]) == 8
    codes = similarity.pq_encode(emb, books)
    plan = codes._jdf.queryExecution().executedPlan().toString()
    assert "Exchange" not in plan  # pure narrow projection
    rows = {r.vec_id: list(r.codes) for r in codes.collect()}
    assert len(rows) == emb.count()
    assert all(0 <= c < 16 for cs in rows.values() for c in cs)
    # a seed vector encodes to itself in every subspace (distance 0)
    seed_ids = [r.vec_id for r in emb.orderBy("vec_id").limit(16).collect()]
    assert rows[seed_ids[3]] == [3] * 8
    # re-encoding is bit-identical
    assert {r.vec_id: list(r.codes) for r in similarity.pq_encode(emb, books).collect()} == rows


@pytest.mark.slow
def test_pq_adc_recall_and_refinement(spark, emb, qvec):
    # cosine via PQ = L2-normalize first (unit vectors: L2² = 2 − 2·cos),
    # then L2-metric codes; exact baseline stays raw-cosine
    nemb = similarity.l2_normalize(emb)
    qn = sum(x * x for x in qvec) ** 0.5
    nqvec = [x / qn for x in qvec]
    books = similarity.pq_train_codebooks(nemb, m=16, n_codes=16, n_iters=3)
    codes = similarity.pq_encode(nemb, books)
    approx = [r.vec_id for r in similarity.pq_adc_search(codes, books, nqvec, k=10).collect()]
    exact = [r.vec_id for r in similarity.knn_brute_force(emb, qvec, k=10).collect()]
    # ADC shortlist overlaps the exact top-10 (coarse recall; measured 5)
    assert len(set(approx) & set(exact)) >= 3
    # two-stage refinement ~recovers the exact top-10 (measured 9/10)
    refined = [r.vec_id for r in
               similarity.pq_search_refined(nemb, books, nqvec, k=10, rerank=50).collect()]
    hits = len(set(refined) & set(exact))
    assert hits >= 7, (refined, exact)
    # the ADC plan is a TakeOrdered over the codes column, no join/shuffle
    p = similarity.pq_adc_search(codes, books, nqvec, k=10)._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in p
    assert "Join" not in p


def test_pq_train_deterministic(spark, emb):
    b1 = similarity.pq_train_codebooks(emb, m=4, n_codes=8, n_iters=2)
    b2 = similarity.pq_train_codebooks(emb, m=4, n_codes=8, n_iters=2)
    assert b1 == b2


def test_semantic_dedup_cluster_scoped(spark):
    # two tight clusters on orthogonal axes + one exact-dup pair inside
    # each; a cross-cluster near-dup CANNOT be found (the SemDeDup
    # trade-off) because candidates are cluster-scoped
    def v(axis, eps, d=8):
        base = [0.0] * d
        base[axis] = 1.0
        base[(axis + 4) % d] = eps
        return base

    rows = [
        (0, v(0, 0.0)),   # centroid seed A
        (1, v(1, 0.0)),   # centroid seed B
        (2, v(0, 0.01)),  # near-dup of 0 (cluster A)
        (3, v(1, 0.01)),  # near-dup of 1 (cluster B)
        (4, v(2, 0.0)),   # isolated direction
    ]
    emb = spark.createDataFrame(rows, "vec_id long, embedding array<double>")
    pairs = {
        (r.vec_a, r.vec_b)
        for r in similarity.semantic_near_duplicates(
            emb, threshold=0.9, n_lists=2
        ).collect()
    }
    assert (0, 2) in pairs and (1, 3) in pairs
    # vectors in different clusters never pair, whatever their cosine
    assert all(a != 4 and b != 4 for a, b in pairs)

    keep = {
        r.vec_id: r.keep
        for r in similarity.semantic_dedup_keep_list(
            emb, threshold=0.9, n_lists=2
        ).collect()
    }
    assert keep == {0: True, 1: True, 2: False, 3: False, 4: True}

    # the bucket guard drops a degenerate cluster instead of going quadratic
    capped = similarity.semantic_near_duplicates(
        emb, threshold=0.9, n_lists=2, max_bucket_size=1
    ).count()
    assert capped == 0


def test_lit_nested_doubles_rejects_non_finite():
    import pytest

    from translator_tm_provider_pipelines_spark.operators.similarity import (
        _lit_nested_doubles,
    )

    with pytest.raises(ValueError, match="non-finite"):
        _lit_nested_doubles([[1.0, float("nan")], [2.0, 3.0]])
    with pytest.raises(ValueError, match="non-finite"):
        _lit_nested_doubles([float("inf")])


def test_sampled_farthest_first_one_scan(spark):
    """The sampled init must launch an O(1) number of Spark jobs
    regardless of n_lists (the exact variant launches n_lists scans)."""
    emb = _clustered_corpus(spark)
    sc = spark.sparkContext

    def jobs_for(fn, group):
        sc.setJobGroup(group, group)
        try:
            fn()
        finally:
            sc.setJobGroup("", "")
        return len(sc.statusTracker().getJobIdsForGroup(group))

    j4 = jobs_for(
        lambda: similarity.sampled_farthest_first_centroids(emb, n_lists=4), "sffc4"
    )
    j8 = jobs_for(
        lambda: similarity.sampled_farthest_first_centroids(emb, n_lists=8), "sffc8"
    )
    assert j4 == j8, f"job count must not grow with n_lists ({j4} vs {j8})"
    assert j8 <= 2  # one TakeOrdered (limit may split into 1-2 jobs)


def test_sampled_farthest_first_recall_and_determinism(spark):
    """Same acceptance bar as the exact init: after Lloyd refinement the
    quantizer reaches recall@10 = 1.0 with nprobe=2 of 8 lists on the
    clustered corpus, spreads one centroid per cluster, and reproduces
    bit-identical centroids on a re-run."""
    emb = _clustered_corpus(spark).persist()
    qvec = [
        r[0]
        for r in emb.where("vec_id = 130").selectExpr("explode(embedding)").collect()
    ]
    init = similarity.sampled_farthest_first_centroids(emb, n_lists=8)
    assert init == similarity.sampled_farthest_first_centroids(emb, n_lists=8)
    trained = similarity.train_centroids(emb, n_lists=8, n_iters=3, init=init)
    assert _recall_at_10(spark, emb, qvec, trained) == 1.0
    import numpy as np

    axes = {int(np.argmax(np.abs(cv))) for _, cv in trained}
    assert axes == set(range(8))
    emb.unpersist()


def test_ivf_index_incremental_add(spark, emb, qvec, tmp_path):
    """Incremental IVF adds: batch-0 build + batch-1 add under the same
    frozen quantizer equal a single-shot query over the union; retrying a
    batch is idempotent; list pruning still reaches the scan."""
    path = str(tmp_path / "ivf_inc")
    old = emb.where(F.col("vec_id") < 400)
    new = emb.where(F.col("vec_id") >= 400)
    cents = similarity.seed_centroids(old, n_lists=8)
    similarity.add_to_ivf_index(old, path, cents, batch_id=0)
    similarity.add_to_ivf_index(new, path, cents, batch_id=1)
    top = similarity.ann_ivf_from_index(spark, path, cents, qvec, k=10, nprobe=2)
    mem = similarity.ann_ivf(emb, qvec, k=10, n_lists=8, nprobe=2, centroids=cents)
    assert [tuple(r) for r in top.collect()] == [tuple(r) for r in mem.collect()]
    plan = top._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters: [ivf_list" in plan
    # retry of batch 1 must not duplicate rows
    similarity.add_to_ivf_index(new, path, cents, batch_id=1)
    assert spark.read.parquet(path).count() == emb.count()
    assert [tuple(r) for r in similarity.ann_ivf_from_index(
        spark, path, cents, qvec, k=10, nprobe=2
    ).collect()] == [tuple(r) for r in mem.collect()]


def _recall10(spark, path, cents, corpus, qv, nprobe=2):
    truth = {r.vec_id for r in similarity.knn_brute_force(corpus, qv, k=10).collect()}
    got = {
        r.vec_id
        for r in similarity.ann_ivf_from_index(
            spark, path, cents, qv, k=10, nprobe=nprobe
        ).collect()
    }
    return len(truth & got) / 10


def test_ivf_drift_guard_detects_shifted_batch(spark, emb, tmp_path):
    """Appended batches assign against the FROZEN quantizer, so a
    distribution shift degrades the index silently. ivf_assignment_quality
    + ivf_should_retrain make it measurable: a concentrated shift (every
    vector pulled toward one direction, renormalized) moves the mean
    assigned-cosine 0.19 -> ~0.83 and max_list_share 0.15 -> ~1.0 — both
    far past the guard thresholds — while an in-distribution batch trips
    neither. On this (near-isotropic) fixture recall@10 survives at
    nprobe=2 because the drifted cluster fits inside the probed hotspot
    list; the measured harm is SELECTIVITY: the probed scan fraction for
    drifted-neighborhood queries grows ~5x (0.13 -> 0.63 of the corpus,
    recorded in SCALING.md), i.e. list pruning stops pruning and the hot
    list becomes one giant skewed partition."""
    path = str(tmp_path / "ivf_drift")
    base = emb.where(F.col("vec_id") < 400).select("vec_id", "embedding")
    inlier = emb.where(F.col("vec_id") >= 400).select("vec_id", "embedding")
    cents = similarity.seed_centroids(base, n_lists=8)
    similarity.add_to_ivf_index(base, path, cents, batch_id=0)

    q_base = similarity.ivf_assignment_quality(base, cents).first()
    q_inlier = similarity.ivf_assignment_quality(inlier, cents).first()
    assert not similarity.ivf_should_retrain(q_base, q_inlier)

    # concentrated drift: pull every vector toward centroid 0 direction
    u = cents[0][1]
    unorm = sum(x * x for x in u) ** 0.5
    ulit = F.lit([1.5 * x / unorm for x in u])
    shifted_raw = F.zip_with("embedding", ulit, lambda a, b: a + b)
    nrm = F.sqrt(F.aggregate(shifted_raw, F.lit(0.0), lambda acc, x: acc + x * x))
    drifted = base.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(shifted_raw, lambda x: (x / nrm).cast("float")).alias("embedding"),
    )
    q_drift = similarity.ivf_assignment_quality(drifted, cents).first()
    assert similarity.ivf_should_retrain(q_base, q_drift)
    assert abs(q_drift["mean_assigned_cosine"] - q_base["mean_assigned_cosine"]) > 0.2
    assert q_drift["max_list_share"] > 3.0 * q_base["max_list_share"]
    # the promised tail signal: p10 <= mean always, and it moves with the
    # concentrated shift just like the mean does
    for q in (q_base, q_inlier, q_drift):
        assert q["p10_assigned_cosine"] <= q["mean_assigned_cosine"] + 1e-9
    assert abs(q_drift["p10_assigned_cosine"] - q_base["p10_assigned_cosine"]) > 0.2

    # recall@10 + scan selectivity, same frozen quantizer
    similarity.add_to_ivf_index(drifted, path, cents, batch_id=1)
    corpus = base.unionByName(drifted)
    n_total = corpus.count()
    base_q = [
        [float(x) for x in r.embedding]
        for r in base.where(F.col("vec_id").isin(5, 17, 123)).collect()
    ]
    drift_q = [
        [float(x) for x in r.embedding]
        for r in drifted.where(F.col("vec_id").isin(10_005, 10_017, 10_123)).collect()
    ]
    rec_base = sum(_recall10(spark, path, cents, corpus, qv) for qv in base_q) / 3
    rec_drift = sum(_recall10(spark, path, cents, corpus, qv) for qv in drift_q) / 3
    assert rec_base >= 0.8  # in-distribution queries largely unharmed

    def scan_fraction(qv):
        import math

        def pycos(a, b):
            d = sum(x * y for x, y in zip(a, b))
            return d / (math.sqrt(sum(x * x for x in a)) * math.sqrt(sum(y * y for y in b)))

        probes = [cid for _, cid in sorted((-pycos(qv, cv), cid) for cid, cv in cents)[:2]]
        return (
            spark.read.parquet(path).where(F.col("ivf_list").isin(probes)).count()
            / n_total
        )

    frac_base = sum(scan_fraction(qv) for qv in base_q) / 3
    frac_drift = sum(scan_fraction(qv) for qv in drift_q) / 3
    # pruning selectivity destroyed: the hot list alone holds >= half
    # the corpus, and drifted-neighborhood queries scan ~2x what base
    # queries do (0.63 vs 0.29 measured; nprobe/n_lists ideal is 0.25)
    assert frac_drift >= 0.5
    assert frac_drift > 1.5 * frac_base
    print(
        f"IVF drift: recall base={rec_base:.2f} drift={rec_drift:.2f}; "
        f"scan fraction base={frac_base:.3f} drift={frac_drift:.3f}; "
        f"mean_cos {q_base['mean_assigned_cosine']:.3f}->"
        f"{q_drift['mean_assigned_cosine']:.3f}; "
        f"max_share {q_base['max_list_share']:.3f}->{q_drift['max_list_share']:.3f}"
    )


def test_retrain_ivf_index_restores_balance(spark, emb, tmp_path):
    """The guard's prescription end-to-end: after a drifted batch is
    appended, retrain_ivf_index rewrites the whole index under fresh
    centroids — assignment balance is restored (no hotspot list), the
    quality row passes ivf_should_retrain against itself, and queries
    through the rewritten index return exact brute-force top-10 at full
    probe width (the index rewrite loses no rows and mixes no
    quantizers)."""
    path = str(tmp_path / "ivf_retrain")
    base = emb.where(F.col("vec_id") < 400).select("vec_id", "embedding")
    cents0 = similarity.seed_centroids(base, n_lists=8)
    similarity.add_to_ivf_index(base, path, cents0, batch_id=0)
    u = cents0[0][1]
    unorm = sum(x * x for x in u) ** 0.5
    ulit = F.lit([1.5 * x / unorm for x in u])
    shifted_raw = F.zip_with("embedding", ulit, lambda a, b: a + b)
    nrm = F.sqrt(F.aggregate(shifted_raw, F.lit(0.0), lambda acc, x: acc + x * x))
    drifted = base.select(
        (F.col("vec_id") + 10_000).alias("vec_id"),
        F.transform(shifted_raw, lambda x: (x / nrm).cast("float")).alias("embedding"),
    )
    similarity.add_to_ivf_index(drifted, path, cents0, batch_id=1)

    cents1 = similarity.retrain_ivf_index(spark, path, n_lists=8, n_iters=2)
    reindexed = spark.read.parquet(path)
    assert reindexed.count() == 800  # nothing lost in the rewrite
    corpus = base.unionByName(drifted)
    q1 = similarity.ivf_assignment_quality(corpus, cents1).first()
    # hotspot gone: the drifted half now has its own centroid(s)
    assert q1["max_list_share"] < 0.75
    assert not similarity.ivf_should_retrain(q1, q1)
    # full-probe query through the rewritten index == brute force
    qv = [float(x) for x in base.where(F.col("vec_id") == 5).first().embedding]
    truth = [r.vec_id for r in similarity.knn_brute_force(corpus, qv, k=10).collect()]
    got = [
        r.vec_id
        for r in similarity.ann_ivf_from_index(
            spark, path, cents1, qv, k=10, nprobe=8
        ).collect()
    ]
    assert got == truth


def test_retrain_default_never_runs_percentroid_driver_loop(
    spark, emb, tmp_path, monkeypatch
):
    """r9 (VERDICT r8 task 3): the default retrain path must never reach
    the exact farthest-first loop — the last driver-coordinated
    O(n_lists)-scan routine in the repo — and the exact variant stays
    available only behind an explicit exact_seed=True."""
    path = str(tmp_path / "ivf_gate")
    base = emb.where(F.col("vec_id") < 200).select("vec_id", "embedding")
    cents0 = similarity.seed_centroids(base, n_lists=4)
    similarity.add_to_ivf_index(base, path, cents0, batch_id=0)

    def boom(*a, **kw):
        raise AssertionError("exact farthest_first_centroids reached on the default path")

    monkeypatch.setattr(similarity, "farthest_first_centroids", boom)
    cents = similarity.retrain_ivf_index(spark, path, n_lists=4, n_iters=1)
    assert len(cents) == 4  # sampled one-scan seeding carried the retrain
    with pytest.raises(AssertionError, match="default path"):
        similarity.retrain_ivf_index(
            spark, path, n_lists=4, n_iters=1, exact_seed=True
        )


def test_rp_lsh_bucket_vectorized_matches_expression(spark):
    """r12: rp_lsh_bucket's Arrow-vectorized path (auto-enabled at >=
    VECTORIZE_MIN_PLANES, where the interpreted HOF expression chain cost
    ~5 ms/row on the sf10 slice) must produce BIT-IDENTICAL bucket
    strings to the expression path — the numpy GEMM reproduces Spark's
    HALF-UP rounding exactly, and the rounding scale already absorbs
    summation-order float noise by design. Checked at a plane count on
    each side of the threshold, plus the auto-policy itself."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    for n_planes in (8, 96):
        planes = similarity.hyperplanes(n_planes, 64)
        expr = emb.select(
            "vec_id",
            similarity.rp_lsh_bucket(
                F.col("embedding"), planes, vectorized=False
            ).alias("b"),
        )
        vec = emb.select(
            "vec_id",
            similarity.rp_lsh_bucket(
                F.col("embedding"), planes, vectorized=True
            ).alias("b"),
        )
        a = {r.vec_id: r.b for r in expr.collect()}
        b = {r.vec_id: r.b for r in vec.collect()}
        assert a == b, f"bit mismatch at {n_planes} planes"
        assert all(len(s) == n_planes for s in a.values())
    # auto policy: registry-scale plane counts stay pure-expression
    # (no PythonUDF in the plan), scale counts go vectorized
    small = emb.select(
        similarity.rp_lsh_bucket(
            F.col("embedding"), similarity.hyperplanes(48, 64)
        ).alias("b")
    )
    assert "pythonUDF" not in small._jdf.queryExecution().executedPlan().toString().lower()
    big = emb.select(
        similarity.rp_lsh_bucket(
            F.col("embedding"), similarity.hyperplanes(96, 64)
        ).alias("b")
    )
    assert "arrowevalpython" in big._jdf.queryExecution().executedPlan().toString().lower()


def test_spread_bucket_pairs_repartitions_before_explode(spark):
    """r12: the bucketed pair generators round-robin the bucket rows
    before the pair explode so AQE's byte-size coalescing cannot confine
    C(|bucket|,2) expansions to a handful of tasks (the sf10 straggler;
    _spread_bucket_pairs docstring). The exchange must appear below the
    explode, and results are unchanged."""
    emb = spark.read.parquet("/root/testdata/sf0.001/embeddings.parquet")
    cand = similarity.banded_lsh_candidate_pairs(
        emb, n_dims=64, n_bands=4, band_planes=2
    )
    p = cand._jdf.queryExecution().executedPlan().toString()
    assert "RoundRobinPartitioning" in p
    # sanity: pairs are still distinct ordered ids
    rows = cand.collect()
    assert all(r.vec_a < r.vec_b for r in rows)
    assert len(rows) == len({(r.vec_a, r.vec_b) for r in rows})
