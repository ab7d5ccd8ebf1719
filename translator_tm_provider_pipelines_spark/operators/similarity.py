"""Similarity search over embedding columns (LLM-data-pipeline extension).

Baseline: brute-force cosine top-k — exact, O(n·d) per query, expressed as
JVM-side array arithmetic (``zip_with`` + ``aggregate``), no Python in the
hot path. Scale path: random-hyperplane LSH bucketing — candidates are
restricted to the query's bucket (and optional neighbor probes), turning a
100 TB scan into a bucket-pruned lookup; hyperplanes are derived
deterministically from md5 so plans are reproducible with no RNG state.
"""

from __future__ import annotations

import hashlib
import math

import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def _lit_nested_doubles(vals) -> Column:
    """Literal for a (possibly nested) list of doubles as ONE parsed SQL
    expression. ``F.lit`` of a nested Python list crosses py4j once per
    element (~1 ms each — a 1 000-element codebook costs a full second of
    plan build); rendering ``array(array(…))`` text and parsing it JVM-side
    is one call, and ``repr(float)`` round-trips exactly so the doubles are
    bit-identical."""

    def fmt(v) -> str:
        if isinstance(v, (list, tuple)):
            return "array(" + ",".join(fmt(x) for x in v) + ")"
        f = float(v)
        if not math.isfinite(f):
            # 'infD'/'nanD' is not parseable Spark SQL; fail at the source
            # (degenerate codebook / centroid input) instead of with an
            # opaque parse error deep inside the consuming query
            raise ValueError(f"non-finite component in double literal: {f!r}")
        return repr(f) + "D"

    return F.expr(fmt(vals))


def dot(a: Column, b: Column) -> Column:
    """Σ aᵢ·bᵢ as double — zip_with + aggregate, whole-stage-codegen."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def l2_norm(a: Column) -> Column:
    return F.sqrt(
        F.aggregate(
            F.transform(a, lambda x: x.cast("double") * x.cast("double")),
            F.lit(0.0),
            lambda acc, x: acc + x,
        )
    )


def cosine(a: Column, b: Column) -> Column:
    return dot(a, b) / (l2_norm(a) * l2_norm(b))


def knn_brute_force(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Exact top-k by cosine against a literal query vector. Ordering is on
    the *rounded* score with id tie-break so results are stable across
    engines and runs. The filter+sort is a single pass; Spark's
    ``TakeOrderedAndProject`` keeps only k rows per partition."""
    q = F.lit([float(v) for v in query_vec])
    scored = embeddings.select(
        F.col(id_col).alias("vec_id"),
        F.round(cosine(F.col(vec_col), q), scale).alias("cosine"),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_id")).limit(k)


def topk_similar_pairs(
    embeddings: DataFrame,
    k: int = 20,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Top-k most-similar vector pairs (exact, all-pairs — the oracle /
    small-n reference; :func:`topk_similar_pairs_lsh` is the scale path
    and must agree with this on corpora where LSH recall is total)."""
    a = embeddings.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("ea"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    b = embeddings.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("eb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    pairs = a.join(b, F.col("vec_a") < F.col("vec_b"))
    # norms precompute once per vector (n of them), not once per pair
    # (n² of them); dot/(na*nb) is the same float expression cosine()
    # builds, so scores stay bit-identical
    scored = pairs.select(
        "vec_a",
        "vec_b",
        F.round(dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), scale).alias(
            "cosine"
        ),
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_a"), F.col("vec_b")).limit(k)


def banded_lsh_candidate_pairs(
    embeddings: DataFrame,
    n_dims: int,
    n_bands: int = 16,
    band_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate (vec_a, vec_b) pairs via banded random-hyperplane LSH —
    the embedding analogue of dedup's MinHash banding: a pair is a
    candidate iff it collides in ANY band's sign-bit bucket.

    Shape mirrors ``dedup.lsh_candidate_pairs``: bucketing is a narrow
    projection (one explode, no join against the corpus), pairs expand
    JVM-side inside each bucket row after ONE shuffle on (band, bucket),
    and ``max_bucket_size`` caps pathological buckets at scale. Collision
    probability per band is (1 - θ/π)^band_planes, so recall of high-cosine
    pairs rises with ``n_bands`` and selectivity with ``band_planes`` —
    grow ``band_planes`` ~log(n) to keep bucket sizes flat as the corpus
    grows."""
    all_planes = hyperplanes(n_bands * band_planes, n_dims)
    # one sign-bit string over ALL planes, sliced per band. The bit
    # string materializes in its OWN projection: it feeds every band
    # column, and collapsing it into the band slices would recompute all
    # n_bands*band_planes plane dots once per band (CollapseProject keeps
    # multi-referenced non-cheap aliases separate).
    with_bits = embeddings.select(
        F.col(id_col).alias("vec_id"),
        rp_lsh_bucket(F.col(vec_col), all_planes, scale).alias("__bits"),
    )
    band_cols = [
        F.concat(
            F.lit(f"{b}:"),
            F.substring(F.col("__bits"), b * band_planes + 1, band_planes),
        )
        for b in range(n_bands)
    ]
    bucketed = with_bits.select(
        "vec_id",
        F.explode(F.array(*band_cols)).alias("band_bucket"),
    )
    buckets = (
        bucketed.groupBy("band_bucket")
        .agg(F.array_sort(F.collect_set("vec_id")).alias("vs"))
        .where(F.size("vs") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("vs") <= max_bucket_size)
    return _spread_bucket_pairs(buckets).distinct()


def _spread_bucket_pairs(buckets: DataFrame) -> DataFrame:
    """Pair-expand bucket rows with the explode parallelized: the bucket
    relation is tiny by BYTES (one row per bucket), so AQE coalesces the
    grouping shuffle to a handful of partitions — but each row then
    explodes into C(|bucket|,2) pairs, so the expansion (and everything
    fused behind it) runs in those few tasks with one straggler per
    heavy bucket. Measured on the sf10 embedding slice (r12): the
    candidate stage ran as 12+1/13 tasks with multi-minute stragglers;
    an explicit round-robin exchange of the bucket rows — which AQE
    never coalesces — spreads the expansion across the full task width
    (248 -> 75 s for the candidate pass together with the vectorized
    bits path in ``rp_lsh_bucket``). Same trap and same fix as the
    pre-shingle-explode repartition in ``dedup.near_duplicates``
    (dedup.py, "Oversize buckets" numbers in SCALING.md)."""
    n_part = int(
        buckets.sparkSession.conf.get("spark.sql.shuffle.partitions", "200")
    )
    return (
        buckets.repartition(n_part)
        .select(_sorted_set_pairs().alias("p"))
        .select("p.vec_a", "p.vec_b")
    )


def _sorted_set_pairs(vs: str = "vs") -> Column:
    """Exploded (vec_a, vec_b) structs for every a < b combination of a
    SORTED in-bucket id array ``vs`` — the JVM-side pair expansion shared
    by every bucketed candidate generator (no join against the corpus)."""
    return F.explode(
        F.flatten(
            F.transform(
                F.col(vs),
                lambda x, i: F.transform(
                    F.slice(
                        F.col(vs), i + F.lit(2), F.greatest(F.size(vs) - i - 1, F.lit(0))
                    ),
                    lambda y: F.struct(x.alias("vec_a"), y.alias("vec_b")),
                ),
            )
        )
    )


def topk_similar_pairs_lsh(
    embeddings: DataFrame,
    k: int = 20,
    n_dims: int = 64,
    n_bands: int = 16,
    band_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Scale path for top-k similar pairs: banded-LSH candidate generation
    followed by exact cosine verification on candidates only — no all-pairs
    self-join anywhere in the plan. With enough bands the candidate set
    contains every top-k pair and the result is identical to the exact
    form (the registered query is hash-checked against the all-pairs
    oracle); at 100 TB the candidate volume is governed by band/bucket
    parameters instead of n²."""
    pairs = banded_lsh_candidate_pairs(
        embeddings,
        n_dims=n_dims,
        n_bands=n_bands,
        band_planes=band_planes,
        id_col=id_col,
        vec_col=vec_col,
        scale=scale,
        max_bucket_size=max_bucket_size,
    )
    ea = embeddings.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("ea"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    eb = embeddings.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("eb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    scored = (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            # per-vector norms ride the (broadcast) join; only the dot is
            # per-candidate — same float expression, bit-identical scores
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), scale
            ).alias("cosine"),
        )
    )
    return scored.orderBy(F.col("cosine").desc(), F.col("vec_a"), F.col("vec_b")).limit(k)


# ---------------------------------------------------------------------------
# Random-hyperplane LSH (deterministic)
# ---------------------------------------------------------------------------


def lsh_recall_bound(cos_threshold: float, n_bands: int, band_planes: int) -> float:
    """Analytic candidate-recall lower bound of banded random-hyperplane
    LSH for a pair with cosine ≥ ``cos_threshold``: a sign bit agrees with
    probability 1 - θ/π (θ = acos cosine), a band of ``band_planes`` bits
    collides with (1 - θ/π)^r, and the pair is a candidate iff ANY of the
    ``n_bands`` bands collides → 1 - (1 - (1 - θ/π)^r)^b. Monotone in the
    cosine, so evaluating at the threshold bounds every pair above it.
    Use this to size ``n_bands`` for a target recall before trusting
    LSH-gated results on a new corpus."""
    theta = math.acos(min(max(cos_threshold, -1.0), 1.0))
    p_band = (1.0 - theta / math.pi) ** band_planes
    return 1.0 - (1.0 - p_band) ** n_bands


def _plane_component(plane: int, dim: int) -> float:
    """Deterministic pseudo-gaussian component from md5(plane, dim) —
    Box-Muller over two 24-bit uniform draws; no RNG state, so the same
    bucketing is reproducible everywhere."""
    d = hashlib.md5(f"{plane}:{dim}".encode()).digest()
    u1 = (int.from_bytes(d[0:3], "big") + 1) / (2**24 + 1)
    u2 = int.from_bytes(d[3:6], "big") / (2**24)
    return math.sqrt(-2.0 * math.log(u1)) * math.cos(2.0 * math.pi * u2)


def hyperplanes(n_planes: int, n_dims: int) -> list[list[float]]:
    return [[_plane_component(p, d) for d in range(n_dims)] for p in range(n_planes)]


#: plane-count threshold above which rp_lsh_bucket switches to the
#: Arrow-vectorized bits path: the nested-literal transform is a chain of
#: higher-order functions Catalyst evaluates interpreted (no whole-stage
#: codegen for HOF lambdas), costing ~allocations-per-plane per row —
#: measured ~5 ms/row at 256 planes x 64 dims on the sf10 embedding
#: slice, which made the bits projection the candidate stage's dominant
#: cost. Registry-scale plane counts (<= 48) stay on the pure-expression
#: path (plan-flat, oracle-mirrorable); the scale policy "grow
#: band_planes ~log n" crosses into the numpy-matmul path where one
#: Arrow batch costs a (batch x dims) @ (dims x planes) GEMM.
VECTORIZE_MIN_PLANES = 64


def rp_lsh_bucket(
    vec_col: Column,
    planes: list[list[float]],
    scale: int = 6,
    vectorized: bool | None = None,
) -> Column:
    """Bucket id = sign bits of the vector against each hyperplane,
    as a bit string ('0110...'). Vectors in the same bucket are likely
    cosine neighbors (probability 1 - θ/π per plane). The dot product is
    ROUNDED before the sign test so the bit pattern is stable across
    engines (summation-order float noise ≪ the rounding scale).

    Two evaluation paths with IDENTICAL output (pinned by test):

    - expression (default below ``VECTORIZE_MIN_PLANES`` planes): all
      planes evaluate through ONE ``transform`` over a nested literal
      array — one loop instead of |planes| inlined aggregate
      expressions, which keeps the generated code (and analysis time)
      flat as band counts grow. The literal ships as one nested-list
      ``F.lit`` — a single py4j call instead of |planes|×n_dims of them,
      which was seconds of driver time at 48×64.
    - Arrow-vectorized (default at or above the threshold): one
      pandas_udf computing the full sign-bit matrix per Arrow batch as a
      numpy GEMM. HOF lambdas never enter whole-stage codegen, so the
      expression path is interpreted per plane (~5 ms/row at 256×64);
      the GEMM amortizes to microseconds. Rounding reproduces Spark's
      HALF-UP ``F.round`` exactly (floor(|d|·10^scale + 0.5)·sign(d)),
      so the bit pattern — already defined to absorb summation-order
      noise below the rounding scale — is unchanged.

    ``vectorized`` forces a path explicitly (tests pin cross-path
    equality with it)."""
    if vectorized is None:
        vectorized = len(planes) >= VECTORIZE_MIN_PLANES
    if vectorized:
        return _rp_lsh_bucket_vectorized(vec_col, planes, scale)
    planes_lit = F.lit([[float(c) for c in plane] for plane in planes])
    bits = F.transform(
        planes_lit,
        lambda p: F.when(F.round(dot(vec_col, p), scale) >= 0, F.lit("1")).otherwise(
            F.lit("0")
        ),
    )
    return F.array_join(bits, "")


def _rp_lsh_bucket_vectorized(
    vec_col: Column, planes: list[list[float]], scale: int
) -> Column:
    """Arrow-batched sign-bit matrix: (batch × dims) @ (dims × planes)
    GEMM, HALF-UP rounding at ``scale`` decimals matching ``F.round``,
    '1' iff the rounded dot ≥ 0 (−0.0 compares ≥ 0 in numpy exactly as
    in SQL). The plane matrix ships in the task closure (n_planes ×
    n_dims floats — KBs even at scale)."""
    import numpy as np
    from pyspark.sql.functions import pandas_udf

    mat = np.asarray(planes, dtype=np.float64).T  # dims x planes
    factor = float(10**scale)

    @pandas_udf("string")
    def _bits(vecs: pd.Series) -> pd.Series:
        arr = np.vstack(vecs.to_numpy()).astype(np.float64)
        d = arr @ mat
        r = np.floor(np.abs(d) * factor + 0.5) * np.sign(d)
        chars = np.where(r >= 0, "1", "0")
        return pd.Series(["".join(row) for row in chars])

    return _bits(vec_col)


def seed_centroids(
    embeddings: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[tuple[int, list[float]]]:
    """Deterministic IVF coarse quantizer: the first ``n_lists`` vectors by
    id are the list centroids (no k-means iterations — reproducible and
    SQL-expressible; at production scale swap in trained centroids, the
    assignment/probe machinery is unchanged). The collect is bounded by
    ``n_lists`` — the centroid table is tiny by design (same role as the
    reference's broadcast side inputs, but provably small)."""
    rows = (
        embeddings.select(id_col, vec_col)
        .orderBy(id_col)
        .limit(n_lists)
        .collect()
    )
    return [(int(r[0]), [float(x) for x in r[1]]) for r in rows]


def farthest_first_centroids(
    embeddings: DataFrame,
    n_lists: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> list[tuple[int, list[float]]]:
    """Deterministic farthest-first (k-means++-style, without randomness)
    IVF initialization over the FULL corpus: start from the minimum id,
    then repeatedly take the vector whose best cosine against the chosen
    set is lowest (lowest-id tie-break). Exact, but each step is a full
    corpus scan — ``n_lists`` driver-coordinated jobs total, which at
    100 TB × n_lists=1000 is the wrong cost shape. Prefer
    :func:`sampled_farthest_first_centroids` (one scan, same selection
    rule over a deterministic oversample) for anything large; this exact
    variant remains for small corpora and as the reference selection.
    No production path reaches it by default — :func:`retrain_ivf_index`
    gates it behind ``exact_seed=True`` (pinned by test), and
    :func:`train_centroids` / :func:`ann_ivf` default to one-scan
    seeding. Why it stays at all (r10 benchmark note): at sf0.1
    (2,000 vectors, n_lists=16) this loop measured 23.1 s vs the sampled
    variant's 0.2 s — 111× — so it exists solely as (a) the reference
    selection rule the sampled variant's driver-side logic is tested
    against (tests/test_similarity.py) and (b) an exact-seed escape
    hatch for small corpora where bit-reproducing a published centroid
    set matters more than cost."""
    first = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(1).collect()[0]
    )
    chosen: list[tuple[int, list[float]]] = [
        (int(first[0]), [float(x) for x in first[1]])
    ]
    while len(chosen) < n_lists:
        best_cos = F.greatest(
            *[
                F.round(cosine(F.col(vec_col), F.lit([float(x) for x in cv])), scale)
                for _, cv in chosen
            ]
        ) if len(chosen) > 1 else F.round(
            cosine(F.col(vec_col), F.lit([float(x) for x in chosen[0][1]])),
            scale,
        )
        row = (
            embeddings.where(~F.col(id_col).isin([c for c, _ in chosen]))
            .select(id_col, vec_col, best_cos.alias("__c"))
            .orderBy(F.col("__c").asc(), F.col(id_col).asc())
            .limit(1)
            .collect()
        )
        if not row:
            break
        chosen.append((int(row[0][0]), [float(x) for x in row[0][1]]))
    return chosen


def sampled_farthest_first_centroids(
    embeddings: DataFrame,
    n_lists: int,
    oversample: int = 8,
    seed: str = "c0",
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> list[tuple[int, list[float]]]:
    """One-pass oversampled IVF initialization (the sample-then-init
    family of k-means‖, Bahmani et al. 2012): deterministically sample
    ``n_lists × oversample`` candidate vectors in ONE corpus scan, then
    run the exact farthest-first selection driver-side on that small
    candidate pool.

    The sample is the ``n_lists × oversample`` lowest values of
    ``md5(seed || ':' || id)`` — a deterministic uniform draw (the
    engine's cross-engine sampling convention, see
    ``training.sample_hash_key``) computed by a single TakeOrdered over a
    narrow (id, vec, key) projection: one job regardless of ``n_lists``,
    versus ``n_lists`` full scans for :func:`farthest_first_centroids`.
    Driver-side selection then applies the identical rule (start at the
    minimum id, repeatedly add the candidate whose best rounded cosine
    against the chosen set is lowest, lowest-id tie-break), so the result
    is reproducible run-to-run and engine-independent. With oversample
    ≥ 8, every cluster carrying ≥ 1/n_lists of the corpus appears in the
    pool with probability ≥ 1 - n_lists·(1-1/n_lists)^(8·n_lists)
    ≈ 1 - n_lists·e⁻⁸, so farthest-first still lands one seed per real
    cluster; Lloyd iterations (:func:`train_centroids`) absorb the rest."""
    pool_n = max(n_lists * oversample, n_lists)
    key = F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string")))
    rows = (
        embeddings.select(
            F.col(id_col).alias("__id"), F.col(vec_col).alias("__v"), key.alias("__k")
        )
        .orderBy("__k", "__id")
        .limit(pool_n)
        .collect()
    )
    pool = {int(r["__id"]): [float(x) for x in r["__v"]] for r in rows}
    if not pool:
        return []

    def rcos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(x * x for x in b))
        return round(d / (na * nb), scale) if na > 0 and nb > 0 else 0.0

    start = min(pool)
    chosen: list[tuple[int, list[float]]] = [(start, pool.pop(start))]
    # candidate -> best cosine against the chosen set, updated incrementally
    best: dict[int, float] = {i: rcos(v, chosen[0][1]) for i, v in pool.items()}
    while len(chosen) < n_lists and pool:
        nxt = min(pool, key=lambda i: (best[i], i))
        vec = pool.pop(nxt)
        chosen.append((nxt, vec))
        best.pop(nxt)
        for i, v in pool.items():
            c = rcos(v, vec)
            if c > best[i]:
                best[i] = c
    return chosen


def train_centroids(
    embeddings: DataFrame,
    n_lists: int,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    init: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Lloyd-iteration (spherical k-means) refinement of the IVF coarse
    quantizer: assign every vector to its nearest-by-cosine centroid (the
    same narrow :func:`ivf_list_id` projection queries use), recompute
    each list's mean per dimension, repeat. Cosine assignment is
    norm-invariant, so un-normalized means are valid spherical-k-means
    updates. Per iteration: one scan + one groupBy on (list, dim) whose
    result is ``n_lists × n_dims`` rows — a bounded collect, same
    dimension-table role as the seed centroids. Lists that lose all
    members keep their previous centroid. Components round to ``scale``
    so retraining reproduces bit-identical centroids.

    The persisted-index machinery (:func:`write_ivf_index` /
    :func:`read_ivf_index` partition pruning) is unchanged — pass the
    trained centroids through its ``centroids`` argument. The registered
    oracle queries keep the deterministic seed path.

    Default init is :func:`sampled_farthest_first_centroids` — ONE corpus
    scan regardless of ``n_lists`` (deterministic md5 oversample +
    driver-side farthest-first); pass
    ``init=farthest_first_centroids(...)`` for the exact full-corpus
    selection on small data."""
    cents = init or sampled_farthest_first_centroids(
        embeddings, n_lists, id_col=id_col, vec_col=vec_col, scale=scale
    )
    emb = embeddings.select(id_col, vec_col)
    for _ in range(n_iters):
        assigned = emb.withColumn("__l", ivf_list_id(F.col(vec_col), cents, scale))
        means = (
            assigned.select("__l", F.posexplode(F.col(vec_col)).alias("__d", "__v"))
            .groupBy("__l", "__d")
            .agg(F.avg(F.col("__v").cast("double")).alias("__m"))
            .collect()
        )
        by_list: dict[int, dict[int, float]] = {}
        for r in means:
            by_list.setdefault(int(r["__l"]), {})[int(r["__d"])] = float(r["__m"])
        new_cents = []
        for cid, old in cents:
            dims = by_list.get(cid)
            if dims:
                new_cents.append(
                    (cid, [round(dims[d], scale) for d in range(len(old))])
                )
            else:
                new_cents.append((cid, old))
        if new_cents == cents:
            break
        cents = new_cents
    return cents


def ivf_list_id(
    vec_col: Column, centroids: list[tuple[int, list[float]]], scale: int = 6
) -> Column:
    """Nearest-centroid list assignment as a pure column expression:
    argmax of the ROUNDED cosine with centroid-id tie-break (engine-stable
    — the DuckDB oracle ranks with the identical rule). The centroid set
    ships as two nested-list literals (single py4j calls) evaluated
    through one ``transform`` loop, so plan size and plan-build time stay
    flat in ``n_lists``."""
    vecs_lit = _lit_nested_doubles([[float(x) for x in cvec] for _, cvec in centroids])
    cids_lit = F.lit([int(cid) for cid, _ in centroids])
    entries = F.transform(
        vecs_lit,
        lambda v, i: F.struct(
            (-F.round(cosine(vec_col, v), scale)).alias("nc"),
            F.get(cids_lit, i).cast("long").alias("cid"),
        ),
    )
    return F.array_min(entries)["cid"]


def ann_ivf(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_lists: int = 16,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> DataFrame:
    """IVF-flat ANN: assign every vector to its nearest of ``n_lists``
    centroids, probe the ``nprobe`` lists nearest the query, exact-score
    only those lists. Deterministic end to end (seed centroids + rounded
    scores + id tie-breaks), so the full pipeline is oracle-checkable.

    Scale path: persist the assigned corpus partitioned by list id — a
    query then prunes to nprobe partitions (nprobe/n_lists of the corpus)
    instead of scanning 100 TB; assignment itself is a narrow zero-shuffle
    projection against the (tiny, broadcast-literal) centroid set."""
    if centroids is None:
        centroids = seed_centroids(embeddings, n_lists, id_col=id_col, vec_col=vec_col)

    def _pycos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(d / (na * nb), scale)

    probes = [
        cid
        for _, cid in sorted((-_pycos(query_vec, cv), cid) for cid, cv in centroids)[:nprobe]
    ]
    assigned = embeddings.withColumn(
        "__ivf_list", ivf_list_id(F.col(vec_col), centroids, scale)
    )
    cands = assigned.where(F.col("__ivf_list").isin(probes)).drop("__ivf_list")
    return knn_brute_force(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col, scale=scale)


def ann_lsh(
    embeddings: DataFrame,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Approximate top-k: hash all vectors (and the query) into
    sign-pattern buckets, score only the query's bucket. At scale the
    bucketed table is precomputed and partitioned by bucket, so a query
    touches one partition instead of the full corpus."""
    planes = hyperplanes(n_planes, len(query_vec))
    qbits = "".join(
        "1" if round(sum(c * v for c, v in zip(plane, query_vec)), scale) >= 0 else "0"
        for plane in planes
    )
    bucketed = embeddings.withColumn("bucket", rp_lsh_bucket(F.col(vec_col), planes, scale))
    cands = bucketed.where(F.col("bucket") == qbits)
    return knn_brute_force(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col, scale=scale)


def embedding_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.9,
    n_dims: int = 64,
    n_bands: int = 16,
    band_planes: int = 2,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Embedding-cosine near-duplicate pairs: banded-LSH candidate
    generation followed by exact cosine verification at ``threshold`` —
    the embedding analogue of MinHash near-dup (dedup.near_duplicates).
    Same scale shape as :func:`topk_similar_pairs_lsh`: candidate volume
    is governed by band/bucket parameters, the exact cosine runs only on
    survivors, and no all-pairs join exists anywhere in the plan."""
    pairs = banded_lsh_candidate_pairs(
        embeddings,
        n_dims=n_dims,
        n_bands=n_bands,
        band_planes=band_planes,
        id_col=id_col,
        vec_col=vec_col,
        scale=scale,
        max_bucket_size=max_bucket_size,
    )
    return _exact_cosine_pairs(embeddings, pairs, id_col, vec_col, scale).where(
        F.col("cosine") >= threshold
    )


def _exact_cosine_pairs(
    embeddings: DataFrame, pairs: DataFrame, id_col: str, vec_col: str, scale: int
) -> DataFrame:
    """Exact rounded cosine for candidate (vec_a, vec_b) pairs — the
    survivor-scoped verification join shared by every candidate
    generator. Norms precompute per vector; scores stay bit-identical."""
    ea = embeddings.select(
        F.col(id_col).alias("vec_a"),
        F.col(vec_col).alias("ea"),
        l2_norm(F.col(vec_col)).alias("na"),
    )
    eb = embeddings.select(
        F.col(id_col).alias("vec_b"),
        F.col(vec_col).alias("eb"),
        l2_norm(F.col(vec_col)).alias("nb"),
    )
    return (
        pairs.join(ea, "vec_a")
        .join(eb, "vec_b")
        .select(
            "vec_a",
            "vec_b",
            F.round(
                dot(F.col("ea"), F.col("eb")) / (F.col("na") * F.col("nb")), scale
            ).alias("cosine"),
        )
    )


# ---------------------------------------------------------------------------
# SemDeDup — cluster-scoped semantic deduplication (Abbas et al. 2023)
# ---------------------------------------------------------------------------


def semantic_cluster_candidates(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """Candidate (vec_a, vec_b) pairs scoped to a shared nearest-centroid
    cluster — the SemDeDup candidate rule: embeddings are k-means-
    clustered and only WITHIN-cluster pairs are ever compared (the
    documented trade-off: cross-cluster near-dups are invisible, in
    exchange for candidate volume bounded by Σ|cluster|² instead of n²).

    Same scale shape as the LSH generators: assignment is a narrow
    column expression over a broadcast centroid literal
    (:func:`ivf_list_id`), ONE shuffle groups ids per cluster, pairs
    expand JVM-side inside the bucket row, and ``max_bucket_size``
    guards degenerate clusters (re-train with more lists instead of
    letting one cluster go quadratic)."""
    buckets = (
        embeddings.select(
            F.col(id_col).alias("vec_id"),
            ivf_list_id(F.col(vec_col), centroids, scale).alias("list_id"),
        )
        .groupBy("list_id")
        .agg(F.array_sort(F.collect_set("vec_id")).alias("vs"))
        .where(F.size("vs") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("vs") <= max_bucket_size)
    return _spread_bucket_pairs(buckets)


def semantic_near_duplicates(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """SemDeDup near-duplicate pairs: within-cluster candidates verified
    by exact rounded cosine at ``threshold``. ``centroids`` defaults to
    the deterministic seed quantizer (first ``n_lists`` ids); pass
    :func:`train_centroids` output for production-quality clusters —
    candidate generation and verification are unchanged."""
    if centroids is None:
        centroids = seed_centroids(embeddings, n_lists, id_col=id_col, vec_col=vec_col)
    pairs = semantic_cluster_candidates(
        embeddings,
        centroids,
        id_col=id_col,
        vec_col=vec_col,
        scale=scale,
        max_bucket_size=max_bucket_size,
    )
    return _exact_cosine_pairs(embeddings, pairs, id_col, vec_col, scale).where(
        F.col("cosine") >= threshold
    )


def semantic_dedup_keep_list(
    embeddings: DataFrame,
    threshold: float = 0.95,
    n_lists: int = 16,
    centroids: list[tuple[int, list[float]]] | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    max_bucket_size: int | None = None,
) -> DataFrame:
    """(vec_id, keep) over the whole corpus: semantic near-dup pairs →
    connected components → keep the minimum id per component (every
    unpaired vector keeps). The end state of a SemDeDup pass, mirroring
    ``dedup.near_dup_keep_list``'s contract on the text side."""
    from .dedup import connected_components

    pairs = semantic_near_duplicates(
        embeddings,
        threshold=threshold,
        n_lists=n_lists,
        centroids=centroids,
        id_col=id_col,
        vec_col=vec_col,
        scale=scale,
        max_bucket_size=max_bucket_size,
    )
    comps = connected_components(pairs, id_a="vec_a", id_b="vec_b")
    return (
        embeddings.select(F.col(id_col).alias("vec_id"))
        .join(comps, F.col("vec_id") == F.col("node"), "left")
        .select(
            "vec_id",
            (F.col("component").isNull() | (F.col("component") == F.col("vec_id"))).alias(
                "keep"
            ),
        )
    )


# ---------------------------------------------------------------------------
# Persisted ANN indexes — the 100 TB query path
# ---------------------------------------------------------------------------


def write_ivf_index(
    embeddings: DataFrame,
    path: str,
    n_lists: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    centroids: list[tuple[int, list[float]]] | None = None,
) -> list[tuple[int, list[float]]]:
    """Materialize the IVF-assigned corpus PARTITIONED BY list id, so a
    query scans only its ``nprobe`` probed lists: Spark's partition
    pruning turns the corpus read into ``nprobe/n_lists`` of the data
    (assignment itself is the narrow zero-shuffle projection from
    :func:`ivf_list_id`). Returns the centroids to persist alongside."""
    if centroids is None:
        centroids = seed_centroids(embeddings, n_lists, id_col=id_col, vec_col=vec_col)
    assigned = embeddings.withColumn(
        "ivf_list", ivf_list_id(F.col(vec_col), centroids, scale)
    )
    assigned.write.mode("overwrite").partitionBy("ivf_list").parquet(path)
    return centroids


def ann_ivf_from_index(
    spark,
    path: str,
    centroids: list[tuple[int, list[float]]],
    query_vec: list[float],
    k: int = 10,
    nprobe: int = 4,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Query a persisted IVF index: the ``ivf_list IN probes`` predicate
    prunes to the probed partitions at scan time (visible as a partition
    filter in the physical plan — asserted in tests), then exact-scores
    only those lists. Identical results to :func:`ann_ivf` over the same
    corpus and centroids."""
    def _pycos(a: list[float], b: list[float]) -> float:
        d = sum(x * y for x, y in zip(a, b))
        na = math.sqrt(sum(x * x for x in a))
        nb = math.sqrt(sum(y * y for y in b))
        return round(d / (na * nb), scale)

    probes = [
        cid
        for _, cid in sorted((-_pycos(query_vec, cv), cid) for cid, cv in centroids)[:nprobe]
    ]
    cands = spark.read.parquet(path).where(F.col("ivf_list").isin(probes))
    return knn_brute_force(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col, scale=scale)


def add_to_ivf_index(
    new_embeddings: DataFrame,
    path: str,
    centroids: list[tuple[int, list[float]]],
    batch_id: int,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> None:
    """Incrementally absorb a batch of new vectors into a persisted IVF
    index (the ANN twin of ``streaming.dedup_index``): the batch is
    assigned with the SAME frozen coarse quantizer (so old and new rows
    are bucketed identically — never mix quantizers in one path) and
    appended under its own ``ivf_batch`` partition inside each list
    partition. Guard every batch with :func:`ivf_assignment_quality` +
    :func:`ivf_should_retrain`: a drifted batch forms a hotspot list that
    defeats list pruning (measured on the pinned test: max_list_share
    0.15 → 1.0, probed scan fraction 0.13 → 0.63), and the fix is
    retrain + full rewrite with ``batch_id=0``, not more appends. Dynamic partition overwrite on
    (ivf_list, ivf_batch) makes a foreachBatch retry idempotent, and
    queries through :func:`ann_ivf_from_index` keep pruning on
    ``ivf_list`` exactly as before — the extra partition level only adds
    files, never rows outside the probed lists. At 100 TB this turns a
    daily embedding drop into an append of the batch's bytes instead of
    a full-corpus rewrite.

    Layout note: an incremental index is (ivf_list, ivf_batch)-
    partitioned from birth — build it by calling THIS function with
    ``batch_id=0`` for the initial corpus (don't mix with the flat
    :func:`write_ivf_index` layout in one path; Spark partition
    discovery requires one consistent scheme per root)."""
    assigned = new_embeddings.withColumn(
        "ivf_list", ivf_list_id(F.col(vec_col), centroids, scale)
    ).withColumn("ivf_batch", F.lit(int(batch_id)))
    (
        assigned.write.partitionBy("ivf_list", "ivf_batch")
        .option("partitionOverwriteMode", "dynamic")
        .mode("overwrite")
        .parquet(path)
    )


def ivf_assignment_quality(
    embeddings: DataFrame,
    centroids: list[tuple[int, list[float]]],
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Drift guard for the frozen IVF coarse quantizer: one-row DataFrame
    with (a) the mean and 10th-percentile cosine of each vector to its
    NEAREST centroid (exactly the similarity :func:`ivf_list_id` assigns
    by) and (b) ``max_list_share`` — the fraction of the batch landing in
    its single most-populated list. A batch from the training
    distribution reproduces the build-time numbers; a drifted batch moves
    the mean (either direction: away from every centroid lowers it, a
    concentrated shift raises it) and/or piles into a hotspot list. The
    hotspot is the operational killer at 100 TB: on the sf0.001 fixture a
    concentrated shift sent max_list_share 0.15 → 1.00 and the probed
    scan fraction for drifted-neighborhood queries 0.13 → 0.63 of the
    corpus — list pruning stops pruning, and the hot list becomes one
    giant skewed partition. The p10 (``percentile_approx``, rank-exact at
    the default accuracy for any batch a driver row can hold) catches
    tail drift a stable mean hides: a small drifted sub-population drags
    the 10th percentile long before the mean moves. One narrow assignment
    scan feeding a global aggregate (mean/p10/count) and a per-list count
    for the share — the centroid set rides along as a broadcast literal,
    same as assignment."""
    vecs_lit = _lit_nested_doubles(
        [[float(x) for x in cvec] for _, cvec in centroids]
    )
    entries = F.transform(
        vecs_lit,
        lambda v, i: F.struct(
            (-F.round(cosine(F.col(vec_col), v), scale)).alias("nc"),
            i.cast("long").alias("pos"),
        ),
    )
    # stage the argmin struct once: referencing `best` twice in one
    # projection would evaluate the full centroid scan per reference
    assigned = embeddings.select(F.array_min(entries).alias("__b")).select(
        F.col("__b.pos").alias("__list"), (-F.col("__b.nc")).alias("__cos")
    )
    # a global percentile cannot be merged from per-list percentiles, so
    # the quality row comes from two aggregates over the narrow assignment
    # projection: a grouping-free global one (mean/p10/count) and an
    # n_lists-sized per-list count for the hotspot share
    stats = assigned.agg(
        F.avg("__cos").alias("mean_assigned_cosine"),
        F.percentile_approx("__cos", 0.1).alias("p10_assigned_cosine"),
        F.count(F.lit(1)).alias("n_vectors"),
    )
    share = (
        assigned.groupBy("__list")
        .agg(F.count(F.lit(1)).alias("__n"))
        .agg((F.max("__n") / F.sum("__n")).alias("max_list_share"))
    )
    return stats.crossJoin(F.broadcast(share)).select(
        "mean_assigned_cosine",
        "p10_assigned_cosine",
        "max_list_share",
        "n_vectors",
    )


def ivf_should_retrain(
    base_quality_row,
    batch_quality_row,
    tolerance: float = 0.05,
    share_ratio: float = 3.0,
) -> bool:
    """Retrain-when rule for :func:`add_to_ivf_index` (rows from
    :func:`ivf_assignment_quality` over the build corpus and the new
    batch): True when the batch's mean assigned-cosine moved more than
    ``tolerance`` in EITHER direction (down = far from all centroids,
    up = concentrated shift), or its ``max_list_share`` exceeds
    ``share_ratio`` × the build-time share (hotspot list forming). On the
    pinned drift test a concentrated shift trips both guards by wide
    margins (Δmean 0.64, share ratio ~7×) while an in-distribution batch
    trips neither. Retraining = re-seed/retrain centroids over a sample
    of old+new, then rewrite the index with ``batch_id=0`` (the quantizer
    is frozen per index lifetime; never mix quantizers in one path)."""
    dmean = abs(
        batch_quality_row["mean_assigned_cosine"]
        - base_quality_row["mean_assigned_cosine"]
    )
    return bool(
        dmean > tolerance
        or batch_quality_row["max_list_share"]
        > share_ratio * base_quality_row["max_list_share"]
    )


def retrain_ivf_index(
    spark,
    path: str,
    n_lists: int = 16,
    n_iters: int = 3,
    sample_fraction: float | None = None,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
    exact_seed: bool = False,
) -> list[tuple[int, list[float]]]:
    """The retrain-and-rewrite that :func:`ivf_should_retrain` prescribes:
    read the whole incremental index (every ``ivf_batch``), train fresh
    centroids over it (deterministic farthest-first init + Lloyd
    spherical k-means; ``sample_fraction`` trains on a seeded Bernoulli
    sample when the corpus is too large to iterate over in full — the
    assignment REWRITE below always covers every row), and rewrite the
    index as a single ``batch_id=0`` under the new quantizer. Returns the
    new centroids — persist them wherever the old ones lived; mixing
    quantizers in one index path is never valid, which is why this
    rewrites rather than appends.

    Seeding is :func:`sampled_farthest_first_centroids` — ONE corpus scan
    regardless of ``n_lists``. ``exact_seed=True`` switches to the exact
    full-corpus :func:`farthest_first_centroids`, which runs ``n_lists``
    DRIVER-COORDINATED full scans (at n_lists=1000 over 100 TB that is
    1000 sequential jobs) — reference-quality selection for small corpora
    only, never the production path.

    Staged like :func:`compact_index`: the reassigned rows land in a
    dot-prefixed sibling (`<path>.retrain_tmp`, invisible to readers and
    never self-read), then replace the index via two directory renames.
    Readers never see a half-written mix of quantizers; they CAN race the
    brief window between the two renames when no directory exists at
    ``path`` (a whole-index miss, immediately retryable). Each rename's
    boolean return is checked: on failure the original index is restored
    (or reported intact at ``.retrain_old``) and the old copy is only
    deleted after the new index verifiably exists at ``path``."""
    emb = spark.read.parquet(path).drop("ivf_list", "ivf_batch")
    train = (
        emb.sample(fraction=sample_fraction, seed=7)
        if sample_fraction is not None
        else emb
    )
    seed_fn = farthest_first_centroids if exact_seed else sampled_farthest_first_centroids
    init = seed_fn(
        train, n_lists, id_col=id_col, vec_col=vec_col, scale=scale
    )
    cents = train_centroids(
        train, n_lists, n_iters=n_iters, id_col=id_col, vec_col=vec_col,
        scale=scale, init=init,
    )
    tmp = path.rstrip("/") + ".retrain_tmp"
    old = path.rstrip("/") + ".retrain_old"
    add_to_ivf_index(
        emb, tmp, cents, batch_id=0, id_col=id_col, vec_col=vec_col, scale=scale
    )
    jvm = spark._jvm
    conf = spark._jsc.hadoopConfiguration()
    jpath = jvm.org.apache.hadoop.fs.Path(path)
    fs = jpath.getFileSystem(conf)
    jtmp = jvm.org.apache.hadoop.fs.Path(tmp)
    jold = jvm.org.apache.hadoop.fs.Path(old)
    if fs.exists(jold):
        fs.delete(jold, True)
    # Hadoop FileSystem.rename reports failure by RETURNING FALSE, not
    # raising — every step must check it, or a failed tmp→path rename
    # would fall through to deleting `old`, the only surviving copy.
    if not fs.rename(jpath, jold):
        raise IOError(f"retrain_ivf_index: rename {path} -> {old} failed; "
                      f"index untouched, new index left at {tmp}")
    if not fs.rename(jtmp, jpath):
        # restore the original index before failing: the swap window where
        # no index exists at `path` must not outlive this call
        restored = fs.rename(jold, jpath)
        raise IOError(
            f"retrain_ivf_index: rename {tmp} -> {path} failed; original "
            f"index {'restored' if restored else f'left at {old}'}"
        )
    # only drop the old copy once the new index is verifiably in place
    if fs.exists(jpath):
        fs.delete(jold, True)
    return cents


def write_lsh_index(
    embeddings: DataFrame,
    path: str,
    n_planes: int = 8,
    n_dims: int = 64,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> None:
    """Materialize the rp-LSH bucketed corpus PARTITIONED BY bucket: an
    :func:`ann_lsh`-style query then reads exactly one partition (plus
    optional probe neighbors) instead of the full corpus."""
    planes = hyperplanes(n_planes, n_dims)
    bucketed = embeddings.withColumn("bucket", rp_lsh_bucket(F.col(vec_col), planes, scale))
    bucketed.write.mode("overwrite").partitionBy("bucket").parquet(path)


def ann_lsh_from_index(
    spark,
    path: str,
    query_vec: list[float],
    k: int = 10,
    n_planes: int = 8,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """Query a persisted LSH index: compute the query's sign-bit bucket
    driver-side (one dot product per plane) and scan only that
    partition."""
    planes = hyperplanes(n_planes, len(query_vec))
    qbits = "".join(
        "1" if round(sum(c * v for c, v in zip(plane, query_vec)), scale) >= 0 else "0"
        for plane in planes
    )
    cands = spark.read.parquet(path).where(F.col("bucket") == qbits)
    return knn_brute_force(cands, query_vec, k=k, id_col=id_col, vec_col=vec_col, scale=scale)


# ---------------------------------------------------------------------------
# Product quantization (PQ) — the memory-bounded 100 TB search path
# ---------------------------------------------------------------------------


def _l2sq(a: Column, b) -> Column:
    """Squared L2 between a vector column and a (column or literal list)
    in DOUBLE arithmetic — float32 inputs promote before any multiply, so
    the DuckDB oracles (which compute in double) agree bit-for-bit."""
    bb = F.lit([float(x) for x in b]) if isinstance(b, list) else b
    return F.aggregate(
        F.zip_with(
            a, bb, lambda x, y: (x.cast("double") - y.cast("double")) ** 2
        ),
        F.lit(0.0),
        lambda acc, v: acc + v,
    )


def pq_seed_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> list[list[list[float]]]:
    """Deterministic PQ codebooks: the first ``n_codes`` vectors by id
    supply the code words — codebook ``s`` is their s-th subvectors,
    position-indexed (code j = j-th seed). No training iterations, so the
    whole encode/search pipeline is SQL-expressible and oracle-checkable;
    swap in :func:`pq_train_codebooks` at production scale — the
    encode/search machinery is unchanged. The collect is bounded by
    ``n_codes`` (a dimension table, like the IVF seed centroids)."""
    rows = (
        embeddings.select(id_col, vec_col).orderBy(id_col).limit(n_codes).collect()
    )
    dim = len(rows[0][1])
    if dim % m:
        raise ValueError(f"dim {dim} not divisible by m={m}")
    sub = dim // m
    return [
        [[float(x) for x in r[1][s * sub : (s + 1) * sub]] for r in rows]
        for s in range(m)
    ]


def pq_train_codebooks(
    embeddings: DataFrame,
    m: int = 8,
    n_codes: int = 16,
    n_iters: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> list[list[list[float]]]:
    """Lloyd-refined PQ codebooks: per subspace, k-means on the
    subvectors under squared L2 (assign to nearest code word, recompute
    code words as member means, repeat). ALL ``m`` subspaces train in the
    SAME pass — one scan + one groupBy per iteration whose result is
    ``m × n_codes × subdim`` rows (a bounded collect, dimension-table
    sized), not one job per subspace. Empty codes keep their previous
    word; components round to ``scale`` so retraining is bit-identical."""
    books = pq_seed_codebooks(
        embeddings, m=m, n_codes=n_codes, id_col=id_col, vec_col=vec_col
    )
    sub = len(books[0][0])
    emb = embeddings.select(F.col(vec_col).alias("__v"))
    for _ in range(n_iters):
        assigns = []
        for s in range(m):
            subv = F.slice("__v", s * sub + 1, sub)
            entries = F.transform(
                F.lit(books[s]),
                lambda w, i: F.struct(
                    F.round(_l2sq(subv, w), scale).alias("d"),
                    i.cast("long").alias("j"),
                ),
            )
            assigns.append(
                F.struct(
                    F.lit(s).alias("s"),
                    F.array_min(entries)["j"].alias("j"),
                    F.transform(subv, lambda x: x.cast("double")).alias("sv"),
                )
            )
        means = (
            emb.select(F.explode(F.array(*assigns)).alias("a"))
            .select("a.s", "a.j", F.posexplode("a.sv").alias("d", "v"))
            .groupBy("s", "j", "d")
            .agg(F.avg("v").alias("mv"))
            .collect()
        )
        got: dict[tuple[int, int], dict[int, float]] = {}
        for r in means:
            got.setdefault((int(r["s"]), int(r["j"])), {})[int(r["d"])] = float(r["mv"])
        new_books = [
            [
                [round(got[(s, j)][d], scale) for d in range(sub)]
                if (s, j) in got
                else books[s][j]
                for j in range(n_codes)
            ]
            for s in range(m)
        ]
        if new_books == books:
            break
        books = new_books
    return books


def pq_encode(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """(id, codes ARRAY<INT>[m]): each vector compressed to one code per
    subspace — nearest code word by ROUNDED squared L2, smaller code
    index on ties (engine-stable). A pure narrow projection (the
    codebooks ship as nested literals, evaluated through ``transform``
    loops): zero shuffles, embarrassingly parallel, and the output is
    ``m`` small ints per vector instead of ``4·dim`` bytes — the ~32×
    compression that makes a 100 TB embedding set rescannable."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    # ONE nested higher-order expression for all m subspaces (not a Python
    # loop of per-subspace columns): the expression tree is built once, so
    # driver-side plan construction stays flat in m — measured ~8× less
    # py4j traffic on plan build
    books_lit = _lit_nested_doubles(codebooks)
    codes = F.transform(
        F.sequence(F.lit(0), F.lit(m - 1)),
        lambda s: F.array_min(
            F.transform(
                F.get(books_lit, s),
                lambda w, j: F.struct(
                    F.round(
                        _l2sq(F.slice(F.col(vec_col), s * sub + 1, sub), w), scale
                    ).alias("d"),
                    j.cast("int").alias("j"),
                ),
            )
        )["j"],
    )
    return embeddings.select(F.col(id_col).alias(id_col), codes.alias("codes"))


def pq_adc_search(
    codes: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    id_col: str = "vec_id",
    scale: int = 6,
) -> DataFrame:
    """Asymmetric-distance top-k over PQ codes: the query stays exact,
    each corpus vector is approximated by its code words, and the
    distance is a TABLE LOOKUP — the per-subspace query↔code-word squared
    L2s are computed driver-side (m × n_codes doubles) and shipped as one
    literal, so the scan reads ONLY the codes column and does ``m`` array
    gets + adds per row. TakeOrderedAndProject top-k, no shuffle, no
    all-pairs anything. Returns (id, approx_dist) ascending (nearest
    first), id tie-break."""
    m = len(codebooks)
    sub = len(codebooks[0][0])
    table = [
        [
            round(
                sum(
                    (float(query_vec[s * sub + i]) - float(w[i])) ** 2
                    for i in range(sub)
                ),
                scale,
            )
            for w in codebooks[s]
        ]
        for s in range(m)
    ]
    tab_lit = _lit_nested_doubles(table)
    dist = None
    for s in range(m):
        term = F.get(F.get(tab_lit, s), F.get(F.col("codes"), s))
        dist = term if dist is None else dist + term
    return (
        codes.select(id_col, F.round(dist, scale).alias("approx_dist"))
        .orderBy(F.col("approx_dist").asc(), F.col(id_col).asc())
        .limit(k)
    )


def pq_search_refined(
    embeddings: DataFrame,
    codebooks: list[list[list[float]]],
    query_vec: list[float],
    k: int = 10,
    rerank: int = 50,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """PQ-ADC shortlist → exact rescoring: take the ``rerank`` nearest by
    approximate distance, join back to the raw vectors (semi-join scoped
    to the shortlist — the wide embedding column is read for ``rerank``
    rows, not the corpus), exact cosine top-k. The standard two-stage
    recall repair for PQ's quantization error."""
    shortlist = pq_adc_search(
        pq_encode(embeddings, codebooks, id_col=id_col, vec_col=vec_col, scale=scale),
        codebooks,
        query_vec,
        k=rerank,
        id_col=id_col,
        scale=scale,
    )
    cands = embeddings.join(F.broadcast(shortlist.select(id_col)), id_col, "left_semi")
    return knn_brute_force(
        cands, query_vec, k=k, id_col=id_col, vec_col=vec_col, scale=scale
    )


def l2_normalize(
    embeddings: DataFrame, vec_col: str = "embedding", scale: int | None = None
) -> DataFrame:
    """Unit-normalize the vector column (double precision). On unit
    vectors squared L2 = 2 − 2·cosine, so L2-metric structures (PQ,
    k-means) rank identically to cosine — normalize once at ingest and
    every downstream ANN stage gets both metrics for free. ``scale``
    optionally rounds components for bit-stable cross-engine parity."""
    v = F.transform(F.col(vec_col), lambda x: x.cast("double"))
    n = F.sqrt(F.aggregate(v, F.lit(0.0), lambda a, x: a + x * x))
    out = F.transform(v, lambda x: x / n)
    if scale is not None:
        out = F.transform(out, lambda x: F.round(x, scale))
    return embeddings.withColumn(vec_col, out)
