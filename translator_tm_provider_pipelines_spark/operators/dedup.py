"""Document deduplication operators (LLM-data-pipeline extension).

The reference's only dedup is identity-key dedup before writes
(PipelineMain.deduplicateDocumentsByStringKey:927-945 → A11). A 100 TB
training-data pipeline needs content dedup as well; these operators provide
exact and near-dup detection, all as native DataFrame programs:

- exact:    hash-groupBy on content digest
- near-dup: word-shingle → MinHash → banded LSH → candidate pairs →
            exact n-gram Jaccard verification
- SimHash:  64-bit sign-sum fingerprint, Hamming-bucketed

Scale design: every stage is shuffle-by-key (doc_id / shingle / band
signature); nothing widens beyond (num_perms ×) the shingle relation.
Candidate generation joins on band signature — a high-cardinality key whose
groups are the (rare) collision buckets, so the pair expansion is bounded;
hot buckets (boilerplate docs) are handled by AQE skew splitting. Exact
Jaccard runs only on LSH survivors, never all-pairs.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

TOKEN_RE = r"([a-z0-9]+)"


def exact_duplicates(docs: DataFrame, text_col: str = "text", id_col: str = "doc_id") -> DataFrame:
    """Exact dedup via content digest: one row per duplicate group with the
    canonical (min-id) representative and the group's members. First-wins
    semantics mirror A11 (deduplicateByKey keeps an arbitrary element; we
    keep min id for determinism)."""
    return (
        docs.select(F.md5(F.col(text_col)).alias("content_hash"), F.col(id_col))
        .groupBy("content_hash")
        .agg(
            F.min(id_col).alias("canonical_id"),
            F.count("*").alias("n_docs"),
        )
    )


def word_shingles(
    docs: DataFrame,
    k: int = 3,
    text_col: str = "text",
    id_col: str = "doc_id",
) -> DataFrame:
    """Distinct word k-gram shingles per document, tokenized with
    ``[a-z0-9]+``. Entirely JVM-side: regexp tokenize, index expansion with
    ``sequence`` + ``transform`` (guarded — Spark's sequence(1,0) counts
    *down*), no UDF."""
    words = F.regexp_extract_all(F.col(text_col), F.lit(TOKEN_RE), 1)
    n = F.size(words)
    idx = F.when(n >= k, F.sequence(F.lit(1), n - F.lit(k - 1))).otherwise(
        F.array().cast("array<int>")
    )
    w = F.col("w")
    shingle = F.concat_ws(" ", *[F.element_at(w, F.col("i") + F.lit(j)) for j in range(k)])
    return (
        docs.select(F.col(id_col).alias("doc_id"), F.explode(idx).alias("i"), words.alias("w"))
        .select("doc_id", shingle.alias("shingle"))
        .distinct()
    )


def minhash_signatures(shingles: DataFrame, num_perms: int = 16) -> DataFrame:
    """MinHash: for permutation j, min over shingles of md5(j ':' shingle).
    md5 hex compares lexicographically, so ``min(hex)`` is a uniform
    min-hash. The perm fan-out is a broadcast cross join (num_perms rows)."""
    spark = shingles.sparkSession
    perms = spark.range(num_perms).select(F.col("id").cast("int").alias("perm"))
    return (
        shingles.crossJoin(F.broadcast(perms))
        .select(
            "doc_id",
            "perm",
            F.md5(F.concat(F.col("perm").cast("string"), F.lit(":"), F.col("shingle"))).alias("h"),
        )
        .groupBy("doc_id", "perm")
        .agg(F.min("h").alias("minhash"))
    )


def lsh_bands(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """Group the signature into bands of ``rows_per_band`` rows; band
    signature = md5 of the in-order concatenation. Docs sharing any
    (band, signature) are near-dup candidates."""
    banded = signatures.withColumn("band", (F.col("perm") / rows_per_band).cast("int"))
    ordered = F.transform(
        F.array_sort(F.collect_list(F.struct("perm", "minhash"))), lambda x: x["minhash"]
    )
    return banded.groupBy("doc_id", "band").agg(
        F.md5(F.array_join(ordered, "")).alias("band_sig")
    )


def lsh_candidate_pairs(bands: DataFrame) -> DataFrame:
    """Self-join on (band, band_sig) → distinct unordered candidate pairs.
    The join key is the collision bucket, so output ≈ true near-dups plus a
    small false-positive tail — this is the scale path that avoids the
    all-pairs O(n²) comparison."""
    a = bands.select("band", "band_sig", F.col("doc_id").alias("doc_a"))
    b = bands.select("band", "band_sig", F.col("doc_id").alias("doc_b"))
    return (
        a.join(b, ["band", "band_sig"])
        .where(F.col("doc_a") < F.col("doc_b"))
        .select("doc_a", "doc_b")
        .distinct()
    )


def jaccard_for_pairs(shingles: DataFrame, pairs: DataFrame) -> DataFrame:
    """Exact shingle-set Jaccard for given (doc_a, doc_b) pairs — the
    verification stage after LSH candidate generation."""
    counts = shingles.groupBy("doc_id").agg(F.count("*").alias("n"))
    sa = shingles.select(F.col("doc_id").alias("doc_a"), "shingle")
    sb = shingles.select(F.col("doc_id").alias("doc_b"), "shingle")
    inter = (
        pairs.join(sa, "doc_a")
        .join(sb, ["doc_b", "shingle"])
        .groupBy("doc_a", "doc_b")
        .agg(F.count("*").alias("n_inter"))
    )
    ca = counts.select(F.col("doc_id").alias("doc_a"), F.col("n").alias("n_a"))
    cb = counts.select(F.col("doc_id").alias("doc_b"), F.col("n").alias("n_b"))
    return (
        pairs.join(inter, ["doc_a", "doc_b"], "left")
        .na.fill({"n_inter": 0})
        .join(ca, "doc_a")
        .join(cb, "doc_b")
        .select(
            "doc_a",
            "doc_b",
            F.round(
                F.col("n_inter") / (F.col("n_a") + F.col("n_b") - F.col("n_inter")), 8
            ).alias("jaccard"),
        )
    )


def near_duplicates(
    docs: DataFrame,
    threshold: float = 0.8,
    k: int = 3,
    num_perms: int = 16,
    rows_per_band: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    persist: bool = True,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: shingle → signature → bands →
    candidates → exact-Jaccard filter ≥ threshold.

    ``persist`` caches the shingle relation, which both the MinHash and the
    Jaccard-verification branches consume (otherwise it is recomputed ~4×).
    At 100 TB, write shingles/signatures to intermediate tables instead."""
    sh = word_shingles(docs, k=k, text_col=text_col, id_col=id_col)
    if persist:
        from pyspark.storagelevel import StorageLevel

        sh = sh.persist(StorageLevel.MEMORY_AND_DISK)
    cands = lsh_candidate_pairs(lsh_bands(minhash_signatures(sh, num_perms), rows_per_band))
    return jaccard_for_pairs(sh, cands).where(F.col("jaccard") >= threshold)


def simhash(shingles: DataFrame, bits: int = 32) -> DataFrame:
    """SimHash fingerprint: per bit position b, sum(±1) over shingles by the
    b-th bit of md5(shingle); fingerprint bit b = 1 iff the sum > 0.

    Uses the top ``bits`` bits of the digest (first bits/4 hex chars via
    ``conv``); 32 bits keeps the value inside a signed long. Near-dup docs
    differ in O(1) bits (compare via Hamming distance on the result)."""
    hexlen = bits // 4
    hval = F.conv(F.substring(F.md5(F.col("shingle")), 1, hexlen), 16, 10).cast("long")
    exploded = (
        shingles.select("doc_id", hval.alias("hv"))
        .select("doc_id", "hv", F.explode(F.sequence(F.lit(0), F.lit(bits - 1))).alias("b"))
        .select(
            "doc_id",
            "b",
            F.expr("(shiftright(hv, b) & 1) * 2 - 1").alias("s"),
        )
    )
    return (
        exploded.groupBy("doc_id", "b")
        .agg(F.sum("s").alias("bitsum"))
        .groupBy("doc_id")
        .agg(
            F.sum(
                F.when(F.col("bitsum") > 0, F.expr("shiftleft(cast(1 as bigint), b)")).otherwise(0)
            ).alias("simhash")
        )
    )


def hamming_distance(a, b):
    """Hamming distance between two simhash longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
