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
    """MinHash as ONE aggregation: per shingle, all ``num_perms`` hashes
    md5(j ':' shingle) are computed in a single projection (md5 hex compares
    lexicographically, so ``min(hex)`` is a uniform min-hash); the signature
    is ``num_perms`` MIN aggregates with map-side partial combine.

    Returns (doc_id, sig ARRAY<STRING>[num_perms]). Compared with the
    naive perm×shingle explode, shuffle volume drops by num_perms× — at
    100 TB that is the difference between one pass and sixteen."""
    hashes = [
        F.min(F.md5(F.concat(F.lit(f"{j}:"), F.col("shingle")))).alias(f"h{j}")
        for j in range(num_perms)
    ]
    wide = shingles.groupBy("doc_id").agg(*hashes)
    return wide.select(
        "doc_id", F.array(*[F.col(f"h{j}") for j in range(num_perms)]).alias("sig")
    )


def lsh_bands(signatures: DataFrame, rows_per_band: int = 4) -> DataFrame:
    """Fold the signature array into bands of ``rows_per_band`` entries;
    band signature = md5 of the in-order concatenation. Pure projection —
    no extra shuffle. Docs sharing any (band, band_sig) are candidates."""
    bands = F.posexplode(
        F.transform(
            F.sequence(F.lit(0), F.floor((F.size("sig") - 1) / rows_per_band).cast("int")),
            lambda b: F.md5(
                F.array_join(F.slice("sig", b * rows_per_band + 1, rows_per_band), "")
            ),
        )
    )
    return signatures.select("doc_id", bands.alias("band", "band_sig"))


def lsh_candidate_pairs(bands: DataFrame, max_bucket_size: int | None = None) -> DataFrame:
    """Candidate pairs via bucket grouping, not a self-join: docs collect
    per (band, band_sig) bucket and unordered pairs expand JVM-side inside
    each bucket row. One shuffle, the upstream chain is evaluated once
    (a self-join would recompute it for both sides), and the expansion is
    bounded by bucket size.

    ``max_bucket_size`` is the 100 TB guard for pathological boilerplate
    buckets (one wide row that AQE cannot split): buckets larger than the
    cap are DROPPED — their members are exact-or-near-identical boilerplate
    that exact dedup should have removed upstream, and emitting their k²
    pairs would dominate the output. None (default) keeps every bucket."""
    buckets = (
        bands.groupBy("band", "band_sig")
        .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
        .where(F.size("ds") >= 2)
    )
    if max_bucket_size is not None:
        buckets = buckets.where(F.size("ds") <= max_bucket_size)
    pair = F.explode(
        F.flatten(
            F.transform(
                F.col("ds"),
                lambda x, i: F.transform(
                    F.slice(
                        F.col("ds"), i + F.lit(2), F.greatest(F.size("ds") - i - 1, F.lit(0))
                    ),
                    lambda y: F.struct(x.alias("doc_a"), y.alias("doc_b")),
                ),
            )
        )
    )
    return buckets.select(pair.alias("p")).select("p.doc_a", "p.doc_b").distinct()


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
    persist: bool = False,
) -> DataFrame:
    """MinHash-LSH near-dup pipeline: shingle → signature → bands →
    candidates → exact-Jaccard filter ≥ threshold.

    ``persist`` (off by default — measured slower at bench scale: caching
    serializes the shingle relation and breaks codegen pipelines, while
    recompute is one cheap scan) caches shingles for the MinHash and
    Jaccard branches; enable it when the upstream is expensive, or better,
    write shingles/signatures to intermediate tables at 100 TB."""
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
    # one ±1 sum aggregate per bit (map-side combine) instead of a bits×
    # row explosion — shuffle volume is per-doc, not per-(shingle, bit)
    bitsums = [
        F.sum(F.expr(f"(shiftright(hv, {b}) & 1) * 2 - 1")).alias(f"b{b}")
        for b in range(bits)
    ]
    wide = shingles.select("doc_id", hval.alias("hv")).groupBy("doc_id").agg(*bitsums)
    fingerprint = None
    for b in range(bits):
        term = F.when(F.col(f"b{b}") > 0, F.lit(1 << b).cast("long")).otherwise(F.lit(0).cast("long"))
        fingerprint = term if fingerprint is None else fingerprint + term
    return wide.select("doc_id", fingerprint.alias("simhash"))


def hamming_distance(a, b):
    """Hamming distance between two simhash longs (bit_count of xor)."""
    return F.bit_count(a.bitwiseXOR(b))
