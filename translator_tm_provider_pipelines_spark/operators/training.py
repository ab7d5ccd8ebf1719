"""Training-batch construction operators (LLM-data-pipeline extension):
sequence packing, deterministic hash sampling, stratified corpus mixing.

All column-expression / window work — no UDFs, no driver loops. The
sampling primitives hash with md5 so a DuckDB/any-ANSI oracle reproduces
the exact keep set (Spark's xxhash64/rand have no cross-engine twin);
md5 cost is per-row-constant and off the 100 TB text bytes.
"""

from __future__ import annotations

import math

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F
from pyspark.sql import types as T


def pack_sequences(
    docs: DataFrame,
    capacity: int,
    n_shards: int = 1,
    token_col: str = "n_tokens",
    id_col: str = "doc_id",
) -> DataFrame:
    """Concat-then-chunk sequence packing (the GPT-2/LM pre-training
    recipe): documents are laid end-to-end in ``id_col`` order and the
    stream is cut into fixed ``capacity``-token blocks; each document
    reports the block it starts in and its offset inside that block.

    Scale shape: a single global ordering is a one-reducer sort, so the
    stream is SHARDED first and packing runs per shard — the window sort
    then parallelizes across ``n_shards`` reducers and each training
    shard stays independently reproducible. Numeric ids shard as
    ``id % n_shards`` (cross-engine trivial); string ids shard on the
    engine's md5 convention (``conv(substr(md5(id),1,4),16,10) %
    n_shards``) — a bare modulo on a non-numeric string would cast to
    NULL and silently collapse every row into one single-reducer shard.
    Output: (doc_id, shard, n_tokens, start_block, block_offset,
    n_blocks_spanned) — ``n_blocks_spanned`` > 1 marks documents that
    straddle a block boundary."""
    if capacity <= 0:
        raise ValueError("capacity must be positive")
    doc_id = F.col(id_col)
    toks = F.col(token_col).cast("long")
    w = (
        Window.partitionBy("shard")
        .orderBy(id_col)
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    numeric_id = isinstance(
        docs.schema[id_col].dataType,
        (T.ByteType, T.ShortType, T.IntegerType, T.LongType, T.DecimalType),
    )
    shard = (
        F.pmod(doc_id, F.lit(n_shards))
        if numeric_id
        else F.pmod(
            F.conv(F.substring(F.md5(doc_id.cast("string")), 1, 4), 16, 10).cast("int"),
            F.lit(n_shards),
        )
    )
    staged = docs.select(
        doc_id.alias(id_col),
        toks.alias("n_tokens"),
        shard.cast("int").alias("shard"),
    )
    cum = F.sum("n_tokens").over(w)
    start = (cum - F.col("n_tokens")).alias("__start")
    out = staged.select(id_col, "shard", "n_tokens", start, cum.alias("__cum"))
    start_block = F.floor(F.col("__start") / capacity)
    end_block = F.floor((F.col("__cum") - 1) / capacity)
    return out.select(
        F.col(id_col).alias("doc_id"),
        "shard",
        "n_tokens",
        start_block.cast("long").alias("start_block"),
        (F.col("__start") % capacity).cast("long").alias("block_offset"),
        F.when(F.col("n_tokens") > 0, end_block - start_block + 1)
        .otherwise(F.lit(0))
        .cast("long")
        .alias("n_blocks_spanned"),
    )


def _hex_threshold(fraction: float) -> str:
    """4-hex-digit keep threshold: a row survives when the first 4 hex
    chars of its md5 compare lexicographically below this (fixed-width
    hex compare == numeric compare), giving keep rates quantized to
    1/65536 — deterministic and reproducible in any engine with md5."""
    if not 0.0 <= fraction <= 1.0:
        raise ValueError("fraction must be in [0, 1]")
    v = int(round(fraction * 0x10000))
    if v >= 0x10000:
        return "g"  # sorts above every hex digit: keeps all rows
    return format(v, "04x")


def sample_hash_key(seed: str, id_col: str = "doc_id"):
    """The md5 sampling key: ``substr(md5(seed || ':' || id), 1, 4)``."""
    return F.substring(
        F.md5(F.concat(F.lit(f"{seed}:"), F.col(id_col).cast("string"))), 1, 4
    )


def deterministic_sample(
    docs: DataFrame, fraction: float, seed: str = "s0", id_col: str = "doc_id"
) -> DataFrame:
    """Deterministic Bernoulli-style sample: keep rows whose md5 key
    falls below the fraction threshold. Unlike ``DataFrame.sample`` this
    is stable across runs, engines, partitionings, and retries — the
    property a reproducible training mixture needs. Zero shuffle."""
    return docs.where(sample_hash_key(seed, id_col) < F.lit(_hex_threshold(fraction)))


def stratified_sample(
    docs: DataFrame,
    fractions: dict[str, float],
    stratum_col: str,
    seed: str = "s0",
    id_col: str = "doc_id",
    default_fraction: float = 0.0,
) -> DataFrame:
    """Per-stratum deterministic sampling — the corpus-mixing primitive
    (e.g. upweight curated sources, downweight web crawl): each stratum
    value keeps its own fraction; unlisted strata keep
    ``default_fraction``. One when-chain threshold lookup + the same
    zero-shuffle md5 keep rule as :func:`deterministic_sample`."""
    thr = F.lit(_hex_threshold(default_fraction))
    for value, frac in sorted(fractions.items()):
        thr = F.when(
            F.col(stratum_col) == value, F.lit(_hex_threshold(frac))
        ).otherwise(thr)
    return docs.where(sample_hash_key(seed, id_col) < thr)


def curation_manifest(
    docs: DataFrame,
    min_quality: float = 0.4,
    lang: str = "en",
    sample_fraction: float = 1.0,
    seed: str = "cur",
    capacity: int = 2048,
    n_shards: int = 4,
    text_col: str = "text",
    id_col: str = "doc_id",
    profiles: dict[str, tuple[str, ...]] | None = None,
) -> DataFrame:
    """The end-to-end corpus-curation capstone: quality floor → language
    filter → exact-dedup keep (minimum id per identical text) →
    deterministic md5 sample → sequence packing, FUSED into one corpus
    scan and two shuffles (the md5-text dedup window, then the pack
    shard window). Every rule reuses the single-source column logic of
    its standalone operator (``_quality_blend``, ``_lang_argmax``,
    :func:`sample_hash_key`, :func:`pack_sequences`), so the composed
    pipeline is definitionally consistent with running the steps one by
    one — without re-scanning the text per step.

    Returns the training manifest: the :func:`pack_sequences` columns
    for every surviving document."""
    from .textanalysis import (
        DEFAULT_LANG_PROFILES,
        EN_STOPWORDS,
        _count_words,
        _lang_argmax,
        _quality_blend,
        _words,
        lang_marker_matches,
    )

    profiles = profiles or DEFAULT_LANG_PROFILES
    text = F.col(text_col)
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        _words(text).alias("__w"),
        lang_marker_matches(text, profiles).alias("__m"),
        F.md5(text).alias("__h"),
        _count_words(text, EN_STOPWORDS).alias("__nstop"),
    )
    nt = F.size("__w")
    _, _, score = _quality_blend(nt, F.size(F.array_distinct("__w")), F.col("__nstop"))
    pred_lang, _ = _lang_argmax(F.col("__m"), profiles)
    scored = staged.select(
        "doc_id",
        "__h",
        nt.cast("long").alias("n_tokens"),
        F.round(score, 8).alias("__q"),
        pred_lang.alias("__lang"),
    )
    kept = scored.withColumn(
        "__minid", F.min("doc_id").over(Window.partitionBy("__h"))
    ).where(
        (F.col("doc_id") == F.col("__minid"))
        & (F.col("__q") >= min_quality)
        & (F.col("__lang") == lang)
        & (sample_hash_key(seed) < F.lit(_hex_threshold(sample_fraction)))
    )
    return pack_sequences(
        kept.select("doc_id", "n_tokens"), capacity=capacity, n_shards=n_shards
    )


# ---------------------------------------------------------------------------
# DSIR — Data Selection with Importance Resampling (Xie et al. 2023)
# ---------------------------------------------------------------------------

_DSIR_MOD = 2_147_483_647  # 2^31-1, same modulus as the dedup hash family


def _dsir_features(docs: DataFrame, n_buckets: int, text_col: str, id_col: str) -> DataFrame:
    """(doc id, feature bucket) rows: word unigrams + bigrams hashed into
    ``n_buckets`` via the engine's md5-affine convention (28-bit word
    hash; bigram = (3·h₁ + 5·h₂ + 11) mod 2³¹−1) — the same arithmetic
    the dedup family uses, so a DuckDB oracle reproduces every bucket id
    exactly. One occurrence = one row (DSIR weights count occurrences,
    not presence)."""
    words = F.expr(f"regexp_extract_all(lower({text_col}), '([a-z0-9]+)', 1)")
    # STAGE the hash array as a real attribute before deriving n-grams:
    # referencing an inline `hw` expression from inside the bigram lambda
    # (F.get(hw, i+1)) re-evaluates the ENTIRE md5 array per element —
    # O(words²) md5 calls per document (the same re-inline trap the
    # round-4 decontamination fix removed; measured here 61.8 s → ~2 s at
    # sf0.1). Two select boundaries keep `__hw` a bound attribute that
    # CollapseProject will not re-inline (non-cheap, multiply-referenced).
    staged = docs.select(F.col(id_col).alias("__did"), words.alias("__w")).select(
        "__did",
        F.transform(
            F.col("__w"),
            lambda w: F.conv(F.substring(F.md5(w), 1, 7), 16, 10).cast("long"),
        ).alias("__hw"),
    )
    hwc = F.col("__hw")
    uni = F.transform(hwc, lambda h: h % n_buckets)
    bi = F.when(
        F.size(hwc) >= 2,
        F.transform(
            F.slice(hwc, 1, F.size(hwc) - 1),
            lambda h, i: ((F.lit(3) * h + F.lit(5) * F.get(hwc, i + 1) + F.lit(11)) % _DSIR_MOD) % n_buckets,
        ),
    ).otherwise(F.array().cast("array<bigint>"))
    return staged.select("__did", F.explode(F.concat(uni, bi)).alias("bucket"))


def dsir_log_weights(
    docs: DataFrame,
    target: DataFrame,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    scale: int = 6,
) -> DataFrame:
    """DSIR importance weights: score every raw document by how much its
    hashed-n-gram profile looks like the TARGET corpus rather than the
    raw corpus — ``log w(x) = Σ_features [log p̂(f) − log q̂(f)]`` with
    Laplace-``alpha`` smoothed bucket estimates (p̂ from ``target``, q̂
    from ``docs``). Select by taking the top fraction by weight (or
    Gumbel-resample downstream); Xie et al. 2023, the importance-
    resampling pretraining-data selection recipe.

    Output: (doc_id, log_weight rounded to ``scale``, n_features); docs
    with no extractable features carry log_weight 0.0. Scale shape: the
    two distribution estimates are groupBys over ≤ ``n_buckets`` keys
    (map-side combined, the shuffle is bucket-count-sized regardless of
    corpus size); the per-doc score is one explode + a BROADCAST join
    against the ≤ n_buckets log-ratio table + one doc-keyed sum —
    corpus-linear with no wide relation, oracle-checked value-exactly
    (`dsir_log_weights` query)."""
    feats_raw = _dsir_features(docs, n_buckets, text_col, id_col)
    feats_tgt = _dsir_features(target, n_buckets, text_col, id_col)
    # ONE feature-extraction pass per corpus (r12, guide §1.2/§2.4): the
    # raw side aggregates to a (doc, bucket, count) frame FIRST and every
    # downstream branch — the per-bucket raw distribution qc, the raw
    # total qt, the per-doc score — derives from that one exchange (the
    # same DataFrame object, so ReuseExchange / AQE stage reuse
    # materializes the md5 extraction + shuffle once; the previous form
    # ran the extraction once for qc and AGAIN for the per-doc score,
    # plus two driver .first() actions for qt/pt). qt/pt become 1-row
    # broadcast frames instead of Python literals, which makes the whole
    # operator a single lazy plan with zero driver actions. Value parity:
    # qn/pn are the same integer counts (sum of per-doc counts ⟺ count of
    # occurrences); the denominators add the same double values in the
    # same order (alpha·n_buckets is still pre-multiplied in Python); the
    # per-doc sum Σ_occurrences log_ratio becomes Σ_buckets c·log_ratio —
    # ulp-reordering of the same terms, absorbed by the round-``scale``
    # output exactly like Spark's own partition-order nondeterminism
    # (equality re-proved against the DuckDB oracle and the old
    # implementation, OPTIMIZATION_r12.md).
    per_doc = feats_raw.groupBy("__did", "bucket").agg(
        F.count(F.lit(1)).alias("__c")
    )
    qc = per_doc.groupBy("bucket").agg(F.sum("__c").alias("qn"))
    pc = feats_tgt.groupBy("bucket").agg(F.count(F.lit(1)).alias("pn"))
    qtot = qc.agg(F.coalesce(F.sum("qn"), F.lit(0)).cast("double").alias("__qt"))
    ptot = pc.agg(F.coalesce(F.sum("pn"), F.lit(0)).cast("double").alias("__pt"))
    ratio = (
        qc.join(pc, "bucket", "full_outer")
        .crossJoin(F.broadcast(qtot))
        .crossJoin(F.broadcast(ptot))
        .select(
            "bucket",
            (
                F.log(
                    (F.coalesce(F.col("pn"), F.lit(0)) + alpha)
                    / (F.col("__pt") + F.lit(float(alpha * n_buckets)))
                )
                - F.log(
                    (F.coalesce(F.col("qn"), F.lit(0)) + alpha)
                    / (F.col("__qt") + F.lit(float(alpha * n_buckets)))
                )
            ).alias("log_ratio"),
        )
    )
    scored = (
        per_doc.join(F.broadcast(ratio), "bucket")
        .groupBy("__did")
        .agg(
            F.sum(F.col("__c") * F.col("log_ratio")).alias("__lw"),
            F.sum("__c").alias("n_features"),
        )
    )
    out = docs.select(F.col(id_col).alias("doc_id")).join(
        scored, F.col("doc_id") == F.col("__did"), "left"
    )
    return out.select(
        "doc_id",
        F.round(F.coalesce(F.col("__lw"), F.lit(0.0)), scale).alias("log_weight"),
        F.coalesce(F.col("n_features"), F.lit(0)).alias("n_features"),
    )


def boundary_top_n(
    df: DataFrame,
    n_keep: int,
    key_col: str,
    tie_col: str = "doc_id",
    rel_err: float = 0.001,
    n_total: int | None = None,
) -> DataFrame:
    """EXACT global top-``n_keep`` by (``key_col`` desc, ``tie_col`` asc)
    WITHOUT a full-relation single-partition window — the boundary-slice
    rank every global-selection operator here shares (dsir_select,
    dsir_gumbel_sample).

    Two ``approxQuantile`` key thresholds bracket the selection boundary
    (``1 - n_keep/n ∓ 2·rel_err``); rows strictly above the upper
    threshold are kept outright, rows below the lower one dropped
    outright, and only the boundary slice — ~``4·rel_err`` of the
    relation plus ties — goes through the global ``row_number`` window.
    A one-pass count of the sure and candidate sets validates the
    bracket; a degenerate distribution (ties wider than the bracket)
    falls back to the full rank rather than returning a wrong set. The
    caller should persist ``df`` (this makes 2 passes over it plus the
    quantile sketch) and pass the relation size it already counted as
    ``n_total`` so no extra count action runs here (left None, one count
    runs)."""
    if n_keep <= 0:
        return df.limit(0)
    if n_total is None:
        n_total = df.count()
    if n_keep >= n_total:
        return df
    key = F.col(key_col)
    fraction = n_keep / n_total
    margin = max(2.0 * rel_err, 1e-4)
    p_lo = max(0.0, 1.0 - fraction - margin)
    p_hi = min(1.0, 1.0 - fraction + margin)
    t_lo, t_hi = df.stat.approxQuantile(key_col, [p_lo, p_hi], rel_err)
    counts = df.agg(
        F.sum(F.when(key > t_hi, 1).otherwise(0)).alias("ns"),
        F.sum(F.when(key >= t_lo, 1).otherwise(0)).alias("nc"),
    ).first()
    n_sure = int(counts["ns"] or 0)
    n_cand = int(counts["nc"] or 0)
    if n_sure <= n_keep and n_cand >= n_keep:
        sure = df.where(key > t_hi)
        boundary = df.where((key <= t_hi) & (key >= t_lo))
    else:
        # bracket violated (pathological ties / quantile error): full rank
        sure = df.limit(0)
        boundary = df
        n_sure = 0
    rank = F.row_number().over(Window.orderBy(key.desc(), F.col(tie_col)))
    picked = (
        boundary.withColumn("__r", rank)
        .where(F.col("__r") <= n_keep - n_sure)
        .drop("__r")
    )
    return sure.unionByName(picked)


def dsir_select(
    docs: DataFrame,
    target: DataFrame,
    fraction: float,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    text_col: str = "text",
    id_col: str = "doc_id",
    rel_err: float = 0.001,
) -> DataFrame:
    """Top-``fraction`` DSIR selection (deterministic variant: rank by
    log_weight with doc-id tie-break instead of Gumbel noise, so the
    selected set is engine-reproducible; :func:`dsir_gumbel_sample` is
    the paper's stochastic resampling rule). Returns the weight rows of
    the selected documents.

    Scale shape: :func:`boundary_top_n` — never a full-corpus
    single-partition window. The weight table (doc_id, log_weight,
    n_features — narrow) is persisted for the quantile/count/rank
    passes; ``n_keep = floor(count · fraction)`` comes from the SAME
    table (no second corpus action) and matches the oracle's ``floor()``
    exactly.

    Cache contract: the weight table STAYS persisted after return — the
    returned plan reads it, so this function cannot unpersist it itself.
    A long-lived session making many calls should release it after
    materializing the result (``spark.catalog.clearCache()`` or
    iterating ``spark.sparkContext._jsc.getPersistentRDDs``); a one-shot
    job can ignore this."""
    w = dsir_log_weights(
        docs, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
    )
    if fraction >= 1.0:
        return w
    if fraction <= 0.0:
        return w.limit(0)
    w = w.persist()
    n_total = w.count()
    n_keep = int(n_total * fraction)  # floor, as in the oracle
    return boundary_top_n(
        w, n_keep, "log_weight", rel_err=rel_err, n_total=n_total
    )


def dsir_gumbel_sample(
    docs: DataFrame,
    target: DataFrame,
    fraction: float,
    n_buckets: int = 8192,
    alpha: float = 1.0,
    seed: str = "g0",
    text_col: str = "text",
    id_col: str = "doc_id",
    rel_err: float = 0.001,
    scale: int = 6,
) -> DataFrame:
    """DSIR importance RESAMPLING proper (Xie et al. 2023): a
    without-replacement sample of ``fraction`` of the corpus with
    inclusion probability ∝ importance weight, via the Gumbel-top-k
    trick — rank by ``log w(x) + Gumbel_i`` and take the top n, which is
    distributionally exactly weighted sampling without replacement. The
    Gumbel noise is SEEDED AND DETERMINISTIC: ``u_i`` comes from the
    engine's md5-uniform convention (first 7 hex chars of
    ``md5(seed:doc_id)``, midpoint-adjusted over 16^7), and
    ``g_i = −ln(−ln u_i)`` — so the sampled set is engine-reproducible
    and a DuckDB oracle replays it bit-for-bit (the ranking key is
    rounded to ``scale`` decimals to absorb last-ulp transcendental
    differences between runtimes; ties break by doc id).

    Output: (doc_id, log_weight, n_features) of the sampled documents.
    Scale shape: identical to :func:`dsir_select` —
    :func:`boundary_top_n` over the persisted weight table with the
    Gumbel-perturbed key, never a full-corpus single-partition window.
    Same cache contract as :func:`dsir_select`: the persisted keyed
    weight table outlives the call (the returned plan reads it) — a
    long-lived session should clear it after materializing the result."""
    w = dsir_log_weights(
        docs, target, n_buckets=n_buckets, alpha=alpha,
        text_col=text_col, id_col=id_col,
    )
    if fraction >= 1.0:
        return w
    if fraction <= 0.0:
        return w.limit(0)
    u = (
        F.conv(
            F.substring(
                F.md5(F.concat(F.lit(f"{seed}:"), F.col("doc_id").cast("string"))),
                1,
                7,
            ),
            16,
            10,
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(16 ** 7))
    keyed = w.withColumn(
        "__gkey", F.round(F.col("log_weight") - F.log(-F.log(u)), scale)
    ).persist()
    n_total = keyed.count()
    n_keep = int(n_total * fraction)  # floor, as in the oracle
    return boundary_top_n(
        keyed, n_keep, "__gkey", rel_err=rel_err, n_total=n_total
    ).drop("__gkey")


# md5-prefix threshold ladder for the mixture samplers: power-of-two
# 4-hex-char prefixes '0001'..'8000' plus 'g' (above every hex key). The
# per-source stats pass counts survivors at EVERY rung in one aggregate
# (17 fixed conditional sums — constant in source cardinality), and the
# driver picks the smallest rung >= the desired threshold, so the exact
# survivor count at the chosen threshold is already known — threshold
# selection AND validation come out of a single dimension-sized action.
# Rounding up to a rung at most doubles the slice (<= 2*slack*quota rows
# through the per-source window) — still boundary-sliced, never the
# full source.
_PREFIX_LADDER: list[tuple[int, str]] = [
    (1 << k, format(1 << k, "04x")) for k in range(16)
] + [(1 << 16, "g")]


def _ladder_rung(v: int) -> tuple[int, str]:
    """(index, prefix) of the smallest ladder rung >= v; (-1, '0000') for
    v <= 0 (keep nothing — 0 survivors by construction)."""
    if v <= 0:
        return -1, "0000"
    for i, (rv, prefix) in enumerate(_PREFIX_LADDER):
        if rv >= v:
            return i, prefix
    return len(_PREFIX_LADDER) - 1, "g"


def _mixture_plan_table(spark, rows, src_type, quota_type=T.LongType()):
    """Per-source plan table (source, md5-prefix threshold, quota,
    deficient-fallback flag) for the two mixture samplers. Built from one
    dimension-sized collect and BROADCAST-joined back onto the corpus —
    the constant-cardinality alternative to compiling an
    O(n_sources)-deep CASE WHEN threshold chain (which overflows the
    analyzer/codegen stack somewhere past a few thousand sources)."""
    schema = T.StructType(
        [
            T.StructField("__psrc", src_type),
            T.StructField("__thr", T.StringType()),
            T.StructField("__quota", quota_type),
            T.StructField("__def", T.BooleanType()),
        ]
    )
    return spark.createDataFrame(rows, schema)


def temperature_sample(
    docs: DataFrame,
    total: int,
    alpha: float = 0.5,
    source_col: str = "source",
    id_col: str = "doc_id",
    slack: float = 1.3,
    min_margin: int = 64,
) -> DataFrame:
    """Temperature-based source mixing (the mT5/XLM-R multilingual
    recipe): source i gets a quota ∝ n_i^alpha of the ``total`` budget —
    alpha < 1 up-samples small sources relative to their raw share,
    alpha = 1 is proportional, alpha = 0 uniform. Within each source the
    quota fills by the engine's deterministic md5 rank (same convention
    as :func:`deterministic_sample`), so the selected set is
    engine-reproducible — use alpha = 0.5 when cross-engine quota
    equality matters bit-for-bit (sqrt is correctly rounded under IEEE
    754 in every engine; arbitrary pow is not).

    Output: (doc_id, source). Scale shape — boundary-slice ranking, not
    a full-source window: each source gets an md5-PREFIX keep threshold,
    the smallest ``_PREFIX_LADDER`` rung above ``quota/n · slack`` plus
    ``min_margin``/65536, carried on a small per-source plan table that
    BROADCAST-joins onto the corpus (a threshold expression per source
    would compile an O(n_sources)-deep CASE WHEN chain — at 10k sources
    that overflows codegen; the join is the same plan at any
    cardinality). Because the prefix filter keeps exactly a prefix of
    the per-source rank order (the first 4 md5 hex chars dominate the
    full-md5 sort), ranking the survivors reproduces the full-source
    ranks for every rank ≤ quota — the per-source window then sorts
    ≤ ``2 · slack × quota`` rows instead of the whole source.
    ONE dimension-sized driver action runs in total: the stats pass
    counts per-source rows AND survivors at every ladder rung in the
    same aggregate, so threshold choice and its validation come from one
    collect (round 8: a fused-but-nested broadcast chain and the r7
    two-collect shape both measured slower — see SCALING.md). Any
    deficient source — astronomically unlikely at the defaults, but
    possible for tiny sources — falls back to ranking that source in
    full, so the output is EXACTLY the unfiltered ranking's for every
    distribution."""
    staged = docs.select(
        F.col(id_col).alias("doc_id"), F.col(source_col).alias("source")
    )
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    # ONE stats action: per-source n + survivor count at every ladder rung
    rung_counts = [
        F.sum(F.when(key < F.lit(p), 1).otherwise(0)).alias(f"ns{i}")
        for i, (_v, p) in enumerate(_PREFIX_LADDER)
    ]
    stats = sorted(  # deterministic source order for the weight summation
        staged.groupBy("source").agg(F.count(F.lit(1)).alias("n"), *rung_counts)
        .collect(),
        key=lambda r: str(r["source"]),
    )
    # pow-half via math.sqrt (correctly rounded — the engine/oracle
    # cross-agreement convention) and HALF_UP rounding (Spark/DuckDB
    # round; Python's round() is banker's and would disagree on .5 —
    # pinned by test_mixture_quota_half_up_convention_vs_registry_oracle).
    # floor(x+0.5) and round() can in principle part ways one ulp BELOW
    # .5 (x = 0.49999999999999994 has x+0.5 == 1.0): both sides compute
    # the same double ratio from the same counts, so they sit on the
    # same side of any such edge; if an exact decimal boundary ever
    # matters, inject a driver-computed quota literal into the oracle.
    pw = (lambda x: math.sqrt(x)) if alpha == 0.5 else (lambda x: x ** alpha)
    tw = sum(pw(float(r["n"])) for r in stats)
    plan_rows = []
    for r in stats:
        n = int(r["n"])
        q = int(math.floor(total * pw(float(n)) / tw + 0.5)) if tw else 0
        if q <= 0:
            plan_rows.append((r["source"], "0000", q, False))
            continue
        v = int(-(-0x10000 * q * slack // n)) + min_margin  # ceil + margin
        i, prefix = _ladder_rung(v)
        ns = int(r[f"ns{i}"])
        plan_rows.append((r["source"], prefix, q, ns < min(n, q)))
    plan = _mixture_plan_table(
        docs.sparkSession,
        plan_rows,
        staged.schema["source"].dataType,
    )
    survivors = staged.join(
        F.broadcast(plan), F.col("source") == F.col("__psrc")
    ).where((key < F.col("__thr")) | F.col("__def"))
    rank = F.row_number().over(
        Window.partitionBy("source").orderBy(
            F.md5(F.col("doc_id").cast("string")), F.col("doc_id")
        )
    )
    return (
        survivors.withColumn("__rn", rank)
        .where(F.col("__rn") <= F.col("__quota"))
        .select("doc_id", "source")
    )


def token_budget_sample(
    docs: DataFrame,
    budget: float,
    alpha: float = 0.5,
    token_col: str = "n_tokens",
    source_col: str = "source",
    id_col: str = "doc_id",
    slack: float = 1.3,
    min_margin: int = 64,
) -> DataFrame:
    """Token-budget temperature mixing — :func:`temperature_sample` with
    the quota denominated in TOKENS instead of documents (what a
    pretraining mixture actually budgets): source i gets a token quota
    ∝ (Σ tokens_i)^alpha of ``budget``, and fills it greedily in the
    engine's deterministic md5 order — a document is selected iff its
    per-source RUNNING token total (md5 rank order, doc-id tie-break)
    stays within the quota. Running totals are monotone, so the kept set
    is a prefix of each source's md5 order: deterministic,
    engine-reproducible, and quota overshoot is bounded by one document.

    Output: (doc_id, source). Scale shape mirrors
    :func:`temperature_sample`: per-source thresholds ride a small
    BROADCAST-joined plan table (never an O(n_sources) CASE WHEN chain);
    each source pre-filters to an md5-PREFIX slice — the smallest
    ``_PREFIX_LADDER`` rung above ``slack ×`` its token keep-fraction —
    so the per-source cumulative-sum window sorts ≤ 2·slack× the keep
    fraction, never the full source. ONE dimension-sized driver action
    runs in total: the stats pass collects per-source token total, row
    count, AND the slice token sum + row count at every ladder rung in
    the same aggregate. Exactness is validated per source at the chosen
    rung — if a source's surviving slice neither crosses its quota
    (slice token sum ≤ quota, i.e. its max running total never passes
    it) nor covers the whole source, the boundary might extend past the
    slice, and that source falls back to a full-source window — the
    output equals the unfiltered computation for every input (pinned by
    test)."""
    toks = F.col(token_col).cast("double")
    staged = docs.select(
        F.col(id_col).alias("doc_id"),
        F.col(source_col).alias("source"),
        toks.alias("__tok"),
    )
    key = F.substring(F.md5(F.col("doc_id").cast("string")), 1, 4)
    # ONE stats action: per-source totals + slice count/token-sum at
    # every ladder rung
    rung_aggs = []
    for i, (_v, p) in enumerate(_PREFIX_LADDER):
        rung_aggs.append(
            F.sum(F.when(key < F.lit(p), 1).otherwise(0)).alias(f"sc{i}")
        )
        rung_aggs.append(F.sum(F.when(key < F.lit(p), F.col("__tok"))).alias(f"st{i}"))
    stats = sorted(
        staged.groupBy("source")
        .agg(F.sum("__tok").alias("tok"), F.count(F.lit(1)).alias("n"), *rung_aggs)
        .collect(),
        key=lambda r: str(r["source"]),
    )
    pw = (lambda x: math.sqrt(x)) if alpha == 0.5 else (lambda x: x ** alpha)
    tw = sum(pw(float(r["tok"] or 0.0)) for r in stats)
    plan_rows = []
    for r in stats:
        tok, n = float(r["tok"] or 0.0), int(r["n"])
        # round to 4 decimals HALF_UP on BOTH engine and oracle: the
        # quota is a double ratio whose last ulp may differ across
        # engines, and the boundary compare must not hinge on it
        q = (
            math.floor(budget * pw(tok) / tw * 10000.0 + 0.5) / 10000.0
            if tw
            else 0.0
        )
        if q <= 0 or tok <= 0:
            plan_rows.append((r["source"], "0000", q, False))
            continue
        frac = min(1.0, q / tok)
        v = int(-(-0x10000 * frac * slack // 1)) + min_margin
        i, prefix = _ladder_rung(v)
        stok, sc = float(r[f"st{i}"] or 0.0), int(r[f"sc{i}"])
        plan_rows.append(
            (
                r["source"],
                prefix,
                q,
                bool(stok <= q and sc < n),  # never crossed, not whole source
            )
        )
    plan = _mixture_plan_table(
        docs.sparkSession,
        plan_rows,
        staged.schema["source"].dataType,
        quota_type=T.DoubleType(),
    )
    cum = F.sum("__tok").over(
        Window.partitionBy("source")
        .orderBy(F.md5(F.col("doc_id").cast("string")), F.col("doc_id"))
        .rowsBetween(Window.unboundedPreceding, Window.currentRow)
    )
    survivors = (
        staged.join(F.broadcast(plan), F.col("source") == F.col("__psrc"))
        .where((key < F.col("__thr")) | F.col("__def"))
        .withColumn("__ctok", cum)
    )
    return survivors.where(F.col("__ctok") <= F.col("__quota")).select(
        "doc_id", "source"
    )
