"""Training-batch construction operators (LLM-data-pipeline extension):
sequence packing, deterministic hash sampling, stratified corpus mixing.

All column-expression / window work — no UDFs, no driver loops. The
sampling primitives hash with md5 so a DuckDB/any-ANSI oracle reproduces
the exact keep set (Spark's xxhash64/rand have no cross-engine twin);
md5 cost is per-row-constant and off the 100 TB text bytes.
"""

from __future__ import annotations

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
