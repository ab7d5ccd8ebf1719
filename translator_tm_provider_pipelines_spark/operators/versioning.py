"""Document identity & versioning semantics (SURVEY §1.2).

Reference behavior re-expressed Spark-first:

- semantic-version compare: ``isMoreRecent`` / ``getSemanticVersion``
  (.../etl/PipelineMain.java:446-505) — up-to-3-part dotted versions,
  missing / non-numeric parts → 0; "latest wins".
- ``filterForMostRecent`` (.../etl/PipelineMain.java:408-436) and the
  ``"recent"`` sentinel version (:388-391, :747-754) → a row_number window
  over the document identity key ordered by semantic version descending.
- chunk splicing: content > 1,048,000 bytes was stored split
  (``chunkContent`` :774-815) and re-spliced ascending by chunkId
  (``spliceDocumentChunks`` :519-553). Spark has no value-size limit, so
  splice exists only to ingest reference-shaped data.

Scale notes: the latest-version window partitions on the high-cardinality
document identity key (doc_id, type, format, pipeline) so it parallelizes
evenly; chunk splice is one shuffle on the same key with JVM-side
``array_join``/``sort_array`` (no Python).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: the version value that means "whatever is newest" (PipelineMain.java:388-391)
RECENT = "recent"

#: document identity = everything but the version (DocumentCriteria.java:8-15)
IDENTITY_COLS = ("doc_id", "doc_type", "doc_format", "pipeline_key")

#: Datastore value-size chunking threshold (DatastoreConstants.java:10)
MAX_CHUNK_BYTES = 1_048_000


def semantic_version(version: Column | str) -> Column:
    """Dotted version → orderable BIGINT: ``a.b.c`` → a*10^12 + b*10^6 + c.

    Mirrors ``getSemanticVersion`` (PipelineMain.java:446-505): up to three
    parts, each missing or non-numeric part contributes 0, so "0.2" ==
    "0.2.0" and garbage sorts lowest. Pure column arithmetic — stays inside
    whole-stage codegen."""
    v = F.col(version) if isinstance(version, str) else version
    parts = F.split(v, r"\.")

    def num(i: int) -> Column:
        # F.get (not getItem): null — not an ANSI error — past the end
        p = F.coalesce(F.get(parts, i), F.lit(""))
        digits = F.regexp_extract(p, r"^(\d+)$", 1)
        return F.when(digits == "", F.lit(0)).otherwise(digits.cast("long"))

    return num(0) * F.lit(1_000_000_000_000) + num(1) * F.lit(1_000_000) + num(2)


def filter_most_recent(docs: DataFrame, identity_cols: tuple[str, ...] = IDENTITY_COLS) -> DataFrame:
    """Latest-wins resolution: keep, per document identity, the row(s) with
    the highest semantic version (filterForMostRecent, PipelineMain.java:
    408-436). Chunked rows of the winning version all survive (the
    reference resolves versions before splicing), hence ``rank`` — equal
    versions tie and chunks share one version."""
    w = Window.partitionBy(*identity_cols).orderBy(
        semantic_version("pipeline_version").desc()
    )
    return (
        docs.withColumn("__vrank", F.rank().over(w))
        .where(F.col("__vrank") == 1)
        .drop("__vrank")
    )


def splice_chunks(docs: DataFrame) -> DataFrame:
    """Reassemble chunked documents: concatenate content ascending by
    chunk_id per (identity, version) — spliceDocumentChunks
    (PipelineMain.java:519-553); collections are unioned across chunks
    (spliceValues :1460-1478). One shuffle; all array ops JVM-side."""
    key = [*IDENTITY_COLS, "pipeline_version"]
    return (
        docs.groupBy(*key)
        .agg(
            F.array_join(
                F.transform(
                    F.array_sort(
                        F.collect_list(F.struct("chunk_id", "content"))
                    ),
                    lambda s: s["content"],
                ),
                "",
            ).alias("content"),
            F.count("*").alias("chunk_total"),
            F.array_distinct(F.flatten(F.collect_list("collections"))).alias(
                "collections"
            ),
        )
        .withColumn("chunk_id", F.lit(0).cast("long"))
    )


def chunk_content(docs: DataFrame, max_bytes: int = MAX_CHUNK_BYTES) -> DataFrame:
    """Split content into ≤max_bytes chunks (chunkContent, PipelineMain.java:
    774-815) — only needed when writing reference-shaped stores. Chunk
    boundaries are byte-budget greedy over UTF-8; we approximate with
    fixed character windows sized for the worst case (4-byte chars) when
    any multibyte char is present, else exact byte windows. Emits
    (chunk_id, chunk_total) per identity+version."""
    per_chunk_chars = F.when(
        F.octet_length("content") == F.length("content"), F.lit(max_bytes)
    ).otherwise(F.lit(max_bytes // 4))
    n_chunks = F.greatest(
        F.ceil(F.length("content") / per_chunk_chars).cast("long"), F.lit(1).cast("long")
    )
    return (
        docs.withColumn("__n", n_chunks)
        .withColumn("__w", per_chunk_chars)
        .select(
            *[c for c in docs.columns if c not in ("content", "chunk_id", "chunk_total")],
            F.posexplode(
                F.transform(
                    F.sequence(F.lit(0), F.col("__n") - 1),
                    lambda i: F.substring(
                        F.col("content"), (i * F.col("__w") + 1).cast("int"), F.col("__w").cast("int")
                    ),
                )
            ).alias("chunk_id", "content"),
            F.col("__n").alias("chunk_total"),
        )
        .withColumn("chunk_id", F.col("chunk_id").cast("long"))
    )
