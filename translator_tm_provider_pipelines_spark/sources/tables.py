"""Table IO: the documents/status/failures store and the driver's synthetic
test tables.

The reference's Cloud Datastore kinds (document/status/failure —
.../etl/util/DatastoreConstants.java:27-60) become partitioned Parquet
tables; Datastore query filters (PipelineMain.setFilters:726-766) become
DataFrame predicates that Catalyst pushes into the parquet scan, and the
`collection`/`doc_type` partitioning turns collection-at-a-time batch runs
into partition pruning.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def read_table(spark: SparkSession, sf_dir: str, name: str) -> DataFrame:
    """One driver-generated synthetic table (TESTDATA.md).

    Deliberately NO repartition after the scan: measured at sf0.1, a
    blanket round-robin repartition (to spread single-row-group files
    across cores) made the whole suite 2.4× SLOWER — sortBeforeRepartition
    serializes a full-width local sort on the single scan task and the
    lost size estimates flip broadcast joins to shuffle joins. Narrow
    compute-heavy operators are instead made cheap enough per row that the
    single-split scan is not the bottleneck (see SCALING.md)."""
    return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))


def read_tables(spark: SparkSession, sf_dir: str) -> dict[str, DataFrame]:
    return {t: read_table(spark, sf_dir, t) for t in TESTDATA_TABLES}


def register_views(
    spark: SparkSession, tables: dict[str, DataFrame | str]
) -> None:
    """Expose the engine's tables to ``spark.sql``: each entry becomes a
    temp view (value = DataFrame, or a parquet path to read). Gives users
    the SQL surface over documents/status/annotations/... without any
    engine-specific API:

        register_views(spark, {"documents": "/data/documents", ...})
        spark.sql("SELECT doc_id FROM documents WHERE ...")
    """
    for name, src in tables.items():
        df = spark.read.parquet(src) if isinstance(src, str) else src
        df.createOrReplaceTempView(name)


# ---------------------------------------------------------------------------
# Document store (K1 + S1/S2 scan side)
# ---------------------------------------------------------------------------


def write_documents(df: DataFrame, path: str, mode: str = "append") -> None:
    """K1: documents table, partitioned for pruning by the two hot predicates
    (collection-at-a-time runs + per-type stage selection). Writers dedup on
    the identity key first — the reference does the same to avoid
    non-transactional write conflicts (PipelineMain.java:817-900)."""
    (
        df.dropDuplicates(["doc_id", "doc_type", "doc_format", "pipeline_key", "pipeline_version", "chunk_id"])
        .write.mode(mode)
        .partitionBy("doc_type")
        .parquet(path)
    )


def write_status(df: DataFrame, path: str, mode: str = "append") -> None:
    df.dropDuplicates(["doc_id"]).write.mode(mode).parquet(path)


def write_failures(df: DataFrame, path: str, mode: str = "append") -> None:
    """Failure side-channel (EtlFailureData) — append-only."""
    df.write.mode(mode).parquet(path)


def write_tsv(df: DataFrame, path: str, mode: str = "overwrite") -> None:
    """K2: sharded TSV files (TextIO.write equivalent)."""
    df.write.mode(mode).csv(path, sep="\t", header=False)


def write_jdbc(df: DataFrame, url: str, table: str, mode: str = "append", batchsize: int = 5000) -> None:
    """K3: JDBC sink. The reference batches 5000 rows and rate-limits to
    14.5 rec/s/worker (ConceptCooccurrenceMetricsPipeline.java:282,338);
    Spark's jdbc writer batches per partition — rate limiting is a Cloud
    SQL artifact, deliberately not reproduced."""
    df.write.mode(mode).option("batchsize", batchsize).jdbc(url, table)
