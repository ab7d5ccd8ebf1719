"""Sinks (SURVEY §2.1 K1-K4): parquet table upsert-by-dedup, sharded TSV,
JDBC batch, Elasticsearch bulk JSON-lines.

Reference:
- K1 Datastore upsert w/ pre-write dedup: e.g.
  .../etl/SentenceSegmentationPipeline.java:124-147, dedup
  .../etl/PipelineMain.java:817-900
- K2 TSV:  .../etl/ConceptCooccurrenceCountsPipeline.java:165-171
- K3 JDBC: .../etl/ConceptCooccurrenceMetricsPipeline.java:309-397 —
  INSERT ... ON DUPLICATE KEY UPDATE, batch 5000, 14.5 rec/s rate limiter.
  Spark's JDBC writer batches natively and parallelizes per partition; the
  rate limiter existed to protect a single Cloud SQL instance and is
  deliberately NOT reproduced (throttle with ``num_partitions`` +
  ``batchsize`` instead).
- K4 ES bulk: .../etl/ElasticsearchLoadPipeline.java:124-166 — without the
  es-spark connector on the classpath, bulk-format JSON lines are written
  for ``curl --data-binary`` ingestion.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def write_table(
    df: DataFrame,
    path: str,
    dedup_keys: list[str] | None = None,
    partition_by: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """K1: parquet table write with the reference's pre-write dedup
    (deduplicateByKey — first wins, here min-by-key via dropDuplicates)."""
    if dedup_keys:
        df = df.dropDuplicates(dedup_keys)
    w = df.write.mode(mode)
    if partition_by:
        w = w.partitionBy(*partition_by)
    w.parquet(path)


def write_tsv(df: DataFrame, path: str, header: bool = False) -> None:
    """K2: sharded TSV (one file per partition, like TextIO shards)."""
    df.write.mode("overwrite").option("sep", "\t").option("header", str(header).lower()).csv(path)


def write_jdbc(
    df: DataFrame,
    url: str,
    table: str,
    properties: dict[str, str] | None = None,
    batchsize: int = 5000,
    num_partitions: int | None = None,
    mode: str = "append",
) -> None:
    """K3: JDBC batch write. ``batchsize`` defaults to the reference's 5000;
    concurrency is bounded by ``num_partitions`` (the scale-safe replacement
    for the reference's per-worker rate limiter)."""
    if num_partitions:
        df = df.coalesce(num_partitions)
    df.write.mode(mode).option("batchsize", str(batchsize)).jdbc(
        url, table, properties=properties or {}
    )


def _upsert_sql(table: str, cols: list[str], key_cols: list[str]) -> str:
    """ANSI ``INSERT ... ON CONFLICT DO UPDATE`` equivalent of the
    reference's MySQL ``INSERT ... ON DUPLICATE KEY UPDATE col =
    VALUES(col)`` statements (ConceptCooccurrenceMetricsPipeline.java:
    316-355) — every non-key column updates from the incoming row."""
    placeholders = ", ".join("?" for _ in cols)
    updates = ", ".join(f"{c} = excluded.{c}" for c in cols if c not in key_cols)
    conflict = ", ".join(key_cols)
    if not updates:  # all columns are keys → idempotent insert
        return (
            f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
            f"ON CONFLICT({conflict}) DO NOTHING"
        )
    return (
        f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders}) "
        f"ON CONFLICT({conflict}) DO UPDATE SET {updates}"
    )


def write_upsert(
    df: DataFrame,
    connect,
    table: str,
    key_cols: list[str],
    batchsize: int = 5000,
    num_partitions: int | None = None,
) -> None:
    """K3 upsert path: executor-side batched MERGE through a DB-API
    connection factory (``connect`` must be picklable — a top-level
    function or ``functools.partial``), one connection per partition,
    ``executemany`` per ``batchsize`` chunk then commit.

    This is the foreachBatch/foreachPartition shape of the reference's
    JdbcIO upsert (batch 5000, ON DUPLICATE KEY UPDATE); concurrency
    against a single DB endpoint is bounded with ``num_partitions``
    (replacing the reference's 14.5 rec/s rate limiter). Works against
    any DB-API driver (sqlite3 in tests; a server driver in production —
    or use :func:`write_jdbc` for plain appends via the JVM path)."""
    cols = df.columns
    sql = _upsert_sql(table, cols, key_cols)

    def _write_partition(rows) -> None:
        conn = connect()
        try:
            cur = conn.cursor()
            batch: list[tuple] = []
            for row in rows:
                batch.append(tuple(row[c] for c in cols))
                if len(batch) >= batchsize:
                    cur.executemany(sql, batch)
                    batch = []
            if batch:
                cur.executemany(sql, batch)
            conn.commit()
        finally:
            conn.close()

    if num_partitions:
        df = df.coalesce(num_partitions)
    df.foreachPartition(_write_partition)


def es_bulk_lines(docs: DataFrame, index: str, id_col: str, json_col: str) -> DataFrame:
    """K4: Elasticsearch bulk-format lines — an ``{"index": ...}`` action
    line followed by the document JSON, flattened to one 'line' column
    (write with ``write.text``)."""
    action = F.concat(
        F.lit('{"index":{"_index":"' + index + '","_id":"'),
        F.col(id_col),
        F.lit('"}}'),
    )
    return docs.select(
        F.explode(F.array(action, F.col(json_col))).alias("line")
    )
