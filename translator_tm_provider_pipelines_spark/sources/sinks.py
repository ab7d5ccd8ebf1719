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


def upsert_dialect_from_url(url: str) -> str:
    """'mysql' for MySQL/MariaDB connection URLs (``jdbc:mysql:…``,
    ``mysql://…``, ``mariadb``), else 'ansi'."""
    head = url.split("://", 1)[0].lower()
    return "mysql" if ("mysql" in head or "mariadb" in head) else "ansi"


def _upsert_sql(
    table: str, cols: list[str], key_cols: list[str], dialect: str = "ansi"
) -> str:
    """Upsert statement for one row batch.

    ``dialect='mysql'`` emits the reference's exact statement shape —
    ``INSERT … ON DUPLICATE KEY UPDATE col = VALUES(col)`` for EVERY
    column, keys included (ClassifiedSentenceStoragePipeline.java:458-461,
    481-489, 517-518; ConceptCooccurrenceMetricsPipeline.java:316-355).
    MySQL resolves the conflict against the table's own keys, so no
    conflict-target list is needed.

    ``dialect='ansi'`` emits ``INSERT … ON CONFLICT(keys) DO UPDATE SET
    col = excluded.col`` for the non-key columns (sqlite/PostgreSQL),
    which is the same net row state."""
    placeholders = ", ".join("?" for _ in cols)
    insert = f"INSERT INTO {table} ({', '.join(cols)}) VALUES ({placeholders})"
    if dialect == "mysql":
        updates = ", ".join(f"{c} = VALUES({c})" for c in cols)
        return f"{insert} ON DUPLICATE KEY UPDATE {updates}"
    if dialect != "ansi":
        raise ValueError(f"unknown upsert dialect: {dialect!r}")
    updates = ", ".join(f"{c} = excluded.{c}" for c in cols if c not in key_cols)
    conflict = ", ".join(key_cols)
    if not updates:  # all columns are keys → idempotent insert
        return f"{insert} ON CONFLICT({conflict}) DO NOTHING"
    return f"{insert} ON CONFLICT({conflict}) DO UPDATE SET {updates}"


def write_upsert(
    df: DataFrame,
    connect,
    table: str,
    key_cols: list[str],
    batchsize: int = 5000,
    num_partitions: int | None = None,
    dialect: str = "ansi",
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
    or use :func:`write_jdbc` for plain appends via the JVM path).
    ``dialect`` picks the statement flavor ('ansi' or 'mysql' — see
    :func:`_upsert_sql`; derive it with :func:`upsert_dialect_from_url`)."""
    cols = df.columns
    sql = _upsert_sql(table, cols, key_cols, dialect=dialect)

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
