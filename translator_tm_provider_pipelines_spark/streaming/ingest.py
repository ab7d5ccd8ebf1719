"""Streaming ingest: windowed/sessionized event aggregation and the
incremental document pipeline (SURVEY §2.8 — a Spark-native extension; the
reference batch semantics are preserved by reusing the same stage
functions inside ``foreachBatch``).

Design for scale: state is bounded by watermarks (late data beyond the
watermark is dropped deterministically); session windows use the built-in
``session_window`` aggregation (RocksDB-backed state store on a real
cluster); the foreachBatch path gives exactly-once table sinks when the
sink is transactional (e.g. overwrite-by-partition parquet).
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql.streaming import DataStreamWriter


def windowed_event_counts_stream(
    events: DataFrame,
    window: str = "1 hour",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of the batch ``windowed_event_counts`` query:
    tumbling-window counts + value sums per event type with a watermark
    bound on state."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.window(ts_col, window).alias("win"), "event_type")
        .agg(F.count("*").alias("n_events"), F.sum("value").alias("sum_value"))
        .select(
            F.col("win.start").alias("window_start"),
            F.col("win.end").alias("window_end"),
            "event_type",
            "n_events",
            "sum_value",
        )
    )


def sessionized_events_stream(
    events: DataFrame,
    gap: str = "30 minutes",
    watermark: str = "2 hours",
    ts_col: str = "ts",
) -> DataFrame:
    """Streaming twin of gap-based sessionization: the built-in
    ``session_window`` (dynamic gap-merged windows) replaces the batch
    lag+running-sum construction."""
    return (
        events.withWatermark(ts_col, watermark)
        .groupBy(F.session_window(ts_col, gap).alias("sess"), "user_id")
        .agg(F.count("*").alias("n_events"))
        .select(
            "user_id",
            F.col("sess.start").alias("session_start"),
            F.col("sess.end").alias("session_end"),
            "n_events",
        )
    )


def incremental_pipeline(
    stream: DataFrame,
    stage_fn: Callable[[DataFrame], DataFrame],
    sink: Callable[[DataFrame, int], None],
    checkpoint_dir: str,
) -> DataStreamWriter:
    """foreachBatch driver: each micro-batch of newly-ingested documents
    runs the SAME batch stage operator (e.g. segment_sentences ∘
    extract_sentences) and lands through ``sink(batch_df, batch_id)``.
    This is the Spark-native replacement for the reference's status-flag
    redo loop: new documents flow through stages continuously instead of
    via collection-at-a-time reruns."""

    def run_batch(batch_df: DataFrame, batch_id: int) -> None:
        sink(stage_fn(batch_df), batch_id)

    return (
        stream.writeStream.foreachBatch(run_batch)
        .option("checkpointLocation", checkpoint_dir)
        .trigger(availableNow=True)
    )
