"""SparkSession factory.

Local testing runs a single JVM (``local[N]``); production targets a
multi-executor cluster reading ~100 TB. The defaults below are chosen so the
same logical plans scale: AQE handles runtime coalescing and skew joins,
shuffle partitions are sized for the local core count (override
``spark.sql.shuffle.partitions`` upward on a real cluster), and Arrow is
enabled for the few Pandas-UDF operators.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

DEFAULT_SHUFFLE_PARTITIONS = int(os.environ.get("SPARK_GRAFT_CPUS", "32"))


def get_spark(
    app_name: str = "translator_tm_provider_pipelines_spark",
    master: str | None = None,
    shuffle_partitions: int | None = None,
    extra_conf: dict[str, str] | None = None,
) -> SparkSession:
    """Build (or reuse) a SparkSession with scale-aware defaults.

    AQE is on so that plans written declaratively re-optimize at runtime:
    post-shuffle partition coalescing, dynamic broadcast-join conversion and
    skew-join splitting — the knobs that make the same code correct at
    sf0.001 and at 100 TB.
    """
    cpus = os.environ.get("SPARK_GRAFT_CPUS", "32")
    builder = (
        SparkSession.builder.appName(app_name)
        .master(master or f"local[{cpus}]")
        .config(
            "spark.sql.shuffle.partitions",
            str(shuffle_partitions or DEFAULT_SHUFFLE_PARTITIONS),
        )
        .config("spark.sql.adaptive.enabled", "true")
        .config("spark.sql.adaptive.coalescePartitions.enabled", "true")
        .config("spark.sql.adaptive.skewJoin.enabled", "true")
        .config("spark.sql.session.timeZone", "UTC")
        .config("spark.sql.execution.arrow.pyspark.enabled", "true")
        .config("spark.driver.memory", os.environ.get("SPARK_DRIVER_MEM", "16g"))
        .config("spark.ui.enabled", "false")
        # Parquet scans: keep splits large enough that task overhead doesn't
        # dominate, small enough that a partition fits executor memory.
        .config("spark.sql.files.maxPartitionBytes", "256m")
    )
    if extra_conf:
        for k, v in extra_conf.items():
            builder = builder.config(k, v)
    spark = builder.getOrCreate()
    spark.sparkContext.setLogLevel("WARN")
    return spark
