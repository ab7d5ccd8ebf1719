"""Generic file loader (S6) — .../etl/LoadFilesPipeline.java:94-116
(FileIO.match over ``<dir>/*<suffix>`` → one document per file, id =
basename minus suffix).

Spark-first: the binaryFile source gives a distributed file listing +
contents; decoding and id derivation are column expressions. For huge file
counts the listing parallelizes over executors, unlike a driver-side glob.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F


def load_files(
    spark: SparkSession,
    directory: str,
    suffix: str = ".txt",
    encoding: str = "UTF-8",
) -> DataFrame:
    """(doc_id, content) per ``*<suffix>`` file under ``directory``."""
    raw = spark.read.format("binaryFile").load(
        directory.rstrip("/") + "/*" + suffix
    )
    base = F.element_at(F.split(F.col("path"), "/"), -1)
    return raw.select(
        F.substring(base, 1, F.length(base) - len(suffix)).alias("doc_id"),
        F.decode(F.col("content"), encoding).alias("content"),
    )
