"""Driver contract for the spark-graft builder (PySpark target).

``entry(spark)`` — flagship query (cooccurrence metrics chain) at sf0.001.
``queries()`` / ``oracle_sql()`` — the operator registry defined in
``translator_tm_provider_pipelines_spark.plans.testdata_queries``; every
SQL-expressible operator has a DuckDB oracle with identical column names,
types and (rounded) values.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001; driver checks rows>0."""
    return tq.QUERIES["cooccurrence_metrics"](spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2 (+ the
    LLM-data-pipeline extensions)."""
    return dict(tq.QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL for each query (omitted for the two
    approximate/bit-twiddling ops → rows-only check)."""
    return dict(tq.ORACLES)
