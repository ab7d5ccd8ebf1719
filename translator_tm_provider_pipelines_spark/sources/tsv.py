"""Two-column TSV sources (S7/S8) — .../etl/fn/PCollectionUtil.java:54-175.

The reference reads key/value TSVs (optionally gzipped; gzip is transparent
to Spark's text/csv readers) and builds either KV pairs or key→set-of-values
via a secondary delimiter. Line-set side inputs (S8) become broadcast-able
single-column frames.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T


def two_column_tsv(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "value",
) -> DataFrame:
    """S7a (fromTwoColumnFiles, PCollectionUtil.java:113-140): one (k, v)
    row per line."""
    schema = T.StructType(
        [
            T.StructField(key_col, T.StringType(), False),
            T.StructField(value_col, T.StringType(), True),
        ]
    )
    return spark.read.csv(path, sep="\t", schema=schema, header=False)


def key_to_set_tsv(
    spark: SparkSession,
    path: str,
    key_col: str = "key",
    value_col: str = "values",
    delimiter: str = "|",
) -> DataFrame:
    """S7b (fromKeyToSetTwoColumnFiles, PCollectionUtil.java:142-175): value
    column split on a secondary delimiter into ARRAY<STRING>."""
    import re

    raw = two_column_tsv(spark, path, key_col, "_raw")
    return raw.select(
        key_col, F.split(F.col("_raw"), re.escape(delimiter)).alias(value_col)
    )


def doc_to_concept_tsv(spark: SparkSession, path: str) -> DataFrame:
    """The cooccurrence-counts hand-off file: ``textId \\t c1|c2|...``
    (ConceptCooccurrenceCountsFn.java:64-65; golden fixtures at reference
    src/test/resources/cooccurrence-count-sample-files/)."""
    return key_to_set_tsv(spark, path, key_col="text_id", value_col="concept_ids")


def line_set(spark: SparkSession, path: str, col: str = "value") -> DataFrame:
    """S8 (createPCollectionViewSet, PCollectionUtil.java:54-110): distinct
    lines as a one-column frame; consumers broadcast-join it instead of
    collecting a driver-side set."""
    return spark.read.text(path).select(F.col("value").alias(col)).distinct()
