"""brat standoff-format source (.ann entity/relation files + .txt text).

The reference's relation-extraction tooling round-trips brat directories
(``relation_extraction/BratToBertConverter.java``,
``BratAssertionAnnotationFileCreator.java``). Spark-first read: whole-file
text rows (one per .ann/.txt) keyed by document id, parsed into entity /
relation / sentence relations with JVM regexps — the per-file explode is
narrow, and annotation corpora are dimension-size next to the document
corpus.

brat lines handled:
- ``T1\ttype 0 11\tcovered text`` — entity (discontinuous spans
  ``start end;start end`` aggregate to min-start/max-end, like the
  reference's ``getAggregateSpan``);
- ``R1\trelation Arg1:T1 Arg2:T2`` — binary relation.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import Window


def _doc_id(path_col: F.Column) -> F.Column:
    base = F.element_at(F.split(path_col, "/"), -1)
    return F.regexp_replace(base, r"\.(ann|txt)$", "")


def read_brat_files(spark: SparkSession, directory: str, suffix: str) -> DataFrame:
    """(doc_id, content) — one row per ``*.<suffix>`` file."""
    df = (
        spark.read.format("text")
        .option("wholetext", "true")
        .load(os.path.join(directory, f"*.{suffix}"))
    )
    return df.select(
        _doc_id(F.input_file_name()).alias("doc_id"), F.col("value").alias("content")
    )


def parse_ann_entities(ann_files: DataFrame) -> DataFrame:
    """.ann T-lines → (doc_id, ann_id, entity_type, start, end,
    covered_text). Discontinuous spans aggregate to their envelope."""
    lines = ann_files.select(
        "doc_id", F.explode(F.split("content", "\n")).alias("line")
    ).where(F.col("line").rlike(r"^T\S+\t"))
    spans = F.regexp_extract(F.col("line"), r"^T\S+\t\S+ ([0-9 ;]+)\t", 1)
    starts = F.transform(
        F.split(spans, ";"), lambda s: F.split(F.trim(s), " ").getItem(0).cast("int")
    )
    ends = F.transform(
        F.split(spans, ";"), lambda s: F.split(F.trim(s), " ").getItem(1).cast("int")
    )
    return lines.select(
        "doc_id",
        F.regexp_extract("line", r"^(T\S+)\t", 1).alias("ann_id"),
        F.regexp_extract("line", r"^T\S+\t(\S+) ", 1).alias("entity_type"),
        F.array_min(starts).alias("start"),
        F.array_max(ends).alias("end"),
        F.regexp_extract("line", r"\t([^\t]*)$", 1).alias("covered_text"),
    )


def parse_ann_relations(ann_files: DataFrame) -> DataFrame:
    """.ann R-lines → (doc_id, rel_id, relation, arg1, arg2)."""
    lines = ann_files.select(
        "doc_id", F.explode(F.split("content", "\n")).alias("line")
    ).where(F.col("line").rlike(r"^R\S+\t"))
    return lines.select(
        "doc_id",
        F.regexp_extract("line", r"^(R\S+)\t", 1).alias("rel_id"),
        F.regexp_extract("line", r"^R\S+\t(\S+) ", 1).alias("relation"),
        F.regexp_extract("line", r"Arg1:(\S+)", 1).alias("arg1"),
        F.regexp_extract("line", r"Arg2:(\S+)", 1).alias("arg2"),
    )


def txt_sentences(txt_files: DataFrame) -> DataFrame:
    """.txt files, one sentence per line (the reference's assumption in
    ``getSentenceAnnotationsOnePerLine``) → (doc_id, sent_start, sent_end,
    sentence_text) with exact character offsets (cumulative line lengths
    + newlines)."""
    lines = txt_files.select(
        "doc_id", F.posexplode(F.split("content", "\n")).alias("line_idx", "sentence_text")
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("line_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    off = F.coalesce(F.sum(F.length("sentence_text") + 1).over(w), F.lit(0))
    return (
        lines.withColumn("sent_start", off.cast("int"))
        .withColumn("sent_end", (F.col("sent_start") + F.length("sentence_text")).cast("int"))
        .where(F.col("sentence_text") != "")
        .select("doc_id", "sent_start", "sent_end", "sentence_text")
    )
