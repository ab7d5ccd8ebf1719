"""Embedding-based dictionary-label quality tooling.

Reference: ``oger/util/LabelFilterByEmbedding.java`` +
``oger/util/EmbeddingUtil.java`` — exploratory tooling that builds a
domain-average word embedding from an ontology subtree's single-token
labels and flags dictionary labels whose embeddings sit far from it
(chemical labels that "don't seem like chemicals"), plus two relational
label-quality analyses over the MolePro chemical-label file.

Quirks preserved (and documented):

- ``createAverageEmbedding`` (LabelFilterByEmbedding.java:35-80) folds
  ``avg = (avg + e) / 2`` over the labels — an EXPONENTIALLY-WEIGHTED
  average biased toward late iteration order, not an arithmetic mean.
  The reference iterates a HashSet (order nondeterministic run to run);
  the engine fixes ascending word order so the fold is reproducible, and
  exposes ``strategy="mean"`` for the unweighted average the method name
  suggests. After folding n vectors the weight of the r-th word is
  2^-(n-r+1) (2^-(n-1) for the first) — at vocabulary scale everything
  but the last ~50 words underflows, which is faithful to the fold.
- ``findOverlappingLabels`` (:89-138) keeps labels used by ≥2 ids,
  prints the top entries by id count with ≤20 example ids; the example
  subList order comes from a HashSet — engine uses sorted ids, and the
  top cutoff is the reference's literal 102 (``count++ > 100`` breaks
  AFTER printing the 102nd row).
- ``findLabelsThatAreEnglishWords`` (:300-322) flags labels exactly
  equal to a dictionary word (case-sensitive ``contains``, unlike the
  dictionary-side lowercase filter in PrOgerDictFileFactory).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

from .similarity import cosine


def read_word_embeddings(
    spark: SparkSession, path: str, delimiter: str = " "
) -> DataFrame:
    """word2vec-text-format embeddings → (word, embedding ARRAY<DOUBLE>).

    EmbeddingUtil.loadEmbeddingFile:30-76: first line is a ``rows dim``
    header, every other line is ``word v1 … vdim``; rows whose column
    count disagrees with the header make the reference throw — here they
    land in no-row silence only if the file is header-consistent, so the
    same check is applied as a filter with the dimension read from the
    header (bounded collect of one line). Distributed parse otherwise."""
    lines = spark.read.text(path).select(F.col("value").alias("line"))
    header = lines.limit(1).collect()[0].line.split(delimiter)
    if len(header) != 2:
        raise ValueError(f"unexpected embedding-file header: {header!r}")
    dim = int(header[1])
    cols = F.split(F.col("line"), delimiter)
    return (
        lines.where(F.size(cols) == dim + 1)
        .select(
            cols.getItem(0).alias("word"),
            F.transform(F.slice(cols, 2, dim), lambda x: x.cast("double")).alias(
                "embedding"
            ),
        )
    )


def overlapping_labels(
    labels: DataFrame,
    min_ids: int = 2,
    sample: int = 20,
    top: int | None = 102,
    specific: list[str] | None = None,
    id_col: str = "concept_id",
    label_col: str = "label",
) -> DataFrame:
    """(label, n_ids, sample_ids): labels shared by ≥ ``min_ids``
    identifiers, ordered by id count descending, each with ≤ ``sample``
    example ids (sorted — the reference samples a HashSet's arbitrary
    head). ``specific`` restricts to a lowercased label list and
    lowercases the label key, exactly like findSpecificOverlappingLabels
    (:140-205); ``top`` keeps the reference's 102-row print cutoff
    (``None`` disables)."""
    key = F.col(label_col)
    base = labels
    if specific is not None:
        key = F.lower(key)
        wanted = [s.lower() for s in specific]
        base = labels.where(F.lower(F.col(label_col)).isin(wanted))
    out = (
        base.select(key.alias("label"), F.col(id_col).alias("id"))
        .groupBy("label")
        .agg(
            F.countDistinct("id").cast("long").alias("n_ids"),
            F.slice(F.array_sort(F.collect_set("id")), 1, sample).alias("sample_ids"),
        )
        .where(F.col("n_ids") >= min_ids)
        .orderBy(F.desc("n_ids"), "label")
    )
    return out.limit(top) if top else out


def english_word_labels(
    labels: DataFrame,
    words: DataFrame,
    id_col: str = "concept_id",
    label_col: str = "label",
) -> DataFrame:
    """(id, label) rows whose label IS a dictionary word — the
    case-sensitive whole-label membership test of
    findLabelsThatAreEnglishWords (:300-322; contrast the
    dictionary-build-side filter, which lowercases). ``words`` is a
    one-column ``word`` frame; broadcast semi-join."""
    w = words.select(F.col("word").alias(label_col))
    return labels.select(F.col(id_col), F.col(label_col)).join(
        F.broadcast(w), label_col, "left_semi"
    )


def domain_average_embedding(
    term_vecs: DataFrame,
    strategy: str = "reference",
    word_col: str = "word",
    vec_col: str = "embedding",
    scale: int = 6,
) -> DataFrame:
    """(d, value): the domain-average embedding over the given term
    vectors (already restricted to the domain subtree's single-token
    labels, the caller's analogue of the descendants loop).

    ``strategy="reference"`` reproduces the ``avg = (avg + e)/2`` fold
    (createAverageEmbedding:35-80) in ascending ``word_col`` order: the
    r-th of n words carries weight 2^-(n-r+1) (first word 2^-(n-1)), so
    the result equals a per-dimension weighted sum — computed
    distributedly from a rank window + power weights, no driver fold.
    ``strategy="mean"`` is the plain arithmetic mean."""
    if strategy not in ("reference", "mean"):
        raise ValueError(f"unknown strategy: {strategy!r}")
    if strategy == "mean":
        parts = term_vecs.select(
            F.posexplode(
                F.transform(F.col(vec_col), lambda x: x.cast("double"))
            ).alias("d", "v")
        )
        return (
            parts.groupBy("d")
            .agg(F.round(F.avg("v"), scale).alias("value"))
            .orderBy("d")
        )
    ranked = term_vecs.select(
        F.row_number().over(Window.orderBy(F.col(word_col))).alias("__r"),
        F.count("*").over(Window.partitionBy()).alias("__n"),
        F.col(vec_col).alias("__v"),
    )
    weight = F.when(
        F.col("__r") == 1, F.pow(F.lit(0.5), F.col("__n") - 1)
    ).otherwise(F.pow(F.lit(0.5), F.col("__n") - F.col("__r") + 1))
    return (
        ranked.select(
            weight.alias("__wt"),
            F.posexplode(
                F.transform(F.col("__v"), lambda x: x.cast("double"))
            ).alias("d", "v"),
        )
        .groupBy("d")
        .agg(F.round(F.sum(F.col("v") * F.col("__wt")), scale).alias("value"))
        .orderBy("d")
    )


def label_embedding_flags(
    labels: DataFrame,
    word_vecs: DataFrame,
    avg_embedding: list[float],
    threshold: float = 0.1,
    id_col: str = "concept_id",
    label_col: str = "label",
    scale: int = 6,
) -> DataFrame:
    """(id, label, cosine): single-token labels whose embedding's cosine
    against the domain average falls below ``threshold`` — the "possible
    bad label" filter (LabelFilterByEmbedding.java:283-296; the reference
    keeps it commented against the MolePro file but computes exactly
    these cosines in main). Single-token = no space, as the reference's
    ``label.indexOf(" ") < 0``; labels without an embedding pass (no
    evidence). Join is on the label word; the avg ships as a literal."""
    single = labels.where(~F.col(label_col).contains(" "))
    joined = single.join(
        word_vecs.select(F.col("word").alias(label_col), "embedding"), label_col
    )
    avg = F.lit([float(x) for x in avg_embedding])
    scored = joined.select(
        F.col(id_col),
        F.col(label_col),
        F.round(cosine(F.col("embedding"), avg), scale).alias("cosine"),
    )
    return scored.where(F.col("cosine") < threshold)
