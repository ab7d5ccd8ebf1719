"""Annotation-repo batch tooling: batch-size catalog, inter-annotator
overlap matrix, IDF-threshold concept filtering, overlap-sentence
selection, and the annotation-file PMID-reference fixer.

Reference (relation_extraction/annot_batch_cli/ + one-off):
- ``RepoStatsCommand.java:1`` — per-annotator batch sentence counts and the
  batch×batch sentence-id overlap matrix printed by the ``stats`` command.
- ``BatchCreateCommand.java:1`` — the ``create`` command's reusable
  semantics: prefix→allowed-concept-ids from an IDF file + threshold
  (addConceptIdsAboveIdfThreshold:246-263), already-used sentence-id
  exclusion (getAlreadyInUseSentenceIds:486-494), redundant-sentence
  selection for inter-annotator agreement (getOverlappingSentences:354-399).
- ``OneOffAnnotationFileFixer.java:1`` — strip `` -- PMID:\\d+`` line
  suffixes and shift downstream annotation spans.

The file-system walk of the reference (annotator dir / batch dir / .txt
files) becomes a DataFrame of lines keyed by (annotator, batch); the brat
reading itself lives in :mod:`..sources.brat` and the batch *writer* in
:mod:`.relext`. Everything here is native column expressions — one
equi-join on sentence id for the overlap matrix, no UDFs.
"""

from __future__ import annotations

from collections.abc import Iterable

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

from ..functions.staging import stage

#: Lines holding only this marker terminate an annotation file and are not
#: sentences (RepoStatsCommand.countSentences:172-184).
DONE_MARKER = "DONE"

#: The PMID back-reference suffix the one-off fixer removes
#: (OneOffAnnotationFileFixer.java:48).
PMID_SUFFIX_RE = r" -- PMID:\d+$"


def sentence_identifier(line: Column) -> Column:
    """sha256 hex of the sentence text — the Elasticsearch sentence id
    (ElasticsearchDocumentCreatorFn.computeSentenceIdentifier, reused by
    RepoStatsCommand.getSentenceIds:377-390)."""
    return F.sha2(line, 256)


def valid_sentence_lines(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Drop blank lines and bare ``DONE`` markers — the lines that do not
    count as sentences (RepoStatsCommand.countSentences:172-184)."""
    c = F.col(line_col)
    return lines.where((F.trim(c) != "") & (c != DONE_MARKER))


def batch_sentence_counts(
    lines: DataFrame,
    annotator_col: str = "annotator",
    batch_col: str = "batch",
    line_col: str = "line",
) -> DataFrame:
    """(annotator, batch, n_sentences) — the ``stats`` command's batch-size
    catalog (RepoStatsCommand.countBatchSizes:126-142). One map-side
    combining groupBy; annotator/batch cardinality is human-scale."""
    return (
        valid_sentence_lines(lines, line_col)
        .groupBy(
            F.col(annotator_col).alias("annotator"), F.col(batch_col).alias("batch")
        )
        .agg(F.count("*").alias("n_sentences"))
    )


def batch_sentence_ids(
    lines: DataFrame,
    annotator_col: str = "annotator",
    batch_col: str = "batch",
    line_col: str = "line",
) -> DataFrame:
    """Distinct (batch_key, sentence_id) where batch_key =
    ``annotator_batch`` (RepoStatsCommand.linkAnnotatorToSentenceIds:347-363)
    and sentence_id is the sha256 sentence hash."""
    v = valid_sentence_lines(lines, line_col)
    return v.select(
        F.concat_ws("_", F.col(annotator_col), F.col(batch_col)).alias("batch_key"),
        sentence_identifier(F.col(line_col)).alias("sentence_id"),
    ).distinct()


def batch_overlap_matrix(
    lines: DataFrame,
    annotator_col: str = "annotator",
    batch_col: str = "batch",
    line_col: str = "line",
) -> DataFrame:
    """The full batch×batch overlap matrix as rows (batch_a, batch_b,
    n_overlap) including the diagonal and zero cells — exactly the matrix
    the ``stats`` command prints (findOverlappingBatches:205-222).

    Shape: overlaps come from ONE equi-join of the distinct id relation
    with itself on sentence_id (pair volume is bounded by batches-per-
    sentence², small by construction); the dense grid comes from a
    broadcast cross of the dimension-sized key list, so zero cells cost no
    shuffle."""
    # LAZY localCheckpoint (r12, guide §1.2): the distinct id relation
    # feeds both self-join sides AND the key grid — three evaluations of
    # the explode+sha256+distinct tower without it
    ids = stage(
        batch_sentence_ids(lines, annotator_col, batch_col, line_col), eager=False
    )
    a = ids.select(F.col("batch_key").alias("batch_a"), "sentence_id")
    b = ids.select(F.col("batch_key").alias("batch_b"), "sentence_id")
    ov = a.join(b, "sentence_id").groupBy("batch_a", "batch_b").agg(
        F.count("*").alias("__n")
    )
    keys = ids.select("batch_key").distinct()
    grid = keys.select(F.col("batch_key").alias("batch_a")).crossJoin(
        F.broadcast(keys.select(F.col("batch_key").alias("batch_b")))
    )
    return grid.join(ov, ["batch_a", "batch_b"], "left").select(
        "batch_a",
        "batch_b",
        F.coalesce("__n", F.lit(0)).cast("long").alias("n_overlap"),
    )


def allowed_concepts_by_idf(
    idf: DataFrame,
    idf_threshold: float,
    ontology_prefixes: Iterable[str] | None = None,
    input_class_ids: Iterable[str] | DataFrame | None = None,
    concept_col: str = "concept_id",
    idf_col: str = "idf",
    level_col: str | None = "level",
    document_level: str = "document",
) -> DataFrame:
    """(prefix, concept_id) concepts allowed in a new annotation batch —
    BatchCreateCommand.addConceptIdsAboveIdfThreshold:246-263:

    - with ``input_class_ids`` (the GO_CC/GO_BP namespace lists): keep ids
      in the list, and when ``idf_threshold`` >= 0 additionally require
      idf > threshold at the document level
      (populatePrefixToIdMapBasedOnClassListAndIdf:306-323);
    - otherwise, when ``idf_threshold`` > 0: keep ids whose prefix is in
      ``ontology_prefixes`` with idf > threshold at the document level
      (populatePrefixToIdMapBasedOnOntPrefixAndIdf:275-293);
    - otherwise no filtering was requested → empty result (the reference
    adds nothing to the map).

    ``level_col=None`` skips the level predicate for IDF frames computed at
    a single level (e.g. :func:`.cooccurrence.concept_idf` output).
    ``input_class_ids`` may be a Python iterable (broadcast isin) or a
    DataFrame with ``concept_col`` (left-semi join).

    Relational counterpart of
    :func:`..sources.elastic.allowable_concept_ids_map`, which collects the
    same selection into the driver-side dict the ES search client needs;
    use this form when the allowed set feeds further joins."""
    cid = F.col(concept_col)
    prefix = F.split(cid, ":").getItem(0)
    level_ok = (
        F.lit(True) if level_col is None else (F.col(level_col) == document_level)
    )
    idf_ok = (F.col(idf_col) > F.lit(float(idf_threshold))) & level_ok

    if input_class_ids is not None:
        if isinstance(input_class_ids, DataFrame):
            base = idf.join(
                input_class_ids.select(F.col(concept_col)).distinct(),
                concept_col,
                "left_semi",
            )
        else:
            base = idf.where(cid.isin(*list(input_class_ids)))
        if idf_threshold >= 0:
            base = base.where(idf_ok)
    elif idf_threshold > 0:
        base = idf.where(idf_ok)
        if ontology_prefixes is not None:
            base = base.where(prefix.isin(*list(ontology_prefixes)))
    else:
        return idf.sparkSession.createDataFrame(
            [], "prefix string, concept_id string"
        )
    return base.select(
        prefix.alias("prefix"), cid.alias("concept_id")
    ).distinct()


def already_used_sentence_ids(lines: DataFrame, line_col: str = "line") -> DataFrame:
    """Distinct sentence ids across every batch of an association directory
    — the exclusion set for new-batch creation
    (BatchCreateCommand.getAlreadyInUseSentenceIds:486-494)."""
    return (
        valid_sentence_lines(lines, line_col)
        .select(sentence_identifier(F.col(line_col)).alias("sentence_id"))
        .distinct()
    )


def overlap_sentences(
    batches: DataFrame,
    percent_overlap: float,
    batch_col: str = "batch_key",
    id_col: str = "sentence_id",
) -> DataFrame:
    """Sentence ids to annotate redundantly for inter-annotator agreement
    (BatchCreateCommand.getOverlappingSentences:354-399):

    - ≥ 2 prior batches: the intersection of the first two batch keys
      (ordered lexicographically, as the reference's sorted directory walk
      yields them);
    - exactly 1 prior batch: round(n × percent_overlap) of its sentences.
      The reference draws them with an unseeded ``Random`` (:408-417); for
      a reproducible pipeline we take the first k in sha256-of-id order —
      an arbitrary-but-deterministic uniform choice, documented deviation.

    Input: (batch_key, sentence_id) rows of the PRIOR batches (the current
    empty batch excluded, as in getBatchDirectories:430-449). A prior batch
    is a human annotation batch (10²–10³ sentences), so the single-partition
    ordering window in the 1-batch path is dimension-sized by construction.
    """
    keys = [r[0] for r in batches.select(batch_col).distinct().orderBy(batch_col).collect()]
    if not keys:
        return batches.select(F.col(id_col).alias("sentence_id")).limit(0)
    if len(keys) == 1:
        one = batches.where(F.col(batch_col) == keys[0]).select(id_col).distinct()
        n = one.count()
        k = round(n * percent_overlap)
        w = Window.orderBy(F.sha2(F.col(id_col), 256))
        return (
            one.withColumn("__rn", F.row_number().over(w))
            .where(F.col("__rn") <= k)
            .select(F.col(id_col).alias("sentence_id"))
        )
    a = batches.where(F.col(batch_col) == keys[0]).select(id_col).distinct()
    b = batches.where(F.col(batch_col) == keys[1]).select(id_col).distinct()
    return a.join(b, id_col, "left_semi").select(F.col(id_col).alias("sentence_id"))


def remove_pmid_references(
    docs: DataFrame,
    annotations: DataFrame | None = None,
    text_col: str = "text",
    id_col: str = "doc_id",
    spans_col: str = "spans",
) -> DataFrame | tuple[DataFrame, DataFrame]:
    """Strip `` -- PMID:\\d+`` suffixes from every line of the document
    text, and (when an annotations frame is given) shift the spans of
    annotations that start after an edited line left by the cumulative
    removed length — OneOffAnnotationFileFixer.removePmidReferences:29-69.
    (The reference loop iterates ``i = sentences.length`` downward and
    resets instead of accumulating its start-index counter; this port
    implements the documented intent with correct line offsets.)

    Entirely per-row array expressions: the line table (line end position,
    cumulative removed chars) is built per document and consulted per span
    — no shuffle beyond the doc-id equi-join for the annotations frame.

    Returns the fixed docs frame, or (docs, annotations) when
    ``annotations`` is provided. Annotation rows must carry ``id_col`` and
    an ``ARRAY<STRUCT<start,end>>`` ``spans_col``."""
    lines = F.split(F.col(text_col), "\n")
    cleaned = F.transform(lines, lambda l: F.regexp_replace(l, PMID_SUFFIX_RE, ""))
    # per-line struct: end = original line end offset, cum = removed chars in
    # this line and every line above it. Built with one prefix-sum aggregate.
    lens = F.transform(lines, F.length)
    removed = F.zip_with(lines, cleaned, lambda a, b: F.length(a) - F.length(b))
    line_table = F.aggregate(
        F.zip_with(lens, removed, lambda l, r: F.struct(l.alias("len"), r.alias("rm"))),
        F.struct(
            F.lit(0).alias("pos"),
            F.lit(0).alias("cum"),
            F.array().cast("array<struct<end:int,cum:int>>").alias("rows"),
        ),
        lambda acc, x: F.struct(
            (acc["pos"] + x["len"] + 1).alias("pos"),
            (acc["cum"] + x["rm"]).alias("cum"),
            F.concat(
                acc["rows"],
                F.array(
                    F.struct(
                        (acc["pos"] + x["len"]).cast("int").alias("end"),
                        (acc["cum"] + x["rm"]).cast("int").alias("cum"),
                    )
                ),
            ).alias("rows"),
        ),
        lambda acc: acc["rows"],
    )
    fixed_docs = docs.withColumn(text_col, F.array_join(cleaned, "\n"))
    if annotations is None:
        return fixed_docs

    tables = docs.select(F.col(id_col), line_table.alias("__lt"))
    joined = annotations.join(tables, id_col, "left")

    def shifted(sp):
        # reference condition: annot start strictly after line end
        # (annot.getAggregateSpan().getSpanStart() > sentenceStart + len)
        shift = F.coalesce(
            F.array_max(
                F.filter(F.col("__lt"), lambda e: e["end"] < sp["start"])
            )["cum"],
            F.lit(0),
        )
        return F.struct(
            (sp["start"] - shift).cast("int").alias("start"),
            (sp["end"] - shift).cast("int").alias("end"),
        )

    fixed_annots = joined.withColumn(
        spans_col, F.transform(F.col(spans_col), shifted)
    ).drop("__lt")
    return fixed_docs, fixed_annots
