"""End-to-end pipeline compositions: the reference's multi-stage dataflows
as single DataFrame programs (SURVEY §3).

Each function composes the operator layer exactly the way the reference
chains its Beam pipelines, so one call replaces a sequence of Dataflow
jobs + Datastore round-trips. Stages hand off DataFrames — Catalyst sees
the WHOLE chain and optimizes across the old job boundaries (e.g. the
concept-recognition scan fuses with segmentation's tokenizer pass when
both read the same documents).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

from ..operators import conceptfilters as cf
from ..operators import cooccurrence as co
from ..operators import ner, sentences
from ..operators.spans import containment_join


def documents_to_cooccurrence_metrics(
    docs: DataFrame,
    dictionary: DataFrame,
    ancestors: DataFrame | None = None,
    doc_id: str = "doc_id",
    text: str = "content",
    min_match_len: int = 4,
) -> DataFrame:
    """The full analytic heart in one program: raw documents → dictionary
    concept recognition → post-processing cleanup → document-level
    concept sets → cooccurrence pair metrics (NGD/PMI/NPMI/MD/LFMD).

    Reference equivalent: OGER pipeline → ConceptPostProcessing pipeline →
    ConceptCooccurrenceCounts pipeline → ConceptCooccurrenceMetrics
    pipeline (four Dataflow jobs, three Datastore/TSV hand-offs)."""
    annots = ner.dictionary_concept_recognition(docs, dictionary, doc_id=doc_id, text=text)
    annots = cf.remove_matches_less_than(annots, min_match_len)
    annots = cf.remove_nested_annotations(annots)
    units = annots.select(
        F.col("doc_id").alias("text_id"), "concept_id"
    ).distinct()
    return co.cooccurrence_chain_from_rows(units, ancestors=ancestors)


def documents_to_sentence_cooccurrence(
    docs: DataFrame,
    dictionary: DataFrame,
    doc_id: str = "doc_id",
    text: str = "content",
) -> DataFrame:
    """SENTENCE-level cooccurrence (CooccurLevel.SENTENCE,
    ConceptCooccurrenceCountsFn.java:43-60): segment → recognize → assign
    concepts to containing sentences (J3) → per-sentence concept sets →
    metrics. Sentence text-unit ids use the reference's
    ``docId_LEVEL_sha256`` scheme (functions.hashing.level_text_id)."""
    from ..functions.hashing import level_text_id

    sents = sentences.segment_sentences(docs, doc_id=doc_id, text=text)
    annots = ner.dictionary_concept_recognition(docs, dictionary, doc_id=doc_id, text=text)
    s = sents.select(
        "doc_id",
        level_text_id(
            F.col("doc_id"),
            F.lit("SENTENCE"),
            F.col("start"),
            F.col("end"),
            F.col("sentence"),
        ).alias("id"),
        "start",
        "end",
    )
    c = annots.select(
        "doc_id",
        F.col("concept_id").alias("id"),
        F.col("spans").getItem(0).getField("start").alias("start"),
        F.col("spans").getItem(0).getField("end").alias("end"),
    )
    contained = containment_join(s, c, on=("doc_id",))
    units = contained.select(
        F.col("outer_id").alias("text_id"), F.col("inner_id").alias("concept_id")
    ).distinct()
    return co.cooccurrence_chain_from_rows(units)


def extraction_pipeline(
    docs: DataFrame,
    dictionary: DataFrame,
    x_prefixes: list[str],
    y_prefixes: list[str],
    x_placeholder: str,
    y_placeholder: str,
    keywords: list[str] | None = None,
    doc_id: str = "doc_id",
    text: str = "content",
) -> DataFrame:
    """documents → segmentation → concept recognition → relation-candidate
    extraction (the SENTENCE_EXTRACTION dataflow end-to-end)."""
    sents = sentences.segment_sentences(docs, doc_id=doc_id, text=text)
    annots = ner.dictionary_concept_recognition(docs, dictionary, doc_id=doc_id, text=text)
    return sentences.extract_sentences(
        sents,
        annots,
        x_prefixes=x_prefixes,
        y_prefixes=y_prefixes,
        x_placeholder=x_placeholder,
        y_placeholder=y_placeholder,
        keywords=keywords,
    )
