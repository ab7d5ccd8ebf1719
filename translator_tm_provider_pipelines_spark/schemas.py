"""Explicit StructType schemas for every core entity.

The reference defines its data model as Java classes + closed enums (see
SURVEY.md §1); schemas are code-defined, never inferred. References:

- Document:  /root/reference .../etl/ProcessedDocument.java:26-50
- Status:    .../etl/ProcessingStatus.java:31-49
- Annotation: edu.ucdenver.ccp.nlp.core.annotation.TextAnnotation (external
  lib), cloned at .../etl/PipelineMain.java:1480-1490
- ExtractedSentence: .../etl/fn/ExtractedSentence.java:30-56
- Failure:   .../etl/EtlFailureData.java
"""

from __future__ import annotations

from pyspark.sql import types as T

# ---------------------------------------------------------------------------
# Closed vocabularies (reference enums). Kept as plain frozensets — they are
# validation vocabularies, not types.
# ---------------------------------------------------------------------------

# .../etl/util/DocumentFormat.java:3-5
DOCUMENT_FORMATS = frozenset(
    {
        "BIOCXML",
        "BIONLP",
        "CONLLU",
        "TEXT",
        "OGER_CONLL",
        "BIGQUERY",
        "JSON",
        "KGX",
        "TSV",
        "CONLL03",
    }
)

# .../etl/util/DocumentType.java:3-12 (most-used subset; the column is an
# open string, validated against this set only when ingesting reference data)
DOCUMENT_TYPES = frozenset(
    {
        "TEXT",
        "ACTIONABLE_TEXT",
        "AUGMENTED_TEXT",
        "AUGMENTED_SENTENCE",
        "SECTIONS",
        "SENTENCE",
        "ABBREVIATIONS",
        "CONCEPT_ALL",
        "CONCEPT_ALL_UNFILTERED",
        "CRF",
        "DEPENDENCY_PARSE",
        "BIGQUERY",
        "SENTENCE_COOCCURRENCE",
    }
)

# Workflow status-flag property names (the commonly-used subset of
# DatastoreConstants.java:117-260 / ProcessingStatusFlag.java; the ``flags``
# MAP column is open — these are the canonical keys stage runners use).
STATUS_FLAGS = (
    "text",                  # TEXT_DONE
    "text_aug",              # TEXT_AUG_DONE (P11)
    "filt_unact",            # FILTER_UNACTIONABLE_TEXT_DONE (P6)
    "sections",              # SECTIONS_DONE
    "abbrev",                # ABBREVIATIONS_DONE (X4)
    "dep",                   # DEPENDENCY_PARSE_DONE (X5)
    "sent",                  # SENTENCE_SEGMENTATION_DONE (X1)
    "sent_by_dp",            # SENTENCE_SEGMENTATION_VIA_DEP_PARSE_DONE
    "concept_pp",            # CONCEPT_POST_PROCESSING_DONE (P8)
    "concept_pp_unfiltered",
    "oger_pp1",
    "oger_pp2",
    "concept_cooccur_counts",
    "elasticsearch",
    "oger_done",
    "oger_cs",
    "oger_cimax",
    "oger_cimin",
)

# ---------------------------------------------------------------------------
# Core tables
# ---------------------------------------------------------------------------

SPAN = T.StructType(
    [
        T.StructField("start", T.IntegerType(), False),
        T.StructField("end", T.IntegerType(), False),
    ]
)

# Versioned, (optionally) chunked document blob. On Spark there is no 1 MB
# value limit, so content is a single column; chunk_id/chunk_total are kept
# for ingesting reference-shaped data (splice logic in operators.versioning).
DOCUMENT = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("doc_type", T.StringType(), False),
        T.StructField("doc_format", T.StringType(), False),
        T.StructField("pipeline_key", T.StringType(), False),
        T.StructField("pipeline_version", T.StringType(), False),
        T.StructField("content", T.StringType(), True),
        T.StructField("chunk_id", T.LongType(), False),
        T.StructField("chunk_total", T.LongType(), False),
        T.StructField("collections", T.ArrayType(T.StringType()), True),
    ]
)

# Per-document workflow state; ~50 boolean done-flags in the reference
# (DatastoreConstants.java:120-260) modeled as a MAP column.
STATUS = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("pub_year", T.StringType(), True),  # default "2155"
        T.StructField("pub_types", T.ArrayType(T.StringType()), True),
        T.StructField("flags", T.MapType(T.StringType(), T.BooleanType()), True),
        T.StructField("collections", T.ArrayType(T.StringType()), True),
    ]
)

# Stand-off span annotation: the exploded relational form of every BIONLP
# blob. annot_type is "sentence" / a section name / "concept".
ANNOTATION = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("annot_type", T.StringType(), False),
        T.StructField("concept_id", T.StringType(), True),
        T.StructField("spans", T.ArrayType(SPAN), False),
        T.StructField("covered_text", T.StringType(), True),
    ]
)

# Relation-candidate sentence (ExtractedSentence.java:30-56). Flat row; the
# 19-column TSV layout of toTsv() (:147-190) is produced by
# operators.sentences.extracted_sentence_tsv.
EXTRACTED_SENTENCE = T.StructType(
    [
        T.StructField("sentence_id", T.StringType(), False),  # sha256
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("entity1_id", T.StringType(), False),
        T.StructField("entity1_text", T.StringType(), True),
        T.StructField("entity1_spans", T.ArrayType(SPAN), False),
        T.StructField("entity2_id", T.StringType(), False),
        T.StructField("entity2_text", T.StringType(), True),
        T.StructField("entity2_spans", T.ArrayType(SPAN), False),
        T.StructField("keyword", T.StringType(), True),
        T.StructField("sentence_text", T.StringType(), False),
        T.StructField("sentence_with_placeholders", T.StringType(), True),
        T.StructField("doc_zone", T.StringType(), True),
        T.StructField("pub_types", T.ArrayType(T.StringType()), True),
        T.StructField("pub_year", T.StringType(), True),
        T.StructField("sentence_span_start", T.IntegerType(), True),
        T.StructField("other_entity_ids", T.ArrayType(T.StringType()), True),
        T.StructField("other_entity_texts", T.ArrayType(T.StringType()), True),
        T.StructField("other_entity_spans", T.ArrayType(SPAN), True),
    ]
)

# Error side-channel (EtlFailureData.java): every fallible operator returns
# an (output, failures) pair; failures are unioned into one table.
FAILURE = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), False),
        T.StructField("stage", T.StringType(), False),
        T.StructField("message", T.StringType(), True),
        T.StructField("stacktrace", T.StringType(), True),
    ]
)

# Cooccurrence chain intermediates ------------------------------------------

# One row per (level text unit, concept set) — the "doc-to-concept" TSV of
# ConceptCooccurrenceCountsFn.java:64-65.
TEXT_UNIT_CONCEPTS = T.StructType(
    [
        T.StructField("text_id", T.StringType(), False),
        T.StructField("concept_ids", T.ArrayType(T.StringType()), False),
    ]
)

CONCEPT_PAIR_METRICS = T.StructType(
    [
        T.StructField("pair_id", T.StringType(), False),
        T.StructField("concept1", T.StringType(), False),
        T.StructField("concept2", T.StringType(), False),
        T.StructField("pair_count", T.LongType(), False),
        T.StructField("concept1_count", T.LongType(), False),
        T.StructField("concept2_count", T.LongType(), False),
        T.StructField("ngd", T.DoubleType(), True),
        T.StructField("pmi", T.DoubleType(), True),
        T.StructField("npmi", T.DoubleType(), True),
        T.StructField("npmi_max", T.DoubleType(), True),
        T.StructField("md", T.DoubleType(), True),
        T.StructField("lfmd", T.DoubleType(), True),
    ]
)

# LLM-data-pipeline extensions ----------------------------------------------

# Opaque multimodal payloads: binary blob + typed metadata. Decoders are
# Pandas-UDF stages over mapInPandas (operators.multimodal).
MEDIA = T.StructType(
    [
        T.StructField("media_id", T.StringType(), False),
        T.StructField("modality", T.StringType(), False),  # image|audio|video
        T.StructField("mime_type", T.StringType(), True),
        T.StructField("payload", T.BinaryType(), True),
        T.StructField("width", T.IntegerType(), True),
        T.StructField("height", T.IntegerType(), True),
        T.StructField("duration_ms", T.LongType(), True),
        T.StructField("meta", T.MapType(T.StringType(), T.StringType()), True),
    ]
)

EMBEDDING = T.StructType(
    [
        T.StructField("vec_id", T.LongType(), False),
        T.StructField("embedding", T.ArrayType(T.FloatType()), False),
        T.StructField("label", T.IntegerType(), True),
    ]
)
