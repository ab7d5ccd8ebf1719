"""Export family (SURVEY §2.1 K2-K5, §2.4 A10): concept count distribution,
BigQuery 4-table relational annotation export, KGX node/edge serialization,
Elasticsearch sentence JSON.

Reference:
- count distribution: .../etl/ConceptCountDistributionPipeline.java:60-135
  (label default "UKNOWN" [sic] — the typo is the reference's)
- BigQuery export: .../etl/fn/BigQueryExportFileBuilderFn.java +
  .../etl/util/serialization/BigQueryLoadBuilder.java:48-75; table schemas
  doc/bigquery/schema/{annotation,in-section,relation,ancestor}-schema.json
- KGX: kg/KgxNode.java:17-22 (id, name, category + padding),
  kg/KgxEdge.java:42-62 (subject, edge label, object, relation, id,
  association type, evidence count, '|'-joined evidence ids)
- ES JSON: .../etl/fn/ElasticsearchDocumentCreatorFn.createJsonDocument
  :161-180 — Gson JSON with '%' → '%25' and '=' → '%3D' (URL-encoding for
  the bulk API)

All exports are projections/joins of the annotation substrate — no UDFs.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .spans import containment_join


# ---------------------------------------------------------------------------
# A10 + J7 — concept count distribution
# ---------------------------------------------------------------------------


def concept_count_distribution(
    unit_concepts: DataFrame, labels: DataFrame | None = None
) -> DataFrame:
    """(count, concept_id, label) — per-concept distinct-document counts
    decorated with labels; missing label → 'UKNOWN' (reference typo,
    ConceptCountDistributionPipeline.createConceptToDocumentCountLines:
    80-105). Labels are a small vocabulary table → broadcast left join."""
    counts = unit_concepts.groupBy("concept_id").agg(
        F.count_distinct("text_id").alias("count")
    )
    if labels is not None:
        counts = counts.join(F.broadcast(labels), "concept_id", "left")
        label = F.coalesce(F.col("label"), F.lit("UKNOWN"))
    else:
        label = F.lit("UKNOWN")
    return counts.select("count", "concept_id", label.alias("label"))


# ---------------------------------------------------------------------------
# K5 — BigQuery 4-table relational annotation export
# ---------------------------------------------------------------------------


def _annotation_id(
    doc_id: Column, layer: Column, annot_type: Column, start: Column, end: Column, text: Column
) -> Column:
    return F.sha2(
        F.concat_ws(
            "|", doc_id, layer, annot_type, start.cast("string"), end.cast("string"), text
        ),
        256,
    )


def bigquery_annotation_table(
    annots: DataFrame, layer: str, annotator: str = "TM_PROVIDER"
) -> DataFrame:
    """annotation-schema.json row per annotation: (annotation_id,
    annotator_name, document_id, annotation_layer, annotation_type,
    span_start, span_end, covered_text). Multi-span annotations use the
    aggregate span (the serializer's span flattening)."""
    start = F.array_min(F.transform("spans", lambda s: s["start"]))
    end = F.array_max(F.transform("spans", lambda s: s["end"]))
    a_type = F.coalesce(F.col("concept_id"), F.col("annot_type"))
    return annots.select(
        _annotation_id(F.col("doc_id"), F.lit(layer), a_type, start, end, F.col("covered_text")).alias(
            "annotation_id"
        ),
        F.lit(annotator).alias("annotator_name"),
        F.col("doc_id").alias("document_id"),
        F.lit(layer).alias("annotation_layer"),
        a_type.alias("annotation_type"),
        start.cast("int").alias("span_start"),
        end.cast("int").alias("span_end"),
        F.col("covered_text"),
    )


def bigquery_in_section_table(
    concept_table: DataFrame, section_table: DataFrame
) -> DataFrame:
    """in-section-schema.json: (inner_annot_id, outer_annot_id) — concept
    annotations contained in section/sentence annotations. Containment
    equi-joins on document_id with the span predicate."""
    inner = concept_table.select(
        F.col("annotation_id").alias("id"),
        F.col("document_id").alias("doc"),
        F.col("span_start").alias("start"),
        F.col("span_end").alias("end"),
    )
    outer = section_table.select(
        F.col("annotation_id").alias("id"),
        F.col("document_id").alias("doc"),
        F.col("span_start").alias("start"),
        F.col("span_end").alias("end"),
    )
    joined = containment_join(outer, inner, on=("doc",))
    return joined.select(
        F.col("inner_id").alias("inner_annot_id"),
        F.col("outer_id").alias("outer_annot_id"),
    )


def bigquery_relation_table(
    pairs: DataFrame, relation_type: str, annotator: str = "TM_PROVIDER"
) -> DataFrame:
    """relation-schema.json: (source_annot_id, annotator_name, type,
    target_annot_id) — e.g. abbreviation long-form → short-form links."""
    return pairs.select(
        F.col("source_annot_id"),
        F.lit(annotator).alias("annotator_name"),
        F.lit(relation_type).alias("type"),
        F.col("target_annot_id"),
    )


def bigquery_ancestor_table(ancestors: DataFrame) -> DataFrame:
    """ancestor-schema.json passthrough: (concept_id, ancestor_id)."""
    return ancestors.select("concept_id", "ancestor_id").distinct()


# ---------------------------------------------------------------------------
# KGX node/edge export
# ---------------------------------------------------------------------------


def kgx_nodes(concepts: DataFrame, labels: DataFrame, category: str) -> DataFrame:
    """KGX node rows (KgxNode.java:17-22): (id, name, category); names from
    the (broadcast) label map."""
    return (
        concepts.select(F.col("concept_id").alias("id"))
        .distinct()
        .join(F.broadcast(labels.select(F.col("concept_id").alias("id"), "label")), "id", "left")
        .select(
            "id",
            F.coalesce("label", F.lit("UKNOWN")).alias("name"),
            F.lit(category).alias("category"),
        )
    )


def kgx_node_tsv(nodes: DataFrame, column_count: int = 3) -> DataFrame:
    """toKgxString(columnCount): id, name, category then tab-padding out to
    ``column_count`` columns."""
    line = F.concat_ws("\t", "id", "name", "category")
    if column_count > 3:
        line = F.concat(line, F.lit("\t" * (column_count - 3)))
    return nodes.select(line.alias("line"))


def kgx_edges(
    assertions: DataFrame,
    evidence: DataFrame,
    edge_label: str,
    relation_curie: str,
    association_type: str,
) -> DataFrame:
    """KGX edge rows (KgxEdge.toKgxString): subject, edge_label, object,
    relation, id (= assertion id), association type, evidence count and
    '|'-joined evidence ids. Evidence aggregates per assertion — one
    shuffle keyed by assertion_id."""
    ev = evidence.groupBy("assertion_id").agg(
        F.count("*").alias("evidence_count"),
        F.array_join(F.array_sort(F.collect_list("evidence_id")), "|").alias("evidence_ids"),
    )
    return assertions.join(ev, "assertion_id", "left").select(
        F.col("subject_curie").alias("subject"),
        F.lit(edge_label).alias("edge_label"),
        F.col("object_curie").alias("object"),
        F.lit(relation_curie).alias("relation"),
        F.col("assertion_id").alias("id"),
        F.lit(association_type).alias("biolink_association_type"),
        F.coalesce("evidence_count", F.lit(0)).cast("long").alias("evidence_count"),
        F.coalesce("evidence_ids", F.lit("")).alias("evidence_ids"),
    )


def kgx_edge_tsv(edges: DataFrame) -> DataFrame:
    line = F.concat_ws(
        "\t",
        "subject", "edge_label", "object", "relation", "id",
        "biolink_association_type",
        F.col("evidence_count").cast("string"),
        "evidence_ids",
    )
    return edges.select(line.alias("line"))


# ---------------------------------------------------------------------------
# K4 — Elasticsearch sentence JSON
# ---------------------------------------------------------------------------


def es_sentence_json(sentences_with_concepts: DataFrame) -> DataFrame:
    """JSON document per sentence for the ES bulk load
    (ElasticsearchDocumentCreatorFn.createJsonDocument:161-180): the
    sentence struct serialized to JSON, then '%' → '%25' and '=' → '%3D'
    (order matters: percent first, exactly as the reference). Input needs
    (sentence_id, doc_id, sentence, start, end, concepts ARRAY<STRUCT>)."""
    js = F.to_json(
        F.struct(
            F.col("sentence_id").alias("id"),
            F.col("doc_id").alias("documentId"),
            F.col("sentence").alias("text"),
            F.col("start").alias("spanStart"),
            F.col("end").alias("spanEnd"),
            F.col("concepts").alias("annotations"),
        )
    )
    escaped = F.regexp_replace(F.regexp_replace(js, "%", "%25"), "=", "%3D")
    return sentences_with_concepts.select(
        F.col("sentence_id"), escaped.alias("json")
    )


# ---------------------------------------------------------------------------
# CONCEPT_ANNOTATION_EXPORT — BioNLP standoff + text
# ---------------------------------------------------------------------------


def bionlp_lines(annots: DataFrame, dedupe: bool = False) -> DataFrame:
    """BioNLP (brat standoff) serialization of the annotations table
    (ConceptAnnotationExportPipeline: post-processed annotations exported
    'in BioNLP format'): per document, annotations sorted by (start, end,
    type) and numbered T1..Tn; each line is
    ``T<n>\\t<type> <start> <end>[;<start> <end>...]\\t<covered text>``
    (discontinuous spans ';'-separated; newlines/tabs in the covered text
    flattened to spaces). Returns (doc_id, bionlp) — one standoff blob per
    document, one aggregation.

    ``dedupe=True`` drops duplicate annotation rows inside the same
    per-document aggregation (array_distinct) — use it instead of a
    ``.distinct()`` on the input, which would add a second full-width
    shuffle before the groupBy."""
    a_type = F.coalesce(F.col("concept_id"), F.col("annot_type"))
    entry = F.struct(
        F.array_min(F.transform("spans", lambda s: s["start"])).alias("s"),
        F.array_max(F.transform("spans", lambda s: s["end"])).alias("e"),
        a_type.alias("t"),
        F.array_join(
            F.transform(
                "spans", lambda s: F.concat_ws(" ", s["start"].cast("string"), s["end"].cast("string"))
            ),
            ";",
        ).alias("spans_str"),
        F.regexp_replace(F.col("covered_text"), "[\\n\\t]", " ").alias("txt"),
    )
    agg = F.array_sort(F.collect_list(entry))
    if dedupe:
        # collect_set instead of array_distinct(collect_list): duplicates
        # drop in the map-side partial aggregate instead of riding the
        # shuffle into one post-merge array pass (r12, guide §2.3); the
        # final array_sort makes the set's order irrelevant
        agg = F.array_sort(F.collect_set(entry))
    per_doc = annots.groupBy("doc_id").agg(agg.alias("es"))
    lines = F.transform(
        F.col("es"),
        lambda x, i: F.concat(
            F.lit("T"), (i + 1).cast("string"), F.lit("\t"),
            x["t"], F.lit(" "), x["spans_str"], F.lit("\t"), x["txt"],
        ),
    )
    return per_doc.select("doc_id", F.array_join(lines, "\n").alias("bionlp"))


# ---------------------------------------------------------------------------
# SENTENCE_COOCCURRENCE_EXPORT — per-sentence concept membership lines
# ---------------------------------------------------------------------------


def _bigquery_annotation_identifier(
    doc_id: Column, start: Column, text: Column, layer: str, annot_type: str
) -> Column:
    """BigQueryUtil.getAnnotationIdentifier:27-34 — sha256 of docId +
    spanStart + coveredText(\\n,\\t → ' ') + LAYER + '[type]' (the Java
    List.toString() of the sorted, lower-cased type list)."""
    clean = F.regexp_replace(F.regexp_replace(text, "\\n", " "), "\\t", " ")
    return F.sha2(
        F.concat(doc_id, start.cast("string"), clean, F.lit(layer), F.lit(f"[{annot_type}]")),
        256,
    )


def sentence_cooccurrence_lines(
    sentences: DataFrame, concepts: DataFrame, stopwords: list[str] | None = None
) -> DataFrame:
    """SENTENCE_COOCCURRENCE_EXPORT (SentenceCooccurrenceBuilder
    .toSentenceCooccurrenceString:42-120): per document a header line
    ``SENT_COUNT\\t<n_sentences>\\t<doc_id>``, then for every sentence with
    at least one overlapping non-stopword concept a line
    ``<sentence_annotation_id>\\t<start-off>|<end-off>|<concept>;...`` with
    concept offsets rebased to the sentence start. The reference iterates
    a HashSet (arbitrary order); we order deterministically by
    (start, end, concept).

    ``sentences`` = (doc_id, start, end, covered_text);
    ``concepts``  = (doc_id, start, end, concept_id, covered_text).
    Returns (doc_id, line) — write the lines column.

    The sha256 sentence id is computed AFTER the aggregation: hashing is
    the dominant per-row cost, and post-agg it runs once per sentence that
    actually has concepts instead of once per sentence pre-join and again
    through the join fan-out (measured ~2× on the whole query)."""
    sw = [w.lower() for w in (stopwords or [])]
    s = sentences.select("doc_id", "start", "end", "covered_text")
    # coalesce: NULL covered_text is not a stopword (NULL.isin → NULL
    # would silently drop the row under a WHERE)
    keep = (
        F.coalesce(~F.lower(F.col("covered_text")).isin(sw), F.lit(True))
        if sw
        else F.lit(True)
    )
    c = concepts.where(keep).select(
        "doc_id",
        F.col("start").alias("c_start"),
        F.col("end").alias("c_end"),
        "concept_id",
    )
    # reference predicate is OVERLAP (Span.overlaps), not containment
    ov = s.join(c, "doc_id").where(
        (F.col("c_start") < F.col("end")) & (F.col("start") < F.col("c_end"))
    )
    entry = F.struct(
        (F.col("c_start") - F.col("start")).alias("s"),
        (F.col("c_end") - F.col("start")).alias("e"),
        F.col("concept_id").alias("cid"),
    )
    # group on the narrow (doc_id, start) key; the sentence text needed for
    # the post-agg hash is functionally dependent on it and rides along as
    # first() — on real corpora the full sentence string would otherwise be
    # part of every hash-aggregate key comparison and of the shuffle key
    per_sent = ov.groupBy("doc_id", "start").agg(
        F.array_sort(F.collect_set(entry)).alias("cs"),
        F.first("covered_text").alias("covered_text"),
    )
    body = per_sent.select(
        "doc_id",
        F.concat(
            _bigquery_annotation_identifier(
                F.col("doc_id"), F.col("start"), F.col("covered_text"), "SENTENCE", "sentence"
            ),
            F.lit("\t"),
            F.array_join(
                F.transform(
                    "cs",
                    lambda x: F.concat(
                        x["s"].cast("string"), F.lit("|"), x["e"].cast("string"), F.lit("|"), x["cid"], F.lit(";")
                    ),
                ),
                "",
            ),
        ).alias("line"),
    )
    # header: plain count per doc, the doc id re-enters AFTER the agg from
    # the group key itself — the r11 ``F.first("doc_id")`` forced a
    # SortAggregate (First's string buffer is immutable, so HashAggregate
    # is ineligible), paying two full Sorts of the sentence relation; a
    # count-only aggregate hash-aggregates with map-side combine (guide
    # §2.3 "aggregate before you shuffle"; plan diff in
    # plans/r12/sentence_cooccurrence_export_{before,after}.txt).
    header = (
        sentences.groupBy("doc_id")
        .agg(F.count("*").alias("__n"))
        .select(
            "doc_id",
            F.concat(
                F.lit("SENT_COUNT\t"),
                F.col("__n").cast("string"),
                F.lit("\t"),
                F.col("doc_id"),
            ).alias("line"),
        )
    )
    return header.unionByName(body.select("doc_id", "line"))


# ---------------------------------------------------------------------------
# WEBANNO_SENTENCE_EXTRACTION — WebAnno-style token TSV
# ---------------------------------------------------------------------------


def webanno_sentence_tsv(sentences: DataFrame, concepts: DataFrame) -> DataFrame:
    """WebAnno token lines for sentences with ≥ 2 concept annotations
    (SentenceExtractionWebAnnoFn.java:45-325):
    ``<sentNum>-<tokNum>\\t<start>-<end>\\t<token>\\t<label>`` per token,
    offsets document-absolute, label = the covering concept id (multi-token
    entities carry a per-sentence ``[k]`` disambiguation index, single-token
    entities are bare, un-covered tokens get '_'). Deliberate
    simplifications vs. the reference: one label per token (no '|'
    stacking) and deterministic (start, end, concept) entity order instead
    of HashSet order.

    ``sentences`` = (doc_id, start, end, covered_text);
    ``concepts``  = (doc_id, start, end, concept_id). Returns
    (doc_id, sent_num, line)."""
    from pyspark.sql import Window

    from .ner import tokenize_with_offsets

    w = Window.partitionBy("doc_id").orderBy("start", "end")
    s = sentences.select(
        "doc_id", "start", "end", "covered_text", F.row_number().over(w).alias("sent_num")
    )
    two_plus = (
        s.join(
            concepts.select("doc_id", F.col("start").alias("cs"), F.col("end").alias("ce")),
            "doc_id",
        )
        .where((F.col("cs") >= F.col("start")) & (F.col("ce") <= F.col("end")))
        .groupBy("doc_id", "sent_num")
        .agg(F.count("*").alias("n"))
        .where(F.col("n") >= 2)
        .select("doc_id", "sent_num")
    )
    s2 = s.join(two_plus, ["doc_id", "sent_num"])
    toks = tokenize_with_offsets(
        s2.select(
            F.concat_ws("\x1f", "doc_id", F.col("sent_num").cast("string"), F.col("start").cast("string")).alias(
                "doc_id"
            ),
            F.col("covered_text").alias("content"),
        )
    ).select(
        F.split("doc_id", "\x1f").getItem(0).alias("doc_id"),
        F.split("doc_id", "\x1f").getItem(1).cast("int").alias("sent_num"),
        F.split("doc_id", "\x1f").getItem(2).cast("int").alias("sent_start"),
        (F.col("tok_idx") + 1).alias("tok_num"),
        (F.col("start") + F.col("sent_start")).alias("g_start"),
        (F.col("end") + F.col("sent_start")).alias("g_end"),
        "token",
    )
    ents = concepts.select(
        F.col("doc_id").alias("e_doc"),
        F.col("start").alias("e_start"),
        F.col("end").alias("e_end"),
        "concept_id",
    ).distinct()
    lab = toks.join(
        ents,
        (F.col("doc_id") == F.col("e_doc"))
        & (F.col("g_start") >= F.col("e_start"))
        & (F.col("g_end") <= F.col("e_end")),
        "left",
    ).drop("e_doc")
    # first covering entity per token (deterministic)
    pick = Window.partitionBy("doc_id", "sent_num", "tok_num").orderBy(
        F.col("e_start").asc_nulls_last(), F.col("e_end").asc_nulls_last(), F.col("concept_id").asc_nulls_last()
    )
    lab = lab.withColumn("rn", F.row_number().over(pick)).where(F.col("rn") == 1)
    # entity disambiguation index is PER SENTENCE (dense_rank over the
    # sentence's entities in span order, identical for all tokens of the
    # same entity), matching the reference's per-extraction numbering
    sent_ent = Window.partitionBy("doc_id", "sent_num").orderBy(
        F.col("e_start").asc_nulls_last(), F.col("e_end").asc_nulls_last(), F.col("concept_id").asc_nulls_last()
    )
    lab = lab.withColumn("sent_ent_idx", F.dense_rank().over(sent_ent))
    multi_token = (F.col("e_end") - F.col("e_start")) > (F.col("g_end") - F.col("g_start"))
    label = F.when(
        F.col("concept_id").isNull(), F.lit("_")
    ).when(
        multi_token, F.concat(F.col("concept_id"), F.lit("["), F.col("sent_ent_idx").cast("string"), F.lit("]"))
    ).otherwise(F.col("concept_id"))
    line = F.concat(
        F.col("sent_num").cast("string"), F.lit("-"), F.col("tok_num").cast("string"), F.lit("\t"),
        F.col("g_start").cast("string"), F.lit("-"), F.col("g_end").cast("string"), F.lit("\t"),
        F.col("token"), F.lit("\t"), label,
    )
    return lab.select("doc_id", "sent_num", "tok_num", line.alias("line"))


def sentence_cooccurrence_blobs(
    sentences: DataFrame, concepts: DataFrame, stopwords: list[str] | None = None
) -> DataFrame:
    """One blob per document — the SENT_COUNT header followed by the
    sentence lines (sorted) — mirroring the reference, where
    toSentenceCooccurrenceString returns ONE string per document. Use this
    (not the line relation) for file output: sharded writers then keep
    every document's lines contiguous and ordered."""
    lines = sentence_cooccurrence_lines(sentences, concepts, stopwords=stopwords)
    entry = F.struct(
        F.when(F.col("line").startswith("SENT_COUNT\t"), F.lit(0)).otherwise(F.lit(1)).alias("k"),
        F.col("line").alias("line"),
    )
    return (
        lines.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(entry)).alias("es"))
        .select("doc_id", F.array_join(F.transform("es", lambda x: x["line"]), "\n").alias("blob"))
    )


def webanno_sentence_blobs(sentences: DataFrame, concepts: DataFrame) -> DataFrame:
    """One WebAnno TSV blob per document, token lines in
    (sent_num, tok_num) order — the file-output form of
    :func:`webanno_sentence_tsv` (unordered line relations shard
    arbitrarily, which breaks a sequential TSV consumer)."""
    lines = webanno_sentence_tsv(sentences, concepts)
    entry = F.struct("sent_num", "tok_num", "line")
    return (
        lines.groupBy("doc_id")
        .agg(F.array_sort(F.collect_list(entry)).alias("es"))
        .select("doc_id", F.array_join(F.transform("es", lambda x: x["line"]), "\n").alias("blob"))
    )
