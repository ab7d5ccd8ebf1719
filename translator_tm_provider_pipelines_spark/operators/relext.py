"""Relation-extraction corpus tooling: brat → BERT training data.

Re-expresses ``relation_extraction/BratToBertConverter.java`` as DataFrame
joins: annotated brat directories become (id, sentence-with-placeholders,
relation-label) training rows for the BERT relation classifier.

Pipeline (reference file:line inline):
1. entity-type normalization — ``corrected_*`` annotations supersede the
   original annotations they overlap, ``corrected_/missed_`` prefixes are
   stripped, disease/phenotype fold into DISEASE_OR_PHENOTYPIC_FEATURE
   when the association uses it (``normalizeEntityTypes`` :175-232);
2. entity → sentence assignment by span overlap
   (``populateSentenceToEntityMap`` :348-362);
3. subject×object assertion candidates per sentence, relation from the
   annotated R-link when present else the NO-RELATION label
   (``getAssertions``/``createAllAssertions`` :239-300);
4. placeholder substitution in decreasing span order + sha1-hex example
   id + first-wins dedup (``getTrainingExampleLine`` :364-420).

Scale: annotation corpora are tiny next to the document corpus, but the
plan is shuffle-minimal anyway — the overlap joins are per-doc
equi-joins, pair generation is a within-sentence join, and nothing
collects to the driver.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions.staging import stage

from ..functions import biolink


def normalize_entity_types(
    entities: DataFrame, association: biolink.BiolinkAssociation
) -> DataFrame:
    """``normalizeEntityTypes`` (BratToBertConverter.java:175-232):
    drop annotations overlapped by a ``corrected``-typed annotation,
    strip ``corrected_``/``missed_`` prefixes, fold disease/phenotype
    variants into disease_or_phenotypic_feature when the association
    uses that class. 'DONE' marker annotations are dropped
    (``getEntityAnnots`` :455-457)."""
    a = entities.alias("a")
    b = entities.alias("b")
    victims = (
        a.join(
            b,
            (F.col("a.doc_id") == F.col("b.doc_id"))
            & (F.col("a.ann_id") != F.col("b.ann_id"))
            & (F.col("a.start") < F.col("b.end"))
            & (F.col("b.start") < F.col("a.end"))
            & F.col("b.entity_type").contains("corrected")
            & ~F.col("a.entity_type").contains("corrected"),
        )
        .select(F.col("a.doc_id").alias("doc_id"), F.col("a.ann_id").alias("ann_id"))
        .distinct()
    )
    kept = entities.join(victims, ["doc_id", "ann_id"], "left_anti")
    t = F.regexp_replace(F.col("entity_type"), "^(corrected_|missed_)", "")
    uses_dop = biolink.DISEASE_OR_PHENOTYPIC_FEATURE in (
        association.subject,
        association.object,
    )
    if uses_dop:
        t = F.when(
            F.lower(t).isin("disease", "phenotype", "phenotypic_feature"),
            F.lit("disease_or_phenotypic_feature"),
        ).otherwise(t)
    return kept.where(F.upper(F.col("entity_type")) != "DONE").withColumn(
        "entity_type", t
    )


def _biolink_class(entity_type: F.Column, association: biolink.BiolinkAssociation) -> F.Column:
    """``getEntityAnnots`` (BratToBertConverter.java:447-471): CURIE-typed
    annotations classify by ontology prefix against the association's
    subject/object prefix lists; plain types are biolink class names."""
    prefix = F.split(entity_type, ":").getItem(0)
    return F.when(
        entity_type.contains(":"),
        F.when(prefix.isin(list(association.subject.prefixes)), F.lit(association.subject.name))
        .when(prefix.isin(list(association.object.prefixes)), F.lit(association.object.name)),
    ).otherwise(F.upper(entity_type))


def bert_training_examples(
    sentences: DataFrame,
    entities: DataFrame,
    relations: DataFrame,
    association: biolink.BiolinkAssociation,
    no_relation_label: str = biolink.NO_RELATION,
) -> DataFrame:
    """brat relations → (id, sentence, relation) BERT training rows.

    The dedup is deterministic where the reference's ``alreadyPrinted``
    HashSet is iteration-order dependent: per substituted sentence the
    lexicographically smallest relation label survives."""
    ents = normalize_entity_types(entities, association).withColumn(
        "blclass", _biolink_class(F.col("entity_type"), association)
    )
    ents = ents.where(F.col("blclass").isNotNull())

    # entity → containing sentence by overlap (one sentence per entity)
    in_sent = ents.join(
        sentences,
        ["doc_id"],
    ).where((F.col("start") < F.col("sent_end")) & (F.col("sent_start") < F.col("end")))

    subj = in_sent.where(F.col("blclass") == association.subject.name).select(
        "doc_id",
        "sent_start",
        "sent_end",
        "sentence_text",
        F.col("ann_id").alias("s_id"),
        F.col("start").alias("s_start"),
        F.col("end").alias("s_end"),
    )
    obj = in_sent.where(F.col("blclass") == association.object.name).select(
        "doc_id",
        F.col("sent_start").alias("o_sent_start"),
        F.col("ann_id").alias("o_id"),
        F.col("start").alias("o_start"),
        F.col("end").alias("o_end"),
    )
    pairs = subj.join(obj, "doc_id").where(
        (F.col("sent_start") == F.col("o_sent_start"))
        & (F.col("s_id") != F.col("o_id"))
        # subject and object must not overlap (getTrainingExampleLine :416)
        & ~((F.col("s_start") < F.col("o_end")) & (F.col("o_start") < F.col("s_end")))
    )

    rels = relations.select(
        "doc_id",
        F.col("arg1").alias("s_id"),
        F.col("arg2").alias("o_id"),
        F.col("relation").alias("__rel"),
    )
    pairs = pairs.join(F.broadcast(rels), ["doc_id", "s_id", "o_id"], "left").withColumn(
        "relation", F.coalesce(F.col("__rel"), F.lit(no_relation_label))
    )

    # placeholder substitution, decreasing span order; offsets are
    # sentence-relative (entity spans never cross a sentence by step 2)
    lo_is_subj = F.col("s_start") <= F.col("o_start")
    lo_start = F.when(lo_is_subj, F.col("s_start")).otherwise(F.col("o_start")) - F.col("sent_start")
    lo_end = F.when(lo_is_subj, F.col("s_end")).otherwise(F.col("o_end")) - F.col("sent_start")
    hi_start = F.when(lo_is_subj, F.col("o_start")).otherwise(F.col("s_start")) - F.col("sent_start")
    hi_end = F.when(lo_is_subj, F.col("o_end")).otherwise(F.col("s_end")) - F.col("sent_start")
    lo_ph = F.when(lo_is_subj, F.lit(association.subject.placeholder)).otherwise(
        F.lit(association.object.placeholder)
    )
    hi_ph = F.when(lo_is_subj, F.lit(association.object.placeholder)).otherwise(
        F.lit(association.subject.placeholder)
    )
    text = F.col("sentence_text")
    substituted = F.concat(
        F.substring(text, F.lit(1), lo_start),
        lo_ph,
        F.substring(text, lo_end + 1, hi_start - lo_end),
        hi_ph,
        F.substring(text, hi_end + 1, F.length(text) - hi_end),
    )

    out = pairs.select(
        F.sha1(substituted).alias("id"),
        substituted.alias("sentence"),
        "relation",
    )
    w = Window.partitionBy("id").orderBy("relation")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )


# ---------------------------------------------------------------------------
# brat annotation-batch export (BratAssertionAnnotationFileCreator.java)
# ---------------------------------------------------------------------------

from ..functions.hashing import sha1_base64  # noqa: E402

#: overly-general concepts never sent for annotation
#: (BratAssertionAnnotationFileCreator.java:60-61)
BRAT_IDENTIFIERS_TO_EXCLUDE = (
    "CHEBI:36080",
    "CL:0000000",
    "PR:000000001",
    "MONDO:0000001",
    "DRUGBANK:DB00118",
)

SENTENCES_PER_PAGE = 20  # BratAssertionAnnotationFileCreator.java:58


def sub_batch_id(index: F.Column) -> F.Column:
    """0 → 'aaa', 1 → 'aab', … (getSubBatchId,
    BratAssertionAnnotationFileCreator.java:209-222)."""
    c = F.lit("abcdefghijklmnopqrstuvwxyz")

    def letter(i: F.Column) -> F.Column:
        return F.substring(c, (i % 26 + 1).cast("int"), 1)

    return F.concat(
        letter((index / (26 * 26)).cast("int")),
        letter((index / 26).cast("int")),
        letter(index),
    )


def brat_annotation_batch(
    extracted: DataFrame,
    association: biolink.BiolinkAssociation,
    batch_size: int,
    sentences_per_page: int = SENTENCES_PER_PAGE,
    ids_to_exclude: tuple[str, ...] = BRAT_IDENTIFIERS_TO_EXCLUDE,
    already_annotated: DataFrame | None = None,
) -> DataFrame:
    """Extracted-sentence rows → brat .ann/.txt page contents for an
    annotation batch (createBratFiles + writeSentenceToBratFiles,
    BratAssertionAnnotationFileCreator.java:91-404).

    Mirrored semantics: rows with an excluded entity id drop; sentences
    dedupe on the base64-sha1 text hash with previously-annotated hashes
    (``already_annotated``: one ``hash`` column) removed; pages hold
    ``sentences_per_page`` sentences; every page's .txt ends with a
    ``DONE`` line; entity annotations union subject+object mentions of
    all of a sentence's pair rows, dedupe on (type, span), sort by span,
    and number T1.. continuously through a page with span offsets
    accumulated over the page's sentences. One deliberate change: the
    reference samples the batch RANDOMLY; this picks the first
    ``batch_size`` sentences ordered by sentence text so batches are
    reproducible.

    Output rows: (page, kind 'ann'|'txt', line_no, line) — a writer
    partitions by page and emits two files per page.
    """
    rows = extracted.where(
        ~F.col("entity1_id").isin(list(ids_to_exclude))
        & ~F.col("entity2_id").isin(list(ids_to_exclude))
    ).withColumn("hash", sha1_base64(F.col("sentence_text")))
    if already_annotated is not None:
        rows = rows.join(already_annotated, "hash", "left_anti")
    # LAZY localCheckpoint (r12, guide §1.2): the filtered extraction
    # relation feeds BOTH the batch-sentence selection and the annotation
    # explode, and the selected-batch frame is then read by three final
    # branches (ann lines, txt lines, DONE lines) — without cutting
    # lineage each consumer re-evaluates the whole upstream extraction
    # chain (measured: 24 parquet scans in the registry query's before
    # plan, 4 after — plans/r12/brat_annotation_export_{before,after}).
    # ``rows`` is extraction-output-sized (what a production run
    # materializes between stages anyway); ``sents`` is ≤ batch_size
    # rows. Lazy so plan construction stays action-free.
    rows = stage(rows, eager=False)

    sents = (
        rows.select("hash", "sentence_text")
        .distinct()
        .orderBy("sentence_text")
        .limit(batch_size)
    )
    sents = stage(sents, eager=False)
    w_all = Window.orderBy("sentence_text")
    sents = sents.select(
        "hash",
        "sentence_text",
        (F.row_number().over(w_all) - 1).alias("__i"),
    ).select(
        "hash",
        "sentence_text",
        sub_batch_id((F.col("__i") / sentences_per_page).cast("int")).alias("page"),
        (F.col("__i") % sentences_per_page).alias("sent_idx"),
    )
    w_page = Window.partitionBy("page").orderBy("sent_idx")
    w_prev = w_page.rowsBetween(Window.unboundedPreceding, -1)
    sents = sents.withColumn(
        "span_offset",
        F.coalesce(F.sum(F.length("sentence_text") + 1).over(w_prev), F.lit(0)).cast("int"),
    )

    subj_type = association.subject.placeholder[1:-1].lower()
    obj_type = association.object.placeholder[1:-1].lower()
    annots = rows.select(
        "hash",
        F.explode(
            F.array(
                F.struct(
                    F.lit(subj_type).alias("label"),
                    F.col("entity1_spans").alias("spans"),
                    F.col("entity1_text").alias("covered_text"),
                ),
                F.struct(
                    F.lit(obj_type).alias("label"),
                    F.col("entity2_spans").alias("spans"),
                    F.col("entity2_text").alias("covered_text"),
                ),
            )
        ).alias("a"),
    ).select("hash", "a.label", "a.spans", "a.covered_text").distinct()

    placed = annots.join(sents, "hash")
    agg_start = F.array_min(F.transform("spans", lambda s: s["start"]))
    agg_end = F.array_max(F.transform("spans", lambda s: s["end"]))
    placed = placed.withColumn("__s", agg_start).withColumn("__e", agg_end)
    w_ann = Window.partitionBy("page").orderBy("sent_idx", "__s", "__e", "label")
    span_str = F.array_join(
        F.transform(
            F.array_sort("spans"),
            lambda s: F.concat_ws(
                " ",
                (s["start"] + F.col("span_offset")).cast("string"),
                (s["end"] + F.col("span_offset")).cast("string"),
            ),
        ),
        ";",
    )
    ann_lines = placed.select(
        "page",
        F.lit("ann").alias("kind"),
        (F.row_number().over(w_ann) - 1).alias("line_no"),
        F.concat(
            F.lit("T"),
            F.row_number().over(w_ann).cast("string"),
            F.lit("\t"),
            F.col("label"),
            F.lit(" "),
            span_str,
            F.lit("\t"),
            F.col("covered_text"),
        ).alias("line"),
    )

    n_sents = F.count("*").over(Window.partitionBy("page"))
    txt_lines = sents.select(
        "page",
        F.lit("txt").alias("kind"),
        F.col("sent_idx").alias("line_no"),
        F.col("sentence_text").alias("line"),
        n_sents.alias("__n"),
    )
    done_lines = (
        txt_lines.groupBy("page")
        .agg(F.max("__n").alias("__n"))
        .select(
            "page",
            F.lit("txt").alias("kind"),
            F.col("__n").alias("line_no"),
            F.lit("DONE").alias("line"),
        )
    )
    return ann_lines.unionByName(txt_lines.drop("__n")).unionByName(done_lines)


# ---------------------------------------------------------------------------
# Distant supervision: concept-pair sentence mining
# (distant_supervision/ConceptPairSentenceExtractor.java)
# ---------------------------------------------------------------------------

#: overly-general concepts excluded from distant-supervision searches
#: (ConceptPairSentenceExtractor.java:59-75)
DISTANT_SUPERVISION_IDS_TO_EXCLUDE = (
    "CHEBI:36080",
    "PR:000000001",
    "CL:0000000",
    "MONDO:0000001",
    "HP:0002664",
    "MONDO:0005070",
    "DRUGBANK:DB00118",
    "GO:0005575",
    "GO:0110165",
    "GO:0032991",
    "GO:0044423",
    "GO:0005622",
)


def distant_supervision_sentences(
    extracted: DataFrame,
    pairs: DataFrame,
    max_per_pair: int = 10,
    ids_to_exclude: tuple[str, ...] = DISTANT_SUPERVISION_IDS_TO_EXCLUDE,
) -> DataFrame:
    """Sentences containing a given concept pair, capped per pair — the
    engine core of ``ConceptPairSentenceExtractor.search`` (the reference
    issues one Elasticsearch annotated-text query per pair and keeps up
    to ``maxReturned`` hits; here it's ONE broadcast join of the
    unordered pair list against the extracted-sentence relation, so a
    100 TB corpus is scanned once for every pair at once instead of once
    per pair).

    ``pairs``: (concept1, concept2) rows, order-insensitive. The per-pair
    cap keeps the lexicographically smallest sentence ids (the
    reference keeps whatever Elasticsearch returns first — capped but
    unspecified; this is the deterministic analogue)."""
    canon1 = F.least(F.col("entity1_id"), F.col("entity2_id"))
    canon2 = F.greatest(F.col("entity1_id"), F.col("entity2_id"))
    e = extracted.where(
        ~F.col("entity1_id").isin(list(ids_to_exclude))
        & ~F.col("entity2_id").isin(list(ids_to_exclude))
    ).withColumn("__c1", canon1).withColumn("__c2", canon2)
    p = pairs.select(
        F.least(F.col("concept1"), F.col("concept2")).alias("__c1"),
        F.greatest(F.col("concept1"), F.col("concept2")).alias("__c2"),
    ).distinct()
    hit = e.join(F.broadcast(p), ["__c1", "__c2"])
    w = Window.partitionBy("__c1", "__c2").orderBy("sentence_id")
    return (
        hit.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") <= max_per_pair)
        .drop("__rn", "__c1", "__c2")
    )


#: RO predicate URI → biolink slot, the only mappings the reference
#: handles (ConceptPairsFileParser.getBiolink:115-127 — anything else
#: throws there; here unmapped predicates never match target_predicate).
CONCEPT_PAIR_PREDICATES = {
    "http://purl.obolibrary.org/obo/RO_0002200": "biolink:has_phenotype",
    "http://purl.obolibrary.org/obo/RO_0001025": "biolink:located_in",
}


def positive_concept_pairs(
    pair_lines: DataFrame, target_predicate_uri: str, line_col: str = "line"
) -> DataFrame:
    """(subject_curie, object_curie, predicate_biolink) from the
    distant-supervision pair TSV (subject URI, object URI, predicate
    URI) — ConceptPairsFileParser.extractPositivePairs:30-56: rows with
    the target predicate, URIs normalized to CURIEs (strip the OBO purl,
    first ``_`` → ``:``), predicate mapped to its biolink slot."""
    from ..sources.obo import curie

    cols = F.split(F.col(line_col), "\t")
    biolink = CONCEPT_PAIR_PREDICATES.get(target_predicate_uri)
    if biolink is None:
        raise ValueError(f"unhandled predicate URI: {target_predicate_uri!r}")
    return (
        pair_lines.where(F.trim(F.col(line_col)) != "")
        .where(cols.getItem(2) == target_predicate_uri)
        .select(
            curie(cols.getItem(0)).alias("subject_curie"),
            curie(cols.getItem(1)).alias("object_curie"),
            F.lit(biolink).alias("predicate_biolink"),
        )
        .distinct()
    )


def negative_concept_pairs(
    pair_lines: DataFrame,
    target_predicate_uri: str,
    chunk_size: int = 1000,
    line_col: str = "line",
) -> DataFrame:
    """(subject_curie, object_curies ARRAY, predicate_biolink='false'):
    for every positive subject, all object CURIEs seen in the file MINUS
    the subject's own positives, subdivided into ≤ ``chunk_size`` groups
    (extractNegativePairs:58-113 + subdivideNegativeCuries:97-113; the
    reference chunks HashSet order — nondeterministic — so the engine
    chunks sorted object order). The object universe is a one-row
    broadcast (dimension-sized: distinct positive objects)."""
    pos = positive_concept_pairs(pair_lines, target_predicate_uri, line_col=line_col)
    all_objs = pos.select(
        F.array_sort(F.collect_set("object_curie")).alias("__all")
    )
    per_subj = pos.groupBy("subject_curie").agg(
        F.collect_set("object_curie").alias("__own")
    )
    negs = per_subj.crossJoin(F.broadcast(all_objs)).select(
        "subject_curie",
        F.array_sort(F.array_except("__all", "__own")).alias("__negs"),
    )
    n_chunks = F.ceil(F.size("__negs") / F.lit(chunk_size)).cast("int")
    chunked = negs.where(F.size("__negs") > 0).select(
        "subject_curie",
        F.explode(
            F.transform(
                F.sequence(F.lit(0), n_chunks - 1),
                lambda i: F.slice("__negs", i * chunk_size + 1, chunk_size),
            )
        ).alias("object_curies"),
    )
    return chunked.select(
        "subject_curie", "object_curies", F.lit("false").alias("predicate_biolink")
    )


def promote_pair_subjects(
    pair_lines: DataFrame, promotion_map: DataFrame, line_col: str = "line"
) -> DataFrame:
    """Concept-pair TSV lines with column 0 promoted to its
    species-agnostic PR class (PrPromoter.createFileWithPromotedPrConcepts
    :20-46): the promotion map's CURIEs normalize ``:`` → ``_`` to match
    the underscore-form concepts in the pair files; unmapped concepts
    pass through (the reference logs NOT PROMOTED and keeps them).
    ``promotion_map`` = (concept_id, promoted_id), e.g.
    :func:`~translator_tm_provider_pipelines_spark.operators.ontmaps.pr_promotion_map`.
    Returns one ``line`` column, tabs intact."""
    cols = F.split(F.col(line_col), "\t")
    m = F.broadcast(
        promotion_map.select(
            F.replace(F.col("concept_id"), F.lit(":"), F.lit("_")).alias("__k"),
            F.replace(F.col("promoted_id"), F.lit(":"), F.lit("_")).alias("__v"),
        ).distinct()
    )
    joined = pair_lines.join(m, cols.getItem(0) == F.col("__k"), "left")
    out_cols = F.split(F.col(line_col), "\t")
    return joined.select(
        F.concat_ws(
            "\t",
            F.coalesce(F.col("__v"), out_cols.getItem(0)),
            out_cols.getItem(1),
            out_cols.getItem(2),
        ).alias("line")
    )


# ---------------------------------------------------------------------------
# BERT NER output → BioNLP (relation_extraction/NerBertToBionlpConverter)
# ---------------------------------------------------------------------------


def parse_bert_ner_files(spark, input_path: str, output_path: str) -> DataFrame:
    """Line-align the BERT NER input file (``token\\tdocId\\tspanStart``,
    docId '-' on continuation rows) with the label file (``token x tag``)
    → (doc_id, line_no, token, span_start, tag) rows
    (EntityDocumentIterator, NerBertToBionlpConverter.java:65-137).

    The two files correspond line-by-line, so this is one of the rare
    genuinely positional reads: each file zips with its line index
    (RDD ``zipWithIndex`` — deterministic per file), blank lines drop
    (``fastForward`` :318-325), and the join key is the blank-skipping
    rank. Document ids forward-fill from each sentence's first token."""
    def indexed(path: str, name: str) -> DataFrame:
        rdd = spark.sparkContext.textFile(path).zipWithIndex()
        df = spark.createDataFrame(rdd, f"{name} string, idx long")
        df = df.where(F.trim(F.col(name)) != "")
        w = Window.orderBy("idx")
        return df.withColumn("rank", F.row_number().over(w)).drop("idx")

    inp = indexed(input_path, "in_line")
    out = indexed(output_path, "out_line")
    joined = inp.join(out, "rank")
    doc_raw = F.split("in_line", "\t").getItem(1)
    rows = joined.select(
        F.col("rank").alias("line_no"),
        F.split("in_line", "\t").getItem(0).alias("token"),
        F.when(doc_raw != "-", doc_raw).alias("__doc"),
        F.split("in_line", "\t").getItem(2).cast("int").alias("span_start"),
        F.element_at(F.split(F.col("out_line"), r"\s+"), 3).alias("tag"),
    )
    w_fill = Window.orderBy("line_no").rowsBetween(Window.unboundedPreceding, 0)
    return rows.select(
        F.last("__doc", ignorenulls=True).over(w_fill).alias("doc_id"),
        "line_no",
        "token",
        "span_start",
        "tag",
    )


def ner_bert_entities(tokens: DataFrame) -> DataFrame:
    """IOB(ES) token tags → entity annotation rows (schemas.ANNOTATION
    shape: doc_id, annot_type, concept_id, spans, covered_text).

    ``fixTag`` (NerBertToBionlpConverter.java:292-312) collapses to: a
    token starts a new entity iff its label differs from the previous
    token's label (B/I/E/S prefixes are normalized away, so adjacent
    same-label entities merge — mirrored exactly). Segments aggregate to
    min-start/max-end spans; intervening gaps pad with spaces in the
    covered text (``addSpaces`` :277-284)."""
    label = F.when(F.col("tag") != "O", F.element_at(F.split("tag", "-"), 2))
    t = tokens.withColumn("__label", label)
    w = Window.partitionBy("doc_id").orderBy("line_no")
    new_seg = (
        F.col("__label").isNotNull()
        & ~F.coalesce(F.lag("__label").over(w) == F.col("__label"), F.lit(False))
    ).cast("int")
    t = t.withColumn("__seg", F.sum(new_seg).over(w))
    ents = t.where(F.col("__label").isNotNull())
    toks = F.array_sort(
        F.collect_list(
            F.struct(
                F.col("span_start").alias("s"),
                (F.col("span_start") + F.length("token")).alias("e"),
                F.col("token").alias("tok"),
            )
        )
    )
    grouped = ents.groupBy("doc_id", "__seg").agg(
        F.first("__label").alias("label"), toks.alias("toks")
    )
    covered = F.aggregate(
        F.col("toks"),
        F.lit(""),
        lambda acc, x: F.concat(
            acc,
            F.repeat(F.lit(" "), x["s"] - F.element_at(F.col("toks"), 1)["s"] - F.length(acc)),
            x["tok"],
        ),
    )
    start = F.element_at(F.col("toks"), 1)["s"].cast("int")
    end = F.element_at(F.col("toks"), -1)["e"].cast("int")
    return grouped.select(
        "doc_id",
        F.lit("concept").alias("annot_type"),
        F.col("label").alias("concept_id"),
        F.array(F.struct(start.alias("start"), end.alias("end"))).alias("spans"),
        covered.alias("covered_text"),
    )


def ner_bert_documents(tokens: DataFrame) -> DataFrame:
    """Reconstruct each document's text from (span_start, token):
    space-pad up to every token's offset then append it
    (``populateDocumentText``, NerBertToBionlpConverter.java:226-231)."""
    toks = F.array_sort(
        F.collect_list(
            F.struct(F.col("span_start").alias("s"), F.col("token").alias("tok"))
        )
    )
    text = F.aggregate(
        F.col("toks"),
        F.lit(""),
        lambda acc, x: F.concat(
            acc, F.repeat(F.lit(" "), x["s"] - F.length(acc)), x["tok"]
        ),
    )
    return (
        tokens.groupBy("doc_id")
        .agg(toks.alias("toks"))
        .select("doc_id", text.alias("text"))
    )


# ---------------------------------------------------------------------------
# Inception (WebAnno TSV) subset creation
# (relation_extraction/InceptionInputFileCreator.java)
# ---------------------------------------------------------------------------


def parse_webanno_blocks(spark, path: str) -> DataFrame:
    """WebAnno TSV file → one row per sentence block, in file order:
    (block_idx, text_line, tokens array<struct(tok_num,start,end,token,
    entity)>). Blocks split on blank lines; the leading #FORMAT header
    block (no #Text= line) is dropped (getNextSentence,
    InceptionInputFileCreator.java:160-183)."""
    # one whole-file row, then posexplode over the blank-line split: the
    # block index is the split position — file order without leaving
    # Catalyst (no RDD zipWithIndex job). WebAnno inputs are single
    # annotation-export files, so the wholetext read is dimension-sized.
    blocks = (
        spark.read.text(path, wholetext=True)
        .select(F.posexplode(F.split("value", "\n\n")).alias("block_idx", "block"))
    )
    toks = F.filter(
        F.split("block", "\n"), lambda l: l.rlike(r"^\d+-\d+\t")
    )
    tok = lambda l: F.struct(  # noqa: E731
        F.regexp_extract(l, r"^\d+-(\d+)\t", 1).cast("int").alias("tok_num"),
        F.regexp_extract(l, r"^\d+-\d+\t(\d+)-", 1).cast("long").alias("start"),
        F.regexp_extract(l, r"^\d+-\d+\t\d+-(\d+)\t", 1).cast("long").alias("end"),
        F.regexp_extract(l, r"^\d+-\d+\t\d+-\d+\t([^\t]*)\t", 1).alias("token"),
        F.regexp_extract(l, r"^\d+-\d+\t\d+-\d+\t[^\t]*\t(.*)$", 1).alias("entity"),
    )
    return (
        blocks.select(
            "block_idx",
            F.regexp_extract("block", r"(?m)^(#Text=.*?)\s*$", 1).alias("text_line"),
            F.transform(toks, tok).alias("tokens"),
        )
        .where(F.col("text_line") != "")
    )


def inception_subset(
    blocks: DataFrame, batch_size: int, already_annotated: DataFrame | None = None
) -> DataFrame:
    """Select a new annotation subset from WebAnno sentence blocks
    (createNewSubset/updateSentenceData,
    InceptionInputFileCreator.java:54-259):

    - sentence identity = base64 of the #Text= line (computeHash :146);
      previously exported hashes (``already_annotated``: one ``hash``
      column) are skipped, duplicates collapse to their first occurrence;
    - sentences renumber 1..batch_size; token spans shift so sentences
      pack contiguously (next sentence starts at previous shifted
      end + 1);
    - multi-token entity ``[k]`` indices renumber globally in
      first-appearance order.

    The reference samples randomly; this takes the first ``batch_size``
    sentences in file order, so subsets reproduce. Output rows:
    (sent_num, line_no, line)."""
    b = blocks.withColumn("hash", F.base64(F.col("text_line").cast("binary")))
    if already_annotated is not None:
        b = b.join(already_annotated, "hash", "left_anti")
    w_dup = Window.partitionBy("hash").orderBy("block_idx")
    b = b.withColumn("__rn", F.row_number().over(w_dup)).where(F.col("__rn") == 1)
    w_all = Window.orderBy("block_idx")
    b = (
        b.withColumn("sent_num", F.row_number().over(w_all))
        .where(F.col("sent_num") <= batch_size)
    )
    # contiguous packing: shift(i) = Σ_{j<i} (max_end(j) + 1)
    max_end = F.array_max(F.transform("tokens", lambda t: t["end"]))
    w_prev = w_all.rowsBetween(Window.unboundedPreceding, -1)
    b = b.withColumn("shift", F.coalesce(F.sum(max_end + 1).over(w_prev), F.lit(0)))

    toks = b.select(
        "sent_num", "shift", F.posexplode("tokens").alias("pos", "t")
    ).select(
        "sent_num",
        "shift",
        "pos",
        F.col("t.tok_num").alias("tok_num"),
        (F.col("t.start") + F.col("shift")).alias("start"),
        (F.col("t.end") + F.col("shift")).alias("end"),
        F.col("t.token").alias("token"),
        F.col("t.entity").alias("entity"),
        F.regexp_extract(F.col("t.entity"), r"\[(\d+)\]", 1).alias("orig_idx"),
    )
    # global first-appearance renumbering of [k] entity indices
    firsts = (
        toks.where(F.col("orig_idx") != "")
        .groupBy("sent_num", "orig_idx")
        .agg(F.min(F.struct("pos", "tok_num")).alias("__first"))
    )
    w_idx = Window.orderBy(F.col("sent_num"), F.col("__first"))
    firsts = firsts.select(
        "sent_num", "orig_idx", F.row_number().over(w_idx).alias("new_idx")
    )
    toks = toks.join(F.broadcast(firsts), ["sent_num", "orig_idx"], "left")
    entity_out = F.when(
        F.col("orig_idx") != "",
        F.regexp_replace(
            F.col("entity"), r"\[\d+\]", F.concat(F.lit("["), F.col("new_idx"), F.lit("]"))
        ),
    ).otherwise(F.col("entity"))

    token_lines = toks.select(
        "sent_num",
        F.col("tok_num").alias("line_no"),
        F.concat(
            F.col("sent_num").cast("string"), F.lit("-"), F.col("tok_num").cast("string"),
            F.lit("\t"), F.col("start").cast("string"), F.lit("-"), F.col("end").cast("string"),
            F.lit("\t"), F.col("token"), F.lit("\t"), entity_out,
        ).alias("line"),
    )
    text_lines = b.select(
        "sent_num", F.lit(0).alias("line_no"), F.col("text_line").alias("line")
    )
    return text_lines.unionByName(token_lines)


# ---------------------------------------------------------------------------
# BIO tag format for NER training (corpora/craft/CraftToBioTagFormat.java)
# ---------------------------------------------------------------------------


def bio_token_tags(
    tokens: DataFrame,
    concepts: DataFrame,
    label_overrides: dict[str, str] | None = None,
) -> DataFrame:
    """Token-level BIO tags from concept spans
    (CraftToBioTagFormat.addBioLabelsToTokens/getLabel :116-199): per
    concept, its overlapping tokens sort by span — the first gets
    ``B-<prefix>``, the rest ``I-<prefix>``; unlabeled tokens get ``O``.
    The label prefix is the CURIE prefix, with per-concept-id overrides
    (the reference's GO→GO_BP/GO_CC/GO_MF namespace map) and the HP→MONDO
    remap applied after. The reference assumes nested concepts were
    removed upstream (conceptfilters.remove_nested_annotations) so each
    token has at most one label; ties here resolve deterministically to
    the earliest-starting (then lowest-id) concept.

    ``tokens``: (doc_id, tok_idx, start, end, token) —
    ``ner.tokenize_with_offsets`` output. ``concepts``:
    (doc_id, concept_id, start, end). One overlap join on doc_id plus a
    per-concept window; scales with annotation density, not corpus². The
    output keeps (doc_id, tok_idx, token, tag); blank sentence
    separators are the writer's job, as in CoNLL exports."""
    overrides = label_overrides or {}
    prefix = F.split(F.col("concept_id"), ":").getItem(0)
    if overrides:
        omap = F.create_map(*[F.lit(x) for kv in overrides.items() for x in kv])
        prefix = F.coalesce(omap[F.col("concept_id")], prefix)
    prefix = F.when(prefix == "HP", F.lit("MONDO")).otherwise(prefix)

    c = concepts.select(
        F.col("doc_id").alias("c_doc"),
        F.col("concept_id"),
        F.col("start").alias("c_start"),
        F.col("end").alias("c_end"),
        prefix.alias("c_prefix"),
    )
    overlap = tokens.join(
        c,
        (tokens.doc_id == c.c_doc)
        & (tokens.start < c.c_end)
        & (c.c_start < tokens.end),
    )
    w_concept = Window.partitionBy("c_doc", "c_start", "c_end", "concept_id").orderBy(
        "start", "end"
    )
    labeled = overlap.select(
        tokens.doc_id,
        "tok_idx",
        F.concat(
            F.when(F.row_number().over(w_concept) == 1, F.lit("B-")).otherwise(
                F.lit("I-")
            ),
            F.col("c_prefix"),
        ).alias("tag"),
        F.col("c_start"),
        F.col("concept_id"),
    )
    # deterministic single label per token when concepts overlap
    w_tok = Window.partitionBy("doc_id", "tok_idx").orderBy("c_start", "concept_id")
    labeled = (
        labeled.withColumn("__rn", F.row_number().over(w_tok))
        .where(F.col("__rn") == 1)
        .select("doc_id", "tok_idx", "tag")
    )
    return tokens.join(labeled, ["doc_id", "tok_idx"], "left").select(
        "doc_id",
        "tok_idx",
        "token",
        F.coalesce(F.col("tag"), F.lit("O")).alias("tag"),
    )


def bio_tag_lines(tagged: DataFrame) -> DataFrame:
    """(doc_id, tok_idx, line) — the ``token<TAB>tag`` file content
    (serializeTokensForSentence :100-113)."""
    return tagged.select(
        "doc_id",
        "tok_idx",
        F.concat_ws("\t", "token", "tag").alias("line"),
    )
