"""Sentence layer: segmentation (X1) and relation-candidate sentence
extraction (J5 + P3/P4/P5/P9/P10/P13, SURVEY §2.2/§2.3).

Reference:
- segmentation: .../etl/fn/OpenNLPSentenceSegmentFn.java:60-95,127-193 —
  OpenNLP maxent spans, then any sentence containing '\\n' is split at the
  line breaks (splitSentencesOnLineBreaks).
- extraction: .../etl/fn/SentenceExtractionFn.java — concept annotations
  partitioned into X/Y prefix classes (:222-257), mapped into containing
  sentences (:409-447), keyword filter (:449-462), spans rebased to sentence
  coordinates (:399-407); .../etl/fn/ExtractedSentence.java — sha256
  sentence id (:104-107), placeholder substitution over aggregate spans
  (:109-143), overlapping entity pairs dropped (toTsv :147-150).

Spark-first design
------------------
Segmentation is pure column expressions: a record-separator character is
inserted after sentence-final punctuation and before line breaks, the text
is split on it (parts concatenate back to the original text, so character
offsets are exact), and spans come from a cumulative-length window per
document. No Python UDF, no model service — the segmenter is deliberately
pluggable: any (doc_id, text) → (doc_id, start, end, text) stage (e.g. a
mapInPandas wrapper around a real model) drops in.

Extraction is two containment joins + array ops; the placeholder surgery is
an ``aggregate`` over the two entity spans sorted descending — JVM-side,
mirroring the reference's end-first substring stitching.
"""

from __future__ import annotations

import re

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: record separator (ASCII 30) used as an in-band sentence boundary marker
_RS = "\x1e"

#: sentence-final punctuation followed by whitespace ends a sentence
_BOUNDARY_PATTERN = r"([.!?])(\s+)"


# ---------------------------------------------------------------------------
# X1 — segmentation
# ---------------------------------------------------------------------------


def segment_sentences(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "content"
) -> DataFrame:
    """(doc_id, text) → (doc_id, sent_idx, start, end, sentence) with exact
    character spans.

    Boundary rule: sentence-final punctuation + whitespace, and every line
    break (the reference's splitSentencesOnLineBreaks post-rule). Marker
    insertion preserves every original character, so the cumulative sum of
    raw part lengths reproduces document offsets exactly; each part is then
    whitespace-trimmed with the span adjusted accordingly — matching
    OpenNLP's trimmed sentence spans.

    One narrow projection + one window keyed on the high-cardinality doc id;
    everything stays in whole-stage codegen."""
    marked = F.regexp_replace(
        F.regexp_replace(F.col(text), r"\n", _RS + "\n"),
        _BOUNDARY_PATTERN,
        "$1" + _RS + "$2",
    )
    parts = docs.select(
        F.col(doc_id).alias("doc_id"),
        F.posexplode(F.split(marked, _RS)).alias("part_idx", "part"),
    )
    w = (
        Window.partitionBy("doc_id")
        .orderBy("part_idx")
        .rowsBetween(Window.unboundedPreceding, -1)
    )
    lead_ws = F.length(F.regexp_extract("part", r"^(\s*)", 1))
    # \z, not $: Java's $ matches BEFORE a final line terminator (\n, \r,
    # NEL U+0085, U+2028/U+2029), which would count whitespace preceding a
    # trailing terminator as "trailing" and misplace the span end
    trail_ws = F.length(F.regexp_extract("part", r"(\s*)\z", 1))
    sents = (
        parts.withColumn("off", F.coalesce(F.sum(F.length("part")).over(w), F.lit(0)))
        .select(
            "doc_id",
            "part_idx",
            (F.col("off") + lead_ws).cast("int").alias("start"),
            (F.col("off") + F.length("part") - trail_ws).cast("int").alias("end"),
            # regex trim: F.trim strips spaces only, spans count all \s
            F.regexp_replace("part", r"^\s+|\s+\z", "").alias("sentence"),
        )
        .where(F.col("sentence") != "")
    )
    w2 = Window.partitionBy("doc_id").orderBy("part_idx")
    return sents.select(
        "doc_id",
        (F.row_number().over(w2) - 1).alias("sent_idx"),
        "start",
        "end",
        "sentence",
    )


def segment_sentences_with_backend(
    docs: DataFrame,
    backend,
    doc_id: str = "doc_id",
    text: str = "content",
) -> DataFrame:
    """X1 with a pluggable model backend — the seam where a real sentence
    model (OpenNLP's maxent in the reference, ``OpenNlpSentenceSegmentFn``;
    pysbd/spaCy in a Python stack) slots in.

    Adapter contract (pinned by test): ``backend(text: str) ->
    list[tuple[int, int]]`` — character spans, in order, within bounds,
    non-overlapping; the engine derives the covered sentence text itself,
    so a backend can never return text that disagrees with its spans.
    Runs as Arrow-batched ``mapInPandas`` (model inference is per-row
    Python work; one initialization per partition, vectorized transfer),
    output schema identical to :func:`segment_sentences`.

    Built-in backends in :data:`SEGMENTER_BACKENDS`; measured span-level
    agreement between them is recorded in COVERAGE.md ("Segmentation
    backend divergence")."""
    from collections.abc import Iterator

    import pandas as pd

    out_schema = "doc_id string, sent_idx int, start int, end int, sentence string"
    id_name, text_name = doc_id, text

    def run(batches: Iterator[pd.DataFrame]) -> Iterator[pd.DataFrame]:
        for pdf in batches:
            rows = []
            for did, content in zip(pdf[id_name], pdf[text_name]):
                if content is None:
                    continue
                for i, (s, e) in enumerate(backend(content)):
                    rows.append((str(did), i, s, e, content[s:e]))
            yield pd.DataFrame(
                rows, columns=["doc_id", "sent_idx", "start", "end", "sentence"]
            )

    return docs.select(F.col(id_name), F.col(text_name)).mapInPandas(
        run, schema=out_schema
    )


def regex_segmenter(content: str) -> list[tuple[int, int]]:
    """The native rule as a Python backend: sentence-final punctuation +
    whitespace, plus line breaks; spans whitespace-trimmed. Equals
    :func:`segment_sentences` span-for-span (asserted by test), so the
    adapter itself provably adds no divergence."""
    marked = re.sub(r"\n", _RS + "\n", content)
    marked = re.sub(_BOUNDARY_PATTERN, r"\1" + _RS + r"\2", marked)
    spans, off = [], 0
    for part in marked.split(_RS):
        lead = len(part) - len(part.lstrip())
        trimmed = part.strip()
        if trimmed:
            spans.append((off + lead, off + lead + len(trimmed)))
        off += len(part)
    return spans


#: sentence-final-period exceptions for the abbreviation-aware backend —
#: common scientific-prose abbreviations (the error class OpenNLP's maxent
#: model learns; here an explicit list so behavior is deterministic)
_ABBREVIATIONS = frozenset(
    "e.g i.e cf vs etc al fig figs eq eqs ref refs sec no nos ca approx "
    "dr mr mrs ms prof st jr sr inc ltd co corp dept univ".split()
)


def abbrev_aware_segmenter(content: str) -> list[tuple[int, int]]:
    """A deliberately divergent model-class backend: like the native rule
    but a period does NOT end a sentence after a known abbreviation, a
    single initial (``J. Smith``), or inside a decimal number (``3. 5`` is
    still a boundary but ``3.5`` never splits — the native rule agrees
    there since it requires whitespace). Stands in for pysbd/OpenNLP when
    no model runtime is installed; if ``pysbd`` is importable,
    :data:`SEGMENTER_BACKENDS` exposes it too."""
    spans = []
    for s, e in regex_segmenter(content):
        if spans:
            ps, pe = spans[-1]
            prev = content[ps:pe]
            last_word = re.findall(r"[A-Za-z.]+$", prev[:-1].rstrip())
            word = last_word[0].rstrip(".").lower() if last_word else ""
            if prev.endswith(".") and (
                word in _ABBREVIATIONS
                or re.search(r"(?:^|\s)[A-Z]\.$", prev) is not None
            ):
                spans[-1] = (ps, e)  # merge: abbreviation, not a boundary
                continue
        spans.append((s, e))
    return spans


def _pysbd_segmenter():  # pragma: no cover - optional dependency
    import pysbd

    seg = pysbd.Segmenter(language="en", clean=False, char_span=True)

    def run(content: str) -> list[tuple[int, int]]:
        out = []
        for ts in seg.segment(content):
            t = ts.sent
            lead = len(t) - len(t.lstrip())
            trail = len(t) - len(t.rstrip())
            if t.strip():
                out.append((ts.start + lead, ts.end - trail))
        return out

    return run


SEGMENTER_BACKENDS = {
    "native_regex": regex_segmenter,
    "abbrev_aware": abbrev_aware_segmenter,
}
try:  # pragma: no cover - optional dependency
    SEGMENTER_BACKENDS["pysbd"] = _pysbd_segmenter()
except ImportError:
    pass


def sentences_as_annotations(sents: DataFrame) -> DataFrame:
    """Segmented sentences → schemas.ANNOTATION rows (annot_type='sentence'),
    the relational replacement for the reference's BioNLP sentence blobs."""
    return sents.select(
        "doc_id",
        F.lit("sentence").alias("annot_type"),
        F.lit(None).cast("string").alias("concept_id"),
        F.array(F.struct(F.col("start"), F.col("end"))).alias("spans"),
        F.col("sentence").alias("covered_text"),
    )


# ---------------------------------------------------------------------------
# Span helpers (aggregate span = min start .. max end, ExtractedSentence
# getAggregateSpan)
# ---------------------------------------------------------------------------


def _agg_start(spans: Column) -> Column:
    return F.array_min(F.transform(spans, lambda s: s["start"]))


def _agg_end(spans: Column) -> Column:
    return F.array_max(F.transform(spans, lambda s: s["end"]))


def span_str(spans: Column) -> Column:
    """Canonical span-list string used inside the sentence id hash:
    ``[start..end;start..end]`` (multi-spans ';'-joined, sorted)."""
    return F.concat(
        F.lit("["),
        F.array_join(
            F.transform(
                F.array_sort(spans),
                lambda s: F.concat(s["start"].cast("string"), F.lit(".."), s["end"].cast("string")),
            ),
            ";",
        ),
        F.lit("]"),
    )


def offset_spans(spans: Column, offset: Column) -> Column:
    """P9 (offsetSpan, SentenceExtractionFn.java:399-407): rebase spans from
    document to sentence coordinates."""
    return F.transform(
        spans,
        lambda s: F.struct(
            (s["start"] - offset).cast("int").alias("start"),
            (s["end"] - offset).cast("int").alias("end"),
        ),
    )


# ---------------------------------------------------------------------------
# P10 — placeholder substitution
# ---------------------------------------------------------------------------


def sentence_with_placeholders(
    sentence: Column,
    e1_start: Column,
    e1_end: Column,
    placeholder1: Column,
    e2_start: Column,
    e2_end: Column,
    placeholder2: Column,
) -> Column:
    """Replace the two (sentence-relative, non-overlapping) aggregate entity
    spans with placeholders, substituting the later span first so earlier
    offsets stay valid (getSentenceWithPlaceholders,
    ExtractedSentence.java:109-143). Pure string expressions."""
    first_start = F.least(e1_start, e2_start)
    first_end = F.least(e1_end, e2_end)
    second_start = F.greatest(e1_start, e2_start)
    second_end = F.greatest(e1_end, e2_end)
    first_ph = F.when(e1_start <= e2_start, placeholder1).otherwise(placeholder2)
    second_ph = F.when(e1_start <= e2_start, placeholder2).otherwise(placeholder1)
    return F.concat(
        F.substring(sentence, F.lit(1), first_start),
        first_ph,
        F.substring(sentence, first_end + 1, second_start - first_end),
        second_ph,
        F.substring(sentence, second_end + 1, F.length(sentence)),
    )


# ---------------------------------------------------------------------------
# J5 + the extraction chain
# ---------------------------------------------------------------------------


def _matches_prefix(concept_id: Column, prefixes: list[str]) -> Column:
    """Plain string-prefix test (conceptId.startsWith(prefix),
    SentenceExtractionFn.java:239) — NOT a CURIE-namespace equality: prefix
    'GO' matches 'GO_BP:...' exactly as in the reference."""
    out = F.lit(False)
    for p in prefixes:
        out = out | concept_id.startswith(p)
    return out


def concepts_by_prefix(concepts: DataFrame, prefixes: list[str]) -> DataFrame:
    """P4 (getAnnotsByPrefix :222-257): keep annotations whose CURIE starts
    with one of ``prefixes``."""
    return concepts.where(_matches_prefix(F.col("concept_id"), prefixes))


def exclude_concepts(concepts: DataFrame, excluded_ids: DataFrame) -> DataFrame:
    """P5 (removeConceptsToExclude :191-202): drop annotations whose id is
    in the exclusion set — broadcast anti-join (the exclusion list is
    small)."""
    ex = excluded_ids.select(F.col(excluded_ids.columns[0]).alias("concept_id")).distinct()
    return concepts.join(F.broadcast(ex), "concept_id", "left_anti")


def document_zone(sents: DataFrame, sections: DataFrame) -> DataFrame:
    """P13 (determineDocumentZone :375-388): first overlapping section
    annotation's name by span order, else 'Unknown'. Left range-join on
    doc_id + overlap, window keeps the first section."""
    sec = sections.select(
        F.col("doc_id").alias("sec_doc_id"),
        F.col("annot_type").alias("zone"),
        _agg_start(F.col("spans")).alias("sec_start"),
        _agg_end(F.col("spans")).alias("sec_end"),
    )
    # overlap inside the join condition (not a post-filter) so sentences with
    # no overlapping section survive with zone NULL → 'Unknown'
    joined = sents.join(
        sec,
        (F.col("doc_id") == F.col("sec_doc_id"))
        & (F.col("start") < F.col("sec_end"))
        & (F.col("sec_start") < F.col("end")),
        "left",
    )
    w = Window.partitionBy("doc_id", "sent_idx").orderBy(
        F.col("sec_start").asc_nulls_last(), F.col("sec_end").asc_nulls_last()
    )
    return (
        joined.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn", "sec_doc_id", "sec_start", "sec_end")
        .withColumn("zone", F.coalesce("zone", F.lit("Unknown")))
    )


def extract_sentences(
    sents: DataFrame,
    concepts: DataFrame,
    x_prefixes: list[str],
    y_prefixes: list[str],
    x_placeholder: str,
    y_placeholder: str,
    keywords: list[str] | None = None,
    excluded_ids: DataFrame | None = None,
    doc_meta: DataFrame | None = None,
) -> DataFrame:
    """SentenceExtractionFn end-to-end: sentence rows
    (doc_id, sent_idx, start, end, sentence [, zone]) × concept annotations
    (schemas.ANNOTATION) → schemas.EXTRACTED_SENTENCE rows.

    Steps: P4 prefix partition (plain startswith, :239) → P5 exclusion →
    containment join into sentences → per-sentence same-span synonym merge
    (mergeOverlappingConcepts :352-368: ids '|'-joined; we join in sorted
    order where the reference inherits nondeterministic set order) → X×Y
    pair expansion (same-id / same-span / overlapping pairs dropped —
    catalogExtractedSentences :316 + toTsv :147-152) → entity order
    normalized by span start (ExtractedSentence ctor :68-90: entity1 is
    always the leftmost, carrying its placeholder) → P3 keyword gate →
    P9 span rebase → P10 placeholders → sha256 id.

    ``other_entity_*`` lists cover EVERY concept annotation in the sentence
    including the pair entities themselves (getAllConceptsInSentence
    :341-350), with the same-span merge visible exactly as in the
    reference: the merge mutates one annotation's id to the '|'-joined
    form while the swallowed annotations keep their own ids (:352-368).

    ``doc_meta`` (doc_id, pub_year, pub_types) decorates the output;
    defaults pub_year='2155' (MedlineXmlToTextFn.java:62).

    Known deviation: concepts are matched to sentences by containment, not
    the reference's first-overlapping-sentence scan (:426-447) — identical
    whenever concepts lie within sentence bounds (every reference test
    case); a boundary-straddling concept is dropped here instead of being
    assigned spans outside the sentence (which make the reference's
    placeholder substringing throw).

    Scale: the concept→sentence join is an equi-join on doc_id with a span
    predicate — per-document data is small, the join key is
    high-cardinality, and both sides arrive pre-filtered; pair expansion
    and the synonym merge are per-sentence array ops bounded by
    annotations-per-sentence (no extra shuffle)."""
    if excluded_ids is not None:
        concepts = exclude_concepts(concepts, excluded_ids)
    c = concepts.select(
        "doc_id",
        "concept_id",
        "covered_text",
        "spans",
        _agg_start(F.col("spans")).alias("c_start"),
        _agg_end(F.col("spans")).alias("c_end"),
        _matches_prefix(F.col("concept_id"), x_prefixes).alias("is_x"),
        _matches_prefix(F.col("concept_id"), y_prefixes).alias("is_y"),
    )
    s = sents
    if "zone" not in s.columns:
        s = s.withColumn("zone", F.lit("Unknown"))
    in_sent = s.join(c, "doc_id").where(
        (F.col("c_start") >= F.col("start")) & (F.col("c_end") <= F.col("end"))
    )
    ent = F.struct(
        F.col("concept_id"), F.col("covered_text"), F.col("spans"),
        F.col("c_start"), F.col("c_end"), F.col("is_x"), F.col("is_y"),
    )

    def merge_same_span(arr: Column) -> Column:
        # one entity per distinct span list; ids of the span-group joined
        # with '|' in sorted order (arr is sorted by concept_id first)
        keys = F.array_distinct(F.transform(arr, lambda e: e["spans"]))
        return F.transform(
            keys,
            lambda sp: F.struct(
                F.array_join(
                    F.transform(
                        F.filter(arr, lambda e: e["spans"] == sp),
                        lambda m: m["concept_id"],
                    ),
                    "|",
                ).alias("concept_id"),
                F.element_at(F.filter(arr, lambda e: e["spans"] == sp), 1)[
                    "covered_text"
                ].alias("covered_text"),
                sp.alias("spans"),
                F.element_at(F.filter(arr, lambda e: e["spans"] == sp), 1)[
                    "c_start"
                ].alias("c_start"),
                F.element_at(F.filter(arr, lambda e: e["spans"] == sp), 1)[
                    "c_end"
                ].alias("c_end"),
            ),
        )

    per_sent = (
        in_sent.groupBy("doc_id", "sent_idx", "start", "end", "sentence", "zone")
        .agg(
            F.array_sort(F.collect_list(F.when(F.col("is_x"), ent))).alias("xs"),
            F.array_sort(F.collect_list(F.when(F.col("is_y"), ent))).alias("ys"),
            F.array_sort(F.collect_list(ent)).alias("all_ents"),
        )
        .withColumn("xs", merge_same_span(F.col("xs")))
        .withColumn("ys", merge_same_span(F.col("ys")))
    )
    if keywords:
        kw = F.coalesce(
            *[
                F.when(
                    F.col("sentence").rlike(r"(?i)\b" + re.escape(k) + r"\b"),
                    F.lit(k),
                )
                for k in keywords
            ]
        )
        per_sent = per_sent.withColumn("keyword", kw).where(F.col("keyword").isNotNull())
    else:
        per_sent = per_sent.withColumn("keyword", F.lit(None).cast("string"))

    pairs = (
        per_sent.select(
            "*", F.explode("xs").alias("e1")
        )
        .select("*", F.explode("ys").alias("e2"))
        .where(
            (F.col("e1.concept_id") != F.col("e2.concept_id"))
            # overlapping aggregate spans → dropped (toTsv returns null);
            # subsumes the ctor's same-span exclusion (:316)
            & ~(
                (F.col("e1.c_start") < F.col("e2.c_end"))
                & (F.col("e2.c_start") < F.col("e1.c_end"))
            )
        )
    )
    if set(x_prefixes) == set(y_prefixes):
        # single-prefix mode (e.g. PR-regulates-PR): xs and ys are the same
        # list, so keep one arm of each unordered pair — the reference's
        # HashSet collapses the two span-normalized duplicates (:324)
        pairs = pairs.where(F.col("e1.c_start") < F.col("e2.c_start"))
    if doc_meta is not None:
        pairs = pairs.join(
            doc_meta.select("doc_id", "pub_year", "pub_types"), "doc_id", "left"
        )
    else:
        pairs = pairs.withColumn("pub_year", F.lit(None).cast("string")).withColumn(
            "pub_types", F.lit(None).cast("array<string>")
        )
    # entity order normalized by span start: entity1 = leftmost, and each
    # entity keeps its own placeholder (ExtractedSentence ctor :68-90)
    swap = F.col("e2.c_start") < F.col("e1.c_start")
    pairs = (
        pairs.withColumn("e1n", F.when(swap, F.col("e2")).otherwise(F.col("e1")))
        .withColumn("e2n", F.when(swap, F.col("e1")).otherwise(F.col("e2")))
        .withColumn(
            "ph1", F.when(swap, F.lit(y_placeholder)).otherwise(F.lit(x_placeholder))
        )
        .withColumn(
            "ph2", F.when(swap, F.lit(x_placeholder)).otherwise(F.lit(y_placeholder))
        )
    )
    off = F.col("start")
    e1_spans = offset_spans(F.col("e1n.spans"), off)
    e2_spans = offset_spans(F.col("e2n.spans"), off)

    def display_id(o: Column) -> Column:
        # the id an annotation shows in the other-entity lists: the first
        # (lowest-id) member of a merged span-group carries the '|'-joined
        # id, swallowed members keep their own (mutation semantics of
        # mergeOverlappingConcepts :352-368)
        def group_ids(flag: str) -> Column:
            g = F.filter(
                F.col("all_ents"),
                lambda m: m[flag] & (m["spans"] == o["spans"]),
            )
            return F.when(
                F.element_at(g, 1)["concept_id"] == o["concept_id"],
                F.array_join(F.transform(g, lambda m: m["concept_id"]), "|"),
            ).otherwise(o["concept_id"])

        return (
            F.when(o["is_x"], group_ids("is_x"))
            .when(o["is_y"], group_ids("is_y"))
            .otherwise(o["concept_id"])
        )

    others = F.col("all_ents")
    sid = F.sha2(
        F.concat(
            F.col("doc_id"),
            F.col("zone"),
            F.col("e1n.concept_id"),
            span_str(e1_spans),
            F.col("e2n.concept_id"),
            span_str(e2_spans),
            F.col("sentence"),
        ),
        256,
    )
    return pairs.select(
        sid.alias("sentence_id"),
        "doc_id",
        F.col("e1n.concept_id").alias("entity1_id"),
        F.col("e1n.covered_text").alias("entity1_text"),
        e1_spans.alias("entity1_spans"),
        F.col("e2n.concept_id").alias("entity2_id"),
        F.col("e2n.covered_text").alias("entity2_text"),
        e2_spans.alias("entity2_spans"),
        "keyword",
        F.col("sentence").alias("sentence_text"),
        sentence_with_placeholders(
            F.col("sentence"),
            F.col("e1n.c_start") - off,
            F.col("e1n.c_end") - off,
            F.col("ph1"),
            F.col("e2n.c_start") - off,
            F.col("e2n.c_end") - off,
            F.col("ph2"),
        ).alias("sentence_with_placeholders"),
        F.col("zone").alias("doc_zone"),
        "pub_types",
        F.coalesce("pub_year", F.lit("2155")).alias("pub_year"),
        F.col("start").cast("int").alias("sentence_span_start"),
        F.transform(others, lambda o: display_id(o)).alias("other_entity_ids"),
        F.transform(others, lambda o: o["covered_text"]).alias("other_entity_texts"),
        F.transform(
            others,
            lambda o: F.struct(
                (o["c_start"] - off).cast("int").alias("start"),
                (o["c_end"] - off).cast("int").alias("end"),
            ),
        ).alias("other_entity_spans"),
    )


def extracted_sentence_tsv(extracted: DataFrame) -> DataFrame:
    """The 19-column TSV layout of ExtractedSentence.toTsv()
    (ExtractedSentence.java:147-190): one 'line' string column, tab-joined;
    pub types '|'-joined, other-entity ids ';'-joined, texts '|'-joined
    (tabs scrubbed), span lists '!'-joined."""
    span_field = lambda c: F.array_join(  # noqa: E731
        F.transform(c, lambda s: F.concat_ws(" ", s["start"], s["end"])), ";"
    )
    line = F.concat_ws(
        "\t",
        F.col("sentence_id"),
        F.col("sentence_with_placeholders"),
        F.col("doc_id"),
        F.col("entity1_text"),
        F.col("entity1_id"),
        span_field(F.col("entity1_spans")),
        F.col("entity2_text"),
        F.col("entity2_id"),
        span_field(F.col("entity2_spans")),
        F.coalesce("keyword", F.lit("")),
        F.length("sentence_text").cast("string"),
        F.lit(""),
        F.col("sentence_text"),
        F.col("doc_zone"),
        F.array_join(F.coalesce("pub_types", F.array()), "|"),
        F.col("pub_year"),
        F.col("sentence_span_start").cast("string"),
        F.array_join(F.coalesce("other_entity_ids", F.array()), ";"),
        F.regexp_replace(
            F.array_join(F.coalesce("other_entity_texts", F.array()), "|"), "\t", " "
        ),
        F.array_join(
            F.transform(
                F.coalesce("other_entity_spans", F.array()),
                lambda s: F.concat_ws(" ", s["start"], s["end"]),
            ),
            "!",
        ),
    )
    return extracted.select(line.alias("line"))
