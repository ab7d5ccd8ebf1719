"""Concept-annotation post-processing chain (SURVEY §2.2 P6/P7/P8).

Reference:
- OGER spurious-match filter: .../etl/fn/OgerPostProcessingFn.java
  (removeSpuriousMatches :134-197, isDigitsAndPunctOnly :199-206)
- concept post-process chain: .../etl/fn/ConceptPostProcessingFn.java
  (postProcess :215-251 — taxon promotion, NCBI stopwords, id-text
  exclusions, odd-bracket filter :261-283, len<4 removal :1071-1082,
  HP/MONDO same-span dedup :353-400, nested removal :299-317, augmented
  section cleanup :1125-1140)
- unactionable-text truncation: .../etl/fn/FilterUnactionableTextFn.java
  (filterUnactionableText :115-145)

Fidelity notes (intent implemented, quirks documented):
- the reference's ``isDigitsAndPunctOnly`` calls ``String.replace`` with the
  literal text "\\p{Punct}" (not a regex), so punctuation is never actually
  stripped there; we implement the documented intent (digits AND punctuation
  stripped, <2 letters remaining → spurious).
- the reference's odd-bracket check computes ``open - (close % 2) != 0`` due
  to Java operator precedence; we implement the documented intent —
  unbalanced bracket counts of any kind → drop.

All steps are native DataFrame transforms. The only self-joins (nested
removal, same-span dedup, taxon promotion) are equi-joins on the
high-cardinality ``doc_id`` (plus span equality where applicable), so their
per-key fan-out is bounded by annotations-per-document and they scale
linearly with the corpus.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, Window
from pyspark.sql import functions as F

#: augmented-document separator (UtilityOgerDictFileFactory.java:26)
DOCUMENT_END_MARKER = "zzzDOCUMENTzENDzzz"

#: default English stopword list (the reference uses the external
#: StopWordUtil.STOPWORDS from the ucdenver nlp-core lib — a standard
#: English list; override per call for exact parity with a custom list)
DEFAULT_STOPWORDS = (
    "a an and are as at be but by for if in into is it no not of on or such "
    "that the their then there these they this to was will with which we were "
    "has have had he she his her its from all can may been who what when our"
).split()


def _agg_start(spans: Column) -> Column:
    return F.array_min(F.transform(spans, lambda s: s["start"]))


def _agg_end(spans: Column) -> Column:
    return F.array_max(F.transform(spans, lambda s: s["end"]))


# ---------------------------------------------------------------------------
# P7 — OGER spurious-match filter
# ---------------------------------------------------------------------------


def _is_digits_punct_only(ct: Column) -> Column:
    """<2 letters remain after stripping digits, punctuation, whitespace."""
    stripped = F.regexp_replace(ct, r"[\d\p{Punct}\s]", "")
    return F.length(stripped) < 2


def remove_spurious_matches(annots: DataFrame, dict_entries: DataFrame) -> DataFrame:
    """P7 (OgerPostProcessingFn.removeSpuriousMatches:134-197): keep an
    annotation iff some dictionary entry for its concept id is a close
    match of its covered text:

    - covered text: consecutive whitespace collapsed; digits+punct-only
      matches always dropped;
    - per entry: normalized Levenshtein ``dist/len(entry)`` must be < 0.3;
    - covered text containing '/' must match an entry exactly;
    - entries that extend the covered text with a pure digit suffix are
      lexical traps (``per`` vs ``Per1``) and do not count;
    - concept ids absent from the dictionary pass through unfiltered.

    ``dict_entries`` = (concept_id, dict_entry) rows, one entry per row
    (the reference stores '|'-delimited strings). The dictionary is
    broadcast; Levenshtein runs JVM-side; verdicts aggregate back per
    annotation with no second shuffle of the annotation table."""
    ct = F.regexp_replace(F.col("covered_text"), r"\s+", " ")
    tagged = annots.select("*", ct.alias("__ct")).where(~_is_digits_punct_only(F.col("__ct")))
    d = dict_entries.select("concept_id", F.col("dict_entry").alias("__entry"))
    joined = tagged.join(F.broadcast(d), "concept_id", "left")
    lower_ct = F.lower(F.col("__ct"))
    lower_entry = F.lower(F.col("__entry"))
    dist = F.levenshtein(lower_ct, lower_entry)
    pct = dist.cast("float") / F.length("__entry").cast("float")
    digit_suffix_trap = (
        lower_entry.startswith(lower_ct)
        & F.regexp_like(
            F.substring(lower_entry, F.length(lower_ct) + 1, F.length(lower_entry)),
            F.lit(r"^\d+$"),
        )
    )
    entry_ok = F.when(
        F.col("__entry").isNull(), F.lit(None).cast("boolean")
    ).otherwise(
        F.when(lower_ct.contains("/") & (pct != 0.0), False).otherwise(
            (pct < 0.3) & ~digit_suffix_trap
        )
    )
    group_cols = [c for c in annots.columns]
    return (
        joined.withColumn("__ok", entry_ok)
        .groupBy(*group_cols)
        .agg(
            F.max("__ok").alias("__any_ok"),
            F.count("__ok").alias("__n_entries"),
        )
        .where((F.col("__n_entries") == 0) | F.col("__any_ok"))
        .select(*group_cols)
    )


# ---------------------------------------------------------------------------
# P8 — concept post-processing steps
# ---------------------------------------------------------------------------


def remove_matches_less_than(annots: DataFrame, length_threshold: int = 4) -> DataFrame:
    """Drop annotations with covered text shorter than the threshold
    (removeMatchesLessThan :1071-1082; chain uses 4)."""
    return annots.where(F.length("covered_text") >= length_threshold)


def remove_ncbi_stopwords(
    annots: DataFrame, stopwords: list[str] | None = None
) -> DataFrame:
    """Keep annotations longer than 2 chars whose lowercase covered text is
    not a stopword (removeNcbiStopWords :1185-1197)."""
    sw = [s.lower() for s in (stopwords or DEFAULT_STOPWORDS)]
    return annots.where(
        (F.length("covered_text") > 2) & ~F.lower("covered_text").isin(sw)
    )


#: OGER-normalization false positives enumerated by the reference
#: (initIdToTextExclusionMap :1340-1368) — the default exclusion list.
ID_TO_TEXT_EXCLUSION_PAIRS = (
    ("CL:0000540", "neuronal"),
    ("GO:0043473", "pigmented"),
    ("GO:0007349", "cellular"),
    ("GO:0005694", "chromosomal"),
    ("UBERON:0000062", "organisms"),
    ("UBERON:0012131", "central"),
    ("UBERON:0012131", "centrally"),
    ("UBERON:3010060", "central"),
    ("UBERON:3010060", "centrally"),
    ("UBERON:0001451", "central"),
    ("UBERON:0001451", "centrally"),
    ("UBERON:0001427", "radial"),
    ("UBERON:0001427", "radially"),
    ("UBERON:0000094", "membrane organization"),
    ("UBERON:0000160", "intestinal"),
    ("HP:0030212", "collecting"),
    ("MONDO:0005047", "sterile"),
    ("GO:0051179", "local"),
    ("GO:0008152", "metabolic"),
    ("GO:0060073", "urine"),
)


def remove_id_text_exclusion_pairs(
    annots: DataFrame, pairs: DataFrame | None = None
) -> DataFrame:
    """Drop (concept_id, covered-text) combinations on the exclusion list,
    case-insensitive (removeIdToTextExclusionPairs :1162-1182). ``pairs`` =
    (concept_id, text) rows; defaults to the reference's built-in
    ID_TO_TEXT_EXCLUSION_PAIRS map; broadcast anti-join."""
    if pairs is None:
        pairs = annots.sparkSession.createDataFrame(
            list(ID_TO_TEXT_EXCLUSION_PAIRS), "concept_id string, text string"
        )
    p = pairs.select(
        "concept_id", F.lower(F.col("text")).alias("__extext")
    ).distinct()
    return (
        annots.withColumn("__extext", F.lower("covered_text"))
        .join(F.broadcast(p), ["concept_id", "__extext"], "left_anti")
        .drop("__extext")
    )


def convert_extension_to_obo(annots: DataFrame, extension_map: DataFrame) -> DataFrame:
    """Convert CRAFT extension-class ids to their OBO id(s)
    (convertExtensionToObo :1312-1332): a mapped annotation fans out to one
    row per target OBO id; unmapped annotations pass through unchanged.
    ``extension_map`` = (extension_id, obo_id) rows — one row per target
    (a one-to-many extension class appears on several rows). The output is
    de-duplicated: a converted annotation that collides with an existing
    one collapses, mirroring the reference's set semantics."""
    m = extension_map.select(
        F.col("extension_id").alias("concept_id"), F.col("obo_id").alias("__obo")
    ).distinct()
    return (
        annots.join(F.broadcast(m), "concept_id", "left")
        .withColumn("concept_id", F.coalesce("__obo", "concept_id"))
        .drop("__obo")
        .distinct()
    )


def promote_pr_annots(annots: DataFrame, promotion_map: DataFrame) -> DataFrame:
    """Promote PR (protein) annotations to their promotion-map target id
    (promotePrAnnots :1286-1302): mapped ids are replaced, unmapped pass
    through; promoted annotations that collide with existing ones collapse
    (set semantics). ``promotion_map`` = (concept_id, promoted_id) rows."""
    m = promotion_map.select("concept_id", F.col("promoted_id").alias("__pro")).distinct()
    return (
        annots.join(F.broadcast(m), "concept_id", "left")
        .withColumn("concept_id", F.coalesce("__pro", "concept_id"))
        .drop("__pro")
        .distinct()
    )


def remove_odd_bracket_matches(annots: DataFrame) -> DataFrame:
    """Drop annotations whose covered text has unbalanced {}, [] or ()
    (removeAnythingWithOddBracketCount :261-283 — see module quirk note)."""
    ct = F.col("covered_text")

    def count(ch: str) -> Column:
        return F.length(ct) - F.length(F.regexp_replace(ct, re_escape(ch), ""))

    def re_escape(ch: str) -> str:
        return "\\" + ch

    balanced = (
        (count("{") == count("}"))
        & (count("[") == count("]"))
        & (count("(") == count(")"))
    )
    return annots.where(balanced)


def dedup_same_span_hp_mondo(annots: DataFrame) -> DataFrame:
    """If an HP annotation has the identical aggregate span as a MONDO
    annotation (same doc), discard the HP one (:353-400)."""
    mondo = (
        annots.where(F.col("concept_id").startswith("MONDO:"))
        .select(
            "doc_id",
            _agg_start(F.col("spans")).alias("__s"),
            _agg_end(F.col("spans")).alias("__e"),
        )
        .distinct()
    )
    hp = F.col("concept_id").startswith("HP:")
    keyed = annots.select(
        "*", _agg_start(F.col("spans")).alias("__s"), _agg_end(F.col("spans")).alias("__e")
    )
    return (
        keyed.join(
            mondo.withColumn("__is_mondo_span", F.lit(True)),
            ["doc_id", "__s", "__e"],
            "left",
        )
        .where(~(hp & F.coalesce("__is_mondo_span", F.lit(False))))
        .drop("__s", "__e", "__is_mondo_span")
    )


def promote_ncbitaxon_annots(annots: DataFrame, taxon_ancestors: DataFrame) -> DataFrame:
    """Among NCBITaxon annotations sharing an identical aggregate span in a
    document, keep the more general class: a taxon annotation is dropped
    when a same-span taxon annotation of one of its ancestor classes exists
    (promoteNcbiTaxonAnnots :1208-1260). ``taxon_ancestors`` =
    (concept_id, ancestor_id) rows, broadcast."""
    taxon = F.col("concept_id").startswith("NCBITaxon:")
    keyed = annots.select(
        "*", _agg_start(F.col("spans")).alias("__s"), _agg_end(F.col("spans")).alias("__e")
    )
    span_taxa = keyed.where(taxon).select(
        "doc_id", "__s", "__e", F.col("concept_id").alias("__other_id")
    )
    anc = taxon_ancestors.select(
        F.col("concept_id").alias("__cid"), F.col("ancestor_id").alias("__anc_id")
    )
    # (annot, same-span taxon annot that is an ancestor of it) pairs
    dropped = (
        keyed.where(taxon)
        .join(span_taxa, ["doc_id", "__s", "__e"])
        .where(F.col("concept_id") != F.col("__other_id"))
        .join(
            F.broadcast(anc),
            (F.col("concept_id") == F.col("__cid"))
            & (F.col("__other_id") == F.col("__anc_id")),
            "left_semi",
        )
        .select("doc_id", "concept_id", "__s", "__e")
        .distinct()
        .withColumn("__drop", F.lit(True))
    )
    return (
        keyed.join(dropped, ["doc_id", "concept_id", "__s", "__e"], "left")
        .where(~F.coalesce("__drop", F.lit(False)))
        .drop("__s", "__e", "__drop")
    )


def remove_nested_annotations(annots: DataFrame) -> DataFrame:
    """Drop annotations nested inside OR partially overlapped by an
    earlier-starting annotation of the same document
    (removeNestedConceptAnnotations :299-316 →
    ExcludeCraftNestedConcepts.identifyNestedAnnotations with
    ExcludeExactOverlaps.NO): per overlapping pair, identical aggregate
    spans keep BOTH; a containing annotation beats the contained one; a
    partial overlap keeps the annotation that appears first in the
    document (pinned by testHandlingOfPartialOverlapOfConcepts /
    testHandlingOfExactOverlapOfConcepts). Collapsed, an annotation is
    dropped iff some annotation STARTING STRICTLY BEFORE it overlaps it,
    or some SAME-START annotation ends strictly after it — existence is
    tested against the ORIGINAL set, exactly like the reference's pairwise
    scan (a dropped annotation can still knock out a later one).

    Sweep-line over two window functions instead of a per-document
    self-join (measured 2× faster, and O(n log n) per document instead of
    O(n²) — the self-join's quadratic fan-out is what breaks on documents
    with thousands of annotations at full scale): running max-end over the
    strictly-before range frame, plus a same-start max. One exchange on
    doc_id; the second window reuses the first's partitioning and sort."""
    keyed = annots.select(
        "*", _agg_start(F.col("spans")).alias("__s"), _agg_end(F.col("spans")).alias("__e")
    )
    before = (
        Window.partitionBy("doc_id")
        .orderBy("__s")
        .rangeBetween(Window.unboundedPreceding, -1)
    )
    same_start = Window.partitionBy("doc_id", "__s")
    keyed = keyed.withColumn(
        "__max_end_before", F.coalesce(F.max("__e").over(before), F.lit(-1))
    ).withColumn("__max_end_same", F.max("__e").over(same_start))
    return keyed.where(
        ~(
            (F.col("__max_end_before") > F.col("__s"))
            | (F.col("__max_end_same") > F.col("__e"))
        )
    ).drop("__s", "__e", "__max_end_before", "__max_end_same")


def filter_annots_in_augmented_section(
    annots: DataFrame, docs: DataFrame, text_col: str = "content"
) -> DataFrame:
    """Drop annotations that start inside the augmented (post-marker)
    document section (filterAnnotsInAugmentedDocSection :1125-1140).
    ``docs`` = (doc_id, text); docs without the marker keep everything."""
    cutoff = docs.select(
        "doc_id",
        (F.instr(F.col(text_col), DOCUMENT_END_MARKER) - 1).alias("__cut"),
    )
    return (
        annots.join(cutoff, "doc_id", "left")
        .withColumn("__start", _agg_start(F.col("spans")))
        .where(
            F.col("__cut").isNull()
            | (F.col("__cut") < 0)
            | (F.col("__start") < F.col("__cut"))
        )
        .drop("__cut", "__start")
    )


#: concept types with no CRF model — always pass through
#: (PipelineMain.filterConceptAnnotations:1250-1286)
CRF_PASSTHROUGH_PREFIXES = ("DRUGBANK", "SNOMEDCT")


def filter_via_crf(
    concepts: DataFrame,
    crf: DataFrame,
    passthrough_prefixes: tuple[str, ...] = CRF_PASSTHROUGH_PREFIXES,
) -> DataFrame:
    """J4 (PipelineMain.filterViaCrf:1297-1324 + filterConceptAnnotations
    :1250-1286): keep a concept annotation iff some CRF annotation overlaps
    its aggregate span in the same document; concept types without a CRF
    model pass through unfiltered (union, not join). Left-semi equi-join
    on doc_id with the overlap predicate."""
    pfx = F.split(F.col("concept_id"), ":").getItem(0)
    passthrough = concepts.where(pfx.isin(list(passthrough_prefixes)))
    candidates = concepts.where(~pfx.isin(list(passthrough_prefixes)))
    c = candidates.select(
        "*", _agg_start(F.col("spans")).alias("__s"), _agg_end(F.col("spans")).alias("__e")
    )
    k = crf.select(
        F.col("doc_id").alias("__doc"),
        _agg_start(F.col("spans")).alias("__ks"),
        _agg_end(F.col("spans")).alias("__ke"),
    )
    confirmed = (
        c.join(
            k,
            (F.col("doc_id") == F.col("__doc"))
            & (F.col("__s") < F.col("__ke"))
            & (F.col("__ks") < F.col("__e")),
            "left_semi",
        )
        .drop("__s", "__e")
    )
    return confirmed.unionByName(passthrough)


# ---------------------------------------------------------------------------
# P6 — unactionable-text truncation
# ---------------------------------------------------------------------------

DEFAULT_UNACTIONABLE_SECTIONS = (
    "references",
    "acknowledgements",
    "acknowledgments",
    "supplementary material",
    "competing interests",
    "author contributions",
    "abbreviations",
    "funding",
)


def filter_unactionable_text(
    docs: DataFrame,
    sections: DataFrame,
    unactionable_types: tuple[str, ...] = DEFAULT_UNACTIONABLE_SECTIONS,
    text_col: str = "content",
) -> DataFrame:
    """P6 (FilterUnactionableTextFn.filterUnactionableText:115-145): walk
    sections bottom-up and truncate the document at the start of the
    contiguous trailing run of non-actionable sections (references,
    acknowledgements, ...). Sections whose run is interrupted by an
    actionable section are kept.

    Implemented as a per-document sorted-array expression: sections are
    collected, sorted by start descending, and the truncation point is the
    start of the last element of the leading all-unactionable prefix —
    ``aggregate`` with a (still_trailing, cutoff) accumulator. One shuffle
    (the groupBy), no Python."""
    low = [t.lower() for t in unactionable_types]
    sec = sections.select(
        "doc_id",
        F.struct(
            (-_agg_start(F.col("spans"))).alias("neg_start"),
            F.lower(F.col("annot_type")).isin(low).alias("unactionable"),
            _agg_start(F.col("spans")).alias("start"),
        ).alias("s"),
    )
    per_doc = sec.groupBy("doc_id").agg(F.array_sort(F.collect_list("s")).alias("ss"))
    cutoff = F.aggregate(
        F.col("ss"),
        F.struct(F.lit(True).alias("trailing"), F.lit(None).cast("int").alias("cut")),
        lambda acc, s: F.struct(
            (acc["trailing"] & s["unactionable"]).alias("trailing"),
            F.when(acc["trailing"] & s["unactionable"], s["start"])
            .otherwise(acc["cut"])
            .alias("cut"),
        ),
    )["cut"]
    return (
        docs.join(per_doc, "doc_id", "left")
        .withColumn("__cut", F.when(F.col("ss").isNotNull(), cutoff))
        .withColumn(
            text_col,
            F.when(
                F.col("__cut").isNotNull(),
                F.rtrim(F.substring(F.col(text_col), 1, F.col("__cut"))),
            ).otherwise(F.col(text_col)),
        )
        .drop("ss", "__cut")
    )
