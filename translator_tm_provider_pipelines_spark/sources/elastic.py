"""Elasticsearch sentence-selection client for brat annotation batches.

Parity with ``relation_extraction/ElasticsearchToBratExporter.java``: the
reference queries a sentence index (boolean must over per-ontology-prefix
``annotatedText`` match stanzas), scrolls results in 10 000-hit pages
until ``maxReturnCount`` sentences survive filtering, deserializes the
``(covered text)[CONCEPT_ID&…]`` annotated-text markup back into
sentence + entity annotations, and feeds the selected sentences to the
brat .ann/.txt batch writer.

Spark-first split: the HTTP search/scroll is inherently a driver-side
client (it selects a few hundred sentences for a human annotation batch),
so it runs against a pluggable ``transport`` — anything with
``search(index, query, size, scroll)`` and ``scroll(scroll_id, scroll)``
returning Elasticsearch response dicts (a mock in tests, an
``HttpTransport`` over stdlib urllib in production). Everything after
selection is distributed: the surviving sentences become a DataFrame of
extracted-sentence rows and reuse ``operators.relext.brat_annotation_batch``
for page/offset/T-numbering semantics.
"""

from __future__ import annotations

import hashlib
import json
import re
from typing import Iterable, Iterator

from pyspark.sql import DataFrame, SparkSession

from ..functions import biolink

#: sentences fetched per search/scroll page (SEARCH_BATCH_SIZE,
#: ElasticsearchToBratExporter.java:67)
SEARCH_BATCH_SIZE = 10000

#: overly-general concepts excluded from annotation batches
#: (IDENTIFIERS_TO_EXCLUDE, ElasticsearchToBratExporter.java:77-84)
IDENTIFIERS_TO_EXCLUDE = (
    "CHEBI:36080",      # protein
    "PR:000000001",     # protein
    "CL:0000000",       # cell
    "MONDO:0000001",    # disease
    "HP:0002664",       # tumor
    "MONDO:0005070",    # tumor
    "DRUGBANK:DB00118",
)

#: resources/elastic/elastic_boolean_query_template.json, verbatim
BOOLEAN_QUERY_TEMPLATE = (
    "{\n"
    '\t"bool": {\n'
    '\t\t"must": [\n'
    "\t\t\tMATCH_PLACEHOLDER\n"
    "\t\t]\n"
    "\t}\n"
    "}"
)

#: resources/elastic/elastic_annotatedtext_match_template.json, verbatim
ANNOTATED_TEXT_MATCH_TEMPLATE = (
    "{\n"
    '\t"match": {\n'
    '\t\t"annotatedText": {\n'
    '\t\t\t"query": "QUERY_PLACEHOLDER",\n'
    '\t\t\t"operator": "BOOLEAN_OPERATOR_PLACEHOLDER"\n'
    "\t\t}\n"
    "\t}\n"
    "}"
)


def _sorted_prefix_query_strings(prefix_sets: Iterable[Iterable[str]]) -> list[str]:
    """'_'-prefixed (index representation), space-joined within a set,
    sets sorted for determinism (getSortedOntologyPrefixQueryStrings,
    ElasticsearchToBratExporter.java:689-703)."""
    out = [" ".join("_" + p for p in sorted(s)).strip() for s in prefix_sets]
    return sorted(out)


def create_annotated_text_match_stanza(query_string: str) -> str:
    """One ``match`` block ORing a prefix set's tokens; single-token
    queries drop the operator line and its preceding comma
    (createAnnotatedTextMatchStanza, ElasticsearchToBratExporter.java:
    712-740)."""
    stanza = ANNOTATED_TEXT_MATCH_TEMPLATE.replace("QUERY_PLACEHOLDER", query_string)
    stanza = stanza.replace("BOOLEAN_OPERATOR_PLACEHOLDER", "or")
    if " " not in query_string:
        lines = []
        for line in stanza.split("\n"):
            if "query" in line:
                line = line[:-1]  # trailing comma
            if "operator" not in line:
                lines.append(line)
        stanza = "\n".join(lines) + "\n"
    return stanza


def build_sentence_query(prefix_sets: Iterable[Iterable[str]]) -> str:
    """Boolean-must query JSON requiring a hit to mention at least one
    prefix from EVERY set (buildSentenceQuery,
    ElasticsearchToBratExporter.java:643-668)."""
    stanzas = ",\n".join(
        create_annotated_text_match_stanza(q)
        for q in _sorted_prefix_query_strings(prefix_sets)
    )
    return BOOLEAN_QUERY_TEMPLATE.replace("MATCH_PLACEHOLDER", stanzas + "\n")


def decode_annotated_text(s: str) -> str:
    """Reverse the index-side encoding of %/=/parens
    (ElasticsearchDocumentCreatorFn.decode :190-198)."""
    return (
        s.replace("%25", "%").replace("%3D", "=").replace("%29", ")").replace("%28", "(")
    )


def compute_sentence_identifier(sentence_text: str) -> str:
    """sha256 hex of the sentence text (computeSentenceIdentifier,
    ElasticsearchDocumentCreatorFn.java:205-207)."""
    return hashlib.sha256(sentence_text.encode("utf-8")).hexdigest()


_ANNOT_RE = re.compile(r"\(([^\(]*?)\)\[(.*?)\]")


def parse_annotated_text(
    annotated_text: str,
    ontology_prefixes: set[str],
    allowable_concept_ids: dict[str, set[str]] | None = None,
) -> tuple[str, list[dict]]:
    """``(covered text)[ID1&ID2&_PREFIX]`` markup → (sentence text,
    entity annotations) with spans relative to the clean sentence
    (deserializeAnnotatedText, ElasticsearchToBratExporter.java:756-828).

    Concept ids in the markup use ``_`` for ``:``; bare ``_PREFIX``
    tokens are the per-span prefix markers and are skipped. Ids keep only
    prefixes in ``ontology_prefixes``; if ``allowable_concept_ids`` maps
    a prefix, ids under that prefix must be listed to survive."""
    decoded = decode_annotated_text(annotated_text)
    annots: list[dict] = []
    parts: list[str] = []
    annotated_offset = 0
    sentence_offset = 0
    for m in _ANNOT_RE.finditer(decoded):
        parts.append(decoded[annotated_offset : m.start()])
        covered = m.group(1)
        parts.append(covered)
        span_start = m.start() - sentence_offset
        span_end = span_start + len(covered)
        for concept in m.group(2).split("&"):
            if concept.startswith("_") or "_" not in concept:
                continue
            prefix = concept[: concept.index("_")]
            if prefix not in ontology_prefixes:
                continue
            cid = concept.replace("_", ":")
            if (
                allowable_concept_ids is not None
                and prefix in allowable_concept_ids
                and cid not in allowable_concept_ids[prefix]
            ):
                continue
            annots.append(
                {"start": span_start, "end": span_end, "text": covered, "concept_id": cid}
            )
        annotated_offset = m.end()
        sentence_offset += len(m.group()) - len(covered)
    parts.append(decoded[annotated_offset:])
    return "".join(parts), annots


def filter_entity_annotations(
    annots: list[dict],
    association: biolink.BiolinkAssociation,
    ids_to_exclude: Iterable[str] = IDENTIFIERS_TO_EXCLUDE,
) -> list[dict] | None:
    """Drop excluded/out-of-class annotations; the sentence survives only
    if BOTH the association's subject and object classes remain
    represented (excludeBasedOnEntityIds,
    ElasticsearchToBratExporter.java:367-402)."""
    classes = {association.subject, association.object}
    prefix_to_class = {p: c for c in classes for p in c.prefixes}
    present = {c: False for c in classes}
    excluded = set(ids_to_exclude)
    keep = []
    for a in annots:
        cid = a["concept_id"]
        prefix = cid.split(":", 1)[0]
        if cid not in excluded and prefix in prefix_to_class:
            keep.append(a)
            present[prefix_to_class[prefix]] = True
    return keep if all(present.values()) else None


def scroll_search(
    transport,
    index: str,
    query_json: str,
    batch_size: int = SEARCH_BATCH_SIZE,
    scroll: str = "1m",
) -> Iterator[list[dict]]:
    """Search + scroll paging: yield each page's hit list until a page
    comes back empty (search, ElasticsearchToBratExporter.java:519-590).
    The caller breaks early once it has enough surviving sentences, like
    the reference's ``docsToReturn.size() < maxReturnCount`` loop."""
    resp = transport.search(index=index, query=query_json, size=batch_size, scroll=scroll)
    while True:
        hits = resp.get("hits", {}).get("hits", [])
        if not hits:
            return
        yield hits
        scroll_id = resp.get("_scroll_id")
        resp = transport.scroll(scroll_id=scroll_id, scroll=scroll)


def search_sentences(
    transport,
    index: str,
    association: biolink.BiolinkAssociation,
    max_return: int,
    prefix_sets: Iterable[Iterable[str]] | None = None,
    allowable_concept_ids: dict[str, set[str]] | None = None,
    ids_to_exclude: Iterable[str] = IDENTIFIERS_TO_EXCLUDE,
    already_assigned_ids: set[str] | None = None,
    batch_size: int = SEARCH_BATCH_SIZE,
) -> list[dict]:
    """Scroll the sentence index until ``max_return`` sentences survive
    filtering (or hits run out). Returns sentence dicts
    (id=sha256(text), text, annotations) — feed them to
    :func:`extracted_sentence_rows` + ``relext.brat_annotation_batch``.

    Defaults mirror the reference driver: one prefix set per association
    side (subject prefixes, object prefixes), both required to match."""
    if prefix_sets is None:
        prefix_sets = [association.subject.prefixes, association.object.prefixes]
    include_prefixes = {p for s in prefix_sets for p in s}
    already = already_assigned_ids or set()
    query = build_sentence_query(prefix_sets)
    out: list[dict] = []
    seen: set[str] = set()
    for hits in scroll_search(transport, index, query, batch_size=batch_size):
        for hit in hits:
            source = hit.get("_source", {})
            text, annots = parse_annotated_text(
                source.get("annotatedText", ""), include_prefixes, allowable_concept_ids
            )
            kept = filter_entity_annotations(annots, association, ids_to_exclude)
            if kept is None or not kept:
                continue
            sid = compute_sentence_identifier(text)
            if sid in already or sid in seen:
                continue
            seen.add(sid)
            out.append({"id": sid, "text": text, "annotations": kept})
        if len(out) >= max_return:
            break
    return out


def extracted_sentence_rows(
    spark: SparkSession,
    sentences: list[dict],
    association: biolink.BiolinkAssociation,
) -> DataFrame:
    """Selected sentences → the extracted-sentence relation
    ``relext.brat_annotation_batch`` consumes: one row per
    (subject entity, object entity) mention pair, spans as
    array<struct<start,end>>."""
    subj_prefixes = set(association.subject.prefixes)
    obj_prefixes = set(association.object.prefixes)
    same_class = subj_prefixes == obj_prefixes
    rows = []
    for s in sentences:
        subjects = [a for a in s["annotations"] if a["concept_id"].split(":")[0] in subj_prefixes]
        if same_class:
            objects = subjects  # e.g. gene-regulates-gene: pair within class
        else:
            objects = [
                a for a in s["annotations"] if a["concept_id"].split(":")[0] in obj_prefixes
            ]
        for e1 in subjects:
            for e2 in objects:
                if same_class and e1 is e2:
                    continue
                rows.append(
                    (
                        s["id"],
                        s["text"],
                        e1["concept_id"],
                        e1["text"],
                        [(e1["start"], e1["end"])],
                        e2["concept_id"],
                        e2["text"],
                        [(e2["start"], e2["end"])],
                    )
                )
    return spark.createDataFrame(
        rows,
        "sentence_id string, sentence_text string, "
        "entity1_id string, entity1_text string, entity1_spans array<struct<start:int,end:int>>, "
        "entity2_id string, entity2_text string, entity2_spans array<struct<start:int,end:int>>",
    )


class HttpTransport:
    """Minimal stdlib transport for a live Elasticsearch endpoint:
    POST ``/{index}/_search?scroll=…`` and ``/_search/scroll`` with an
    ``Authorization: ApiKey`` header (the reference's RestClient setup,
    ElasticsearchToBratExporter.java:527-538). ``opener`` is injectable
    for tests; the default is ``urllib.request.urlopen``."""

    def __init__(self, base_url: str, api_key: str | None = None, opener=None):
        if opener is None:  # pragma: no cover - exercised via injection
            from urllib.request import urlopen

            opener = urlopen
        self.base_url = base_url.rstrip("/")
        self.api_key = api_key
        self._opener = opener

    def _post(self, path: str, body: dict) -> dict:
        from urllib.request import Request

        headers = {"Content-Type": "application/json"}
        if self.api_key:
            headers["Authorization"] = "ApiKey " + self.api_key
        req = Request(
            self.base_url + path,
            data=json.dumps(body).encode("utf-8"),
            headers=headers,
            method="POST",
        )
        with self._opener(req) as resp:
            return json.loads(resp.read().decode("utf-8"))

    def search(self, index: str, query: str, size: int, scroll: str) -> dict:
        return self._post(
            f"/{index}/_search?scroll={scroll}",
            {"size": size, "query": json.loads(query)},
        )

    def scroll(self, scroll_id: str, scroll: str) -> dict:
        return self._post("/_search/scroll", {"scroll": scroll, "scroll_id": scroll_id})


def catalog_sentence_ids(spark, base_dir: str) -> "DataFrame":
    """Distinct sentence ids (sha256 hex of each non-DONE line) across
    every .txt annotation file under ``base_dir``, recursively — the
    already-annotated ledger fed back into :func:`search_sentences`
    (SentenceIdFileGenerator.catalogSentences :28-48)."""
    from pyspark.sql import functions as F

    lines = spark.read.option("recursiveFileLookup", "true").text(
        base_dir, pathGlobFilter="*.txt"
    )
    return (
        lines.where(F.col("value") != "DONE")
        .select(F.sha2(F.col("value"), 256).alias("id"))
        .distinct()
    )


def allowable_concept_ids_map(
    idf_rows: DataFrame,
    association: biolink.BiolinkAssociation,
    subject_idf_threshold: float = -1.0,
    object_idf_threshold: float = -1.0,
    go_bp_ids: set[str] | None = None,
    go_cc_ids: set[str] | None = None,
) -> dict[str, set[str]]:
    """Prefix → allowable-concept-id map for :func:`search_sentences`
    (annot_batch_cli/BatchCreateCommand.loadOntologyPrefixToAllowableConceptIdsMap
    :196-226 + the populate/threshold helpers :246-320).

    ``idf_rows`` is the (concept_id, level, idf) relation the concept-IDF
    operator produces (the reference reads the same triple from CSV).
    Per association side: GO-backed classes restrict to their
    namespace id list (``go_bp_ids`` / ``go_cc_ids``) and keep listed ids
    outright when the threshold is negative, else only document-level ids
    above it; other classes filter by class prefix + threshold, and a
    negative threshold means no filtering for that side at all. The
    GO_BP + GO_CC pairing is rejected, as in the reference (the search
    cannot distinguish the namespaces)."""
    s_cls, o_cls = association.subject, association.object
    go_classes = {"BIOLOGICAL_PROCESS", "CELLULAR_COMPONENT"}
    if {s_cls.name, o_cls.name} == go_classes:
        raise ValueError("Cannot handle GO_BP + GO_CC pairing.")

    from pyspark.sql import functions as F

    def input_ids(cls):
        if cls.name == "BIOLOGICAL_PROCESS":
            return go_bp_ids
        if cls.name == "CELLULAR_COMPONENT":
            return go_cc_ids
        return None

    out: dict[str, set[str]] = {}

    def add(cls, threshold):
        ids = input_ids(cls)
        if ids:
            rows = idf_rows.where(F.col("concept_id").isin(sorted(ids)))
            if threshold >= 0:
                rows = rows.where(
                    (F.col("idf") > threshold) & (F.col("level") == "document")
                )
        elif threshold > 0:
            prefix = F.split(F.col("concept_id"), ":").getItem(0)
            rows = idf_rows.where(
                prefix.isin(list(cls.prefixes))
                & (F.col("idf") > threshold)
                & (F.col("level") == "document")
            )
        else:
            return
        # bounded collect: the distinct set is one annotation batch's
        # allowable concept vocabulary (a single biolink class filtered by
        # IDF threshold — thousands of ids, not corpus-scale); the guard
        # below turns a mis-wired unfiltered input into a loud error
        # instead of a silent driver OOM
        ids_rows = rows.select("concept_id").distinct().limit(1_000_001).collect()
        if len(ids_rows) > 1_000_000:
            raise ValueError(
                "allowable-concept-id set exceeds 1M ids; the IDF input is "
                "not a per-class vocabulary — check the threshold/class wiring"
            )
        for r in ids_rows:
            out.setdefault(r.concept_id.split(":")[0], set()).add(r.concept_id)

    add(s_cls, subject_idf_threshold)
    add(o_cls, object_idf_threshold)
    return out


def create_brat_batch(
    spark,
    transport,
    index: str,
    association: biolink.BiolinkAssociation,
    batch_size: int,
    sentences_per_page: int = 20,
    already_assigned_ids: set[str] | None = None,
    allowable_concept_ids: dict[str, set[str]] | None = None,
    max_search: int = 49999,
) -> DataFrame:
    """End-to-end batch creation (BatchCreateCommand.createBatch
    :85-137): search the sentence index (capped at the reference's
    49 999), turn survivors into extracted-sentence rows, and hand them
    to the brat page writer. Returns the (page, kind, line_no, line)
    relation to write one .ann/.txt pair per page."""
    from ..operators import relext

    sentences = search_sentences(
        transport,
        index,
        association,
        max_return=max_search,
        allowable_concept_ids=allowable_concept_ids,
        already_assigned_ids=already_assigned_ids,
    )
    rows = extracted_sentence_rows(spark, sentences, association)
    return relext.brat_annotation_batch(
        rows, association, batch_size=batch_size, sentences_per_page=sentences_per_page
    )


def build_sentence_text_query(sentence_text: str) -> str:
    """Debug/lookup query for one literal sentence: a single
    ``annotatedText`` match stanza with the ``and`` operator
    (ElasticsearchQueryUtil.buildSentenceQuery :77-90) — every token of
    the sentence must appear."""
    stanza = ANNOTATED_TEXT_MATCH_TEMPLATE.replace("QUERY_PLACEHOLDER", sentence_text)
    return stanza.replace("BOOLEAN_OPERATOR_PLACEHOLDER", "and")
