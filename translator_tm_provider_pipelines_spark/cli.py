"""CLI: PipelineKey dispatch + the reference's option grammar (SURVEY §3.1).

Reference: .../etl/PipelineMain.java:124-236 — ``args[0]`` selects a
PipelineKey, the rest configure it; input documents are specified with the
``TYPE|FORMAT|PIPELINE|VERSION;...`` mini-DSL
(compileInputDocumentCriteria :1065-1078) and required status flags as a
'|'-delimited list (compileRequiredProcessingStatusFlags :1080-1086).

Each pipeline here is a thin wiring function: read partitioned parquet
tables, run the operator-layer functions, write outputs. The heavy
semantics live in ``operators/``; the CLI is replaceable by any
orchestrator (Airflow, dbt, plain spark-submit).
"""

from __future__ import annotations

import argparse
from collections.abc import Callable

from pyspark.sql import SparkSession

from .operators import documents as docops
from .operators.documents import parse_criteria  # re-export for callers


def parse_flags(spec: str | None) -> list[str]:
    """'FLAG_A|FLAG_B' → list (compileRequiredProcessingStatusFlags)."""
    if not spec:
        return []
    return [f for f in spec.split("|") if f]


def _common_io_args(p: argparse.ArgumentParser) -> None:
    p.add_argument("--documents", required=True, help="documents parquet table path")
    p.add_argument("--status", required=True, help="status parquet table path")
    p.add_argument("--output", required=True, help="output path")
    p.add_argument("--failures", help="failure side-channel output path")
    p.add_argument(
        "--inputDocumentCriteria",
        required=True,
        help="TYPE|FORMAT|PIPELINE|VERSION;... (PipelineMain.java:1065-1078)",
    )
    p.add_argument("--requiredProcessingStatusFlags", default="")
    p.add_argument("--targetProcessingStatusFlag")
    p.add_argument("--collection")
    p.add_argument("--overwrite", action="store_true")


def _load_joined(spark: SparkSession, ns: argparse.Namespace):
    status = spark.read.parquet(ns.status)
    docs = spark.read.parquet(ns.documents)
    criteria = parse_criteria(ns.inputDocumentCriteria)
    joined, failures = docops.universal_input_join(
        status,
        docs,
        criteria,
        required_flags=parse_flags(ns.requiredProcessingStatusFlags),
        target_flag=ns.targetProcessingStatusFlag,
        collection=ns.collection,
        overwrite=ns.overwrite,
    )
    if ns.failures:
        failures.write.mode("overwrite").parquet(ns.failures)
    return joined, criteria


def run_sentence_segmentation(spark: SparkSession, argv: list[str]) -> None:
    """SENTENCE_SEGMENTATION: text documents → sentence annotations."""
    from pyspark.sql import functions as F

    from .operators import sentences as sentops

    p = argparse.ArgumentParser(prog="SENTENCE_SEGMENTATION")
    _common_io_args(p)
    ns = p.parse_args(argv)
    joined, criteria = _load_joined(spark, ns)
    text = joined.select(
        "doc_id", F.col("contents").getItem(criteria[0].key).alias("content")
    )
    sents = sentops.segment_sentences(text)
    sentops.sentences_as_annotations(sents).write.mode("overwrite").parquet(ns.output)


def run_concept_cooccurrence_counts(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_COOCCURRENCE_COUNTS: annotations → doc-to-concept relation."""
    from pyspark.sql import functions as F

    p = argparse.ArgumentParser(prog="CONCEPT_COOCCURRENCE_COUNTS")
    p.add_argument("--annotations", required=True)
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    annots = spark.read.parquet(ns.annotations)
    annots.where(F.col("concept_id").isNotNull()).select(
        F.col("doc_id").alias("text_id"), "concept_id"
    ).distinct().write.mode("overwrite").parquet(ns.output)


def run_concept_cooccurrence_metrics(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_COOCCURRENCE_METRICS: doc-to-concept → pair metrics table."""
    from .operators import cooccurrence as co

    p = argparse.ArgumentParser(prog="CONCEPT_COOCCURRENCE_METRICS")
    p.add_argument("--unitConcepts", required=True)
    p.add_argument("--ancestorMap", help="(concept_id, ancestor_id) parquet")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    uc = spark.read.parquet(ns.unitConcepts)
    anc = spark.read.parquet(ns.ancestorMap) if ns.ancestorMap else None
    co.cooccurrence_chain_from_rows(uc, ancestors=anc).write.mode(
        "overwrite"
    ).parquet(ns.output)


def run_concept_idf(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_IDF: doc-to-concept → per-concept IDF."""
    from .operators import cooccurrence as co

    p = argparse.ArgumentParser(prog="CONCEPT_IDF")
    p.add_argument("--unitConcepts", required=True)
    p.add_argument("--ancestorMap")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    uc = spark.read.parquet(ns.unitConcepts)
    anc = spark.read.parquet(ns.ancestorMap) if ns.ancestorMap else None
    co.concept_idf(uc, ancestors=anc).write.mode("overwrite").parquet(ns.output)


def run_medline_xml_to_text(spark: SparkSession, argv: list[str]) -> None:
    """MEDLINE_XML_TO_TEXT: PubMed XML → documents + section annotations."""
    from .sources import medline

    p = argparse.ArgumentParser(prog="MEDLINE_XML_TO_TEXT")
    p.add_argument("--xml", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--sectionsOutput")
    ns = p.parse_args(argv)
    docs = medline.medline_documents(medline.read_medline_xml(spark, ns.xml))
    docs.write.mode("overwrite").parquet(ns.output)
    if ns.sectionsOutput:
        medline.medline_section_annotations(docs).write.mode("overwrite").parquet(
            ns.sectionsOutput
        )


def run_bioc_to_text(spark: SparkSession, argv: list[str]) -> None:
    """BIOC_TO_TEXT: PMC BioC XML → documents + section annotations."""
    from .sources import bioc

    p = argparse.ArgumentParser(prog="BIOC_TO_TEXT")
    p.add_argument("--xml", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--sectionsOutput")
    ns = p.parse_args(argv)
    docs = bioc.bioc_documents(bioc.read_bioc_xml(spark, ns.xml))
    docs.write.mode("overwrite").parquet(ns.output)
    if ns.sectionsOutput:
        bioc.bioc_section_annotations(docs).write.mode("overwrite").parquet(
            ns.sectionsOutput
        )


def run_biorxiv_xml_to_text(spark: SparkSession, argv: list[str]) -> None:
    """BIORXIV_XML_TO_TEXT: JATS XML files → documents."""
    from .sources import bioc

    p = argparse.ArgumentParser(prog="BIORXIV_XML_TO_TEXT")
    p.add_argument("--xml", required=True)
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    bioc.jats_documents(spark, ns.xml).write.mode("overwrite").parquet(ns.output)


def run_file_load(spark: SparkSession, argv: list[str]) -> None:
    """FILE_LOAD: <dir>/*<suffix> files → documents (id = basename)."""
    from .sources import files as filesrc

    p = argparse.ArgumentParser(prog="FILE_LOAD")
    p.add_argument("--dir", required=True)
    p.add_argument("--suffix", default=".txt")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    filesrc.load_files(spark, ns.dir, ns.suffix).write.mode("overwrite").parquet(ns.output)


def run_oger(spark: SparkSession, argv: list[str]) -> None:
    """OGER: dictionary concept recognition over text documents."""
    from .operators import ner

    p = argparse.ArgumentParser(prog="OGER")
    p.add_argument("--documents", required=True, help="(doc_id, content) parquet")
    p.add_argument("--dictionary", required=True, help="(term, concept_id) parquet")
    p.add_argument("--output", required=True)
    p.add_argument("--caseSensitive", action="store_true")
    p.add_argument("--maxTermTokens", type=int, default=3)
    ns = p.parse_args(argv)
    docs = spark.read.parquet(ns.documents)
    dictionary = ner.normalize_dictionary(spark.read.parquet(ns.dictionary))
    ner.dictionary_concept_recognition(
        docs, dictionary,
        max_term_tokens=ns.maxTermTokens,
        case_insensitive=not ns.caseSensitive,
    ).write.mode("overwrite").parquet(ns.output)


def run_concept_post_process(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_POST_PROCESS: stopword/short/bracket/nesting cleanup chain."""
    from .operators import conceptfilters as cf

    p = argparse.ArgumentParser(prog="CONCEPT_POST_PROCESS")
    p.add_argument("--annotations", required=True)
    p.add_argument("--output", required=True)
    p.add_argument("--lengthThreshold", type=int, default=4)
    ns = p.parse_args(argv)
    annots = spark.read.parquet(ns.annotations)
    out = cf.remove_nested_annotations(
        cf.remove_odd_bracket_matches(
            cf.remove_ncbi_stopwords(
                cf.remove_matches_less_than(annots, ns.lengthThreshold)
            )
        )
    )
    out.write.mode("overwrite").parquet(ns.output)


def run_sentence_extraction(spark: SparkSession, argv: list[str]) -> None:
    """SENTENCE_EXTRACTION: relation-candidate sentences for an association."""
    from .functions import biolink
    from .operators import ner, sentences as sentops

    p = argparse.ArgumentParser(prog="SENTENCE_EXTRACTION")
    p.add_argument("--documents", required=True, help="(doc_id, content) parquet")
    p.add_argument("--annotations", required=True, help="concept annotations parquet")
    p.add_argument("--association", required=True, choices=sorted(biolink.ASSOCIATIONS))
    p.add_argument("--keywords", default="")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    docs = spark.read.parquet(ns.documents)
    annots = spark.read.parquet(ns.annotations)
    sents = sentops.segment_sentences(docs)
    ext = sentops.extract_sentences(
        sents, annots,
        keywords=[k for k in ns.keywords.split("|") if k] or None,
        **biolink.extraction_args(ns.association),
    )
    sentops.extracted_sentence_tsv(ext).write.mode("overwrite").text(ns.output)


def run_abbreviation(spark: SparkSession, argv: list[str]) -> None:
    """ABBREVIATION: Schwartz-Hearst short/long-form annotation pairs."""
    from .operators import abbreviations as ab

    p = argparse.ArgumentParser(prog="ABBREVIATION")
    p.add_argument("--documents", required=True)
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    abbrevs = ab.detect_abbreviations(spark.read.parquet(ns.documents))
    ab.abbreviation_annotations(abbrevs).write.mode("overwrite").parquet(ns.output)


def run_dependency_parse_to_sentence(spark: SparkSession, argv: list[str]) -> None:
    """DEPENDENCY_PARSE_TO_SENTENCE: CoNLL-U → sentence rows."""
    from .operators import conllu

    p = argparse.ArgumentParser(prog="DEPENDENCY_PARSE_TO_SENTENCE")
    p.add_argument("--conllu", required=True, help="(doc_id, conllu) parquet")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    conllu.conllu_sentences(spark.read.parquet(ns.conllu)).write.mode(
        "overwrite"
    ).parquet(ns.output)


def run_dependency_parse_to_conll03(spark: SparkSession, argv: list[str]) -> None:
    """DEPENDENCY_PARSE_TO_CONLL03: CoNLL-U → CoNLL03 token lines."""
    from .operators import conllu

    p = argparse.ArgumentParser(prog="DEPENDENCY_PARSE_TO_CONLL03")
    p.add_argument("--conllu", required=True)
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    conllu.conll03_export(
        conllu.conllu_tokens(spark.read.parquet(ns.conllu))
    ).write.mode("overwrite").parquet(ns.output)


def run_filter_unactionable_text(spark: SparkSession, argv: list[str]) -> None:
    """FILTER_UNACTIONABLE_TEXT: truncate trailing non-actionable sections."""
    from .operators import conceptfilters as cf

    p = argparse.ArgumentParser(prog="FILTER_UNACTIONABLE_TEXT")
    p.add_argument("--documents", required=True)
    p.add_argument("--sections", required=True)
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    cf.filter_unactionable_text(
        spark.read.parquet(ns.documents), spark.read.parquet(ns.sections)
    ).write.mode("overwrite").parquet(ns.output)


def run_concept_count_distribution(spark: SparkSession, argv: list[str]) -> None:
    """CONCEPT_COUNT_DISTRIBUTION: (count, concept, label) TSV."""
    from .operators import exports as ex

    p = argparse.ArgumentParser(prog="CONCEPT_COUNT_DISTRIBUTION")
    p.add_argument("--unitConcepts", required=True)
    p.add_argument("--labels")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    uc = spark.read.parquet(ns.unitConcepts)
    labels = spark.read.parquet(ns.labels) if ns.labels else None
    from .sources.sinks import write_tsv

    write_tsv(ex.concept_count_distribution(uc, labels), ns.output)


def run_classified_sentence_storage(spark: SparkSession, argv: list[str]) -> None:
    """CLASSIFIED_SENTENCE_STORAGE: scores ⋈ metadata → assertion DB tables."""
    from .functions import biolink
    from .operators import classified as clf

    p = argparse.ArgumentParser(prog="CLASSIFIED_SENTENCE_STORAGE")
    p.add_argument("--bertOutput", required=True, help="classifier TSV lines")
    p.add_argument("--metadata", required=True, help="EXTRACTED_SENTENCE parquet")
    p.add_argument("--association", required=True, choices=sorted(biolink.ASSOCIATIONS))
    p.add_argument("--bertScoreInclusionMinimumThreshold", type=float, required=True)
    p.add_argument("--outputDir", required=True)
    ns = p.parse_args(argv)
    assoc = biolink.ASSOCIATIONS[ns.association]
    scores = clf.parse_bert_output(spark.read.text(ns.bertOutput), list(assoc.predicates))
    tables = clf.classified_sentence_tables(
        scores,
        spark.read.parquet(ns.metadata),
        association_id=assoc.association_id,
        subject_placeholder=assoc.subject.placeholder,
        entity1_placeholder=assoc.subject.placeholder,
        threshold=ns.bertScoreInclusionMinimumThreshold,
    )
    for name, df in tables.items():
        df.write.mode("overwrite").parquet(f"{ns.outputDir.rstrip('/')}/{name}")


def run_elasticsearch_load(spark: SparkSession, argv: list[str]) -> None:
    """ELASTICSEARCH_LOAD: sentence JSON docs → bulk-format lines."""
    from .operators import exports as ex
    from .sources.sinks import es_bulk_lines

    p = argparse.ArgumentParser(prog="ELASTICSEARCH_LOAD")
    p.add_argument("--sentences", required=True, help="(sentence_id, doc_id, sentence, start, end, concepts) parquet")
    p.add_argument("--index", default="sentences")
    p.add_argument("--output", required=True)
    ns = p.parse_args(argv)
    docs = ex.es_sentence_json(spark.read.parquet(ns.sentences))
    es_bulk_lines(docs, ns.index, "sentence_id", "json").write.mode("overwrite").text(
        ns.output
    )


#: PipelineKey → runner (the implemented subset of PipelineMain.java:124-236;
#: keys match the reference's PipelineKey enum verbatim)
PIPELINES: dict[str, Callable[[SparkSession, list[str]], None]] = {
    "SENTENCE_SEGMENTATION": run_sentence_segmentation,
    "CONCEPT_COOCCURRENCE_COUNTS": run_concept_cooccurrence_counts,
    "CONCEPT_COOCCURRENCE_METRICS": run_concept_cooccurrence_metrics,
    "CONCEPT_IDF": run_concept_idf,
    "MEDLINE_XML_TO_TEXT": run_medline_xml_to_text,
    "BIOC_TO_TEXT": run_bioc_to_text,
    "BIORXIV_XML_TO_TEXT": run_biorxiv_xml_to_text,
    "FILE_LOAD": run_file_load,
    "OGER": run_oger,
    "CONCEPT_POST_PROCESS": run_concept_post_process,
    "SENTENCE_EXTRACTION": run_sentence_extraction,
    "ABBREVIATION": run_abbreviation,
    "DEPENDENCY_PARSE_TO_SENTENCE": run_dependency_parse_to_sentence,
    "DEPENDENCY_PARSE_TO_CONLL03": run_dependency_parse_to_conll03,
    "FILTER_UNACTIONABLE_TEXT": run_filter_unactionable_text,
    "CONCEPT_COUNT_DISTRIBUTION": run_concept_count_distribution,
    "CLASSIFIED_SENTENCE_STORAGE": run_classified_sentence_storage,
    "ELASTICSEARCH_LOAD": run_elasticsearch_load,
}


def main(argv: list[str] | None = None) -> int:
    import sys

    args = list(sys.argv[1:] if argv is None else argv)
    if not args or args[0] in ("-h", "--help"):
        print("usage: engine <PIPELINE_KEY> [pipeline options]")
        print("pipelines: " + ", ".join(sorted(PIPELINES)))
        return 0 if args else 2
    key = args[0]
    if key not in PIPELINES:
        raise SystemExit(
            f"unknown pipeline key {key!r}; known: {', '.join(sorted(PIPELINES))}"
        )
    from .session import get_spark

    spark = get_spark(app_name=f"engine-{key.lower()}")
    PIPELINES[key](spark, args[1:])
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
