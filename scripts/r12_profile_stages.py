"""Decompose expensive registry queries into their component frames and
time each with the noop sink — guide §1 empirical profiling without the
UI. Usage: python scripts/r12_profile_stages.py <profile> [sf_dir]
"""

from __future__ import annotations

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from pyspark.sql import functions as F  # noqa: E402


def t(spark, name, df):
    spark.catalog.clearCache()
    spark.sparkContext.setJobDescription(f"prof:{name}")
    t0 = time.perf_counter()
    df.write.format("noop").mode("overwrite").save()
    print(f"  {name}: {time.perf_counter() - t0:.2f}s", flush=True)


def main() -> None:
    which = sys.argv[1]
    sf_dir = sys.argv[2] if len(sys.argv) > 2 else "/root/testdata/sf0.1"
    from translator_tm_provider_pipelines_spark.operators import dedup, ner, ogerdict, similarity as sim
    from translator_tm_provider_pipelines_spark.plans import testdata_queries as tq
    from translator_tm_provider_pipelines_spark.sources import obo
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name=f"r12_prof_{which}")
    spark.sparkContext.setLogLevel("ERROR")

    def tab(name):
        return spark.read.parquet(os.path.join(sf_dir, f"{name}.parquet"))

    if which == "lsh":
        docs = tab("documents")
        sig = dedup.minhash_signatures_doc(docs, num_perms=16)
        t(spark, "minhash_sig", sig)
        bands = dedup.lsh_bands(sig, 4)
        t(spark, "bands", bands)
        buckets = (
            bands.groupBy("band", "band_sig")
            .agg(F.array_sort(F.collect_set("doc_id")).alias("ds"))
            .where(F.size("ds") >= 2)
        )
        t(spark, "buckets", buckets)
        t(spark, "pairs_full", tq.QUERIES["lsh_candidate_pairs"](spark, sf_dir))
    elif which == "emb":
        emb = tab("embeddings")
        t(spark, "scan", emb)
        pairs = sim.banded_lsh_candidate_pairs(emb, n_dims=64)
        t(spark, "cand_pairs", pairs)
        t(spark, "near_dups_full", tq.QUERIES["embedding_near_duplicates"](spark, sf_dir))
        t(spark, "keep_list_full", tq.QUERIES["embedding_keep_list"](spark, sf_dir))
    elif which == "ner":
        terms = obo.read_obo_terms(spark, tq._OBO_FIXTURE)
        t(spark, "obo_terms", terms)
        d = ogerdict.build_oger_dictionary(terms, tq._TEST_DICT_CONFIG)
        t(spark, "dict_build", d)
        raw_terms = d.where(~F.col("case_sensitive")).select("term", "concept_id")
        dictionary = ner.normalize_dictionary(raw_terms)
        docs = tab("documents").select(
            F.col("doc_id").cast("string").alias("doc_id"),
            F.col("text").alias("content"),
        )
        toks = ner.tokenize_with_offsets(docs)
        t(spark, "tokenize", toks)
        annots = ner.dictionary_concept_recognition(docs, dictionary, max_term_tokens=3)
        t(spark, "ner_annots", annots)
        t(spark, "full_query", tq.QUERIES["ontology_dictionary_ner"](spark, sf_dir))
    elif which == "misc":
        for q in ("bionlp_export", "pair_top_publications", "c4_line_filters",
                  "span_containment_counts", "topk_similar_pairs", "oger_dictionary"):
            t(spark, q, tq.QUERIES[q](spark, sf_dir))
    elif which == "spans":
        sent = tq._sent_frame(spark, sf_dir)
        conc = tq._conc_frame(spark, sf_dir)
        t(spark, "sent_frame", sent)
        t(spark, "conc_frame", conc)
        t(spark, "containment_counts_full", tq.QUERIES["span_containment_counts"](spark, sf_dir))
        t(spark, "first_containing_full", tq.QUERIES["span_first_containing"](spark, sf_dir))
        t(spark, "overlap_filter_full", tq.QUERIES["span_overlap_filter"](spark, sf_dir))
    elif which == "exports":
        t(spark, "sentence_cooc_full", tq.QUERIES["sentence_cooccurrence_export"](spark, sf_dir))
        t(spark, "bionlp_full", tq.QUERIES["bionlp_export"](spark, sf_dir))
        t(spark, "bio_tag_full", tq.QUERIES["bio_tag_export"](spark, sf_dir))
        t(spark, "kgx_edge_full", tq.QUERIES["kgx_edge_export"](spark, sf_dir))
    elif which == "dict":
        terms = obo.read_obo_terms(spark, tq._OBO_FIXTURE)
        t(spark, "obo_terms", terms)
        d = ogerdict.build_oger_dictionary(terms, tq._TEST_DICT_CONFIG)
        import time as _time
        t0 = _time.perf_counter()
        d2 = ogerdict.build_oger_dictionary(terms, tq._TEST_DICT_CONFIG)
        print(f"  dict_build_construct_only: {_time.perf_counter()-t0:.2f}s", flush=True)
        t(spark, "dict_build", d)
        for q in ("oger_dictionary", "drugbank_dictionary", "taxon_promoted_dictionary",
                  "procedure_dictionary", "trapi_ontology_nt", "trapi_assoc_nt",
                  "hp_to_mondo_map", "ontology_ancestor_map"):
            if q in tq.QUERIES:
                t(spark, q, tq.QUERIES[q](spark, sf_dir))
    elif which == "misc2":
        for q in ("semmed_cui_idf", "idf_allowed_concepts", "distant_supervision_pairs",
                  "curation_manifest", "extracted_relation_sentences",
                  "concept_postprocess_chain", "minhash_band_signatures",
                  "tfidf_topk_docs", "sheet_bert_training", "annotation_sheet_export",
                  "repetition_metrics", "simhash_fingerprints", "ds_negative_pairs",
                  "dictionary_ner", "input_join_failures", "concept_count_distribution"):
            if q in tq.QUERIES:
                t(spark, q, tq.QUERIES[q](spark, sf_dir))
    spark.stop()


if __name__ == "__main__":
    main()
