"""brat → BERT training tooling: parsing, normalization, pair generation."""

from __future__ import annotations

import hashlib
import os

import pytest

from translator_tm_provider_pipelines_spark.functions import biolink
from translator_tm_provider_pipelines_spark.operators import relext
from translator_tm_provider_pipelines_spark.sources import brat

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "brat")
ASSOC = biolink.ASSOCIATIONS["biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation"]


@pytest.fixture(scope="module")
def parsed(spark):
    ann = brat.read_brat_files(spark, FIXTURE, "ann")
    txt = brat.read_brat_files(spark, FIXTURE, "txt")
    return (
        brat.parse_ann_entities(ann),
        brat.parse_ann_relations(ann),
        brat.txt_sentences(txt),
    )


def test_parse_entities_and_relations(parsed):
    ents, rels, _ = parsed
    e = {(r.doc_id, r.ann_id): r for r in ents.collect()}
    assert e[("doc1", "T1")].entity_type == "chemical"
    assert (e[("doc1", "T2")].start, e[("doc1", "T2")].end) == (19, 31)
    assert e[("doc1", "T2")].covered_text == "rare disease"
    r = rels.collect()[0]
    assert (r.relation, r.arg1, r.arg2) == ("treats", "T1", "T2")


def test_txt_sentence_offsets(parsed):
    _, _, sents = parsed
    s = {(r.doc_id, r.sentence_text): (r.sent_start, r.sent_end) for r in sents.collect()}
    assert s[("doc1", "Bupivacaine treats rare disease today.")] == (0, 38)
    assert s[("doc1", "Aspirin is mentioned alone here.")] == (39, 71)


def test_normalize_entity_types(spark, parsed):
    ents, _, _ = parsed
    out = relext.normalize_entity_types(ents, ASSOC).collect()
    by = {(r.doc_id, r.ann_id): r.entity_type for r in out}
    # corrected_disease supersedes the overlapping original T4
    assert ("doc2", "T4") not in by
    assert by[("doc2", "T3")] == "disease_or_phenotypic_feature"
    assert by[("doc2", "T2")] == "disease_or_phenotypic_feature"
    # DONE marker dropped
    assert ("doc2", "T5") not in by


def test_training_examples(spark, parsed):
    ents, rels, sents = parsed
    rows = relext.bert_training_examples(sents, ents, rels, ASSOC).collect()
    by_sentence = {r.sentence: r for r in rows}
    assert by_sentence["@CHEMICAL$ treats @DISEASE$ today."].relation == "treats"
    assert by_sentence["@CHEMICAL$ affects @DISEASE$ and fever badly."].relation == "false"
    assert by_sentence["@CHEMICAL$ affects headache and @DISEASE$ badly."].relation == "false"
    # chemical-only sentence yields no pair
    assert not any("Aspirin" in s or "alone" in s for s in by_sentence)
    # id = sha1 hex of the substituted sentence (DigestUtils.shaHex)
    for r in rows:
        assert r.id == hashlib.sha1(r.sentence.encode()).hexdigest()


def test_discontinuous_span_envelope(spark):
    ann = spark.createDataFrame(
        [("d", "T1\tchemical 0 4;10 14\tabcd efgh")], "doc_id string, content string"
    )
    e = brat.parse_ann_entities(ann).collect()[0]
    assert (e.start, e.end) == (0, 14)


def _extracted(spark, n=5):
    rows = []
    for i in range(n):
        text = f"sent {i:02d} chemical X and disease Y here padded."
        rows.append(
            (f"CHEBI:{i}", "chem", [(9, 17)], f"HP:{i}", "dis", [(24, 31)], text)
        )
    return spark.createDataFrame(
        rows,
        "entity1_id string, entity1_text string, entity1_spans array<struct<start:int,end:int>>, "
        "entity2_id string, entity2_text string, entity2_spans array<struct<start:int,end:int>>, "
        "sentence_text string",
    )


def test_sub_batch_id(spark):
    from pyspark.sql import functions as F

    df = spark.range(4).select(
        relext.sub_batch_id(F.col("id").cast("int")).alias("s")
    )
    assert [r.s for r in df.collect()] == ["aaa", "aab", "aac", "aad"]


def test_brat_annotation_batch_pages_and_offsets(spark):
    ext = _extracted(spark, 5)
    out = relext.brat_annotation_batch(
        ext, ASSOC, batch_size=4, sentences_per_page=2
    ).collect()
    pages = {r.page for r in out}
    assert pages == {"aaa", "aab"}  # 4 sentences, 2 per page
    txt_aaa = sorted(
        [(r.line_no, r.line) for r in out if r.page == "aaa" and r.kind == "txt"]
    )
    assert txt_aaa[-1][1] == "DONE" and len(txt_aaa) == 3
    ann_aaa = sorted(
        [(r.line_no, r.line) for r in out if r.page == "aaa" and r.kind == "ann"]
    )
    # T numbering continuous through the page; second sentence's spans are
    # offset by len(first sentence) + 1
    first_len = len(txt_aaa[0][1])
    assert ann_aaa[0][1].startswith("T1\tchemical 9 17\t")
    assert ann_aaa[2][1].startswith(f"T3\tchemical {9 + first_len + 1} {17 + first_len + 1}\t")


def test_brat_annotation_batch_exclusions(spark):
    ext = _extracted(spark, 3)
    out = relext.brat_annotation_batch(
        ext, ASSOC, batch_size=10, ids_to_exclude=("CHEBI:0",)
    )
    texts = {r.line for r in out.collect() if r.kind == "txt"}
    assert not any("sent 00" in t for t in texts)
    already = ext.sparkSession.createDataFrame(
        [("x",)], "hash string"
    )  # no matching hash: nothing dropped
    out2 = relext.brat_annotation_batch(ext, ASSOC, batch_size=10, already_annotated=already)
    assert sum(1 for r in out2.collect() if r.kind == "txt" and r.line != "DONE") == 3


def test_distant_supervision_sentences(spark):
    ext = spark.createDataFrame(
        [
            ("s1", "CHEBI:1", "HP:1", "t1"),
            ("s2", "HP:1", "CHEBI:1", "t2"),   # reversed order still matches
            ("s3", "CHEBI:2", "HP:9", "t3"),   # pair not requested
            ("s4", "CHEBI:36080", "HP:1", "t4"),  # excluded general id
        ],
        "sentence_id string, entity1_id string, entity2_id string, sentence_text string",
    )
    pairs = spark.createDataFrame([("HP:1", "CHEBI:1")], "concept1 string, concept2 string")
    out = relext.distant_supervision_sentences(ext, pairs, max_per_pair=10)
    assert {r.sentence_id for r in out.collect()} == {"s1", "s2"}
    capped = relext.distant_supervision_sentences(ext, pairs, max_per_pair=1)
    assert {r.sentence_id for r in capped.collect()} == {"s1"}


def test_ner_bert_to_bionlp(spark, tmp_path):
    inp = "\n".join([
        "The\td1\t0", "BRCA1\t-\t4", "gene\t-\t10", "", "TP53\td1\t15",
    ])
    out = "\n".join([
        "The x O", "BRCA1 x B-gene", "gene x E-gene", "", "TP53 x S-gene",
    ])
    (tmp_path / "in.txt").write_text(inp)
    (tmp_path / "out.txt").write_text(out)
    tokens = relext.parse_bert_ner_files(
        spark, str(tmp_path / "in.txt"), str(tmp_path / "out.txt")
    )
    ents = {
        (r.covered_text, r.spans[0].start, r.spans[0].end, r.concept_id)
        for r in relext.ner_bert_entities(tokens).collect()
    }
    # no O token between 'gene' and 'TP53' → fixTag's same-label rule
    # merges them into one entity, exactly like the reference
    assert ents == {("BRCA1 gene TP53", 4, 19, "gene")}
    docs = {r.doc_id: r.text for r in relext.ner_bert_documents(tokens).collect()}
    assert docs["d1"] == "The BRCA1 gene TP53"


def test_ner_bert_adjacent_same_label_merge(spark):
    # fixTag quirk: B- following same-label token continues the entity
    tokens = spark.createDataFrame(
        [("d", 1, "aa", 0, "B-x"), ("d", 2, "bb", 3, "B-x"), ("d", 3, "cc", 6, "B-y")],
        "doc_id string, line_no long, token string, span_start int, tag string",
    )
    ents = relext.ner_bert_entities(tokens).collect()
    got = {(r.covered_text, r.concept_id) for r in ents}
    assert got == {("aa bb", "x"), ("cc", "y")}


def test_inception_subset(spark, tmp_path):
    content = (
        "#FORMAT=WebAnno TSV 3.3\n#T_SP=custom.Span|label\n\n"
        "#Text=The BRCA1 gene binds TP53.\n"
        "1-1\t10-13\tThe\t_\n"
        "1-2\t14-19\tBRCA1\tPR:1[7]\n"
        "1-3\t20-24\tgene\tPR:1[7]\n"
        "1-5\t31-35\tTP53\tPR:2\n\n"
        "#Text=Mice lack Xyz9 protein.\n"
        "2-1\t50-54\tMice\t_\n"
        "2-4\t64-68\tXyz9\tPR:3[9]\n"
        "2-5\t69-76\tprotein\tPR:3[9]\n\n"
        "#Text=The BRCA1 gene binds TP53.\n"
        "3-1\t90-93\tThe\t_\n"
    )
    p = tmp_path / "w.tsv"
    p.write_text(content)
    blocks = relext.parse_webanno_blocks(spark, str(p))
    out = {(r.sent_num, r.line_no): r.line for r in relext.inception_subset(blocks, 5).collect()}
    # duplicate #Text= sentence collapses to its first occurrence → 2 sentences
    assert max(s for s, _ in out) == 2
    # sentence 2 packs after sentence 1's last end (35) + 1 → shift 36
    assert out[(2, 1)] == "2-1\t86-90\tMice\t_"
    # entity indices renumber globally in first-appearance order: [7]→[1], [9]→[2]
    assert out[(1, 2)].endswith("PR:1[1]")
    assert out[(2, 4)].endswith("PR:3[2]")
    # previously annotated hashes are skipped
    import base64
    h = base64.b64encode(b"#Text=The BRCA1 gene binds TP53.").decode()
    already = spark.createDataFrame([(h,)], "hash string")
    out2 = relext.inception_subset(blocks, 5, already_annotated=already).collect()
    assert {r.sent_num for r in out2} == {1} and any("Mice" in r.line for r in out2)


def test_bio_token_tags(spark):
    """CraftToBioTagFormat parity: first overlapping token B-, rest I-,
    others O; HP remaps to MONDO; GO namespace overrides apply; ties
    resolve to the earliest concept."""
    toks = spark.createDataFrame(
        [("d1", i, s, e, t) for i, (s, e, t) in enumerate(
            [(0, 4, "Beta"), (5, 12, "catenin"), (13, 20, "protein"),
             (21, 26, "binds"), (27, 31, "DNA1")]
        )],
        "doc_id string, tok_idx int, start int, end int, token string",
    )
    concepts = spark.createDataFrame(
        [
            ("d1", "PR:1", 0, 12),    # spans two tokens -> B-PR, I-PR
            ("d1", "HP:9", 27, 31),   # HP -> MONDO
            ("d1", "GO:5", 21, 26),   # override below -> GO_BP
        ],
        "doc_id string, concept_id string, start int, end int",
    )
    out = relext.bio_token_tags(toks, concepts, label_overrides={"GO:5": "GO_BP"})
    tags = {r.tok_idx: r.tag for r in out.collect()}
    assert tags == {0: "B-PR", 1: "I-PR", 2: "O", 3: "B-GO_BP", 4: "B-MONDO"}
    lines = {r.tok_idx: r.line for r in relext.bio_tag_lines(out).collect()}
    assert lines[0] == "Beta\tB-PR" and lines[2] == "protein\tO"


def test_bio_token_tags_tie_resolution(spark):
    toks = spark.createDataFrame(
        [("d1", 0, 0, 5, "alpha")],
        "doc_id string, tok_idx int, start int, end int, token string",
    )
    concepts = spark.createDataFrame(
        [("d1", "CHEBI:2", 0, 5), ("d1", "CHEBI:1", 2, 5)],
        "doc_id string, concept_id string, start int, end int",
    )
    out = relext.bio_token_tags(toks, concepts).collect()
    # earliest-starting concept wins the single label slot
    assert out[0].tag == "B-CHEBI"


def test_concept_pairs_file_parser(spark):
    RO = "http://purl.obolibrary.org/obo/RO_0002200"
    rows = [
        ("http://purl.obolibrary.org/obo/MONDO_0000001\thttp://purl.obolibrary.org/obo/HP_0000662\t" + RO,),
        ("http://purl.obolibrary.org/obo/MONDO_0000001\thttp://purl.obolibrary.org/obo/HP_0000111\t" + RO,),
        ("http://purl.obolibrary.org/obo/MONDO_0000002\thttp://purl.obolibrary.org/obo/HP_0000111\t" + RO,),
        ("http://purl.obolibrary.org/obo/MONDO_0000003\thttp://purl.obolibrary.org/obo/HP_0000999\t"
         "http://purl.obolibrary.org/obo/RO_0001025",),  # other predicate
        ("   ",),  # blank line skipped
    ]
    lines = spark.createDataFrame(rows, "line string")
    pos = {(r.subject_curie, r.object_curie, r.predicate_biolink)
           for r in relext.positive_concept_pairs(lines, RO).collect()}
    assert pos == {
        ("MONDO:0000001", "HP:0000662", "biolink:has_phenotype"),
        ("MONDO:0000001", "HP:0000111", "biolink:has_phenotype"),
        ("MONDO:0000002", "HP:0000111", "biolink:has_phenotype"),
    }
    negs = {r.subject_curie: sorted(r.object_curies)
            for r in relext.negative_concept_pairs(lines, RO).collect()}
    # universe = {HP:0000662, HP:0000111}; MONDO:1 has both -> no negatives
    assert negs == {"MONDO:0000002": ["HP:0000662"]}
    # chunking: universe of 3 split into <=2-element groups
    rows2 = rows[:3] + [
        ("http://purl.obolibrary.org/obo/MONDO_0000002\thttp://purl.obolibrary.org/obo/HP_0000222\t" + RO,),
        ("http://purl.obolibrary.org/obo/MONDO_0000009\thttp://purl.obolibrary.org/obo/HP_0000333\t" + RO,),
    ]
    lines2 = spark.createDataFrame(rows2, "line string")
    chunks = [sorted(r.object_curies) for r in
              relext.negative_concept_pairs(lines2, RO, chunk_size=2).collect()
              if r.subject_curie == "MONDO:0000009"]
    # MONDO:9's negatives = universe minus its own {333} = {662,111,222}, chunked 2+1
    assert sorted(len(c) for c in chunks) == [1, 2]
    assert sorted(x for c in chunks for x in c) == ["HP:0000111", "HP:0000222", "HP:0000662"]


def test_promote_pair_subjects(spark):
    lines = spark.createDataFrame(
        [("PR_000010001\thttp://x/CL_0000001\tpred",),
         ("PR_999999999\thttp://x/CL_0000002\tpred",)],
        "line string",
    )
    pmap = spark.createDataFrame(
        [("PR:000010001", "PR:000010000")], "concept_id string, promoted_id string"
    )
    got = sorted(r.line for r in relext.promote_pair_subjects(lines, pmap).collect())
    assert got == [
        "PR_000010000\thttp://x/CL_0000001\tpred",   # promoted
        "PR_999999999\thttp://x/CL_0000002\tpred",   # unmapped passes through
    ]
