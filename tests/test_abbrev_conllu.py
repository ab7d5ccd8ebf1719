"""Abbreviation detection (Schwartz-Hearst backend) + CoNLL-U parsing tests."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import abbreviations as AB
from translator_tm_provider_pipelines_spark.operators import conllu as CU

TEXT = (
    "The heat shock protein (HSP) family is large. "
    "We measured brain natriuretic peptide (BNP) levels. "
    "Parenthetical (not an acronym match for this text) stays out."
)


@pytest.fixture()
def abbrevs(spark):
    docs = spark.createDataFrame([("d1", TEXT)], "doc_id string, content string")
    return AB.detect_abbreviations(docs)


def test_schwartz_hearst_pairs(abbrevs):
    got = {r.short_form: r.long_form for r in abbrevs.collect()}
    assert got == {"HSP": "heat shock protein", "BNP": "brain natriuretic peptide"}


def test_spans_point_into_text(abbrevs):
    for r in abbrevs.collect():
        assert TEXT[r.sf_start:r.sf_end] == r.short_form
        assert TEXT[r.lf_start:r.lf_end] == r.long_form


def test_blanked_sentence(abbrevs):
    r = [x for x in abbrevs.collect() if x.short_form == "HSP"][0]
    assert "(HSP)" not in r.blanked_sentence
    assert "heat shock protein" in r.blanked_sentence


def test_annotations_and_augmentation(spark, abbrevs):
    annots = AB.abbreviation_annotations(abbrevs)
    types = {(r.annot_type, r.covered_text) for r in annots.collect()}
    assert ("short_form", "HSP") in types and ("long_form", "heat shock protein") in types

    docs = spark.createDataFrame([("d1", TEXT), ("d2", "no abbrevs")],
                                 "doc_id string, content string")
    aug = {r.doc_id: r.content for r in AB.augment_document_text(docs, abbrevs).collect()}
    assert aug["d2"] == "no abbrevs"
    assert AB.DOCUMENT_END_MARKER in aug["d1"]
    assert aug["d1"].startswith(TEXT)


def test_propagation(spark, abbrevs):
    from translator_tm_provider_pipelines_spark import schemas

    concepts = spark.createDataFrame(
        [("d1", "concept", "PR:000012345", [(4, 22)], "heat shock protein")],
        schema=schemas.ANNOTATION,
    )
    out = AB.propagate_long_form_concepts(concepts, abbrevs).collect()
    assert len(out) == 2
    sf = [r for r in out if r.covered_text == "HSP"][0]
    assert sf.concept_id == "PR:000012345"
    assert TEXT[sf.spans[0].start:sf.spans[0].end] == "HSP"


CONLLU = """# sent_id = 1
# text = Dogs chase cats.
1\tDogs\tdog\tNOUN\tNNS\t_\t2\tnsubj\t_\t_
2\tchase\tchase\tVERB\tVBP\t_\t0\troot\t_\t_
3\tcats\tcat\tNOUN\tNNS\t_\t2\tobj\t_\t_
4\t.\t.\tPUNCT\t.\t_\t2\tpunct\t_\t_

# sent_id = 2
# text = They run.
1-2\tThey run\t_\t_\t_\t_\t_\t_\t_\t_
1\tThey\tthey\tPRON\tPRP\t_\t2\tnsubj\t_\t_
2\trun\trun\tVERB\tVBP\t_\t0\troot\t_\t_
"""


@pytest.fixture()
def conllu_docs(spark):
    return spark.createDataFrame([("d1", CONLLU)], "doc_id string, conllu string")


def test_conllu_sentences(conllu_docs):
    rows = {r.sent_idx: r.text for r in CU.conllu_sentences(conllu_docs).collect()}
    assert rows == {0: "Dogs chase cats.", 1: "They run."}


def test_conllu_tokens_skip_ranges(conllu_docs):
    toks = CU.conllu_tokens(conllu_docs).collect()
    assert len(toks) == 6  # the 1-2 range line is skipped
    t = {(r.sent_idx, r.token_id): r for r in toks}
    assert t[(0, 1)].form == "Dogs" and t[(0, 1)].upos == "NOUN" and t[(0, 1)].head == 2
    assert t[(1, 2)].deprel == "root"


def test_dependency_edges(conllu_docs):
    edges = CU.dependency_edges(CU.conllu_tokens(conllu_docs)).collect()
    e = {(r.sent_idx, r.form): r.head_form for r in edges}
    assert e[(0, "Dogs")] == "chase"
    assert e[(0, "chase")] is None  # root
    assert e[(1, "They")] == "run"


def test_conll03_lines(conllu_docs):
    lines = CU.conll03_export(CU.conllu_tokens(conllu_docs)).collect()
    first = [r.line for r in lines if r.sent_idx == 0 and r.token_id == 1][0]
    assert first == "Dogs NNS -X- O"
