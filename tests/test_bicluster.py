"""Percha-Altman bicluster parsers and BERT training file creation."""

from __future__ import annotations

import hashlib
import os

import pytest

from translator_tm_provider_pipelines_spark.operators import bicluster

FIXTURE = os.path.join(os.path.dirname(__file__), "fixtures", "bicluster")


@pytest.fixture(scope="module")
def path_themes(spark):
    return bicluster.part1_path_themes(spark, os.path.join(FIXTURE, "part1.tsv"))


def test_part1_flagship_themes(path_themes):
    got = {(r.dependency_path, r.theme) for r in path_themes.collect()}
    assert got == {
        ("nsubj|binds|dobj", "B_BINDING"),
        ("nsubj|binds|dobj", "Rg_REGULATION"),
        ("amod|via|xcomp", "W_ENHANCES_RESPONSE"),
    }


def test_training_rows(spark, path_themes):
    p2 = bicluster.parse_part2(spark, os.path.join(FIXTURE, "part2.tsv"))
    rows = bicluster.bert_training_rows(
        p2, path_themes,
        themes_to_include=("B_BINDING", "W_ENHANCES_RESPONSE", "Rg_REGULATION"),
    ).collect()
    by = {r.sentence: r for r in rows}
    # detokenized brackets + punctuation, placeholders on first occurrence
    assert by["@GENE$ binds (@GENE$) strongly."].theme == "b_binding"  # min of {b,rg}
    assert by["the @GENE$ protein acts via @GENE$, always."].theme == "w_enhances_response"
    # path with no flagship theme contributes nothing
    assert len(rows) == 2
    for r in rows:
        assert r.id == hashlib.sha1(r.sentence.encode()).hexdigest()
