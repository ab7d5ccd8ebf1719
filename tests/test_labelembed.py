"""Embedding-based label quality tooling (LabelFilterByEmbedding parity)."""

from __future__ import annotations

import gzip

from translator_tm_provider_pipelines_spark.operators import labelembed, similarity


def test_read_word_embeddings(spark, tmp_path):
    p = tmp_path / "vecs.txt"
    p.write_text(
        "3 4\n"
        "aspirin 0.1 0.2 0.3 0.4\n"
        "malformed 0.1 0.2\n"
        "fever -1 0 0.5 2\n"
    )
    got = {r.word: list(r.embedding) for r in
           labelembed.read_word_embeddings(spark, str(p)).collect()}
    assert got == {
        "aspirin": [0.1, 0.2, 0.3, 0.4],
        "fever": [-1.0, 0.0, 0.5, 2.0],
    }


def test_overlapping_labels(spark):
    rows = [("C1", "shared"), ("C2", "shared"), ("C3", "shared"),
            ("C4", "pair"), ("C5", "pair"), ("C6", "unique")]
    labels = spark.createDataFrame(rows, "concept_id string, label string")
    out = labelembed.overlapping_labels(labels).collect()
    assert [(r.label, r.n_ids) for r in out] == [("shared", 3), ("pair", 2)]
    assert list(out[0].sample_ids) == ["C1", "C2", "C3"]
    # specific mode lowercases the key and restricts
    sp = labelembed.overlapping_labels(
        labels.unionByName(
            spark.createDataFrame([("C7", "SHARED")], "concept_id string, label string")
        ),
        specific=["Shared"],
    ).collect()
    assert [(r.label, r.n_ids) for r in sp] == [("shared", 4)]


def test_english_word_labels(spark):
    labels = spark.createDataFrame(
        [("C1", "acid"), ("C2", "Acid"), ("C3", "metformin")],
        "concept_id string, label string",
    )
    words = spark.createDataFrame([("acid",), ("focus",)], "word string")
    got = {(r.concept_id, r.label) for r in
           labelembed.english_word_labels(labels, words).collect()}
    # case-sensitive, unlike the dictionary-build-side lowercase filter
    assert got == {("C1", "acid")}


def test_domain_average_reference_fold_and_mean(spark):
    vecs = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0]), ("c", [4.0, 1.0])],
        "word string, embedding array<double>",
    )
    ref = {r.d: r.value for r in
           labelembed.domain_average_embedding(vecs).collect()}
    # fold in word order: ((a+b)/2 + c)/2 = ([0.5,0.5] + [4,1])/2
    assert ref == {0: 2.25, 1: 0.75}
    mean = {r.d: r.value for r in
            labelembed.domain_average_embedding(vecs, strategy="mean").collect()}
    assert mean == {0: round(5 / 3, 6), 1: round(2 / 3, 6)}


def test_label_embedding_flags(spark):
    word_vecs = spark.createDataFrame(
        [("benzene", [1.0, 0.1]), ("focus", [-1.0, 0.2]), ("acid", [0.9, 0.0])],
        "word string, embedding array<double>",
    )
    labels = spark.createDataFrame(
        [("C1", "benzene"), ("C2", "focus"), ("C3", "acid"),
         ("C4", "two tokens"), ("C5", "unembedded")],
        "concept_id string, label string",
    )
    avg = [1.0, 0.0]  # the "chemical direction"
    out = {r.concept_id: r.cosine for r in
           labelembed.label_embedding_flags(labels, word_vecs, avg, threshold=0.1).collect()}
    assert set(out) == {"C2"}       # far-from-domain label flagged
    assert out["C2"] < 0            # opposite direction
