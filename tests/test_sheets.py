"""Google-Sheets annotation tooling: sheet row layout, mock-client write,
sheet→BERT export."""

from __future__ import annotations

import base64
import hashlib

from translator_tm_provider_pipelines_spark.functions import biolink
from translator_tm_provider_pipelines_spark.operators import sheets

ASSOC = biolink.ASSOCIATIONS["biolink:ChemicalToDiseaseOrPhenotypicFeatureAssociation"]


def _extracted(spark, rows):
    return spark.createDataFrame(
        rows,
        "sentence_id string, doc_id string, entity1_id string, entity1_text string, "
        "entity2_id string, entity2_text string, sentence_text string, "
        "sentence_with_placeholders string",
    )


def _b64sha1(s: str) -> str:
    return base64.b64encode(hashlib.sha1(s.encode()).digest()).decode()


def test_sheet_header_layout():
    h = sheets.sheet_header(ASSOC)
    assert h[:9] == [
        "Sentence ID",
        "Sentence With Placeholders",
        "Document ID",
        "@CHEMICAL$",
        "Subject text",
        "@DISEASE$",
        "Object text",
        "Sentence",
        "NO RELATION PRESENT",
    ]
    assert h[9:] == ["biolink:treats", "biolink:contributes_to"]


def test_assertion_sheet_rows_semantics(spark):
    ext = _extracted(
        spark,
        [
            ("s1", "PMID:1", "CHEBI:10", "aspirin", "MONDO:20", "flu",
             "aspirin treats flu", "@CHEMICAL$ treats @DISEASE$"),
            # same sentence text, second entity pair → dedup collapses
            ("s1", "PMID:1", "CHEBI:11", "asa", "MONDO:20", "flu",
             "aspirin treats flu", "@CHEMICAL$ treats @DISEASE$"),
            # excluded id inside a piped list → dropped
            ("s2", "PMID:2", "CHEBI:5|CHEBI:36080", "protein", "MONDO:21", "x",
             "bad one", "@CHEMICAL$ vs @DISEASE$"),
            ("s3", "PMID:3", "CHEBI:12", "ibuprofen", "MONDO:22", "ache",
             "zz later sentence", "@CHEMICAL$ eases @DISEASE$"),
        ],
    )
    out = sheets.assertion_sheet_rows(ext, ASSOC, batch_size=10).orderBy("row_no").collect()
    assert [r.document_id for r in out] == ["PMID:1", "PMID:3"]
    r1 = out[0]
    assert r1.row_no == 1
    assert r1.sentence_id == _b64sha1("aspirin treats flu")
    assert r1.subject_id == "CHEBI:10" and r1.object_id == "MONDO:20"
    assert r1.sentence == "aspirin treats flu" + " " * 18
    assert r1.no_relation is True
    assert r1["biolink:treats"] is False and r1["biolink:contributes_to"] is False
    # batch cap
    capped = sheets.assertion_sheet_rows(ext, ASSOC, batch_size=1).collect()
    assert len(capped) == 1


def test_assertion_sheet_rows_inverse_and_already(spark):
    ext = _extracted(
        spark,
        [("s1", "PMID:1", "CHEBI:10", "aspirin", "MONDO:20", "flu",
          "aspirin treats flu", "@CHEMICAL$ treats @DISEASE$")],
    )
    out = sheets.assertion_sheet_rows(ext, ASSOC, batch_size=5, include_inverse=True)
    rows = out.orderBy("row_no").collect()
    assert len(rows) == 2
    assert rows[0].subject_id == "CHEBI:10" and rows[0].object_id == "MONDO:20"
    assert rows[1].subject_id == "MONDO:20" and rows[1].object_id == "CHEBI:10"
    already = ext.sparkSession.createDataFrame(
        [(_b64sha1("aspirin treats flu"),)], "hash string"
    )
    assert (
        sheets.assertion_sheet_rows(ext, ASSOC, 5, already_annotated=already).count() == 0
    )


class MockSheets:
    def __init__(self):
        self.created = []
        self.appended = {}

    def create_sheet(self, title):
        self.created.append(title)
        return f"sheet-{len(self.created)}"

    def append_values(self, sheet_id, values):
        self.appended.setdefault(sheet_id, []).extend(values)


def test_write_assertion_sheet_mock_client(spark):
    ext = _extracted(
        spark,
        [("s1", "PMID:1", "CHEBI:10", "aspirin", "MONDO:20", "flu",
          "aspirin treats flu", "@CHEMICAL$ treats @DISEASE$")],
    )
    rows = sheets.assertion_sheet_rows(ext, ASSOC, batch_size=5)
    client = MockSheets()
    sheet_id, hashes = sheets.write_assertion_sheet(client, rows, ASSOC, "batch7")
    assert client.created == ["ChemicalToDiseaseOrPhenotypicFeatureAssociation-batch7"]
    vals = client.appended[sheet_id]
    assert vals[0] == sheets.sheet_header(ASSOC)
    assert vals[1][0] == _b64sha1("aspirin treats flu")
    assert vals[1][8] is True  # NO RELATION default
    assert hashes == [_b64sha1("aspirin treats flu")]


def test_sheet_to_bert_training_last_true_wins(spark):
    rows = spark.createDataFrame(
        [
            # annotator unchecked NO-RELATION, checked treats
            ("@CHEMICAL$ treats @DISEASE$", False, True, False),
            # nothing checked beyond default → no-relation label
            ("@CHEMICAL$ near @DISEASE$", True, False, False),
            # two checked: later predicate column wins (reference scans in
            # order and keeps the last true)
            ("@CHEMICAL$ both @DISEASE$", True, True, True),
        ],
        "sentence_with_placeholders string, no_relation boolean, "
        "`biolink:treats` boolean, `biolink:contributes_to` boolean",
    )
    out = {r.sentence: r for r in sheets.sheet_to_bert_training(rows, ASSOC).collect()}
    assert out["@CHEMICAL$ treats @DISEASE$"].label == "treats"
    assert out["@CHEMICAL$ near @DISEASE$"].label == "false"
    assert out["@CHEMICAL$ both @DISEASE$"].label == "contributes_to"
    h = hashlib.sha256(b"@CHEMICAL$ treats @DISEASE$").hexdigest()
    assert out["@CHEMICAL$ treats @DISEASE$"].hash == h


def test_roundtrip_sheet_rows_to_training(spark):
    """Created sheet rows (as an annotator would return them, one box
    flipped) flow straight into the BERT exporter."""
    from pyspark.sql import functions as F

    ext = _extracted(
        spark,
        [("s1", "PMID:1", "CHEBI:10", "aspirin", "MONDO:20", "flu",
          "aspirin treats flu", "@CHEMICAL$ treats @DISEASE$")],
    )
    rows = sheets.assertion_sheet_rows(ext, ASSOC, batch_size=5)
    annotated = rows.withColumn("no_relation", F.lit(False)).withColumn(
        "biolink:treats", F.lit(True)
    )
    out = sheets.sheet_to_bert_training(annotated, ASSOC).collect()
    assert len(out) == 1 and out[0].label == "treats"
