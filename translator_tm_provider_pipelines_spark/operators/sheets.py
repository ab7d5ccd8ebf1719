"""Google-Sheets assertion-annotation tooling.

Parity with ``relation_extraction/GoogleSheetsAssertionAnnotationSheetCreator
.java`` (extracted sentences → one annotation spreadsheet row each, with a
NO-RELATION checkbox plus one checkbox column per candidate predicate) and
``GoogleSheetsToBertInputFileCreator.java`` (annotated rows → BERT training
TSV).

Spark-first split, same shape as ``sources/elastic.py``: row selection,
filtering, hashing and cell layout are DataFrame expressions; only the
final append of a (bounded, batch-sized) row set goes through a pluggable
``SheetsClient`` — a mock in tests, a real Sheets API wrapper in
production (credentials/network the reference also requires). The
sheet→BERT direction is pure column algebra over rows fetched by the same
client.
"""

from __future__ import annotations

from typing import Iterable, Protocol

from pyspark.sql import DataFrame, Window
from pyspark.sql import functions as F

from ..functions import biolink
from ..functions.hashing import sha1_base64, sha256_hex

#: GoogleSheetsAssertionAnnotationSheetCreator.java:111-113
SHEET_IDENTIFIERS_TO_EXCLUDE = (
    "CHEBI:36080",
    "CL:0000000",
    "PR:000000001",
    "MONDO:0000001",
    "DRUGBANK:DB00118",
)

#: fixed header cells before the per-predicate columns
#: (writeHeaderToSpreadsheet :395-423)
_FIXED_HEADER = (
    "Sentence ID",
    "Sentence With Placeholders",
    "Document ID",
    None,  # subject placeholder
    "Subject text",
    None,  # object placeholder
    "Object text",
    "Sentence",
    "NO RELATION PRESENT",
)


def sheet_header(association: biolink.BiolinkAssociation) -> list[str]:
    """Header row: fixed columns (subject/object placeholders inline) then
    one column per non-NO-RELATION predicate."""
    header = list(_FIXED_HEADER)
    header[3] = association.subject.placeholder
    header[5] = association.object.placeholder
    return header + [p for p in association.predicates if p != biolink.NO_RELATION]


def assertion_sheet_rows(
    extracted: DataFrame,
    association: biolink.BiolinkAssociation,
    batch_size: int,
    include_inverse: bool = False,
    already_annotated: DataFrame | None = None,
    ids_to_exclude: Iterable[str] = SHEET_IDENTIFIERS_TO_EXCLUDE,
    entity1_is_subject: bool = True,
) -> DataFrame:
    """Extracted-sentence rows → annotation-sheet rows
    (createNewSpreadsheet + getSentenceCellData,
    GoogleSheetsAssertionAnnotationSheetCreator.java:201-344, 451-491).

    Mirrored semantics: rows whose entity ids ('|'-splittable) intersect
    the exclusion set drop; sentences dedup on the base64-sha1 text hash
    with previously-annotated hashes removed; the NO-RELATION cell
    defaults true and every predicate cell false; the sentence cell
    carries the reference's 18-space tail (kept verbatim so round-trips
    compare byte-equal); ``include_inverse`` appends a subject/object-
    swapped copy of each row. One deliberate change, same as the brat
    batch writer: the reference samples sentences randomly, this takes
    the first ``batch_size`` ordered by sentence text so batches
    reproduce.

    Output: (row_no, sentence_id, sentence_with_placeholders,
    document_id, subject_id, subject_text, object_id, object_text,
    sentence, no_relation, predicate columns…). ``row_no`` starts at 1
    (row 0 is the header)."""
    excl = list(ids_to_exclude)
    id_hit = lambda c: F.exists(  # noqa: E731
        F.split(F.col(c), r"\|"), lambda x: x.isin(excl)
    )
    rows = extracted.where(~id_hit("entity1_id") & ~id_hit("entity2_id")).withColumn(
        "hash", sha1_base64(F.col("sentence_text"))
    )
    if already_annotated is not None:
        rows = rows.join(already_annotated, "hash", "left_anti")

    w_dup = Window.partitionBy("hash").orderBy("sentence_text", "entity1_id", "entity2_id")
    rows = rows.withColumn("__rn", F.row_number().over(w_dup)).where(F.col("__rn") == 1)
    rows = (
        rows.withColumn(
            "__i", F.row_number().over(Window.orderBy("sentence_text")) - 1
        )
        .where(F.col("__i") < batch_size)
    )

    if entity1_is_subject:
        subj_id, subj_text = F.col("entity1_id"), F.col("entity1_text")
        obj_id, obj_text = F.col("entity2_id"), F.col("entity2_text")
    else:
        subj_id, subj_text = F.col("entity2_id"), F.col("entity2_text")
        obj_id, obj_text = F.col("entity1_id"), F.col("entity1_text")

    predicates = [p for p in association.predicates if p != biolink.NO_RELATION]

    def layout(s_id, s_text, o_id, o_text, order_key):
        cols = [
            order_key.alias("__ord"),
            F.col("hash").alias("sentence_id"),
            F.col("sentence_with_placeholders"),
            F.col("doc_id").alias("document_id"),
            s_id.alias("subject_id"),
            s_text.alias("subject_text"),
            o_id.alias("object_id"),
            o_text.alias("object_text"),
            # the reference pads the sentence cell with trailing spaces
            # (getSentenceCellData :488) so the colored text run fits
            F.concat(F.col("sentence_text"), F.lit(" " * 18)).alias("sentence"),
            F.lit(True).alias("no_relation"),
        ]
        cols += [F.lit(False).alias(p) for p in predicates]
        return rows.select(*cols)

    fwd = layout(subj_id, subj_text, obj_id, obj_text, F.col("__i") * 2)
    if include_inverse:
        inv = layout(obj_id, obj_text, subj_id, subj_text, F.col("__i") * 2 + 1)
        fwd = fwd.unionByName(inv)
    return fwd.withColumn(
        "row_no", F.row_number().over(Window.orderBy("__ord"))
    ).drop("__ord")


class SheetsClient(Protocol):  # pragma: no cover - structural type only
    def create_sheet(self, title: str) -> str: ...

    def append_values(self, sheet_id: str, values: list[list]) -> None: ...


def write_assertion_sheet(
    client: SheetsClient,
    sheet_rows: DataFrame,
    association: biolink.BiolinkAssociation,
    batch_id: str,
) -> tuple[str, list[str]]:
    """Create '<ASSOCIATION>-<batchId>' and append header + rows through
    the client (createNewSheet + batchUpdate,
    GoogleSheetsAssertionAnnotationSheetCreator.java:201-346). The collect
    is bounded by the batch size — annotation batches are hundreds of
    rows. Returns (sheet id, hashes output) so the caller can append the
    hashes to its previously-annotated ledger, as the reference does."""
    title = f"{association.association_id.split(':')[-1]}-{batch_id}"
    sheet_id = client.create_sheet(title)
    header = sheet_header(association)
    data_cols = [c for c in sheet_rows.columns if c != "row_no"]
    collected = sheet_rows.orderBy("row_no").select(*data_cols).collect()
    client.append_values(sheet_id, [header] + [list(r) for r in collected])
    hashes = sorted({r["sentence_id"] for r in collected})
    return sheet_id, hashes


def sheet_to_bert_training(
    rows: DataFrame,
    association: biolink.BiolinkAssociation,
) -> DataFrame:
    """Annotated sheet rows → BERT training rows (hash, sentence with
    placeholders, predicate label)
    (GoogleSheetsToBertInputFileCreator.exportRowsToBertTrainingFile
    :26-70): the predicate is the LAST checked checkbox scanning
    NO-RELATION then the predicate columns in order; the hash is sha256
    hex of the placeholder sentence. Pure projection — no client needed
    once the rows are local/ingested."""
    ordered = [biolink.NO_RELATION] + [
        p for p in association.predicates if p != biolink.NO_RELATION
    ]
    label = F.lit(None).cast("string")
    for p in ordered:  # later columns override: last true wins
        col = "no_relation" if p == biolink.NO_RELATION else p
        label = F.when(F.col(col).cast("boolean"), F.lit(biolink.PREDICATES[p])).otherwise(
            label
        )
    return rows.select(
        sha256_hex(F.col("sentence_with_placeholders")).alias("hash"),
        F.col("sentence_with_placeholders").alias("sentence"),
        label.alias("label"),
    )
