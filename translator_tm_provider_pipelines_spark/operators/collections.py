"""Collection maintenance + remaining export shapes.

Reference:
- collection assignment / redo collections:
  .../etl/CollectionAssignmentPipeline.java, .../etl/UpdateIdCollectionPipeline.java
  — add/remove collection labels on status (and document) rows for
  collection-at-a-time reprocessing.
- Medline status refresh: .../etl/UpdateMedlineStatusEntities-style backfill
  of pub_year/pub_types onto status rows.
- text export (Turku hand-off): .../etl/CollectionAssignmentPipeline.java
  header comment — each document's text prefixed with
  ``###C: DOCUMENT_ID\t<id>`` and ``###C: DOCUMENT_COLLECTIONS\tc1|c2``.
- PubAnnotation JSON: .../etl/util/serialization/PubAnnotationFormatter.java
  — {text, denotations: [{id, span: {begin, end}, obj}]} per document.

All pure column expressions; collection edits are array ops on the status
table (one narrow pass — at 100 TB this replaces per-entity Datastore
rewrites with a partition-overwrite).
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F


def assign_collection(
    status: DataFrame, doc_ids: DataFrame | None, collection: str
) -> DataFrame:
    """Add ``collection`` to the listed documents' collection sets
    (idempotent: array_union). ``doc_ids=None`` adds to EVERY row as a
    pure column edit — no join, nothing broadcast (broadcasting the full
    corpus id set is exactly the OOM the reference's side inputs hit)."""
    if doc_ids is None:
        return status.withColumn(
            "collections",
            F.array_union(
                F.coalesce("collections", F.array()), F.array(F.lit(collection))
            ),
        )
    marked = doc_ids.select("doc_id").distinct().withColumn("__add", F.lit(True))
    return (
        status.join(F.broadcast(marked), "doc_id", "left")
        .withColumn(
            "collections",
            F.when(
                F.col("__add"),
                F.array_union(
                    F.coalesce("collections", F.array()), F.array(F.lit(collection))
                ),
            ).otherwise(F.col("collections")),
        )
        .drop("__add")
    )


def remove_collection(
    status: DataFrame, collection: str, doc_ids: DataFrame | None = None
) -> DataFrame:
    """Remove ``collection`` everywhere (or only from the listed ids)."""
    removed = F.array_remove(F.coalesce("collections", F.array()), collection)
    if doc_ids is None:
        return status.withColumn("collections", removed)
    marked = doc_ids.select("doc_id").distinct().withColumn("__rm", F.lit(True))
    return (
        status.join(F.broadcast(marked), "doc_id", "left")
        .withColumn(
            "collections",
            F.when(F.col("__rm"), removed).otherwise(F.col("collections")),
        )
        .drop("__rm")
    )


def update_medline_status(status: DataFrame, medline_docs: DataFrame) -> DataFrame:
    """Backfill pub_year / pub_types on status rows from freshly-parsed
    Medline documents (UPDATE_MEDLINE_STATUS_ENTITIES): newest parse wins
    (max pub_year per doc — deterministic), missing stays as-is. The
    update side is reduced to one row per doc_id first so duplicate parse
    rows cannot fan out status rows."""
    upd = medline_docs.groupBy("doc_id").agg(
        F.max_by(
            F.struct(F.col("pub_year").alias("y"), F.col("pub_types").alias("t")),
            F.coalesce("pub_year", F.lit("")),
        ).alias("__u")
    ).select("doc_id", F.col("__u.y").alias("__year"), F.col("__u.t").alias("__types"))
    return (
        status.join(upd, "doc_id", "left")
        .withColumn("pub_year", F.coalesce("__year", "pub_year"))
        .withColumn("pub_types", F.coalesce("__types", "pub_types"))
        .drop("__year", "__types")
    )


def text_export_lines(
    docs: DataFrame, doc_id: str = "doc_id", text: str = "content"
) -> DataFrame:
    """TEXT_EXPORT: the Turku hand-off format — per document, a
    ``###C: DOCUMENT_ID`` comment, a ``###C: DOCUMENT_COLLECTIONS`` comment
    ('|'-joined), then the text (one 'line' column; write with
    ``write.text``)."""
    collections = (
        F.array_join(F.coalesce(F.col("collections"), F.array()), "|")
        if "collections" in docs.columns
        else F.lit("")
    )
    line = F.concat(
        F.lit("###C: DOCUMENT_ID\t"),
        F.col(doc_id),
        F.lit("\n###C: DOCUMENT_COLLECTIONS\t"),
        collections,
        F.lit("\n"),
        F.col(text),
    )
    return docs.select(line.alias("line"))


def pubannotation_json(
    docs: DataFrame, annots: DataFrame, source_db: str = "PubMed"
) -> DataFrame:
    """PUBANNOTATION_EXPORT: one JSON document per doc —
    ``{sourcedb, sourceid, text, denotations: [{id, span: {begin, end},
    obj}]}`` (PubAnnotationFormatter semantics; denotation id = T<n> in
    span order, obj = concept id). One aggregation keyed on doc_id."""
    a = annots.where(F.col("concept_id").isNotNull()).select(
        "doc_id",
        F.struct(
            F.array_min(F.transform("spans", lambda s: s["start"])).alias("begin"),
            F.array_max(F.transform("spans", lambda s: s["end"])).alias("end"),
            F.col("concept_id").alias("obj"),
        ).alias("d"),
    )
    per_doc = a.groupBy("doc_id").agg(F.array_sort(F.collect_list("d")).alias("ds"))
    denotations = F.transform(
        F.coalesce("ds", F.array().cast("array<struct<begin:int,end:int,obj:string>>")),
        lambda d, i: F.struct(
            F.concat(F.lit("T"), (i + 1).cast("string")).alias("id"),
            F.struct(d["begin"].alias("begin"), d["end"].alias("end")).alias("span"),
            d["obj"].alias("obj"),
        ),
    )
    joined = docs.join(per_doc, "doc_id", "left")
    js = F.to_json(
        F.struct(
            F.lit(source_db).alias("sourcedb"),
            F.col("doc_id").alias("sourceid"),
            F.col("content").alias("text"),
            denotations.alias("denotations"),
        )
    )
    return joined.select("doc_id", js.alias("json"))
