"""The document substrate: status/document stage queries and the universal
input join (SURVEY §3.2) — the entry point nearly every reference pipeline
shares (PipelineMain.getStatusEntity2Content, PipelineMain.java:287-406).

Spark-first design
------------------
The reference runs one Datastore query per input criteria (up to 27 tagged
streams — TupleTag cap :91-118,307-311) and CoGroupByKey's them with the
status stream. Here all criteria filter ONE pass over the partitioned
``documents`` table (an OR of equality predicates that pushes into the
parquet scan), rows are tagged with their criteria index, and a single
``groupBy(doc_id)`` collects a criteria→content map. One shuffle replaces
the reference's N+1 queries and its 27-stream cap.

Failures are a side-channel, not exceptions: operators return
``(output, failures)`` with failures conforming to schemas.FAILURE
(EtlFailureData.java; logged at PipelineMain.java:331-403 when required
documents are missing).
"""

from __future__ import annotations

from dataclasses import dataclass

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

from .versioning import RECENT, filter_most_recent, splice_chunks


@dataclass(frozen=True)
class DocumentCriteria:
    """(type, format, pipeline, version) — etl/util/DocumentCriteria.java:8-15.
    ``version="recent"`` keeps the newest available version."""

    doc_type: str
    doc_format: str
    pipeline_key: str
    pipeline_version: str = RECENT

    @property
    def key(self) -> str:
        return "|".join(
            (self.doc_type, self.doc_format, self.pipeline_key, self.pipeline_version)
        )


def parse_criteria(spec: str) -> list[DocumentCriteria]:
    """Parse the CLI mini-DSL ``TYPE|FORMAT|PIPELINE|VERSION;...``
    (compileInputDocumentCriteria, PipelineMain.java:1065-1078)."""
    out = []
    for item in spec.split(";"):
        item = item.strip()
        if not item:
            continue
        parts = item.split("|")
        if len(parts) != 4:
            raise ValueError(f"criteria must have 4 '|'-separated parts: {item!r}")
        out.append(DocumentCriteria(*parts))
    return out


# ---------------------------------------------------------------------------
# S1 / S2 — stage-selection filters (the reference's Datastore queries)
# ---------------------------------------------------------------------------


def status_to_process(
    status: DataFrame,
    required_flags: list[str],
    target_flag: str | None = None,
    collection: str | None = None,
    overwrite: bool = False,
) -> DataFrame:
    """S1 (getStatusEntitiesToProcess, PipelineMain.java:555-610): keep
    status rows where every required flag is true, the target flag is false
    (unless overwrite / no target), and the row belongs to ``collection``.
    Missing flags read as false. All predicates push to the scan."""
    df = status
    for flag in required_flags:
        df = df.where(F.coalesce(F.col("flags").getItem(flag), F.lit(False)))
    if target_flag is not None and not overwrite:
        df = df.where(~F.coalesce(F.col("flags").getItem(target_flag), F.lit(False)))
    if collection is not None:
        df = df.where(F.array_contains("collections", collection))
    return df


def _criteria_predicate(c: DocumentCriteria) -> Column:
    p = (
        (F.col("doc_type") == c.doc_type)
        & (F.col("doc_format") == c.doc_format)
        & (F.col("pipeline_key") == c.pipeline_key)
    )
    if c.pipeline_version != RECENT:
        p = p & (F.col("pipeline_version") == c.pipeline_version)
    return p


def documents_for_criteria(
    docs: DataFrame,
    criteria: list[DocumentCriteria],
    collection: str | None = None,
) -> DataFrame:
    """S2 (getDocumentEntitiesToProcess :621-666, filters :726-766) for ALL
    criteria in one scan: OR of equality predicates (pushed down; prunes
    ``doc_type`` partitions), rows tagged with their criteria key. Chunks
    are spliced after filtering; "recent" is resolved per (criteria,
    identity) — an explicitly pinned version must not be shadowed by a
    newer version matched by a different "recent" criteria
    (filterForMostRecent runs per input stream in the reference)."""
    pred = _criteria_predicate(criteria[0])
    for c in criteria[1:]:
        pred = pred | _criteria_predicate(c)
    df = docs.where(pred)
    if collection is not None:
        df = df.where(F.array_contains("collections", collection))
    df = splice_chunks(df)
    # tag each surviving row with every criteria key it satisfies (a row can
    # serve two criteria that differ only in version sentinel)
    key = F.array_compact(
        F.array(
            *[
                F.when(_criteria_predicate(c), F.lit(c.key)).otherwise(F.lit(None))
                for c in criteria
            ]
        )
    )
    tagged = df.select(
        "doc_id",
        F.explode(key).alias("criteria_key"),
        "pipeline_version",
        *[c for c in ("doc_type", "doc_format", "pipeline_key")],
        "content",
        "collections",
    )
    tagged = filter_most_recent(
        tagged, identity_cols=("criteria_key", "doc_id", "doc_type", "doc_format", "pipeline_key")
    )
    return tagged.select("doc_id", "criteria_key", "content", "collections")


# ---------------------------------------------------------------------------
# J1 — the universal input join
# ---------------------------------------------------------------------------


def universal_input_join(
    status: DataFrame,
    docs: DataFrame,
    criteria: list[DocumentCriteria],
    required_flags: list[str] | None = None,
    target_flag: str | None = None,
    collection: str | None = None,
    overwrite: bool = False,
    stage: str = "input-join",
) -> tuple[DataFrame, DataFrame]:
    """getStatusEntity2Content (PipelineMain.java:287-406), Spark-first.

    Returns ``(joined, failures)``:

    - ``joined``: one row per document that (a) passed the status stage
      filter and (b) has ALL required input documents — columns
      ``doc_id, pub_year, pub_types, collections, contents MAP<criteria_key,
      content>``.
    - ``failures``: schemas.FAILURE rows for status-selected documents
      missing one or more required inputs (the reference warns + skips,
      :361-379).

    One wide shuffle (groupBy doc_id over the tagged single-scan document
    pass) + one equi-join against the filtered status table. At 100 TB the
    join key (doc_id) is high-cardinality and unskewed; AQE picks
    broadcast when a small collection is selected.
    """
    st = status_to_process(status, required_flags or [], target_flag, collection, overwrite)
    tagged = documents_for_criteria(docs, criteria, collection)
    contents = tagged.groupBy("doc_id").agg(
        F.map_from_entries(
            F.array_sort(F.collect_list(F.struct("criteria_key", "content")))
        ).alias("contents")
    )
    joined = st.join(contents, "doc_id", "left").select(
        "doc_id",
        "pub_year",
        "pub_types",
        "collections",
        F.coalesce(
            "contents", F.from_json(F.lit("{}"), "map<string,string>")
        ).alias("contents"),
    )
    n = len(criteria)
    complete = joined.where(F.size("contents") == n)
    missing = (
        joined.where(F.size("contents") < n)
        .select(
            "doc_id",
            F.lit(stage).alias("stage"),
            F.concat(
                F.lit("missing required documents: "),
                F.array_join(
                    F.array_except(
                        F.array(*[F.lit(c.key) for c in criteria]),
                        F.map_keys("contents"),
                    ),
                    "; ",
                ),
            ).alias("message"),
            F.lit(None).cast("string").alias("stacktrace"),
        )
    )
    return complete, missing


def read_partitioned_store(
    spark,
    path: str,
    collection: str | None = None,
    doc_types: list[str] | None = None,
    collection_col: str = "collection",
    doc_type_col: str = "doc_type",
    schema=None,
) -> DataFrame:
    """Collection/type-scoped read of a PARTITIONED document or status
    store (written with ``sinks.write_table(partition_by=["collection",
    "doc_type"])`` or similar): equality predicates on the partition
    columns land as ``PartitionFilters`` in the scan, so a stage run over
    one collection reads ONLY that collection's directories — the
    Spark-native equivalent of the reference sharding PubMed into
    PUBMED_SUB_0..36 batch collections and launching one run per batch
    (scripts/rrun-b-sentence-segmentation-batch.sh:5-15). At 100 TB this
    is the difference between a full-corpus listing+scan per stage and a
    directory-pruned one (pinned by tests/test_partition_pruning.py).

    The partition column holds each row's HOME collection (rows are
    stored once); membership in further collections stays in the
    ``collections`` array, and stage runs filtering on a secondary
    collection must still pass ``collection=`` to the stage operators
    (array predicate, pushed but not pruning).

    ``schema`` (optional StructType or DDL string, data columns only —
    the partition columns are discovered from the layout) skips the
    footer-sampling schema inference: at 100 TB the store schema is
    known, and inference needlessly opens a footer outside the scoped
    partitions."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    df = reader.parquet(path)
    if collection is not None:
        df = df.where(F.col(collection_col) == collection)
    if doc_types:
        df = df.where(F.col(doc_type_col).isin(doc_types))
    return df


def skip_existing_documents(
    incoming: DataFrame, existing_ids: DataFrame, overwrite: bool = False
) -> DataFrame:
    """J8 (catalogExistingDocuments, PipelineMain.java:1500-1526): when not
    overwriting, drop incoming documents whose id is already stored —
    left-anti join against the (distinct) existing-id set."""
    if overwrite:
        return incoming
    ex = existing_ids.select("doc_id").distinct()
    return incoming.join(ex, "doc_id", "left_anti")


def fetch_documents(
    docs: DataFrame, doc_ids: DataFrame, doc_types: list[str] | None = None
) -> DataFrame:
    """S9 (DocumentDownloadFn.java:19-56): random-access fetch of documents
    for an id list → one row per (doc_id, doc_type) with content; the
    Datastore key lookup becomes a join against the partitioned table
    (broadcast when the id list is small — AQE decides)."""
    d = docs
    if doc_types:
        d = d.where(F.col("doc_type").isin(doc_types))
    return d.join(doc_ids.select("doc_id").distinct(), "doc_id", "left_semi")


# ---------------------------------------------------------------------------
# Status flag maintenance (stage end)
# ---------------------------------------------------------------------------


def update_status_flags(
    status: DataFrame,
    processed_doc_ids: DataFrame,
    flag: str,
    all_flags: list[str] | None = None,
) -> DataFrame:
    """Set ``flag`` true for processed documents (updateStatusEntity,
    PipelineMain.java:954-1030). ``all_flags`` backfills newly-introduced
    flags as false (the reference adds missing properties on write).
    Left join against the (small) processed-id set → broadcast."""
    done = processed_doc_ids.select("doc_id").distinct().withColumn("__done", F.lit(True))
    flags = F.col("flags")
    if all_flags:
        backfill = F.map_from_arrays(
            F.array(*[F.lit(f) for f in all_flags]),
            F.array(*[F.lit(False) for _ in all_flags]),
        )
        flags = F.map_zip_with(
            backfill, flags, lambda k, base, cur: F.coalesce(cur, base)
        )
    updated = F.map_zip_with(
        flags,
        F.map_from_arrays(F.array(F.lit(flag)), F.array(F.lit(True))),
        lambda k, cur, new: F.coalesce(new, cur),
    )
    return (
        status.join(F.broadcast(done), "doc_id", "left")
        .withColumn(
            "flags", F.when(F.col("__done"), updated).otherwise(F.col("flags"))
        )
        .drop("__done")
    )
