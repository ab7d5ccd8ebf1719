"""BioC XML (S4) and bioRxiv JATS XML (S5) sources.

Reference:
- BioC: .../etl/BiocToTextPipeline.java + .../etl/fn/BiocToTextFn.java:70-148
  + .../etl/util/BiocToTextConverter.java — PMC BioC collections → per-doc
  text with section annotations.
- JATS: .../etl/BiorxivXmlToTextPipeline.java +
  .../etl/fn/JatsFileToArticleFn.java (+ JAXB classes org/biorxiv/*).

Spark-first split:
- BioC has a regular, flat element structure → the native XML source with
  an explicit schema (rowTag=document), then pure column expressions to
  assemble text and spans. Passage offsets are recomputed from the
  assembled text (passages joined by blank lines), not taken from the
  file's byte offsets — the reference likewise re-derives spans over its
  assembled text.
- JATS is deeply recursive (nested <sec>) → a ``mapInPandas`` stage with a
  stdlib ElementTree parser over whole files read through the binaryFile
  source. Python runs once per file (Arrow-batched), all downstream work
  is DataFrame-native.
"""

from __future__ import annotations

from collections.abc import Iterator

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

BIOC_SCHEMA = T.StructType(
    [
        T.StructField("id", T.StringType(), True),
        T.StructField(
            "passage",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField(
                            "infon",
                            T.ArrayType(
                                T.StructType(
                                    [
                                        T.StructField("_VALUE", T.StringType(), True),
                                        T.StructField("_key", T.StringType(), True),
                                    ]
                                )
                            ),
                            True,
                        ),
                        T.StructField("offset", T.LongType(), True),
                        T.StructField("text", T.StringType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def read_bioc_xml(spark: SparkSession, path: str) -> DataFrame:
    """Raw BioC ``document`` rows."""
    return (
        spark.read.format("xml")
        .option("rowTag", "document")
        .schema(BIOC_SCHEMA)
        .load(path)
    )


def bioc_documents(raw: DataFrame) -> DataFrame:
    """BioC rows → (doc_id, content, sections ARRAY<STRUCT<annot_type,
    start, end>>): passages ordered by file offset, joined with blank
    lines; each passage becomes a section annotation over the assembled
    text (section type = the passage's ``type`` infon, default 'Unknown').

    Span arithmetic is an ``aggregate`` over the ordered passage array —
    one pass, JVM-side."""
    passages = F.transform(
        F.array_sort(
            F.transform(
                F.coalesce("passage", F.array().cast(BIOC_SCHEMA["passage"].dataType)),
                lambda p: F.struct(
                    F.coalesce(p["offset"], F.lit(0)).alias("offset"),
                    F.coalesce(p["text"], F.lit("")).alias("text"),
                    F.coalesce(
                        F.filter(
                            F.coalesce(
                                p["infon"],
                                F.array().cast(
                                    "array<struct<_VALUE:string,_key:string>>"
                                ),
                            ),
                            lambda i: i["_key"] == "type",
                        ).getItem(0)["_VALUE"],
                        F.lit("Unknown"),
                    ).alias("sec_type"),
                ),
            )
        ),
        lambda p: F.struct(p["text"].alias("text"), p["sec_type"].alias("sec_type")),
    )
    assembled = F.aggregate(
        passages,
        F.struct(
            F.lit("").alias("text"),
            F.array().cast(
                "array<struct<annot_type:string,start:int,end:int>>"
            ).alias("sections"),
        ),
        lambda acc, p: F.struct(
            F.when(acc["text"] == "", p["text"])
            .otherwise(F.concat(acc["text"], F.lit("\n\n"), p["text"]))
            .alias("text"),
            F.array_append(
                acc["sections"],
                F.struct(
                    p["sec_type"].alias("annot_type"),
                    F.when(acc["text"] == "", F.lit(0))
                    .otherwise(F.length(acc["text"]) + 2)
                    .cast("int")
                    .alias("start"),
                    F.when(acc["text"] == "", F.length(p["text"]))
                    .otherwise(F.length(acc["text"]) + 2 + F.length(p["text"]))
                    .cast("int")
                    .alias("end"),
                ),
            ).alias("sections"),
        ),
    )
    return raw.select(
        F.col("id").alias("doc_id"),
        assembled["text"].alias("content"),
        assembled["sections"].alias("sections"),
    )


def bioc_section_annotations(docs: DataFrame) -> DataFrame:
    """(doc_id, content, sections) → schemas.ANNOTATION rows."""
    return docs.select(
        "doc_id", F.explode("sections").alias("s"), "content"
    ).select(
        "doc_id",
        F.col("s.annot_type").alias("annot_type"),
        F.lit(None).cast("string").alias("concept_id"),
        F.array(
            F.struct(F.col("s.start").alias("start"), F.col("s.end").alias("end"))
        ).alias("spans"),
        F.substring(
            "content", F.col("s.start") + 1, F.col("s.end") - F.col("s.start")
        ).alias("covered_text"),
    )


# ---------------------------------------------------------------------------
# JATS (bioRxiv)
# ---------------------------------------------------------------------------

JATS_DOC_SCHEMA = T.StructType(
    [
        T.StructField("doc_id", T.StringType(), True),
        T.StructField("content", T.StringType(), True),
        T.StructField(
            "sections",
            T.ArrayType(
                T.StructType(
                    [
                        T.StructField("annot_type", T.StringType(), True),
                        T.StructField("start", T.IntegerType(), True),
                        T.StructField("end", T.IntegerType(), True),
                    ]
                )
            ),
            True,
        ),
    ]
)


def _jats_parse_bytes(payload: bytes) -> tuple[str | None, list[tuple[str, str]]]:
    """One JATS article → (doc_id, [(section_type, section_text), ...]).
    Stdlib only; namespace-agnostic tag matching."""
    import xml.etree.ElementTree as ET

    def local(tag: str) -> str:
        return tag.rsplit("}", 1)[-1]

    root = ET.fromstring(payload)
    doc_id = None
    for el in root.iter():
        if local(el.tag) == "article-id":
            doc_id = (el.text or "").strip() or doc_id
            if el.attrib.get("pub-id-type") == "doi":
                break
    parts: list[tuple[str, str]] = []
    for el in root.iter():
        tag = local(el.tag)
        if tag == "article-title":
            parts.append(("title", "".join(el.itertext()).strip()))
            break
    for el in root.iter():
        if local(el.tag) == "abstract":
            text = " ".join("".join(p.itertext()).strip() for p in el if local(p.tag) == "p")
            parts.append(("abstract", text or "".join(el.itertext()).strip()))
            break
    for el in root.iter():
        if local(el.tag) == "body":
            for sec in el:
                if local(sec.tag) != "sec":
                    continue
                sec_title = "Unknown"
                texts = []
                for child in sec.iter():
                    t = local(child.tag)
                    if t == "title" and sec_title == "Unknown":
                        sec_title = ("".join(child.itertext()).strip() or "Unknown").lower()
                    elif t == "p":
                        texts.append("".join(child.itertext()).strip())
                parts.append((sec_title, "\n".join(texts)))
            break
    return doc_id, [(t, s) for t, s in parts if s]


def jats_documents(spark: SparkSession, path: str) -> DataFrame:
    """S5: bioRxiv JATS files → (doc_id, content, sections). Files load via
    the binaryFile source (splittable listing, whole-file payloads); the
    ElementTree parse runs in ``mapInPandas`` batches so one Python worker
    handles many files per call."""
    import pandas as pd

    raw = spark.read.format("binaryFile").load(path)

    def parse(batches: Iterator["pd.DataFrame"]) -> Iterator["pd.DataFrame"]:
        for pdf in batches:
            rows = []
            for _, r in pdf.iterrows():
                try:
                    doc_id, parts = _jats_parse_bytes(bytes(r["content"]))
                except Exception:
                    continue
                text = ""
                sections = []
                for sec_type, sec_text in parts:
                    start = 0 if not text else len(text) + 2
                    text = sec_text if not text else f"{text}\n\n{sec_text}"
                    sections.append(
                        {"annot_type": sec_type, "start": start, "end": len(text)}
                    )
                rows.append(
                    {
                        "doc_id": doc_id or r["path"].rsplit("/", 1)[-1],
                        "content": text,
                        "sections": sections,
                    }
                )
            yield pd.DataFrame(
                rows, columns=["doc_id", "content", "sections"]
            )

    return raw.select("path", "content").mapInPandas(parse, schema=JATS_DOC_SCHEMA)
