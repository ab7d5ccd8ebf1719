"""Medline/PubMed XML source (S3) — .../etl/MedlineXmlToTextPipeline.java:
95-107 (XmlIO rowTag PubmedArticle) and .../etl/fn/MedlineXmlToTextFn.java
(buildDocument :130-201, getYearPublished :209, getPublicationTypes :237).

Spark-first: the native XML data source (rowTag=PubmedArticle) with an
EXPLICIT schema for exactly the fields consumed — no inference pass over
100 TB of gzipped XML, stable column types regardless of which optional
elements a shard contains. Gzip is transparent. Everything downstream is
column expressions.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql import types as T

#: MySQL YEAR max — the reference's "unknown year" sentinel
#: (MedlineXmlToTextFn.java:62)
DEFAULT_PUB_YEAR = "2155"

_TEXTISH = T.StructType(
    [
        T.StructField("_VALUE", T.StringType(), True),
        T.StructField("_Label", T.StringType(), True),
    ]
)

MEDLINE_SCHEMA = T.StructType(
    [
        T.StructField(
            "MedlineCitation",
            T.StructType(
                [
                    T.StructField(
                        "PMID",
                        T.StructType([T.StructField("_VALUE", T.StringType(), True)]),
                        True,
                    ),
                    T.StructField(
                        "Article",
                        T.StructType(
                            [
                                T.StructField("ArticleTitle", T.StringType(), True),
                                T.StructField(
                                    "Abstract",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "AbstractText",
                                                T.ArrayType(_TEXTISH),
                                                True,
                                            )
                                        ]
                                    ),
                                    True,
                                ),
                                T.StructField(
                                    "PublicationTypeList",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "PublicationType",
                                                T.ArrayType(
                                                    T.StructType(
                                                        [
                                                            T.StructField(
                                                                "_VALUE", T.StringType(), True
                                                            )
                                                        ]
                                                    )
                                                ),
                                                True,
                                            )
                                        ]
                                    ),
                                    True,
                                ),
                                T.StructField(
                                    "ArticleDate",
                                    T.ArrayType(
                                        T.StructType(
                                            [T.StructField("Year", T.StringType(), True)]
                                        )
                                    ),
                                    True,
                                ),
                                T.StructField(
                                    "Journal",
                                    T.StructType(
                                        [
                                            T.StructField(
                                                "JournalIssue",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "PubDate",
                                                            T.StructType(
                                                                [
                                                                    T.StructField(
                                                                        "Year",
                                                                        T.StringType(),
                                                                        True,
                                                                    ),
                                                                    T.StructField(
                                                                        "MedlineDate",
                                                                        T.StringType(),
                                                                        True,
                                                                    ),
                                                                ]
                                                            ),
                                                            True,
                                                        )
                                                    ]
                                                ),
                                                True,
                                            )
                                        ]
                                    ),
                                    True,
                                ),
                            ]
                        ),
                        True,
                    ),
                ]
            ),
            True,
        )
    ]
)


def read_medline_xml(spark: SparkSession, path: str) -> DataFrame:
    """Raw PubmedArticle rows (one per article, any number of files;
    *.xml.gz supported)."""
    return (
        spark.read.format("xml")
        .option("rowTag", "PubmedArticle")
        .schema(MEDLINE_SCHEMA)
        .load(path)
    )


def medline_documents(raw: DataFrame) -> DataFrame:
    """PubmedArticle rows → (doc_id, content, pub_year, pub_types,
    title_length, abstract_length).

    Text assembly (MedlineXmlToTextFn.buildDocument:130-201): title, blank
    line, abstract paragraphs joined by blank lines. Year: PubDate/Year,
    else first 4-digit run of MedlineDate, else the 2155 sentinel
    (getYearPublished:209-235). Publication types: PublicationType values
    (getPublicationTypes:237-248)."""
    art = F.col("MedlineCitation.Article")
    title = F.coalesce(art["ArticleTitle"], F.lit(""))
    abstract = F.array_join(
        F.transform(
            F.coalesce(
                art["Abstract"]["AbstractText"],
                F.array().cast(_abstract_array_type()),
            ),
            lambda t: F.when(
                t["_Label"].isNotNull(), F.concat(t["_Label"], F.lit(": "), F.coalesce(t["_VALUE"], F.lit("")))
            ).otherwise(F.coalesce(t["_VALUE"], F.lit(""))),
        ),
        "\n\n",
    )
    content = F.when(abstract == "", title).otherwise(
        F.concat(title, F.lit("\n\n"), abstract)
    )
    year = F.coalesce(
        F.col("MedlineCitation.Article.Journal.JournalIssue.PubDate.Year"),
        F.nullif(
            F.regexp_extract(
                F.coalesce(
                    F.col("MedlineCitation.Article.Journal.JournalIssue.PubDate.MedlineDate"),
                    F.lit(""),
                ),
                r"(\d{4})",
                1,
            ),
            F.lit(""),
        ),
        F.lit(DEFAULT_PUB_YEAR),
    )
    pub_types = F.transform(
        F.coalesce(
            art["PublicationTypeList"]["PublicationType"],
            F.array().cast("array<struct<_VALUE:string>>"),
        ),
        lambda p: p["_VALUE"],
    )
    return _finish(raw, content, title, abstract, year, pub_types)


def _abstract_array_type() -> str:
    return "array<struct<_VALUE:string,_Label:string>>"


def _finish(raw, content, title, abstract, year, pub_types) -> DataFrame:
    return raw.select(
        F.concat(F.lit("PMID:"), F.col("MedlineCitation.PMID._VALUE")).alias("doc_id"),
        content.alias("content"),
        year.alias("pub_year"),
        pub_types.alias("pub_types"),
        F.length(title).cast("int").alias("title_length"),
        F.length(abstract).cast("int").alias("abstract_length"),
    )


def medline_section_annotations(docs: DataFrame) -> DataFrame:
    """schemas.ANNOTATION section rows for the title/abstract zones: title
    spans [0, len(title)); abstract spans [len(title)+2, end)."""
    title_span = F.array(
        F.struct(F.lit(0).cast("int").alias("start"), F.col("title_length").alias("end"))
    )
    has_abs = F.col("abstract_length") > 0
    abs_span = F.array(
        F.struct(
            (F.col("title_length") + 2).cast("int").alias("start"),
            (F.col("title_length") + 2 + F.col("abstract_length")).cast("int").alias("end"),
        )
    )
    title_rows = docs.select(
        "doc_id",
        F.lit("title").alias("annot_type"),
        F.lit(None).cast("string").alias("concept_id"),
        title_span.alias("spans"),
        F.substring("content", 1, F.col("title_length")).alias("covered_text"),
    )
    abs_rows = docs.where(has_abs).select(
        "doc_id",
        F.lit("abstract").alias("annot_type"),
        F.lit(None).cast("string").alias("concept_id"),
        abs_span.alias("spans"),
        F.substring(
            "content", F.col("title_length") + 3, F.col("abstract_length")
        ).alias("covered_text"),
    )
    return title_rows.unionByName(abs_rows)


# ---------------------------------------------------------------------------
# Corpora extractors (corpora/PmidExtractor.java, PmidToYearExtractor.java)
# ---------------------------------------------------------------------------

#: markup the PMID extractor screens title/abstract for
#: (abstractOrTitleContainsHtml, PmidExtractor.java:97-120)
HTML_CODES = ("<b>", "<i>", "<u>", "<sub>", "<sup>")


def pmid_html_flags(raw: DataFrame) -> DataFrame:
    """(pmid, contains_html) per article: true iff the title or ANY
    abstract paragraph contains one of :data:`HTML_CODES`
    (PmidExtractor.abstractOrTitleContainsHtml :97-120). Narrow
    projection — screening 30 M citations is one scan."""
    art = F.col("MedlineCitation.Article")

    def any_code(col):
        hit = F.lit(False)
        for code in HTML_CODES:
            hit = hit | col.contains(code)
        return hit

    title_hit = any_code(F.coalesce(art["ArticleTitle"], F.lit("")))
    abs_hit = F.exists(
        F.coalesce(
            art["Abstract"]["AbstractText"], F.array().cast(_abstract_array_type())
        ),
        lambda t: any_code(F.coalesce(t["_VALUE"], F.lit(""))),
    )
    return raw.select(
        F.col("MedlineCitation.PMID._VALUE").alias("pmid"),
        (title_hit | abs_hit).alias("contains_html"),
    )


def extract_pmids(raw: DataFrame, contains_html: bool) -> DataFrame:
    """PMIDs of articles whose title/abstract does (or does not) contain
    HTML markup — one ``pmid`` column, the extractor's .ids file content
    (extractPmids, PmidExtractor.java:44-95)."""
    flags = pmid_html_flags(raw)
    return flags.where(F.col("contains_html") == contains_html).select("pmid")


def pmid_to_year(raw: DataFrame) -> DataFrame:
    """('PMID:<pmid>', year) rows — the .pubyear.tsv content
    (PmidToYearExtractor.extract :42-117): PubDate/Year first, else the
    first standalone 4-digit run of MedlineDate, else the first
    ArticleDate year; a citation with none raises, as the reference
    throws IllegalArgumentException rather than silently dropping."""
    year = F.coalesce(
        F.col("MedlineCitation.Article.Journal.JournalIssue.PubDate.Year"),
        F.nullif(
            F.regexp_extract(
                F.coalesce(
                    F.col("MedlineCitation.Article.Journal.JournalIssue.PubDate.MedlineDate"),
                    F.lit(""),
                ),
                r"\b(\d\d\d\d)\b",
                1,
            ),
            F.lit(""),
        ),
        F.get(  # null (not ANSI error) when ArticleDate is absent/empty
            F.transform(
                F.coalesce(
                    F.col("MedlineCitation.Article.ArticleDate"),
                    F.array().cast("array<struct<Year:string>>"),
                ),
                lambda d: d["Year"],
            ),
            0,
        ),
    )
    pmid = F.concat(F.lit("PMID:"), F.col("MedlineCitation.PMID._VALUE"))
    year = F.when(year.isNotNull(), year).otherwise(
        F.raise_error(F.concat(F.lit("Null year for "), pmid))
    )
    return raw.select(pmid.alias("pmid"), year.alias("year"))
