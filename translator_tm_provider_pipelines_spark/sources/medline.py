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
                                            [
                                                T.StructField("Year", T.StringType(), True),
                                                T.StructField("Month", T.StringType(), True),
                                                T.StructField("Day", T.StringType(), True),
                                            ]
                                        )
                                    ),
                                    True,
                                ),
                                T.StructField(
                                    "Journal",
                                    T.StructType(
                                        [
                                            T.StructField("Title", T.StringType(), True),
                                            T.StructField(
                                                "ISOAbbreviation", T.StringType(), True
                                            ),
                                            T.StructField(
                                                "JournalIssue",
                                                T.StructType(
                                                    [
                                                        T.StructField(
                                                            "Volume", T.StringType(), True
                                                        ),
                                                        T.StructField(
                                                            "Issue", T.StringType(), True
                                                        ),
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
                                                                        "Month",
                                                                        T.StringType(),
                                                                        True,
                                                                    ),
                                                                    T.StructField(
                                                                        "Day",
                                                                        T.StringType(),
                                                                        True,
                                                                    ),
                                                                    T.StructField(
                                                                        "Season",
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
                                                        ),
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
                    F.array().cast("array<struct<Year:string,Month:string,Day:string>>"),
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


# ---------------------------------------------------------------------------
# Translator UI metadata extractor (corpora/MedlineUiMetadataExtractor.java)
# ---------------------------------------------------------------------------

UI_METADATA_HEADER = (
    "DOC_ID\tyear\tmonth\tday\tjournal\tjournal_abbrev\tvolume\tissue"
    "\tarticle_title\tarticle_abstract"
)

#: numeric / name → three-letter month (getThreeLetterAbbrev :219-289)
_MONTH_ABBREVS = {
    **{str(i): m for i, m in enumerate(
        "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split(), start=1
    )},
    **{f"{i:02d}": m for i, m in enumerate(
        "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split(), start=1
    )},
    **{m: m for m in "Jan Feb Mar Apr May Jun Jul Aug Sep Oct Nov Dec".split()},
}

_SEASON_MONTHS = {
    "winter": "Jan", "spring": "Apr", "summer": "Jul", "fall": "Oct", "autumn": "Oct"
}

#: English 3-letter + French month-name alternation
#: (extractExplicitlyMentionedMonth :421-447) — lowercase key → abbrev
_EXPLICIT_MONTH_RE = (
    "(?i)(Jan)|(Feb)|(Mar)|(Apr)|(May)|(Jun)|(Jul)|(Aug)|(Sep)|(Oct)|(Nov)|(Dec)"
    "|(janvier)|(février)|(mars)|(avril)|(mai)|(juin)|(juillet)|(aout)"
    "|(septembre)|(octobre)|(novembre)|(décembre)"
)
_FRENCH_MONTHS = {
    "janvier": "Jan", "février": "Feb", "mars": "Mar", "avril": "Apr",
    "mai": "May", "juin": "Jun", "juillet": "Jul", "aout": "Aug",
    "septembre": "Sep", "octobre": "Oct", "novembre": "Nov", "décembre": "Dec",
}

#: MedlineDate → approximate month, patterns VERBATIM from the reference
#: (checkJanPatterns/..Apr../..Jul../..Oct.. :346-419, alternation quirks
#: and all — Spark regexes run on java.util.regex, the same engine)
_SEASON_PATTERN_MONTHS = [
    ("Jan", [r"^\d\d\d\d (1st)|(First)|(1d) Quart(er)?$",
             r"^\d\d\d\d Winter(-\w+)?( 01)?$",
             r"^\d\d\d\d Winter(-\d\d\d\d \w+)?$",
             r"^Winter \d\d\d\d$",
             r"^\d\d\d\d-\d\d\d\d Winter(-\w+)?$"]),
    ("Apr", [r"^\d\d\d\d (2nd)|(Second)|(2d) Quart(er)?$",
             r"^\d\d\d\d Spring([-/]\w+)?( 01)?$",
             r"^\d\d\d\d Spring(-\d\d\d\d \w+)?$",
             r"^Spring \d\d\d\d$",
             r"^\d\d\d\d-\d\d\d\d Spring(-\w+)?$"]),
    ("Jul", [r"^\d\d\d\d (3rd)|(Third)|(3d) Quart(er)?$",
             r"^\d\d\d\d Summer([-/]\w+)?( 01)?$",
             r"^\d\d\d\d Summer(-\d\d\d\d \w+)?$",
             r"^Summer \d\d\d\d$",
             r"^\d\d\d\d-\d\d\d\d Summer(-\w+)?$"]),
    ("Oct", [r"^\d\d\d\d (4th)|(Fourth)|(4d) Quart(er)?$",
             r"^\d\d\d\d Fall([-/]\w+)?( 01)?$",
             r"^\d\d\d\d Autumn([-/]\w+)?( 01)?$",
             r"^\d\d\d\d Fall(-\d\d\d\d \w+)?$",
             r"^\d\d\d\d Autumn(-\d\d\d\d \w+)?$",
             r"^Fall \d\d\d\d$",
             r"^Autumn \d\d\d\d$",
             r"^\d\d\d\d-\d\d\d\d Fall(-\w+)?$",
             r"^\d\d\d\d-\d\d\d\d Autumn(-\w+)?$"]),
]

#: MedlineDate day capture — group 13 of the reference's alternation
#: (getDay :524-533); only the "yyyy Dec d(-d)?" branch reaches the group,
#: which is replicated exactly
_MEDLINE_DAY_RE = (
    r"(?i)^\d\d\d\d (Jan)|(Feb)|(Mar)|(Apr)|(May)|(Jun)|(Jul)|(Aug)|(Sep)|(Oct)"
    r"|(Nov)|(Dec) (\d+)(-\d+)?$"
)


def _lit_map(d: dict[str, str]):
    return F.create_map(*[F.lit(x) for kv in d.items() for x in kv])


def _month_from_medline_date(md) -> F.Column:
    explicit = F.lower(F.regexp_extract(md, _EXPLICIT_MONTH_RE, 0))
    explicit_abbrev = F.when(
        explicit != "",
        F.coalesce(_lit_map(_FRENCH_MONTHS)[explicit], F.initcap(explicit)),
    )
    out = explicit_abbrev
    for month, patterns in _SEASON_PATTERN_MONTHS:
        hit = F.lit(False)
        for pat in patterns:
            hit = hit | md.rlike("(?i)" + pat)
        out = F.coalesce(out, F.when(hit, F.lit(month)))
    return out


def ui_metadata(raw: DataFrame) -> DataFrame:
    """Translator-UI publication metadata rows (DOC_ID, year, month, day,
    journal, journal_abbrev, volume, issue, article_title,
    article_abstract) — MedlineUiMetadataExtractor.extract :56-105.

    Dates resolve as the reference does: explicit PubDate Year/Month/Day
    elements first (months via the numeric/name abbreviation switch,
    seasons approximating to Jan/Apr/Jul/Oct), else MedlineDate
    heuristics (first standalone 4-digit year; explicit English/French
    month mention, else the season/quarter pattern set), else the first
    ArticleDate. Missing values print '-'; title/abstract line breaks
    and tabs flatten to spaces. Write with
    ``sinks.write_tsv(..., header=False)`` after unioning the
    :data:`UI_METADATA_HEADER` or with ``header=True`` column names."""
    art = F.col("MedlineCitation.Article")
    pd = F.col("MedlineCitation.Article.Journal.JournalIssue.PubDate")
    md = F.coalesce(pd["MedlineDate"], F.lit(""))
    adates = F.coalesce(
        F.col("MedlineCitation.Article.ArticleDate"),
        F.array().cast("array<struct<Year:string,Month:string,Day:string>>"),
    )

    year = F.coalesce(
        pd["Year"],
        F.nullif(F.regexp_extract(md, r"\b(\d\d\d\d)\b", 1), F.lit("")),
        F.get(F.transform(adates, lambda d: d["Year"]), 0),
    )
    month = F.coalesce(
        _lit_map(_MONTH_ABBREVS)[pd["Month"]],
        _lit_map(_SEASON_MONTHS)[F.lower(pd["Season"])],
        _month_from_medline_date(md),
        _lit_map(_MONTH_ABBREVS)[
            F.get(F.filter(adates, lambda d: d["Month"].isNotNull()), 0)["Month"]
        ],
    )
    two_digit = lambda d: F.lpad(d, 2, "0")  # noqa: E731  enforceTwoDigitDay
    day = F.coalesce(
        two_digit(pd["Day"]),
        two_digit(F.nullif(F.regexp_extract(md, _MEDLINE_DAY_RE, 13), F.lit(""))),
        two_digit(F.get(F.filter(adates, lambda d: d["Day"].isNotNull()), 0)["Day"]),
    )

    title = F.coalesce(art["ArticleTitle"], F.lit(""))
    abstract = F.array_join(
        F.transform(
            F.coalesce(
                art["Abstract"]["AbstractText"],
                F.array().cast(_abstract_array_type()),
            ),
            lambda t: F.when(
                t["_Label"].isNotNull(),
                F.concat(t["_Label"], F.lit(": "), F.coalesce(t["_VALUE"], F.lit(""))),
            ).otherwise(F.coalesce(t["_VALUE"], F.lit(""))),
        ),
        "\n\n",
    )

    dash = lambda c: F.coalesce(c, F.lit("-"))  # noqa: E731
    flat = lambda c: F.regexp_replace(c, r"[\n\t]", " ")  # noqa: E731
    return raw.select(
        F.concat(F.lit("PMID:"), F.col("MedlineCitation.PMID._VALUE")).alias("DOC_ID"),
        dash(year).alias("year"),
        dash(month).alias("month"),
        dash(day).alias("day"),
        dash(art["Journal"]["Title"]).alias("journal"),
        dash(art["Journal"]["ISOAbbreviation"]).alias("journal_abbrev"),
        dash(art["Journal"]["JournalIssue"]["Volume"]).alias("volume"),
        dash(art["Journal"]["JournalIssue"]["Issue"]).alias("issue"),
        flat(dash(F.nullif(title, F.lit("")))).alias("article_title"),
        flat(dash(F.nullif(abstract, F.lit("")))).alias("article_abstract"),
    )


def deleted_pmids(spark: SparkSession, path: str) -> DataFrame:
    """'PMID:<id>' rows of the file's DeleteCitation block — the UI
    extractor's .delete.tsv sidecar (MedlineUiMetadataExtractor.java:
    74-86). DeleteCitation sits outside PubmedArticle, so it reads with
    its own rowTag."""
    schema = T.StructType(
        [
            T.StructField(
                "PMID",
                T.ArrayType(
                    T.StructType([T.StructField("_VALUE", T.StringType(), True)])
                ),
                True,
            )
        ]
    )
    raw = (
        spark.read.format("xml")
        .option("rowTag", "DeleteCitation")
        .schema(schema)
        .load(path)
    )
    return raw.select(F.explode("PMID").alias("p")).select(
        F.concat(F.lit("PMID:"), F.col("p._VALUE")).alias("pmid")
    )


def pmid_to_file(raw: DataFrame) -> DataFrame:
    """(pmid, file) rows linking every citation to its source XML shard
    (PmidToFileExtractor.extractPmids :37-77 — the .ids file content).
    The shard name comes from ``input_file_name`` so one distributed scan
    covers a whole directory of files."""
    fname = F.element_at(F.split(F.input_file_name(), "/"), -1)
    return raw.select(
        F.col("MedlineCitation.PMID._VALUE").alias("pmid"), fname.alias("file")
    )


#: public NCBI FTP layout for Medline distribution files
PUBMED_FTP = "ftp://ftp.ncbi.nlm.nih.gov/pubmed"


def download_script_lines(
    file_set: str,
    min_file_index: int,
    max_file_index: int,
    two_digit_year: int,
    dest_template: str = "{file_name}",
) -> list[str]:
    """Shell commands fetching the Medline ``baseline``/``updatefiles``
    shards and their .md5 sidecars (MedlineDownloadScriptBuilder
    :32-60). The reference pipes each curl into a project-specific
    bucket copy; destination here is caller-templated
    (``{file_set}``/``{year}``/``{file_name}`` placeholders) so the
    script stays deployment-neutral."""
    fs = file_set.lower()
    if fs not in ("baseline", "updatefiles"):
        raise ValueError(f"unknown PubMed file set: {file_set!r}")
    lines = []
    for i in range(min_file_index, max_file_index + 1):
        for suffix in ("", ".md5"):
            file_name = f"pubmed{two_digit_year}n{i:04d}.xml.gz{suffix}"
            dest = dest_template.format(
                file_set=fs, year=f"20{two_digit_year}", file_name=file_name
            )
            lines.append(f"curl {PUBMED_FTP}/{fs}/{file_name} -o {dest}")
    return lines
