"""OBO flat-file ontology source.

The reference loads ontologies through the OWL API
(``oger/util/OgerDictFileFactory.java:63-66`` via OntologyUtil) to feed its
OGER dictionary builders and KGX exporters. The Spark-first equivalent reads
the public OBO 1.2 flat format distributed for every OBO-Foundry ontology:
``spark.read.text`` with a blank-line ``lineSep`` yields ONE ROW PER STANZA,
so parsing is a distributed narrow projection — every field below is a
JVM-side regexp over the stanza text, no Python in the loop. Ontology
relations (a few hundred MB at the high end for NCBITaxon) parse in
parallel and then act as broadcast-size dimensions downstream.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

#: OBO-Foundry IRI prefix; CURIEs are the IRI tail with ``_`` → ``:``
#: (reference getDictLine, OgerDictFileFactory.java:617-620).
OBO_PURL = "http://purl.obolibrary.org/obo/"

# a synonym line looks like:  synonym: "text" EXACT [xref, ...]
# quoted text may contain backslash-escaped quotes.
_SYN_RE = r'(?m)^synonym: "((?:[^"\\]|\\.)*)" {scope}'


def _line(field: str) -> F.Column:
    """First ``field: value`` line of the stanza ('' when absent)."""
    return F.regexp_extract(F.col("stanza"), f"(?m)^{field}: (.*?)\\s*$", 1)


def read_obo_terms(spark: SparkSession, path: str) -> DataFrame:
    """Parse ``[Term]`` stanzas of an OBO file into a term dimension:

    (term_id, label, namespace, comment, is_obsolete, parents[],
     relationships[], exact_synonyms[], related_synonyms[],
     broad_synonyms[], narrow_synonyms[], xrefs[], formulas[])

    ``term_id``/``parents`` are CURIEs as written (e.g. ``GO:0008150``).
    """
    stanzas = (
        spark.read.option("lineSep", "\n\n")
        .text(path)
        .select(F.trim(F.col("value")).alias("stanza"))
        .where(F.col("stanza").startswith("[Term]"))
    )

    def syns(scope: str) -> F.Column:
        return F.transform(
            F.regexp_extract_all(
                F.col("stanza"), F.lit(_SYN_RE.format(scope=scope)), 1
            ),
            _unescape,
        )

    return stanzas.select(
        _line("id").alias("term_id"),
        _unescape(_line("name")).alias("label"),
        _line("namespace").alias("namespace"),
        _line("comment").alias("comment"),
        (_line("is_obsolete") == "true").alias("is_obsolete"),
        F.regexp_extract_all(
            F.col("stanza"), F.lit(r"(?m)^is_a: (\S+)"), 1
        ).alias("parents"),
        F.arrays_zip(
            F.regexp_extract_all(
                F.col("stanza"), F.lit(r"(?m)^relationship: (\S+) (\S+)"), 1
            ).alias("rel"),
            F.regexp_extract_all(
                F.col("stanza"), F.lit(r"(?m)^relationship: (\S+) (\S+)"), 2
            ).alias("target"),
        ).alias("relationships"),
        syns("EXACT").alias("exact_synonyms"),
        syns("RELATED").alias("related_synonyms"),
        syns("BROAD").alias("broad_synonyms"),
        syns("NARROW").alias("narrow_synonyms"),
        F.regexp_extract_all(
            F.col("stanza"), F.lit(r"(?m)^xref: (\S+)"), 1
        ).alias("xrefs"),
        # chemical formulas: property_value: .../chebi/formula "ClNa" xsd:string
        F.regexp_extract_all(
            F.col("stanza"),
            F.lit(r'(?m)^property_value: \S*formula "([^"]*)"'),
            1,
        ).alias("formulas"),
        # generic (property, value) pairs — e.g. MONDO's skos:exactMatch
        # URL targets, consumed by operators/ontmaps.hp_to_mondo_map
        F.arrays_zip(
            F.regexp_extract_all(
                F.col("stanza"), F.lit(r"(?m)^property_value: (\S+) (\S+)"), 1
            ).alias("prop"),
            F.regexp_extract_all(
                F.col("stanza"), F.lit(r"(?m)^property_value: (\S+) (\S+)"), 2
            ).alias("value"),
        ).alias("property_values"),
    ).where(F.col("term_id") != "")


def _unescape(c: F.Column) -> F.Column:
    r"""OBO quoted strings escape ``"`` as ``\"``; the reference strips the
    backslash at dictionary time (OgerDictFileFactory fixLabel :648)."""
    return F.regexp_replace(c, r'\\"', '"')


def curie(id_or_iri: F.Column) -> F.Column:
    """Normalize an OBO IRI or CURIE to CURIE form: strip the purl prefix
    and turn the first ``_`` separator into ``:`` (reference getDictLine,
    OgerDictFileFactory.java:617-620). Already-CURIE inputs pass through.

    Only the FIRST underscore is the prefix separator: real ontology class
    ids carry exactly one (``CHEBI_1234``), but subset markers like
    ``NCBITaxon#_taxonomic_rank`` (NcbiTaxonOgerDictFileFactory.java:34,
    an excluded root matched on the raw IRI in the reference) have more,
    and replacing them all would make the configured exclusion CURIE
    unmatchable."""
    tail = F.replace(id_or_iri, F.lit(OBO_PURL), F.lit(""))
    return F.when(
        tail.contains(":"), tail
    ).otherwise(F.regexp_replace(tail, r"^([^_]*)_", "$1:"))
