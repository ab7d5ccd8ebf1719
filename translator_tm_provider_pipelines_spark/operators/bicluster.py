"""Percha-Altman bicluster files → BERT training data.

Re-expresses ``relation_extraction/bicluster/*`` (PerchaAltmanPartIFileParser,
PerchaAltmanPartIIFileParser, BertTrainingFileCreator): the public
global-network-of-biomedical-relationships dataset ships as

- part-i: dependency path + (score, flagship-flag) column pairs per theme —
  a path carries every theme whose flag > 0;
- part-ii: 14-column sentence file (pmid, entity names/spans/ids/types,
  dependency path, tokenized sentence).

Training rows come from joining part-ii sentences to part-i themes on the
lowercased dependency path, de-tokenizing (Penn-Treebank bracket rules),
replacing the first literal occurrence of each entity with ``@TYPE$``
placeholders, and sha1-hex-deduping.

Spark-first: both files read distributed (gz-transparent text), the theme
map broadcasts onto the sentence scan, and first-occurrence replacement is
locate+substring surgery (Java ``replaceFirst`` over an escaped — i.e.
literal — pattern). The reference's cross-theme dedup follows HashSet
iteration order; here the lexicographically smallest theme label survives,
deterministically.
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession, Window
from pyspark.sql import functions as F

#: theme symbol → enum-name label (PerchaAltmanPartIFileParser.Theme)
THEMES: dict[str, str] = {
    "A+": "Aplus_AGONISM",
    "A-": "Aminus_ANTAGONISM",
    "B": "B_BINDING",
    "E+": "Eplus_INCREASES_EXPRESSION",
    "E-": "Eminus_DECREASES_EXPRESSION",
    "E": "E_AFFECTS_EXPRESSION",
    "N": "N_INHIBITS",
    "O": "O_TRANSPORTS",
    "K": "K_METABOLISM",
    "Z": "Z_ENZYME_ACTIVITY",
    "W": "W_ENHANCES_RESPONSE",
    "V+": "Vplus_ACTIVATES",
    "I": "I_SIGNALING_PATHWAY",
    "H": "H_SAME_PROTEIN_OR_COMPLEX",
    "Rg": "Rg_REGULATION",
    "Q": "Q_PRODUCTION_BY_CELL_POPULATION",
    "T": "T_TREATMENT",
    "C": "C_INHIBITS_CELL_GROWTH",
    "Sa": "Sa_SIDE_EFFECT",
    "Pr": "Pr_PREVENTS",
    "Pa": "Pa_ALLEVIATES",
    "J": "J_ROLE_IN_PATHOGENESIS",
    "Mp": "Mp_BIOMARKERS_PROGRESSION",
    "U": "U_CAUSAL_MUTATIONS",
    "Ud": "Ud_MUTATIONS_AFFECT_DISEASE_COURSE",
    "D": "D_DRUG_TARGETS",
    "Te": "Te_THERAPEUTIC_EFFECT",
    "Y": "Y_POLYMORPHISMS_ALTER_RISK",
    "G": "G_PROMOTES_PROGRESSION",
    "Md": "Md_BIOMARKERS_DIAGNOSTIC",
    "X": "X_OVEREXPRESSION_IN_DISEASE",
    "L": "L_IMPROPER_REGULATION_LINKED_TO_DISEASE",
}

#: default gene-gene theme subset (BertTrainingFileCreator.java:43-48)
GENE_GENE_THEMES = (
    "B_BINDING",
    "W_ENHANCES_RESPONSE",
    "Vplus_ACTIVATES",
    "E_AFFECTS_EXPRESSION",
    "I_SIGNALING_PATHWAY",
    "Rg_REGULATION",
)

PART2_COLUMNS = [
    "pmid",
    "sentence_num",
    "entity1_formatted",
    "entity1_span",
    "entity2_formatted",
    "entity2_span",
    "entity1_raw",
    "entity2_raw",
    "entity1_ids",
    "entity2_ids",
    "entity1_type",
    "entity2_type",
    "dependency_path",
    "tokenized_sentence",
]


def part1_path_themes(spark: SparkSession, path: str) -> DataFrame:
    """part-i file → (dependency_path, theme) rows for every theme whose
    flagship flag > 0 (getFlagshipPaths/getFlagshipThemeScore,
    PerchaAltmanPartIFileParser.java:104-179). The single header line
    (theme symbols at every odd column) is read on the driver — one tiny
    collect — and drives a distributed parse of the data rows."""
    header = spark.read.text(path).limit(1).collect()[0].value
    symbols = header.split("\t")[1::2]
    lines = spark.read.text(path).where(F.col("value") != header)
    cols = F.split("value", "\t")
    out = None
    for i, sym in enumerate(symbols):
        flag = cols.getItem(2 + 2 * i).cast("int")
        rows = lines.where(flag > 0).select(
            cols.getItem(0).alias("dependency_path"),
            F.lit(THEMES[sym]).alias("theme"),
        )
        out = rows if out is None else out.unionByName(rows)
    return out.distinct()


def parse_part2(spark: SparkSession, path: str) -> DataFrame:
    """part-ii sentence file → typed columns (getSentence,
    PerchaAltmanPartIIFileParser.java:61-89); dependency path lowercased
    as in the reference."""
    cols = F.split("value", "\t")
    sel = [cols.getItem(i).alias(name) for i, name in enumerate(PART2_COLUMNS)]
    df = spark.read.text(path).select(*sel)
    return df.withColumn("dependency_path", F.lower("dependency_path"))


def detokenize(c: Column) -> Column:
    """Penn-Treebank de-tokenization (deTokenize,
    BertTrainingFileCreator.java:162-170)."""
    c = F.regexp_replace(c, r"-LRB- ", "(")
    c = F.regexp_replace(c, r"-LSB- ", "[")
    c = F.regexp_replace(c, r" -RRB-", ")")
    c = F.regexp_replace(c, r" -RSB-", "]")
    c = F.regexp_replace(c, r" ,", ",")
    c = F.regexp_replace(c, r" \.", ".")
    return c


def _replace_first(text: Column, needle: Column, replacement: Column) -> Column:
    """First-literal-occurrence replacement — Java ``replaceFirst`` with a
    regex-escaped (hence literal) pattern; locate + substring, no regex."""
    pos = F.instr(text, needle)
    return F.when(
        pos > 0,
        F.concat(
            F.substring(text, F.lit(1), pos - 1),
            replacement,
            F.substring(text, pos + F.length(needle), F.length(text)),
        ),
    ).otherwise(text)


def bert_training_rows(
    part2: DataFrame,
    path_themes: DataFrame,
    themes_to_include: tuple[str, ...] = GENE_GENE_THEMES,
) -> DataFrame:
    """(id, sentence, theme) training rows (createBertTrainingFile,
    BertTrainingFileCreator.java:93-110): join sentences to flagship
    themes on the dependency path, de-tokenize, placeholder the first
    occurrence of each entity (``@TYPE$``), sha1-hex id, dedupe across
    themes keeping the smallest theme label."""
    themes = path_themes.where(F.col("theme").isin(list(themes_to_include)))
    joined = part2.join(F.broadcast(themes), "dependency_path")
    sent = detokenize(F.col("tokenized_sentence"))
    ph1 = F.concat(F.lit("@"), F.upper("entity1_type"), F.lit("$"))
    ph2 = F.concat(F.lit("@"), F.upper("entity2_type"), F.lit("$"))
    sent = _replace_first(sent, F.col("entity1_formatted"), ph1)
    sent = _replace_first(sent, F.col("entity2_formatted"), ph2)
    label = F.lower(F.col("theme"))
    out = joined.select(
        F.sha1(sent).alias("id"), sent.alias("sentence"), label.alias("theme")
    )
    w = Window.partitionBy("id").orderBy("theme")
    return (
        out.withColumn("__rn", F.row_number().over(w))
        .where(F.col("__rn") == 1)
        .drop("__rn")
    )
