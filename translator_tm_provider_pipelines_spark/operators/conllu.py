"""CoNLL-U parsing + CoNLL03 export (X6) — the consumer side of the
dependency-parse stage.

Reference: .../etl/fn/DependencyParseConlluToSentenceFn.java:35-125
(CoNLL-U blocks → sentence annotations) and
.../etl/fn/DependencyParseConlluToConll03Fn.java:37-119 (token stream
export). The producer (Turku HTTP parser, .../etl/fn/TurkuDepParserFn.java)
is an external model backend; any (doc_id, conllu) source plugs in.

Fully native: blocks split on blank lines, token lines on tabs — explode +
split column expressions, no UDF.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql import functions as F

#: CoNLL-U columns (universaldependencies.org format)
_FIELDS = ("token_id", "form", "lemma", "upos", "xpos", "feats", "head", "deprel", "deps", "misc")


def conllu_sentences(docs: DataFrame, conllu_col: str = "conllu") -> DataFrame:
    """(doc_id, conllu) → (doc_id, sent_idx, text): one row per sentence
    block, text from the ``# text =`` comment (empty when absent)."""
    blocks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(conllu_col), r"\n\s*\n")).alias("sent_idx", "block"),
    ).where(F.trim("block") != "")
    return blocks.select(
        "doc_id",
        "sent_idx",
        F.regexp_extract("block", r"(?m)^# text = (.*)$", 1).alias("text"),
    )


def conllu_tokens(docs: DataFrame, conllu_col: str = "conllu") -> DataFrame:
    """(doc_id, conllu) → one row per token with the 10 CoNLL-U fields
    (multi-word range lines ``1-2`` and empty nodes ``1.1`` are skipped, as
    the reference's line parser does)."""
    blocks = docs.select(
        "doc_id",
        F.posexplode(F.split(F.col(conllu_col), r"\n\s*\n")).alias("sent_idx", "block"),
    )
    lines = blocks.select(
        "doc_id",
        "sent_idx",
        F.explode(F.split("block", r"\n")).alias("line"),
    ).where(F.col("line").rlike(r"^\d+\t"))
    cols = F.split("line", "\t")
    return lines.select(
        "doc_id",
        "sent_idx",
        *[
            (F.get(cols, i).cast("int") if name in ("token_id", "head") else F.get(cols, i)).alias(name)
            for i, name in enumerate(_FIELDS)
        ],
    )


def conll03_export(tokens: DataFrame, ner_col: str | None = None) -> DataFrame:
    """Token stream → CoNLL03-style lines ``form POS chunk ner`` with blank
    lines between sentences handled by the writer (one row per token here;
    ner defaults to 'O' when no NER column is supplied)."""
    ner = F.col(ner_col) if ner_col else F.lit("O")
    line = F.concat_ws(
        " ",
        F.col("form"),
        F.coalesce(F.col("xpos"), F.lit("-X-")),
        F.lit("-X-"),
        ner,
    )
    return tokens.select("doc_id", "sent_idx", "token_id", line.alias("line"))


def dependency_edges(tokens: DataFrame) -> DataFrame:
    """(head → token) dependency edges per sentence — the graph-shaped view
    of the parse for downstream path features. Root rows (head=0) are kept
    with head_form NULL; the self-join is an equi-join on
    (doc, sent, head id)."""
    heads = tokens.select(
        "doc_id",
        "sent_idx",
        F.col("token_id").alias("head"),
        F.col("form").alias("head_form"),
    )
    return tokens.join(heads, ["doc_id", "sent_idx", "head"], "left").select(
        "doc_id",
        "sent_idx",
        F.col("token_id"),
        "form",
        "deprel",
        "head",
        "head_form",
    )
