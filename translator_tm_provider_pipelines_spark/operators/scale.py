"""Scale utilities: bucketed co-located joins and explicit skew salting.

These are the two deployment-time levers SCALING.md leans on beyond AQE:

- **Bucketing** pre-shuffles a table ONCE at write time. Two tables
  bucketed on the same key with the same bucket count join with no
  exchange at read time — the repeated document⋈annotation and
  status⋈document joins of a 100 TB store amortize their shuffle into
  the ingest write.
- **Salting** splits one pathologically hot key (Zipf-head concepts)
  across N subkeys explicitly when a deterministic plan is preferred
  over AQE's runtime skew split (e.g. for reproducible stage sizing).
"""

from __future__ import annotations

from pyspark.sql import Column, DataFrame, SparkSession
from pyspark.sql import functions as F


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: list[str],
    n_buckets: int = 32,
    sort_cols: list[str] | None = None,
    mode: str = "overwrite",
) -> None:
    """Persist ``df`` as a bucketed (and optionally sorted) managed table.
    Joins/aggregations keyed on ``bucket_cols`` against tables bucketed
    with the SAME count read back with no Exchange (and no Sort, when
    ``sort_cols`` covers the join key) — the write pays the shuffle once
    for every downstream consumer. Use one bucket count per subject area
    so co-location composes across tables."""
    w = df.write.mode(mode).bucketBy(n_buckets, *bucket_cols)
    if sort_cols:
        w = w.sortBy(*sort_cols)
    w.saveAsTable(table)


def read_bucketed(spark: SparkSession, table: str) -> DataFrame:
    return spark.table(table)


def salted_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    salt_from: str | Column,
    n_salts: int = 16,
    how: str = "inner",
) -> DataFrame:
    """Equi-join with the LEFT side's hot keys split across ``n_salts``
    subkeys: every left row gets a deterministic salt from
    ``hash(salt_from) mod n_salts`` (pass a column unique-ish per row —
    e.g. the doc id on an annotation table), the right side replicates
    once per salt, and the join key becomes (key, salt). Row-for-row
    identical to ``left.join(right, on, how)`` — each left row matches
    exactly the one right replica carrying its salt — but a key holding
    X% of the rows now occupies ``n_salts`` shuffle partitions instead
    of one straggler.

    Cost model: right-side volume × ``n_salts`` (use on dimension-sized
    or pre-aggregated right sides); prefer AQE's runtime skew split when
    the right side is large. Supports 'inner' and 'left' joins (shapes
    where per-row salting preserves semantics)."""
    if how not in ("inner", "left"):
        raise ValueError(f"salted_join supports inner/left, got {how!r}")
    salt_src = F.col(salt_from) if isinstance(salt_from, str) else salt_from
    l = left.withColumn("__salt", F.pmod(F.hash(salt_src), F.lit(n_salts)))
    salts = F.explode(F.sequence(F.lit(0), F.lit(n_salts - 1)))
    r = right.withColumn("__salt", salts)
    out = l.join(r, [on, "__salt"], how)
    return out.drop("__salt")
