"""Mixed-duplicate-rate corpus for the incremental-index measurement
(VERDICT r8 task 2). The sf10-docs slice replicates every document 100×,
so 99.5% of members sit in uniform 100-member clusters — a worst case
that exercises the over-cap machinery everywhere but hides the regime
real corpora run in (sparse duplication). This generator builds the
realistic counterpart:

- ``dup_frac`` (default 20%) of documents are members of near-duplicate
  clusters whose sizes are Zipf-distributed over 2-10 (pmf ∝ 1/s²,
  seeded — most clusters are pairs/triples, a thin tail reaches 10);
- the rest are unique: each document's text is the first half of one
  seed text spliced to the second half of another, with the (a, b) seed
  pair distinct per document, so any two uniques share at most one half
  (word-shingle Jaccard ≲ 0.5, well under the 0.8 near-dup threshold);
- cluster members share one such spliced base plus a cluster marker and
  differ only in a per-member suffix token (Jaccard → 1 for long texts;
  the shortest seed texts legitimately fall under the threshold — real
  corpora have those too, and batch/incremental equality is the bar,
  not a fixed expected cluster count);
- final doc_ids are a seedless md5 permutation of the build order, so
  cluster members scatter uniformly across the id space and a "top 1%
  of ids" ingest delta carries ~1% of every cluster — late arrivals to
  existing clusters, the case the index's reconcile path exists for.

Seed texts come from the driver's sf0.1 documents table (5,000 texts,
44-577 chars). Columns match the documents schema: (doc_id, text, lang,
source, n_chars).

Usage: python scripts/make_mixed_data.py [--src /root/testdata/sf0.1]
       [--dest /root/repo/.scaledata/sf10-docs-mixed] [--n-docs 500000]
       [--dup-frac 0.2] [--seed 9]

NOT used by any correctness gate (same status as make_scaled_data.py).
"""

from __future__ import annotations

import argparse
import os
import random

import duckdb
import pandas as pd


def cluster_specs(n_docs: int, dup_frac: float, seed: int) -> list[tuple[int, int]]:
    """(cluster_id, size) list with sizes Zipf(2)-distributed over 2-10,
    covering ~dup_frac of n_docs members."""
    rng = random.Random(seed)
    sizes = list(range(2, 11))
    weights = [1.0 / s**2 for s in sizes]
    target = int(n_docs * dup_frac)
    specs: list[tuple[int, int]] = []
    total = 0
    cid = 0
    while total < target:
        s = rng.choices(sizes, weights)[0]
        if total + s > target:
            s = target - total
            if s < 2:
                break
        specs.append((cid, s))
        total += s
        cid += 1
    return specs


def main() -> None:
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument(
        "--dest", default=os.path.join(repo, ".scaledata/sf10-docs-mixed")
    )
    ap.add_argument("--n-docs", type=int, default=500_000)
    ap.add_argument("--dup-frac", type=float, default=0.2)
    ap.add_argument("--seed", type=int, default=9)
    ap.add_argument(
        "--splice",
        type=int,
        choices=(2, 3),
        default=2,
        help="seed texts spliced per document: 2 = halves (any two docs "
        "sharing one seed overlap ~50%% — sub-threshold, but dense "
        "enough that 4-row LSH bands collide across them: a "
        "boilerplate-heavy regime with many over-cap buckets of "
        "genuine non-duplicates); 3 = thirds (~33%% max overlap, "
        "bands rarely collide: the sparse-duplication regime where "
        "over-cap buckets come only from the designed Zipf tail)",
    )
    ns = ap.parse_args()
    os.makedirs(ns.dest, exist_ok=True)

    con = duckdb.connect()
    con.sql(
        f"CREATE TABLE pool AS SELECT row_number() OVER (ORDER BY doc_id) - 1 "
        f"AS pool_id, text FROM '{ns.src}/documents.parquet'"
    )
    P = con.sql("SELECT count(*) FROM pool").fetchone()[0]
    specs = cluster_specs(ns.n_docs, ns.dup_frac, ns.seed)
    n_dup = sum(s for _, s in specs)
    n_unique = ns.n_docs - n_dup
    n_clusters = len(specs)
    con.register(
        "specs_df", pd.DataFrame(specs, columns=["cluster_id", "size"])
    )
    print(
        f"{n_clusters} clusters / {n_dup} duplicate members / "
        f"{n_unique} uniques (pool {P})"
    )

    # pair index k -> seed halves (a, b), a != b, distinct for every k
    # used (cluster k = cluster_id; unique k = n_clusters + i): a cycles
    # the pool (so ~k/P docs share any one half — no artificial
    # mega-buckets from thousands of docs sharing h1), and the stride
    # 1 + (k // P) % (P-1) differs for every revisit of the same a while
    # k // P < P-1, so pairs never repeat below k = P*(P-1) ≈ 25M
    # >> n_clusters + n_unique.
    if ns.splice == 2:
        halves = f"""
        w AS (SELECT pool_id, string_split(text, ' ') AS ws FROM pool),
        h AS (SELECT pool_id,
                     array_to_string(ws[1:greatest(len(ws)//2, 1)], ' ') AS h1,
                     array_to_string(ws[greatest(len(ws)//2, 1)+1:len(ws)], ' ') AS h2
              FROM w)
        """
        joins = "JOIN h ha ON ha.pool_id = {t}.pa JOIN h hb ON hb.pool_id = {t}.pb"
        base_text = "ha.h1 || ' ' || hb.h2"
    else:
        halves = f"""
        w AS (SELECT pool_id, string_split(text, ' ') AS ws FROM pool),
        h AS (SELECT pool_id,
                     array_to_string(ws[1:greatest(len(ws)//3, 1)], ' ') AS h1,
                     array_to_string(
                       ws[greatest(len(ws)//3, 1)+1:greatest(2*len(ws)//3, 2)],
                       ' ') AS h2,
                     array_to_string(ws[greatest(2*len(ws)//3, 2)+1:len(ws)], ' ') AS h3
              FROM w)
        """
        joins = (
            "JOIN h ha ON ha.pool_id = {t}.pa JOIN h hb ON hb.pool_id = {t}.pb "
            "JOIN h hc ON hc.pool_id = {t}.pc"
        )
        base_text = "ha.h1 || ' ' || hb.h2 || ' ' || hc.h3"
    # (pa, pb) is injective in k below k = P*(P-1); pc (splice=3 only) is a
    # deterministic function of (pa, pb), so triples stay distinct too
    pair = f"""
    k % {P} AS pa,
    (k % {P} + 1 + (k // {P}) % {P - 1}) % {P} AS pb,
    (k % {P} + 2 * ((k % {P} + 1 + (k // {P}) % {P - 1}) % {P}) + 1) % {P} AS pc
    """
    sql = f"""
    COPY (
      WITH {halves},
      s2 AS (
        SELECT cluster_id, size,
               sum(size) OVER (ORDER BY cluster_id) - size AS start
        FROM specs_df
      ),
      dup_raw AS (
        SELECT start + j - 1 AS raw_id, cluster_id AS k, j
        FROM (
          SELECT cluster_id, start,
                 unnest(generate_series(1, size)) AS j
          FROM s2
        )
      ),
      dup_keyed AS (SELECT raw_id, k, j, {pair} FROM dup_raw),
      dup AS (
        SELECT d.raw_id,
               {base_text} || ' c' || d.k || ' #m' || d.j AS text
        FROM dup_keyed d
        {joins.format(t="d")}
      ),
      uniq_raw AS (
        SELECT {n_dup} + i AS raw_id, {n_clusters} + i AS k
        FROM generate_series(0, {n_unique - 1}) AS t(i)
      ),
      uniq_keyed AS (SELECT raw_id, k, {pair} FROM uniq_raw),
      uniq AS (
        SELECT u.raw_id,
               {base_text} || ' u' || u.raw_id AS text
        FROM uniq_keyed u
        {joins.format(t="u")}
      ),
      all_docs AS (SELECT * FROM dup UNION ALL SELECT * FROM uniq)
      SELECT row_number() OVER (ORDER BY md5(cast(raw_id AS varchar)), raw_id)
               - 1 AS doc_id,
             text,
             'en' AS lang,
             'mixed' AS source,
             length(text) AS n_chars
      FROM all_docs
    ) TO '{ns.dest}/documents.parquet' (FORMAT parquet)
    """
    con.sql(sql)
    n = con.sql(
        f"SELECT count(*), count(DISTINCT doc_id) FROM "
        f"'{ns.dest}/documents.parquet'"
    ).fetchone()
    assert n[0] == n[1] == ns.n_docs, n
    print(f"documents: {n[0]} rows -> {ns.dest}")


if __name__ == "__main__":
    main()
