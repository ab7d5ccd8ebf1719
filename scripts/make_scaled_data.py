"""Generate an sf1.0-equivalent dataset for SCALE VALIDATION ONLY.

The driver ships read-only testdata up to sf0.1. For the scaling bench
(SCALING.md) this script replicates sf0.1 N× (default 10) into a local
directory, offsetting every key column by the replica index so key
cardinalities grow with the data (10× customers, orders, users, docs —
not 10× rows under the same keys). Dimension tables (region, nation)
stay fixed, like TPC-H.

Deliberate consequences, annotated in SCALING.md:
- document texts repeat across replicas modulo a per-replica marker
  token, so the dedup family sees large duplicate clusters — exactly
  what a 100 TB dedup pass encounters; their outputs grow with cluster
  size by design.
- embeddings replicate with offset vec_ids; the registered similarity
  queries filter to the first-replica id range (fixed query working set,
  scan grows).

Usage: python scripts/make_scaled_data.py [--src /root/testdata/sf0.1]
       [--dest /root/repo/.scaledata/sf1.0] [--copies 10]

NOT used by any correctness gate: the driver's oracle comparisons run on
its own testdata exclusively.
"""

from __future__ import annotations

import argparse
import os

import duckdb

KEY_OFFSETS = {
    # table: [(column, span_source_table, span_source_column)]
    "customer": [("c_custkey", "customer", "c_custkey")],
    "supplier": [("s_suppkey", "supplier", "s_suppkey")],
    "part": [("p_partkey", "part", "p_partkey")],
    "orders": [
        ("o_orderkey", "orders", "o_orderkey"),
        ("o_custkey", "customer", "c_custkey"),
    ],
    "lineitem": [
        ("l_orderkey", "orders", "o_orderkey"),
        ("l_partkey", "part", "p_partkey"),
        ("l_suppkey", "supplier", "s_suppkey"),
    ],
    "events": [
        ("event_id", "events", "event_id"),
        ("user_id", "events", "user_id"),
    ],
    "documents": [("doc_id", "documents", "doc_id")],
    "embeddings": [("vec_id", "embeddings", "vec_id")],
}

COPY_AS_IS = ("region", "nation")

#: per-replica text perturbation keeps replicated documents from being
#: byte-identical (they become near-duplicate cluster members instead)
TEXT_PERTURB = "text || ' #r' || {i} AS text"


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="/root/testdata/sf0.1")
    ap.add_argument("--dest", default="/root/repo/.scaledata/sf1.0")
    ap.add_argument("--copies", type=int, default=10)
    ap.add_argument(
        "--tables",
        default=None,
        help="comma-separated subset (e.g. 'documents' for a dedup-family "
        "slice at high sf without replicating the 600k-row fact tables)",
    )
    args = ap.parse_args()
    if args.tables:
        keep = set(args.tables.split(","))
        global COPY_AS_IS
        COPY_AS_IS = tuple(t for t in COPY_AS_IS if t in keep)
        for t in [t for t in KEY_OFFSETS if t not in keep]:
            del KEY_OFFSETS[t]
    os.makedirs(args.dest, exist_ok=True)

    con = duckdb.connect()
    spans: dict[tuple[str, str], int] = {}
    for t, offs in KEY_OFFSETS.items():
        for _, st, sc in offs:
            if (st, sc) not in spans:
                spans[(st, sc)] = (
                    con.sql(
                        f"SELECT max({sc}) + 1 FROM '{args.src}/{st}.parquet'"
                    ).fetchone()[0]
                )

    for t in COPY_AS_IS:
        con.sql(
            f"COPY (SELECT * FROM '{args.src}/{t}.parquet') TO "
            f"'{args.dest}/{t}.parquet' (FORMAT parquet)"
        )
        print(f"{t}: copied")

    for t, offs in KEY_OFFSETS.items():
        parts = []
        for i in range(args.copies):
            exprs = ["*"]
            replaced = []
            for col, st, sc in offs:
                replaced.append(f"{col} + {i * spans[(st, sc)]} AS {col}")
            if t == "documents" and i > 0:
                replaced.append(TEXT_PERTURB.format(i=i))
            exprs = (
                "* REPLACE (" + ", ".join(replaced) + ")" if replaced else "*"
            )
            parts.append(f"SELECT {exprs} FROM '{args.src}/{t}.parquet'")
        sql = " UNION ALL ".join(parts)
        con.sql(
            f"COPY ({sql}) TO '{args.dest}/{t}.parquet' (FORMAT parquet)"
        )
        n = con.sql(f"SELECT count(*) FROM '{args.dest}/{t}.parquet'").fetchone()[0]
        print(f"{t}: {n} rows")


if __name__ == "__main__":
    main()
