"""Generate a FRESH synthetic dataset (new seed) with the driver testdata's
schemas and distribution shapes, for seed-robustness sweeps of the oracle
registry.

The driver's correctness gate always runs on its own fixed seed=42 corpus
(TESTDATA.md). Every oracle being green on one fixture leaves a residual
risk: an oracle could encode a fixture accident (a particular duplicate
cluster, a word-count ceiling, an md5-threshold edge) rather than the
operator's semantics. This script re-rolls the corpus under any seed —
same tables, schemas, vocabularies, value ranges and row-count scaling,
freshly sampled values — so `scripts/oracle_check.py <dest>` can re-run
the full registry on data the queries have never seen. Spark-vs-DuckDB
parity is engine-vs-engine on the SAME files, so ANY valid dataset is a
legitimate comparison input; a query that is green on seed 42 but red on a
fresh seed is overfit by construction.

Distribution shapes mirror /root/testdata/sf0.01 (measured, not copied):
  region/nation   fixed dimensions (5 regions, 25 nations, key%5 region)
  customer        150k·sf rows, acctbal U[-1000,10000) 2dp, 5 segments
  supplier        10k·sf rows, same acctbal shape
  part            200k·sf rows, name=color+noun (8×8), Brand#1-25,
                  6 types, size U[1,50], retailprice 900+0.1·(key%1000)
  orders          1.5M·sf rows, status P/O/F, date U[1995,2001-08-01) days,
                  totalprice U[1000,500000) 2dp, 5 priorities
  lineitem        6M·sf rows, orderkey sampled uniformly (Poisson-like
                  multiplicity), linenumber U[1,7], qty U[1,50] int-valued,
                  extprice U[900,105000) 2dp, discount 0-0.10 1% steps,
                  tax 0-0.08, flags R/A/N × O/F, shipdate independent
  events          1M·sf rows, ts cumulative-exponential over ~30 days from
                  2024-01-01, 15k·sf users, 5 types, value Exp(50) 2dp
                  clipped ≥0.01, props='{"k": 0..99}'
  documents       50k·sf rows, 10–99 words from the 31-word vocabulary,
                  lang en-heavy 5-way, source src0..19, n_chars=len(text)
  embeddings      50k·sf rows, 64-dim float32 unit-norm, 10 labels with
                  weak centroid structure (within-label cosine ≈ 0.02)

Usage:
  python scripts/make_fresh_data.py --seed 7 [--sf 0.01]
         [--dest /root/repo/.freshdata/seed7-sf0.01]

Writes one parquet per table. NOT part of the driver contract; local
validation only (dest is gitignored).
"""

from __future__ import annotations

import argparse
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

REGIONS = ["AFRICA", "AMERICA", "ASIA", "EUROPE", "MIDDLE EAST"]
SEGMENTS = ["MACHINERY", "FURNITURE", "AUTOMOBILE", "HOUSEHOLD", "BUILDING"]
PART_COLORS = ["blue", "cold", "hot", "large", "new", "old", "red", "small"]
PART_NOUNS = ["anvil", "bolt", "gear", "gizmo", "plate", "ring", "rod", "widget"]
PART_TYPES = ["ECONOMY", "LARGE", "MEDIUM", "PROMO", "SMALL", "STANDARD"]
PRIORITIES = ["1-URGENT", "2-HIGH", "3-MEDIUM", "4-NOT SPECIFIED", "5-LOW"]
EVENT_TYPES = ["click", "view", "purchase", "signup", "error"]
DOC_WORDS = (
    "a agg batch big column customer data dup fast filter group hash join key "
    "line merge order part query row scan slow small sort spark stream table "
    "the value vector window"
).split()
LANGS = ["en", "zh", "es", "de", "fr"]
LANG_P = [0.44, 0.14, 0.14, 0.14, 0.14]


def write(dest: str, name: str, cols: dict) -> None:
    pq.write_table(pa.table(cols), os.path.join(dest, f"{name}.parquet"))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--seed", type=int, required=True)
    ap.add_argument("--sf", type=float, default=0.01)
    ap.add_argument("--dest", default=None)
    args = ap.parse_args()
    dest = args.dest or os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        ".freshdata",
        f"seed{args.seed}-sf{args.sf}",
    )
    os.makedirs(dest, exist_ok=True)
    rng = np.random.default_rng(args.seed)
    sf = args.sf

    n_cust = int(150_000 * sf)
    n_supp = int(10_000 * sf)
    n_part = int(200_000 * sf)
    n_ord = int(1_500_000 * sf)
    n_li = int(6_000_000 * sf)
    n_ev = int(1_000_000 * sf)
    n_users = int(15_000 * sf)
    n_doc = int(50_000 * sf)
    n_emb = int(50_000 * sf)

    write(
        dest,
        "region",
        {
            "r_regionkey": pa.array(range(5), pa.int32()),
            "r_name": REGIONS,
        },
    )
    write(
        dest,
        "nation",
        {
            "n_nationkey": pa.array(range(25), pa.int32()),
            "n_name": [f"NATION_{i}" for i in range(25)],
            "n_regionkey": pa.array([i % 5 for i in range(25)], pa.int32()),
        },
    )
    write(
        dest,
        "customer",
        {
            "c_custkey": pa.array(range(n_cust), pa.int64()),
            "c_name": [f"Customer#{i:09d}" for i in range(n_cust)],
            "c_nationkey": pa.array(rng.integers(0, 25, n_cust), pa.int32()),
            "c_acctbal": np.round(rng.uniform(-1000, 10_000, n_cust), 2),
            "c_mktsegment": np.array(SEGMENTS)[rng.integers(0, 5, n_cust)],
        },
    )
    write(
        dest,
        "supplier",
        {
            "s_suppkey": pa.array(range(n_supp), pa.int64()),
            "s_name": [f"Supplier#{i:09d}" for i in range(n_supp)],
            "s_nationkey": pa.array(rng.integers(0, 25, n_supp), pa.int32()),
            "s_acctbal": np.round(rng.uniform(-1000, 10_000, n_supp), 2),
        },
    )
    pk = np.arange(n_part)
    write(
        dest,
        "part",
        {
            "p_partkey": pa.array(pk, pa.int64()),
            "p_name": [
                f"{PART_COLORS[c]} {PART_NOUNS[n]}"
                for c, n in zip(rng.integers(0, 8, n_part), rng.integers(0, 8, n_part))
            ],
            "p_brand": [f"Brand#{b}" for b in rng.integers(1, 26, n_part)],
            "p_type": np.array(PART_TYPES)[rng.integers(0, 6, n_part)],
            "p_size": pa.array(rng.integers(1, 51, n_part), pa.int32()),
            "p_retailprice": np.round(900.0 + 0.1 * (pk % 1000), 2),
        },
    )
    epoch_1995 = np.datetime64("1995-01-01")
    odate = epoch_1995 + rng.integers(0, 2404, n_ord).astype("timedelta64[D]")
    write(
        dest,
        "orders",
        {
            "o_orderkey": pa.array(range(n_ord), pa.int64()),
            "o_custkey": pa.array(rng.integers(0, n_cust, n_ord), pa.int64()),
            "o_orderstatus": np.array(["P", "O", "F"])[rng.integers(0, 3, n_ord)],
            "o_totalprice": np.round(rng.uniform(1000, 500_000, n_ord), 2),
            "o_orderdate": pa.array(odate.astype("datetime64[us]")),
            "o_orderpriority": np.array(PRIORITIES)[rng.integers(0, 5, n_ord)],
        },
    )
    sdate = epoch_1995 + rng.integers(0, 2500, n_li).astype("timedelta64[D]")
    write(
        dest,
        "lineitem",
        {
            "l_orderkey": pa.array(rng.integers(0, n_ord, n_li), pa.int64()),
            "l_partkey": pa.array(rng.integers(0, n_part, n_li), pa.int64()),
            "l_suppkey": pa.array(rng.integers(0, n_supp, n_li), pa.int64()),
            "l_linenumber": pa.array(rng.integers(1, 8, n_li), pa.int32()),
            "l_quantity": rng.integers(1, 51, n_li).astype("float64"),
            "l_extendedprice": np.round(rng.uniform(900, 105_000, n_li), 2),
            "l_discount": np.round(rng.integers(0, 11, n_li) * 0.01, 2),
            "l_tax": np.round(rng.integers(0, 9, n_li) * 0.01, 2),
            "l_returnflag": np.array(["R", "A", "N"])[rng.integers(0, 3, n_li)],
            "l_linestatus": np.array(["O", "F"])[rng.integers(0, 2, n_li)],
            "l_shipdate": pa.array(sdate.astype("datetime64[us]")),
        },
    )
    gaps_us = rng.exponential(scale=259.2e6, size=n_ev)  # ~30 days total
    ts = np.datetime64("2024-01-01", "us") + np.cumsum(gaps_us).astype(
        "timedelta64[us]"
    )
    write(
        dest,
        "events",
        {
            "event_id": pa.array(range(n_ev), pa.int64()),
            "ts": pa.array(ts),
            "user_id": pa.array(rng.integers(0, max(n_users, 1), n_ev), pa.int64()),
            "event_type": np.array(EVENT_TYPES)[rng.integers(0, 5, n_ev)],
            "value": np.maximum(np.round(rng.exponential(50.0, n_ev), 2), 0.01),
            "props": [f'{{"k": {k}}}' for k in rng.integers(0, 100, n_ev)],
        },
    )
    vocab = np.array(DOC_WORDS)
    nw = rng.integers(10, 100, n_doc)
    texts = [" ".join(vocab[rng.integers(0, len(vocab), w)]) for w in nw]
    write(
        dest,
        "documents",
        {
            "doc_id": pa.array(range(n_doc), pa.int64()),
            "text": texts,
            "lang": np.array(LANGS)[rng.choice(5, n_doc, p=LANG_P)],
            "source": [f"src{s}" for s in rng.integers(0, 20, n_doc)],
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        },
    )
    labels = rng.integers(0, 10, n_emb)
    cents = rng.normal(0, 1, (10, 64))
    cents /= np.linalg.norm(cents, axis=1, keepdims=True)
    vecs = 0.15 * cents[labels] + rng.normal(0, 1, (n_emb, 64))
    vecs /= np.linalg.norm(vecs, axis=1, keepdims=True)
    vecs = vecs.astype("float32")
    write(
        dest,
        "embeddings",
        {
            "vec_id": pa.array(range(n_emb), pa.int64()),
            "embedding": pa.array(list(vecs), pa.list_(pa.float32())),
            "label": pa.array(labels, pa.int32()),
        },
    )
    print(dest)


if __name__ == "__main__":
    main()
