"""Full driver-style correctness sweep: run every registry query on Spark
AND its DuckDB oracle at the given scale factor, compare row counts, column
sets, and sorted values (the same signal the round driver hashes).

Usage: python scripts/oracle_check.py [sf_dir]   (default /root/testdata/sf0.01)

Prints one line per query and a final summary; exit code 1 on any mismatch.
"""

from __future__ import annotations

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

TABLES = (
    "region nation customer supplier part orders lineitem events documents "
    "embeddings"
).split()


def main() -> int:
    sf_dir = sys.argv[1] if len(sys.argv) > 1 else "/root/testdata/sf0.01"
    import duckdb

    import __spark_entry__ as entry
    from translator_tm_provider_pipelines_spark.session import get_spark

    spark = get_spark(app_name="oracle_check")
    spark.sparkContext.setLogLevel("ERROR")
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{sf_dir}/{t}.parquet')"
        )
    queries, oracles = entry.queries(), entry.oracle_sql()
    failures: list[str] = []
    for name in sorted(queries):
        try:
            sdf = queries[name](spark, sf_dir).toPandas()
            if name not in oracles:
                print(f"{name}: rows={len(sdf)} (no oracle registered)")
                continue
            odf = con.execute(oracles[name]).df()
            sc, oc = sorted(sdf.columns), sorted(odf.columns)
            s = sdf[sc].sort_values(sc).reset_index(drop=True).astype(str)
            o = odf[oc].sort_values(oc).reset_index(drop=True).astype(str)
            ok = s.shape == o.shape and sc == oc and (s.values == o.values).all()
            print(f"{name}: rows={len(s)}/{len(o)} match={bool(ok)}")
            if not ok:
                failures.append(name)
        except Exception as exc:  # a broken query must not hide the rest
            print(f"{name}: ERROR {type(exc).__name__}: {exc}")
            failures.append(name)
    print(f"\n{len(queries)} queries, {len(failures)} failures: {failures}")
    return 1 if failures else 0


if __name__ == "__main__":
    raise SystemExit(main())
