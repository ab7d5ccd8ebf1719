"""MySQL-dialect JDBC upsert: recorded-SQL + semantics assertion suite.

The sandbox has no MySQL server, so the test drives ``sinks.write_upsert``
end-to-end against a fake DB-API driver that behaves like a MySQL table
with a declared primary key: it records every ``executemany`` call (the
statement text and batch size land in per-commit JSON files, since the
calls happen in executor worker processes) and APPLIES the statement it
received — rows insert when the key is absent, and on a duplicate key
exactly the ``col = VALUES(col)`` pairs parsed from the statement's ON
DUPLICATE KEY UPDATE clause overwrite the stored row, which is MySQL's
actual conflict behavior (ConceptCooccurrenceMetricsPipeline.java:316-355,
ClassifiedSentenceStoragePipeline.java:458-518). This covers the three
things the reference's JdbcIO path guarantees: statement shape, 5000-row
batch flushing (scaled down here), and conflict-update semantics.
"""

from __future__ import annotations

import json
import os
from functools import partial

import fake_mysql

from translator_tm_provider_pipelines_spark.sources import sinks


def _all_calls(db_dir):
    calls = []
    for name in sorted(os.listdir(db_dir)):
        if name.startswith("calls-"):
            calls.extend(json.load(open(os.path.join(db_dir, name))))
    return calls


def test_mysql_upsert_statement_batching_and_conflicts(spark, tmp_path):
    # ship the fake driver to the executor python workers
    spark.sparkContext.addPyFile(
        os.path.join(os.path.dirname(__file__), "fake_mysql.py")
    )
    db = str(tmp_path / "db")
    os.makedirs(db)
    connect = partial(fake_mysql.connect, db, ["pair_id", "metric"])

    first = spark.createDataFrame(
        [(f"p{i}", "ngd", float(i), 1) for i in range(7)],
        "pair_id string, metric string, score double, version int",
    )
    sinks.write_upsert(
        first, connect, "metrics", ["pair_id", "metric"],
        batchsize=3, num_partitions=1, dialect="mysql",
    )

    calls = _all_calls(db)
    # exact reference statement shape: every column in the update list
    expect_sql = (
        "INSERT INTO metrics (pair_id, metric, score, version) "
        "VALUES (?, ?, ?, ?) ON DUPLICATE KEY UPDATE "
        "pair_id = VALUES(pair_id), metric = VALUES(metric), "
        "score = VALUES(score), version = VALUES(version)"
    )
    assert {c["sql"] for c in calls} == {expect_sql}
    # batch flushing: 7 rows at batchsize 3 on one partition -> 3, 3, 1
    assert sorted((c["n"] for c in calls), reverse=True) == [3, 3, 1]

    # second write overlaps 3 keys with new scores and adds 2 new keys
    second = spark.createDataFrame(
        [("p0", "ngd", 100.0, 2), ("p1", "ngd", 101.0, 2), ("p2", "ngd", 102.0, 2),
         ("p7", "ngd", 7.0, 2), ("p8", "ngd", 8.0, 2)],
        "pair_id string, metric string, score double, version int",
    )
    sinks.write_upsert(
        second, connect, "metrics", ["pair_id", "metric"],
        batchsize=3, num_partitions=1, dialect="mysql",
    )

    state = {r["pair_id"]: r for r in json.load(open(os.path.join(db, "state.json")))}
    assert len(state) == 9  # 7 original + 2 new, conflicts collapsed
    for i in (0, 1, 2):  # conflicting keys took the new values
        assert state[f"p{i}"]["score"] == 100.0 + i
        assert state[f"p{i}"]["version"] == 2
    for i in (3, 4, 5, 6):  # untouched keys keep the first write
        assert state[f"p{i}"]["score"] == float(i)
        assert state[f"p{i}"]["version"] == 1
    assert state["p7"]["score"] == 7.0 and state["p8"]["score"] == 8.0


def test_mysql_dialect_detection_and_sql_shape():
    assert sinks.upsert_dialect_from_url("jdbc:mysql://host/db") == "mysql"
    assert sinks.upsert_dialect_from_url("mariadb://host/db") == "mysql"
    assert sinks.upsert_dialect_from_url("jdbc:postgresql://host/db") == "ansi"
    sql = sinks._upsert_sql("t", ["k", "v"], ["k"], dialect="mysql")
    assert sql == (
        "INSERT INTO t (k, v) VALUES (?, ?) "
        "ON DUPLICATE KEY UPDATE k = VALUES(k), v = VALUES(v)"
    )


def test_mysql_upsert_concurrent_partitions_overlapping_keys(spark, tmp_path):
    """Cluster fan-in shape (VERDICT r5 task 7): N partitions upsert
    OVERLAPPING keys concurrently into one endpoint. Contract proven
    against the lock-replay fake (commit replays recorded statements on
    freshly loaded state under an exclusive lock — InnoDB's row-level
    serialization at commit granularity):

    - no lost rows: every key written by any partition is present;
    - no torn rows: each stored row equals EXACTLY one writer's full
      column set for that key (per-statement atomicity), with last-writer
      order racy per key — the same guarantee a real server gives;
    - connection/batch knobs: one commit per partition, ceil(rows/batch)
      executemany flushes per partition."""
    import math

    db = tmp_path / "mysqldb"
    db.mkdir()
    spark.sparkContext.addPyFile(fake_mysql.__file__)

    n_parts, keys_per_writer = 8, 30
    rows = [
        (k, f"writer{w}", w * 1000 + k)
        for w in range(n_parts)
        for k in range(keys_per_writer)  # every writer hits EVERY key
    ]
    df = (
        spark.createDataFrame(rows, "id int, writer string, score int")
        .repartition(n_parts, "writer")
    )
    sinks.write_upsert(
        df,
        partial(fake_mysql.connect, str(db), ["id"]),
        "scores",
        key_cols=["id"],
        batchsize=7,
        dialect="mysql",
    )
    state = {r["id"]: r for r in json.load(open(db / "state.json"))}
    assert sorted(state) == list(range(keys_per_writer))  # no lost rows
    for k, row in state.items():
        w = int(row["writer"].removeprefix("writer"))
        assert row["score"] == w * 1000 + k  # no torn rows
    # knob accounting: every row flushed, batches sized as configured
    calls = _all_calls(db)
    assert sum(c["n"] for c in calls) == len(rows)
    assert max(c["n"] for c in calls) <= 7
    n_commits = len([f for f in os.listdir(db) if f.startswith("calls-")])
    assert n_commits <= n_parts + 1  # one commit per (non-empty) partition


def test_mysql_upsert_second_pass_overwrites(spark, tmp_path):
    """Deterministic last-writer check: a second sequential pass with new
    scores overwrites every conflicting row (update-clause columns only)."""
    db = tmp_path / "mysqldb2"
    db.mkdir()
    spark.sparkContext.addPyFile(fake_mysql.__file__)
    conn = partial(fake_mysql.connect, str(db), ["id"])
    df1 = spark.createDataFrame(
        [(i, "first", i) for i in range(20)], "id int, writer string, score int"
    )
    sinks.write_upsert(df1, conn, "scores", key_cols=["id"], dialect="mysql")
    df2 = spark.createDataFrame(
        [(i, "second", 100 + i) for i in range(0, 20, 2)],
        "id int, writer string, score int",
    )
    sinks.write_upsert(df2, conn, "scores", key_cols=["id"], dialect="mysql")
    state = {r["id"]: r for r in json.load(open(db / "state.json"))}
    assert len(state) == 20
    for i in range(20):
        if i % 2 == 0:
            assert state[i]["writer"] == "second" and state[i]["score"] == 100 + i
        else:
            assert state[i]["writer"] == "first" and state[i]["score"] == i
