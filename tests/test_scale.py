"""Scale utilities: bucketed shuffle-free joins, deterministic skew salting."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from translator_tm_provider_pipelines_spark.operators import scale

SF = "/root/testdata/sf0.001"


def test_bucketed_join_has_no_exchange(spark):
    # managed tables land in the session's spark-warehouse dir (gitignored)
    orders = spark.read.parquet(f"{SF}/orders.parquet")
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet")
    scale.write_bucketed(orders, "b_orders", ["o_orderkey"], 8, sort_cols=["o_orderkey"])
    scale.write_bucketed(
        lineitem.withColumnRenamed("l_orderkey", "o_orderkey"),
        "b_lineitem", ["o_orderkey"], 8, sort_cols=["o_orderkey"],
    )
    a = scale.read_bucketed(spark, "b_orders")
    b = scale.read_bucketed(spark, "b_lineitem")
    # defeat broadcast so the plan must pick a keyed join strategy
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        joined = a.join(b, "o_orderkey")
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "Exchange" not in plan, plan
        n = joined.count()
        assert n == lineitem.count()  # every lineitem matches its order
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.sql("DROP TABLE IF EXISTS b_orders")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")


def test_salted_join_matches_plain_join(spark):
    lineitem = spark.read.parquet(f"{SF}/lineitem.parquet").limit(2000)
    supplier = spark.read.parquet(f"{SF}/supplier.parquet")
    plain = lineitem.join(supplier, lineitem.l_suppkey == supplier.s_suppkey).select(
        "l_orderkey", "l_linenumber", "s_name"
    )
    salted = scale.salted_join(
        lineitem.withColumnRenamed("l_suppkey", "s_suppkey"),
        supplier,
        on="s_suppkey",
        salt_from=F.concat_ws(":", "l_orderkey", "l_linenumber"),
        n_salts=8,
    ).select("l_orderkey", "l_linenumber", "s_name")
    assert salted.count() == plain.count()
    assert salted.exceptAll(plain).count() == 0
    assert plain.exceptAll(salted).count() == 0


def test_salted_join_left_and_validation(spark):
    left = spark.createDataFrame(
        [(1, "a"), (1, "b"), (2, "c"), (3, "d")], "k int, v string"
    )
    right = spark.createDataFrame([(1, "X"), (2, "Y")], "k int, r string")
    out = scale.salted_join(left, right, on="k", salt_from="v", n_salts=4, how="left")
    rows = {(r.k, r.v): r.r for r in out.collect()}
    assert rows == {(1, "a"): "X", (1, "b"): "X", (2, "c"): "Y", (3, "d"): None}
    with pytest.raises(ValueError):
        scale.salted_join(left, right, on="k", salt_from="v", how="full")


def test_salted_join_spreads_hot_key(spark):
    left = spark.createDataFrame(
        [(1, f"row{i}") for i in range(100)] + [(2, "x")], "k int, v string"
    )
    right = spark.createDataFrame([(1, "hot"), (2, "cold")], "k int, r string")
    salted = left.withColumn("__salt", F.pmod(F.hash(F.col("v")), F.lit(8)))
    n_subkeys = salted.where("k = 1").select("__salt").distinct().count()
    assert n_subkeys > 1  # the hot key occupies multiple shuffle subkeys
    out = scale.salted_join(left, right, on="k", salt_from="v", n_salts=8)
    assert out.count() == 101
