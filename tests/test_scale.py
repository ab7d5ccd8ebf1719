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


def test_aqe_skew_split_engages_on_zipf_join(spark):
    """Executed evidence for the SCALING.md Zipf-concept-key claim: a join
    whose left side piles ~90% of its rows (with a fat payload) onto one
    key must trigger AQE's runtime skew split — the final adaptive plan
    marks the shuffle read 'skewed' — while producing exactly the plain
    join's row count."""
    n = 120_000
    left = (
        spark.range(n)
        .select(
            F.when(F.col("id") % 10 < 9, F.lit(0)).otherwise(F.col("id")).alias("k"),
            F.col("id").alias("uid"),
            F.repeat(F.lit("x"), 120).alias("payload"),
        )
    )
    right = spark.range(n).select(F.col("id").alias("k"), (F.col("id") * 2).alias("r"))
    confs = {
        "spark.sql.autoBroadcastJoinThreshold": "-1",
        "spark.sql.adaptive.skewJoin.skewedPartitionThresholdInBytes": "256KB",
        "spark.sql.adaptive.skewJoin.skewedPartitionFactor": "2",
        "spark.sql.adaptive.advisoryPartitionSizeInBytes": "64KB",
    }
    saved = {k: spark.conf.get(k, None) for k in confs}
    try:
        for k, v in confs.items():
            spark.conf.set(k, v)
        joined = left.join(right, "k")
        # execute THIS frame (not a derived count plan) so its adaptive
        # plan finalizes, then read the final plan off it
        assert len(joined.collect()) == n
        plan = joined._jdf.queryExecution().executedPlan().toString()
        assert "isFinalPlan=true" in plan
        assert "skewed" in plan, plan
    finally:
        for k, v in saved.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)


def test_salted_join_splits_hot_key_across_partitions(spark):
    """The deterministic alternative to AQE: with every row on ONE key, a
    plain shuffle join lands the whole key in a single partition (the
    straggler); salted_join must spread it across multiple shuffle
    partitions while keeping row parity."""
    # the hot key must be data-derived (a literal key constant-folds into
    # a cartesian-with-filter plan and never shuffles); 99% of rows share
    # key 0, the rest are tail keys
    left = spark.range(4_000).select(
        F.when(F.col("id") % 100 < 99, F.lit(0)).otherwise(F.col("id")).alias("k"),
        F.col("id").alias("uid"),
    )
    right = left.select("k").distinct().withColumn("r", F.lit("dim"))
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    # AQE would both convert the tiny right side back to broadcast and
    # coalesce the toy-sized post-join partitions into one — disable it so
    # the test observes the raw shuffle partitioning the salt changes
    spark.conf.set("spark.sql.adaptive.enabled", "false")
    try:
        plain = left.join(right, "k")
        plain_parts = (
            plain.where(F.col("k") == 0)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        salted = scale.salted_join(left, right, on="k", salt_from="uid", n_salts=8)
        salted_parts = (
            salted.where(F.col("k") == 0)
            .select(F.spark_partition_id().alias("p"))
            .distinct()
            .count()
        )
        assert plain_parts == 1  # the whole hot key is one straggler
        assert salted_parts > 1  # salting spreads it
        assert salted.count() == plain.count() == 4_000
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "10485760")
        spark.conf.set("spark.sql.adaptive.enabled", "true")
