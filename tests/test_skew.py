"""Skew operators: salted results must equal unsalted; bucketed joins
must plan without a shuffle Exchange."""

from __future__ import annotations

import math

import pytest
from pyspark.sql import functions as F

from etl_projects_spark.operators import skew
from etl_projects_spark.queries import load

SF_DIR = "/root/testdata/sf0.001"


def test_salted_groupby_equals_plain(spark):
    orders = load(spark, SF_DIR, "orders")
    plain = {
        r["o_orderstatus"]: (r["rev"], r["n"])
        for r in orders.groupBy("o_orderstatus")
        .agg(
            F.sum(F.col("o_totalprice").cast("decimal(18,2)")).alias("rev"),
            F.count("*").alias("n"),
        )
        .collect()
    }
    salted = {
        r["o_orderstatus"]: (r["rev"], r["n"])
        for r in skew.salted_groupby_sum(
            orders,
            keys=["o_orderstatus"],
            sum_cols={
                "rev": F.col("o_totalprice").cast("decimal(18,2)"),
                "n": F.lit(1),
            },
            salt=16,
            salt_on="o_orderkey",
        ).collect()
    }
    assert plain == salted


def test_salted_join_equals_plain(spark):
    li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = (
        load(spark, SF_DIR, "orders")
        .withColumnRenamed("o_orderkey", "l_orderkey")
        .select("l_orderkey", "o_totalprice")
    )
    plain = li.join(orders, "l_orderkey").count()
    salted = skew.salted_join(li, orders, on="l_orderkey", salt=8)
    assert salted.count() == plain
    assert "_salt" not in salted.columns


def test_bucketed_join_no_shuffle(spark, tmp_path):
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        li = load(spark, SF_DIR, "lineitem").select("l_orderkey", "l_quantity")
        orders = load(spark, SF_DIR, "orders").select("o_orderkey", "o_totalprice")
        skew.write_bucketed(li, "b_lineitem", ["l_orderkey"], n_buckets=8)
        skew.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "b_orders", ["l_orderkey"], n_buckets=8,
        )
        joined = skew.bucketed_join(spark, "b_lineitem", "b_orders", "l_orderkey")
        assert skew.assert_no_shuffle_join(joined), "bucketed join must not shuffle"
        assert joined.count() == li.join(
            orders, li.l_orderkey == orders.o_orderkey
        ).count()
    finally:
        spark.conf.unset("spark.sql.autoBroadcastJoinThreshold")
        spark.sql("DROP TABLE IF EXISTS b_lineitem")
        spark.sql("DROP TABLE IF EXISTS b_orders")


def test_salt_chooser_hot_vs_uniform(spark):
    """The skew-stats chooser must prescribe real spreading for a hot
    key and (near-)no salting for uniform keys."""
    from etl_projects_spark.operators.skew import choose_salt_factor

    hot = spark.range(10_000).selectExpr(
        "CASE WHEN id % 10 < 8 THEN 0 ELSE id END AS k", "id AS v"
    )
    uniform = spark.range(10_000).selectExpr("id AS k", "id AS v")
    s_hot = choose_salt_factor(hot, "k")
    s_uni = choose_salt_factor(uniform, "k")
    parts = int(spark.conf.get("spark.sql.shuffle.partitions"))
    # 80% hot key: needs ~0.8*parts salts (clamped to 64).
    assert s_hot >= min(64, math.ceil(0.5 * parts))
    assert s_uni == 1


def test_salted_join_auto_salt_80pct_hot_key_matches_unsalted(spark):
    """Property pin for the 100× story: a synthetic join where 80% of
    the big side lands on ONE key must produce exactly the unsalted
    result when salted with the auto-chosen factor."""
    from etl_projects_spark.operators.skew import choose_salt_factor, salted_join

    big = spark.range(20_000).selectExpr(
        "CASE WHEN id % 10 < 8 THEN 7 ELSE id % 500 END AS k",
        "id AS payload",
    )
    small = spark.range(500).selectExpr("id AS k", "id * 10 AS dim_val")
    for how in ("inner", "left"):
        got = salted_join(big, small, on="k", salt=None, how=how)
        want = big.join(small, "k", how)
        assert got.count() == want.count()
        assert got.exceptAll(want).count() == 0
        assert want.exceptAll(got).count() == 0
    assert choose_salt_factor(big, "k") > 1


def test_salt_spreads_byte_identical_rows_across_partitions(spark):
    """r6 review: a hot key of byte-identical rows must not collapse to
    ONE salt — the partition-id mix spreads rows that sit in different
    scan partitions (bounded residual: identical rows within a split)."""
    from etl_projects_spark.operators import skew
    from pyspark.sql import functions as F

    df = spark.createDataFrame([("hot", 1.0)] * 400, "k string, v double").repartition(8)
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(F.col("k"), F.col("v"), F.spark_partition_id()), F.lit(16)),
    )
    n_salts = salted.select("_salt").distinct().count()
    assert n_salts > 1, "identical rows all landed on one salt"
    # and the operator's results stay exact
    out = skew.salted_groupby_sum(df, ["k"], {"s": F.col("v")}, salt=16).collect()
    assert len(out) == 1 and out[0]["s"] == 400.0
