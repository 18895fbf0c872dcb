"""DataFrameOps fluent service: per-operator unit checks (P4-P10, X1-X2)."""

from __future__ import annotations

import datetime

from pyspark.sql import functions as F

from etl_projects_spark.operators.dataframe_ops import DataFrameOps


def test_struct_and_array_to_json(spark):
    df = spark.createDataFrame(
        [(1, {"a": 2}, [1, 2])], "id int, s struct<a:int>, arr array<int>"
    )
    out = (
        DataFrameOps.input(df)
        .convert_struct_type_to_json()
        .convert_array_type_to_json()
        .output()
    )
    types = dict(out.dtypes)
    assert types["s"] == "string" and types["arr"] == "string"
    row = out.collect()[0]
    assert row["s"] == '{"a":2}' and row["arr"] == "[1,2]"


def test_struct_to_string_cast(spark):
    df = spark.createDataFrame([(1, {"a": 2})], "id int, s struct<a:int>")
    out = DataFrameOps.input(df).convert_struct_type_to_string().output()
    assert dict(out.dtypes)["s"] == "string"
    assert out.collect()[0]["s"] == "{2}"


def test_literal_columns_and_date_parts(spark):
    df = spark.createDataFrame([(1,)], "id int")
    out = (
        DataFrameOps.input(df)
        .create_columns_from_dict({"source": "api", "batch": 7})
        .create_year_month_day_columns_from_date(datetime.date(2024, 3, 5))
        .output()
    )
    row = out.collect()[0]
    assert (row["source"], row["batch"]) == ("api", 7)
    assert (row["year"], row["month"], row["day"]) == (2024, 3, 5)


def test_date_parts_from_column(spark):
    df = spark.createDataFrame(
        [(1, datetime.datetime(2023, 12, 31, 5, 0))], "id int, ts timestamp"
    )
    out = (
        DataFrameOps.input(df)
        .create_year_month_day_columns_from_dataframe_column("ts")
        .output()
    )
    row = out.collect()[0]
    assert (row["year"], row["month"], row["day"]) == (2023, 12, 31)


def test_optimize_partition_counts(spark):
    df = spark.range(1000).repartition(16)
    shrunk = DataFrameOps.input(df).optimize_partition(records_by_partition=500).output()
    assert shrunk.rdd.getNumPartitions() <= 2
    grown = DataFrameOps.input(spark.range(10).coalesce(1)).optimize_partition(
        records_by_partition=2
    ).output()
    assert grown.rdd.getNumPartitions() >= 5


def test_optimize_partitions_by_columns(spark):
    df = spark.createDataFrame(
        [(i, i % 3) for i in range(30)], "id int, bucket int"
    )
    out = (
        DataFrameOps.input(df)
        .optimize_partitions_by_partition_columns(["bucket"])
        .output()
    )
    # every in-memory partition holds at most... all rows of its bucket(s)
    per_part = out.rdd.glom().map(lambda rows: len({r["bucket"] for r in rows})).collect()
    assert all(n <= 3 for n in per_part)


def test_explode_json_inference_union_of_keys_no_python(spark):
    """P7 inference: union-of-all-keys schema with JVM-only jobs — the
    key-union plan must contain no Python/Arrow eval stages (the old
    sample.rdd.map path pushed the whole column through Python)."""
    from etl_projects_spark.operators.dataframe_ops import _infer_json_schema

    df = spark.createDataFrame(
        [
            (1, '{"a": 1, "b": "x"}'),
            (2, '{"b": "y", "c": 2.5}'),
            (3, None),
        ],
        "id int, payload string",
    )
    schema = _infer_json_schema(df, "payload")
    assert [f.name for f in schema.fields] == ["a", "b", "c"]
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types == {"a": "bigint", "b": "string", "c": "double"}

    # plan pin: the distributed part of inference is pure JVM
    keys_plan = df.select(
        F.explode(F.json_object_keys(F.coalesce(F.col("payload"), F.lit("{}"))))
    )._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in keys_plan

    out = DataFrameOps.input(df).explode_json_column("payload").output()
    out_plan = out._jdf.queryExecution().executedPlan().toString()
    for marker in ("BatchEvalPython", "ArrowEvalPython", "MapInPandas"):
        assert marker not in out_plan
    rows = {r["id"]: r for r in out.collect()}
    assert rows[1]["a"] == 1 and rows[2]["c"] == 2.5 and rows[3]["b"] is None


def test_explode_json_type_sample_string_fallback(spark):
    """Keys outside the bounded type sample still appear — typed as
    string (union-of-keys fidelity is never sampled away)."""
    import etl_projects_spark.operators.dataframe_ops as ops

    df = spark.createDataFrame(
        [(i, '{"common": %d}' % i) for i in range(5)]
        + [(99, '{"common": 99, "rare": true}')],
        "id int, payload string",
    )
    old = ops.JSON_TYPE_SAMPLE_ROWS
    ops.JSON_TYPE_SAMPLE_ROWS = 0  # force every key outside the sample
    try:
        schema = ops._infer_json_schema(df, "payload")
    finally:
        ops.JSON_TYPE_SAMPLE_ROWS = old
    types = {f.name: f.dataType.simpleString() for f in schema.fields}
    assert types == {"common": "string", "rare": "string"}


def test_prefix_sum_matches_global_window(spark, sf_dir):
    import os

    from pyspark.sql import Window as W
    from pyspark.sql import functions as F

    from etl_projects_spark.operators.exec_util import prefix_sum

    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", F.col("o_custkey").alias("v")
    )
    got = {
        r.o_orderkey: r.c
        for r in prefix_sum(df, "o_orderkey", "v", out_col="c").collect()
    }
    w = W.orderBy("o_orderkey").rowsBetween(W.unboundedPreceding, -1)
    exp = {
        r.o_orderkey: r.c
        for r in df.select(
            "o_orderkey", F.coalesce(F.sum("v").over(w), F.lit(0)).alias("c")
        ).collect()
    }
    assert got == exp


def test_explode_json_collision_raises_clearly(spark):
    """A JSON key colliding with a kept top-level column must fail at
    the explode with an actionable message, not produce a duplicate
    column that breaks some later reference (r5 operator review)."""
    import pytest
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    df = spark.createDataFrame(
        [(1, '{"id": 7, "x": 1}')], "id long, props string"
    )
    with pytest.raises(ValueError, match="collide.*id.*prefix"):
        DataFrameOps(df).explode_json_column("props")
    # a prefix resolves it
    out = DataFrameOps(df).explode_json_column("props", prefix="p_").df
    assert set(out.columns) == {"id", "p_id", "p_x"}


def test_prefix_sum_accepts_precomputed_bounds(spark, sf_dir):
    """r6 ADVICE: hot callers can skip prefix_sum's eager
    approxQuantile pass by supplying boundary values; results must be
    identical to the self-computed path for any valid boundary set."""
    import os

    from pyspark.sql import functions as F

    from etl_projects_spark.operators.exec_util import prefix_sum

    df = spark.read.parquet(os.path.join(sf_dir, "orders.parquet")).select(
        "o_orderkey", F.col("o_custkey").alias("v")
    )
    auto = {
        r.o_orderkey: r.c
        for r in prefix_sum(df, "o_orderkey", "v", out_col="c").collect()
    }
    lo, hi = df.agg(F.min("o_orderkey"), F.max("o_orderkey")).first()
    supplied = {
        r.o_orderkey: r.c
        for r in prefix_sum(
            df, "o_orderkey", "v", out_col="c",
            bounds=[lo + (hi - lo) * i / 4 for i in range(1, 4)],
        ).collect()
    }
    assert supplied == auto
