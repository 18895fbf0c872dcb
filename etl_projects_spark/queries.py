"""The engine's query catalog: every operator from SURVEY §2 as a
named (Spark query, DuckDB oracle SQL) pair.

Each Spark query is a callable ``(spark, sf_dir) -> DataFrame`` built on
the DataFrame API (Catalyst plans the physical strategy); each oracle is
ANSI SQL that DuckDB runs over the same parquet files. The driver
hash-matches the two at sf0.01.

Determinism contract
--------------------
Floating-point aggregation order differs between engines, so any
sum/avg over doubles is computed in exact DECIMAL arithmetic and cast
to DOUBLE only at the end — bit-identical results in both engines.
Top-k queries always carry a unique tie-break key in the sort.

Scale notes are inline per query: broadcast hints on dimension tables,
no driver-side collects anywhere, every plan is a single Spark job.
"""

from __future__ import annotations

import os
from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

SparkQuery = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, SparkQuery] = {}
# Values are either the DuckDB SQL string itself or a zero-arg callable
# producing it lazily (data-derived twin oracles) — resolved by
# __spark_entry__.oracle_sql() at gate time.
OracleEntry = str | Callable[[], "str | None"]
ORACLE: dict[str, OracleEntry] = {}


def _q(name: str, oracle: OracleEntry | None = None):
    """Register a query (and its oracle SQL) in the catalog.

    ``oracle`` is the DuckDB SQL string, or a zero-arg CALLABLE that
    returns it (or None). Callables are resolved at ``oracle_sql()``
    time, not import time — for data-derived twin oracles
    (``_ivf_recall_oracle``) this keeps module import free of parquet
    reads / matmuls / multi-MB SQL-string builds (r12 ADVICE), and
    keys the generated twin to the SPARK_GRAFT_ORACLE_SF_DIR in effect
    when the gate RUNS rather than when Python imported the module.
    """

    def deco(fn: SparkQuery) -> SparkQuery:
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        return fn

    return deco


def load(spark: SparkSession, sf_dir: str, table: str) -> DataFrame:
    """Parquet scan for one testdata table (pushdown + pruning intact).

    ``events.ts`` is parquet TIMESTAMP(NANOS), which Spark reads as long
    nanos (``spark.sql.legacy.parquet.nanosAsLong``) — convert to a real
    timestamp with integer division (no double round-trip: 1e18-scale
    nanos don't fit in a double's 53-bit mantissa).
    """
    if table == "events":
        # Runtime-settable SQL conf — the driver's session may not have it.
        spark.conf.set("spark.sql.legacy.parquet.nanosAsLong", "true")
    df = spark.read.parquet(os.path.join(sf_dir, f"{table}.parquet"))
    if table == "events" and dict(df.dtypes).get("ts") == "bigint":
        df = df.withColumn("ts", F.timestamp_micros(F.expr("ts DIV 1000")))
    return df


def dec(col: str | F.Column, scale: int = 2) -> F.Column:
    """Cast to exact decimal for order-independent aggregation."""
    c = F.col(col) if isinstance(col, str) else col
    return c.cast(f"decimal(18,{scale})")


D = "DECIMAL(18,2)"  # oracle-side twin of dec()


def disc_price() -> F.Column:
    """The catalog's most load-bearing decimal expression —
    l_extendedprice * (1 - l_discount) in exact DECIMAL — defined
    once so the TPC-H revenue queries cannot drift from each other
    (four hand-inlined copies previously)."""
    one = F.lit(1).cast("decimal(18,2)")
    return dec("l_extendedprice") * (one - dec("l_discount"))


# =========================================================================
# Relational surface (SURVEY §2.5) — TPC-H-style analytics
# =========================================================================


@_q(
    "q1_pricing_summary",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) AS sum_qty,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) AS sum_base_price,
           CAST(SUM(CAST(l_extendedprice AS {D}) * (CAST(1 AS {D}) - CAST(l_discount AS {D}))) AS DOUBLE) AS sum_disc_price,
           CAST(SUM(CAST(l_extendedprice AS {D}) * (CAST(1 AS {D}) - CAST(l_discount AS {D})) * (CAST(1 AS {D}) + CAST(l_tax AS {D}))) AS DOUBLE) AS sum_charge,
           CAST(CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_qty,
           CAST(CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_price,
           CAST(CAST(SUM(CAST(l_discount AS {D})) AS DOUBLE) / COUNT(*) AS DOUBLE) AS avg_disc,
           COUNT(*) AS count_order
    FROM lineitem
    WHERE l_shipdate <= TIMESTAMP '1998-09-02 00:00:00'
    GROUP BY l_returnflag, l_linestatus
    """,
)
def q1_pricing_summary(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q1-style pricing summary: scan → filter → 8-agg groupBy.

    Scale: partial (map-side) aggregation + AQE coalescing come free
    from Catalyst; the filter and 7-column projection push into the
    parquet scan.
    """
    li = load(spark, sf_dir, "lineitem")
    one = F.lit(1).cast("decimal(18,2)")
    dp = disc_price()
    charge = dp * (one + dec("l_tax"))
    return (
        li.filter(F.col("l_shipdate") <= F.lit("1998-09-02 00:00:00").cast("timestamp"))
        .groupBy("l_returnflag", "l_linestatus")
        .agg(
            F.sum(dec("l_quantity")).cast("double").alias("sum_qty"),
            F.sum(dec("l_extendedprice")).cast("double").alias("sum_base_price"),
            F.sum(dp).cast("double").alias("sum_disc_price"),
            F.sum(charge).cast("double").alias("sum_charge"),
            (F.sum(dec("l_quantity")).cast("double") / F.count("*")).alias("avg_qty"),
            (F.sum(dec("l_extendedprice")).cast("double") / F.count("*")).alias("avg_price"),
            (F.sum(dec("l_discount")).cast("double") / F.count("*")).alias("avg_disc"),
            F.count("*").alias("count_order"),
        )
    )


@_q(
    "q3_top_orders",
    f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS {D}) * (CAST(1 AS {D}) - CAST(l_discount AS {D}))) AS DOUBLE) AS revenue,
           o_orderdate
    FROM customer JOIN orders ON c_custkey = o_custkey
                  JOIN lineitem ON l_orderkey = o_orderkey
    WHERE c_mktsegment = 'BUILDING'
    GROUP BY l_orderkey, o_orderdate
    ORDER BY revenue DESC, o_orderdate, l_orderkey
    LIMIT 10
    """,
)
def q3_top_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q3-style: 3-way join → agg → top-k.

    Scale: customer (filtered on segment) is the small side — broadcast
    it so the orders⋈customer join is shuffle-free; lineitem⋈orders
    shuffles on orderkey once.
    """
    cust = load(spark, sf_dir, "customer").filter(F.col("c_mktsegment") == "BUILDING")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    revenue = disc_price()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("l_orderkey", "o_orderdate")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
        .select("l_orderkey", "revenue", "o_orderdate")
        .orderBy(F.desc("revenue"), "o_orderdate", "l_orderkey")
        .limit(10)
    )


@_q(
    "q5_local_supplier_volume",
    f"""
    SELECT n_name,
           CAST(SUM(CAST(l_extendedprice AS {D}) * (CAST(1 AS {D}) - CAST(l_discount AS {D}))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders   ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
      JOIN supplier ON l_suppkey = s_suppkey AND c_nationkey = s_nationkey
      JOIN nation   ON s_nationkey = n_nationkey
      JOIN region   ON n_regionkey = r_regionkey
    WHERE r_name = 'ASIA'
    GROUP BY n_name
    """,
)
def q5_local_supplier_volume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q5-style: 6-way star join → agg by nation.

    Scale: region/nation/supplier/customer are dimensions — broadcast
    all of them; only the lineitem⋈orders fact join shuffles.
    """
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    supp = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    region = load(spark, sf_dir, "region").filter(F.col("r_name") == "ASIA")
    revenue = disc_price()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(
            F.broadcast(supp),
            (li.l_suppkey == supp.s_suppkey) & (cust.c_nationkey == supp.s_nationkey),
        )
        .join(F.broadcast(nation), supp.s_nationkey == nation.n_nationkey)
        .join(F.broadcast(region), nation.n_regionkey == region.r_regionkey)
        .groupBy("n_name")
        .agg(F.sum(revenue).cast("double").alias("revenue"))
    )


@_q(
    "join_inner",
    """
    SELECT o_orderkey, o_totalprice, c_name, c_mktsegment
    FROM orders JOIN customer ON o_custkey = c_custkey
    WHERE o_orderstatus = 'F'
    """,
)
def join_inner(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inner equi-join, dimension side broadcast."""
    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderstatus") == "F")
    cust = load(spark, sf_dir, "customer")
    return orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey).select(
        "o_orderkey", "o_totalprice", "c_name", "c_mktsegment"
    )


@_q(
    "join_left_outer",
    f"""
    SELECT c_custkey, c_name, COUNT(o_orderkey) AS n_orders,
           CAST(COALESCE(SUM(CAST(o_totalprice AS {D})), 0) AS DOUBLE) AS total_spend
    FROM customer LEFT JOIN orders ON c_custkey = o_custkey
    GROUP BY c_custkey, c_name
    """,
)
def join_left_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left outer join keeping order-less customers (count = 0)."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return (
        cust.join(orders, cust.c_custkey == orders.o_custkey, "left")
        .groupBy("c_custkey", "c_name")
        .agg(
            F.count("o_orderkey").alias("n_orders"),
            F.coalesce(F.sum(dec("o_totalprice")), F.lit(0).cast("decimal(18,2)"))
            .cast("double")
            .alias("total_spend"),
        )
    )


@_q(
    "join_semi",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE EXISTS (SELECT 1 FROM orders o
                  WHERE o.o_custkey = c.c_custkey AND o.o_totalprice > 100000)
    """,
)
def join_semi(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-semi join (EXISTS): customers with at least one big order."""
    cust = load(spark, sf_dir, "customer")
    big = load(spark, sf_dir, "orders").filter(F.col("o_totalprice") > 100000)
    return cust.join(big, cust.c_custkey == big.o_custkey, "left_semi").select(
        "c_custkey", "c_name"
    )


@_q(
    "join_anti",
    """
    SELECT c_custkey, c_name FROM customer c
    WHERE NOT EXISTS (SELECT 1 FROM orders o WHERE o.o_custkey = c.c_custkey)
    """,
)
def join_anti(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Left-anti join (NOT EXISTS): customers with no orders — the
    incremental merge-dedup primitive."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    return cust.join(orders, cust.c_custkey == orders.o_custkey, "left_anti").select(
        "c_custkey", "c_name"
    )


@_q(
    "join_full_outer",
    """
    SELECT cn.nk AS c_nation, sn.nk AS s_nation
    FROM (SELECT DISTINCT c_nationkey AS nk FROM customer WHERE c_acctbal > 9000) cn
    FULL OUTER JOIN (SELECT DISTINCT s_nationkey AS nk FROM supplier WHERE s_acctbal > 5000) sn
      ON cn.nk = sn.nk
    """,
)
def join_full_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Full outer join of two key sets (nations with rich customers vs
    nations with rich suppliers)."""
    cn = (
        load(spark, sf_dir, "customer")
        .filter(F.col("c_acctbal") > 9000)
        .select(F.col("c_nationkey").alias("nk"))
        .distinct()
    )
    sn = (
        load(spark, sf_dir, "supplier")
        .filter(F.col("s_acctbal") > 5000)
        .select(F.col("s_nationkey").alias("nk"))
        .distinct()
    )
    return cn.join(sn, cn.nk == sn.nk, "full_outer").select(
        cn.nk.alias("c_nation"), sn.nk.alias("s_nation")
    )


@_q(
    "agg_count_distinct",
    """
    SELECT o_orderpriority,
           COUNT(*) AS n_orders,
           COUNT(DISTINCT o_custkey) AS n_customers
    FROM orders GROUP BY o_orderpriority
    """,
)
def agg_count_distinct(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY with exact count-distinct (expand-based in Catalyst)."""
    return (
        load(spark, sf_dir, "orders")
        .groupBy("o_orderpriority")
        .agg(
            F.count("*").alias("n_orders"),
            F.countDistinct("o_custkey").alias("n_customers"),
        )
    )


@_q(
    "window_dedup_latest",
    """
    SELECT o_orderkey, o_custkey, o_orderdate FROM (
      SELECT o_orderkey, o_custkey, o_orderdate,
             ROW_NUMBER() OVER (PARTITION BY o_custkey
                                ORDER BY o_orderdate DESC, o_orderkey DESC) AS rn
      FROM orders) t
    WHERE rn = 1
    """,
)
def window_dedup_latest(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-by-latest window pattern (incremental-load merge): keep the
    newest order per customer. Unique tie-break on o_orderkey keeps it
    deterministic."""
    w = W.partitionBy("o_custkey").orderBy(F.desc("o_orderdate"), F.desc("o_orderkey"))
    return (
        load(spark, sf_dir, "orders")
        .withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select("o_orderkey", "o_custkey", "o_orderdate")
    )


@_q(
    "sort_limit_topk",
    """
    SELECT o_orderkey, o_totalprice FROM orders
    ORDER BY o_totalprice DESC, o_orderkey LIMIT 100
    """,
)
def sort_limit_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k extract — Catalyst plans TakeOrderedAndProject (no global sort)."""
    return (
        load(spark, sf_dir, "orders")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .limit(100)
        .select("o_orderkey", "o_totalprice")
    )


@_q(
    "union_append",
    """
    SELECT o_orderstatus, COUNT(*) AS n FROM (
      SELECT o_orderstatus FROM orders WHERE o_totalprice > 200000
      UNION ALL
      SELECT o_orderstatus FROM orders WHERE o_orderdate >= TIMESTAMP '1997-01-01 00:00:00'
    ) u GROUP BY o_orderstatus
    """,
)
def union_append(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION ALL of two incremental batches then re-aggregate."""
    orders = load(spark, sf_dir, "orders")
    a = orders.filter(F.col("o_totalprice") > 200000).select("o_orderstatus")
    b = orders.filter(
        F.col("o_orderdate") >= F.lit("1997-01-01 00:00:00").cast("timestamp")
    ).select("o_orderstatus")
    return a.unionByName(b).groupBy("o_orderstatus").agg(F.count("*").alias("n"))


@_q(
    "pivot_status",
    f"""
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN l_linestatus = 'O' THEN CAST(l_quantity AS {D}) END) AS DOUBLE) AS O,
           CAST(SUM(CASE WHEN l_linestatus = 'F' THEN CAST(l_quantity AS {D}) END) AS DOUBLE) AS F
    FROM lineitem GROUP BY l_returnflag
    """,
)
def pivot_status(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pivot linestatus into columns (sum of quantity per flag)."""
    return (
        load(spark, sf_dir, "lineitem")
        .groupBy("l_returnflag")
        .pivot("l_linestatus", ["O", "F"])
        .agg(F.sum(dec("l_quantity")).cast("double"))
    )


@_q(
    "cube_counts",
    """
    SELECT l_returnflag, l_linestatus, COUNT(*) AS n
    FROM lineitem GROUP BY CUBE (l_returnflag, l_linestatus)
    """,
)
def cube_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUBE grouping sets (all subtotal combinations)."""
    return (
        load(spark, sf_dir, "lineitem")
        .cube("l_returnflag", "l_linestatus")
        .agg(F.count("*").alias("n"))
    )


# =========================================================================
# Column-transform operators (SURVEY §2.3) as queries
# =========================================================================


@_q(
    "date_parts",
    """
    SELECT CAST(year(l_shipdate) AS INT) AS year,
           CAST(month(l_shipdate) AS INT) AS month,
           CAST(day(l_shipdate) AS INT) AS day,
           COUNT(*) AS n
    FROM lineitem GROUP BY 1, 2, 3
    """,
)
def date_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P9: derive year/month/day partition keys from a date column,
    then aggregate on them (the partition-pruning key pattern)."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    li = load(spark, sf_dir, "lineitem")
    derived = (
        DataFrameOps.input(li)
        .create_year_month_day_columns_from_dataframe_column("l_shipdate")
        .output()
    )
    return derived.groupBy("year", "month", "day").agg(F.count("*").alias("n"))


@_q(
    "json_explode_props",
    f"""
    SELECT event_type,
           CAST(SUM(CAST(json_extract_string(props, '$.k') AS BIGINT)) AS BIGINT) AS sum_k,
           COUNT(*) AS n
    FROM events GROUP BY event_type
    """,
)
def json_explode_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P7: flatten the JSON-string ``props`` column into top-level
    columns (explicit schema → zero inference jobs), then aggregate."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    ev = load(spark, sf_dir, "events")
    flat = (
        DataFrameOps.input(ev)
        .explode_json_column("props", schema="k BIGINT")
        .output()
    )
    return flat.groupBy("event_type").agg(
        F.sum("k").alias("sum_k"), F.count("*").alias("n")
    )


@_q(
    "cast_all_to_string",
    """
    SELECT CAST(n_nationkey AS VARCHAR) AS n_nationkey,
           CAST(n_name AS VARCHAR) AS n_name,
           CAST(n_regionkey AS VARCHAR) AS n_regionkey
    FROM nation
    """,
)
def cast_all_to_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P11: the raw-boundary cast-everything-to-string coercion."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    return DataFrameOps.input(load(spark, sf_dir, "nation")).cast_all_to_string().output()


@_q(
    "format_column_names",
    """
    SELECT r_regionkey AS region_key, r_name AS region_name_raw FROM region
    """,
)
def format_column_names(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P2/P3: snake-case normalization of arbitrary source column names
    (one ``toDF`` node, not N renames)."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    ugly = load(spark, sf_dir, "region").select(
        F.col("r_regionkey").alias("Region Key"),
        F.col("r_name").alias("regionNameRaw"),
    )
    return DataFrameOps.input(ugly).format_column_names().output()


@_q(
    "literal_batch_stamp",
    """
    SELECT o_orderkey, 'yahoo_finance' AS source, 2024 AS year, 1 AS month, 15 AS day
    FROM orders WHERE o_orderkey <= 100
    """,
)
def literal_batch_stamp(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P8 + P10: stamp literal source/batch-date columns (the Airflow
    ``{{ ds }}`` pattern re-expressed)."""
    from datetime import date

    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 100)
    return (
        DataFrameOps.input(orders.select("o_orderkey"))
        .create_columns_from_dict({"source": "yahoo_finance"})
        .create_year_month_day_columns_from_date(date(2024, 1, 15))
        .output()
        .select(
            "o_orderkey",
            "source",
            F.col("year").cast("int").alias("year"),
            F.col("month").cast("int").alias("month"),
            F.col("day").cast("int").alias("day"),
        )
    )


@_q(
    "array_to_json",
    """
    SELECT o_orderkey,
           concat('[', o_orderkey, ',', o_custkey, ']') AS keys_json
    FROM orders WHERE o_orderkey <= 50
    """,
)
def array_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P5: ArrayType column → JSON string."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    with_arr = orders.select(
        "o_orderkey", F.array("o_orderkey", "o_custkey").alias("keys_json")
    )
    return DataFrameOps.input(with_arr).convert_array_type_to_json().output()


@_q(
    "struct_to_json",
    """
    SELECT o_orderkey,
           concat('{"status":"', o_orderstatus, '","priority":"', o_orderpriority, '"}') AS meta
    FROM orders WHERE o_orderkey <= 50
    """,
)
def struct_to_json(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P4: StructType column → JSON string."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    with_struct = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("meta"),
    )
    return DataFrameOps.input(with_struct).convert_struct_type_to_json().output()


@_q(
    "struct_to_string",
    """
    SELECT o_orderkey,
           concat('{', o_orderstatus, ', ', o_orderpriority, '}') AS meta
    FROM orders WHERE o_orderkey <= 50
    """,
)
def struct_to_string(spark: SparkSession, sf_dir: str) -> DataFrame:
    """P6: StructType column → plain string cast. Spark renders a cast
    struct as ``{v1, v2}``; the oracle rebuilds that exact spelling
    with concat (DuckDB's own struct→VARCHAR format differs)."""
    from etl_projects_spark.operators.dataframe_ops import DataFrameOps

    orders = load(spark, sf_dir, "orders").filter(F.col("o_orderkey") <= 50)
    with_struct = orders.select(
        "o_orderkey",
        F.struct(
            F.col("o_orderstatus").alias("status"),
            F.col("o_orderpriority").alias("priority"),
        ).alias("meta"),
    )
    return DataFrameOps.input(with_struct).convert_struct_type_to_string().output()
