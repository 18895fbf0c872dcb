"""Extended relational/SQL surface (SURVEY §2.5): grouping sets /
rollup, subqueries, analytic windows, set ops, scalar functions.

The reference's query language is "whatever Spark SQL runs from the
per-table .sql files" (``etl_projects/base/db/__init__.py:12-21``,
``base_sub_dag.py:58-84``) — these entries pin down that implied
surface with DuckDB-oracle-matched examples of each construct.

Determinism: double aggregation goes through DECIMAL (see queries.dec);
per-row scalar doubles (sqrt/ln) are IEEE-identical across engines;
every top-k sort carries a unique tie-break key.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.queries import D, _q, dec, load


@_q(
    "rollup_revenue",
    f"""
    SELECT n_name, year(o_orderdate) AS o_year,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
      JOIN customer ON o_custkey = c_custkey
      JOIN nation ON c_nationkey = n_nationkey
    GROUP BY ROLLUP (n_name, year(o_orderdate))
    """,
)
def rollup_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP aggregation: (nation, year) → nation → grand total in one
    pass (Catalyst expands to a single Expand+Aggregate — no N scans).
    Dimensions broadcast; the fact table shuffles once."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    return (
        orders.join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .join(F.broadcast(nation), cust.c_nationkey == nation.n_nationkey)
        .select("n_name", F.year("o_orderdate").alias("o_year"), "o_totalprice")
        .rollup("n_name", "o_year")
        .agg(
            F.sum(dec("o_totalprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_orders"),
        )
    )


@_q(
    "grouping_sets_status_priority",
    """
    SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
    FROM orders
    GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
    """,
)
def grouping_sets_status_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUPING SETS via the SQL entry point (engine.sql surface): two
    independent 1-d margins + grand total, one Expand+Aggregate."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_gs")
    return spark.sql(
        """
        SELECT o_orderstatus, o_orderpriority, COUNT(*) AS n
        FROM orders_gs
        GROUP BY GROUPING SETS ((o_orderstatus), (o_orderpriority), ())
        """
    )


@_q(
    "exists_big_lineitem_orders",
    """
    SELECT o_orderkey, o_totalprice
    FROM orders o
    WHERE EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
    """,
)
def exists_big_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Correlated EXISTS — planned as a left-semi hash join on the
    correlation key (no per-row subquery execution)."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_ex")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_ex")
    return spark.sql(
        """
        SELECT o_orderkey, o_totalprice
        FROM orders_ex o
        WHERE EXISTS (SELECT 1 FROM lineitem_ex l
                      WHERE l.l_orderkey = o.o_orderkey AND l.l_quantity >= 49)
        """
    )


@_q(
    "scalar_subquery_pricey_parts",
    """
    SELECT p_partkey, p_name, p_retailprice
    FROM part
    WHERE p_retailprice > 1.5 * (SELECT AVG(p_retailprice) FROM part)
    """,
)
def scalar_subquery_pricey_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Uncorrelated scalar subquery: computed once, broadcast as a
    literal into the filter (one extra tiny job, not a join).

    The avg is a single global aggregate consumed by a >-comparison —
    engine-order float drift cannot flip the predicate at 1.5× margin
    for this data, and DuckDB/Spark agree bit-for-bit on these sums in
    practice; the 1.5 factor keeps the boundary far from any row."""
    load(spark, sf_dir, "part").createOrReplaceTempView("part_sq")
    return spark.sql(
        """
        SELECT p_partkey, p_name, p_retailprice
        FROM part_sq
        WHERE p_retailprice > 1.5 * (SELECT AVG(p_retailprice) FROM part_sq)
        """
    )


@_q(
    "window_running_order_total",
    f"""
    SELECT o_custkey, o_orderkey,
           CAST(SUM(CAST(o_totalprice AS {D})) OVER (
               PARTITION BY o_custkey
               ORDER BY o_orderdate, o_orderkey
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS running_total
    FROM orders
    """,
)
def window_running_order_total(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Running per-customer order total: one shuffle on o_custkey, sort
    within partitions, decimal-exact prefix sums."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy("o_orderdate", "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return load(spark, sf_dir, "orders").select(
        "o_custkey",
        "o_orderkey",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("running_total"),
    )


@_q(
    "window_top_suppliers_per_nation",
    """
    SELECT n_name, s_name, s_acctbal, rnk FROM (
        SELECT n_name, s_name, s_acctbal,
               DENSE_RANK() OVER (PARTITION BY n_name
                                  ORDER BY s_acctbal DESC, s_suppkey) AS rnk
        FROM supplier JOIN nation ON s_nationkey = n_nationkey
    ) WHERE rnk <= 3
    """,
)
def window_top_suppliers_per_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-3 suppliers by balance per nation: dense_rank window +
    filter — the grouped-top-k pattern (rank pushdown prunes to k per
    partition under WindowGroupLimit)."""
    sup = load(spark, sf_dir, "supplier")
    nation = load(spark, sf_dir, "nation")
    w = W.partitionBy("n_name").orderBy(F.desc("s_acctbal"), F.asc("s_suppkey"))
    return (
        sup.join(F.broadcast(nation), sup.s_nationkey == nation.n_nationkey)
        .select("n_name", "s_name", "s_acctbal", F.dense_rank().over(w).alias("rnk"))
        .filter(F.col("rnk") <= 3)
    )


@_q(
    "window_user_value_delta",
    """
    SELECT event_id, user_id,
           round(value - lag(value) OVER (PARTITION BY user_id
                                          ORDER BY ts, event_id), 6) AS delta
    FROM events
    """,
)
def window_user_value_delta(spark: SparkSession, sf_dir: str) -> DataFrame:
    """lag() delta per user ordered by event time — the
    previous-row-comparison analytic (sessionization building block)."""
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        "user_id",
        F.round(F.col("value") - F.lag("value").over(w), 6).alias("delta"),
    )


@_q(
    "q6_selective_revenue",
    f"""
    SELECT CAST(SUM(CAST(l_extendedprice AS {D}) * CAST(l_discount AS {D})) AS DOUBLE)
           AS revenue
    FROM lineitem
    WHERE l_shipdate >= TIMESTAMP '1995-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1996-01-01 00:00:00'
      AND l_discount BETWEEN 0.05 AND 0.07
      AND l_quantity < 24
    """,
)
def q6_selective_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q6-style selective scan-agg: every predicate pushes to the
    parquet reader (PushedFilters), zero joins, one partial+final agg."""
    li = load(spark, sf_dir, "lineitem")
    return (
        li.filter(
            (F.col("l_shipdate") >= "1995-01-01")
            & (F.col("l_shipdate") < "1996-01-01")
            & (F.col("l_discount").between(0.05, 0.07))
            & (F.col("l_quantity") < 24)
        )
        .agg(
            F.sum(dec("l_extendedprice") * dec("l_discount"))
            .cast("double")
            .alias("revenue")
        )
    )


@_q(
    "string_functions_customer",
    """
    SELECT c_custkey,
           upper(c_name) AS name_upper,
           substring(c_name, 1, 8) AS name_prefix,
           length(c_name) AS name_len,
           concat(c_mktsegment, '#', CAST(c_custkey AS VARCHAR)) AS seg_key,
           regexp_extract(c_name, '[0-9]+', 0) AS name_digits,
           replace(c_name, 'Customer', 'Cust') AS name_short
    FROM customer
    """,
)
def string_functions_customer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar string surface: upper/substr/length/concat/regexp_extract/
    replace — all JVM built-ins inside one codegen stage."""
    c = load(spark, sf_dir, "customer")
    return c.select(
        "c_custkey",
        F.upper("c_name").alias("name_upper"),
        F.substring("c_name", 1, 8).alias("name_prefix"),
        F.length("c_name").alias("name_len"),
        F.concat_ws("#", "c_mktsegment", F.col("c_custkey").cast("string")).alias(
            "seg_key"
        ),
        F.regexp_extract("c_name", "[0-9]+", 0).alias("name_digits"),
        F.replace(F.col("c_name"), F.lit("Customer"), F.lit("Cust")).alias(
            "name_short"
        ),
    )


@_q(
    "math_functions_balance",
    """
    SELECT c_custkey,
           abs(c_acctbal) AS bal_abs,
           round(c_acctbal, 1) AS bal_round,
           sqrt(abs(c_acctbal)) AS bal_sqrt,
           ln(abs(c_acctbal) + 1.0) AS bal_ln,
           CAST(floor(c_acctbal) AS BIGINT) AS bal_floor,
           CAST(ceil(c_acctbal) AS BIGINT) AS bal_ceil,
           c_acctbal % 100.0 AS bal_mod
    FROM customer
    """,
)
def math_functions_balance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Scalar math surface: abs/round/sqrt/ln/floor/ceil/mod — per-row
    IEEE doubles, bit-identical across engines (no aggregation order)."""
    c = load(spark, sf_dir, "customer")
    bal = F.col("c_acctbal")
    return c.select(
        "c_custkey",
        F.abs(bal).alias("bal_abs"),
        F.round(bal, 1).alias("bal_round"),
        F.sqrt(F.abs(bal)).alias("bal_sqrt"),
        F.log(F.abs(bal) + 1.0).alias("bal_ln"),
        F.floor(bal).alias("bal_floor"),
        F.ceil(bal).alias("bal_ceil"),
        (bal % 100.0).alias("bal_mod"),
    )


@_q(
    "intersect_repeat_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
    INTERSECT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    """,
)
def intersect_repeat_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """INTERSECT (set semantics): customers ordering in both years —
    planned as an aggregate + semi join, one shuffle per side."""
    orders = load(spark, sf_dir, "orders")
    y94 = orders.filter(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    return y94.intersect(y95)


@_q(
    "except_lost_customers",
    """
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1994
    EXCEPT
    SELECT o_custkey FROM orders WHERE year(o_orderdate) = 1995
    """,
)
def except_lost_customers(spark: SparkSession, sf_dir: str) -> DataFrame:
    """EXCEPT (set semantics): 1994 customers who didn't return in
    1995 — anti-join plan shape. ``subtract`` IS set-EXCEPT;
    ``exceptAll().distinct()`` is NOT (a key with more 1994 than 1995
    orders would survive the multiset difference even though it
    appears on the right side — wrong whenever multiplicities
    differ)."""
    orders = load(spark, sf_dir, "orders")
    y94 = orders.filter(F.year("o_orderdate") == 1994).select("o_custkey")
    y95 = orders.filter(F.year("o_orderdate") == 1995).select("o_custkey")
    return y94.subtract(y95)


@_q(
    "conditional_agg_priority_matrix",
    """
    SELECT o_orderstatus,
           CAST(SUM(CASE WHEN o_orderpriority = '1-URGENT' THEN 1 ELSE 0 END) AS BIGINT) AS n_urgent,
           CAST(SUM(CASE WHEN o_orderpriority = '2-HIGH' THEN 1 ELSE 0 END) AS BIGINT) AS n_high,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS n_other
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def conditional_agg_priority_matrix(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conditional aggregation (manual pivot): CASE-guarded counts in a
    single grouped pass — the no-shuffle-per-column pivot pattern."""
    o = load(spark, sf_dir, "orders")
    urgent = (F.col("o_orderpriority") == "1-URGENT").cast("long")
    high = (F.col("o_orderpriority") == "2-HIGH").cast("long")
    other = (~F.col("o_orderpriority").isin("1-URGENT", "2-HIGH")).cast("long")
    return o.groupBy("o_orderstatus").agg(
        F.sum(urgent).alias("n_urgent"),
        F.sum(high).alias("n_high"),
        F.sum(other).alias("n_other"),
    )


@_q(
    "q4_order_priority",
    """
    SELECT o_orderpriority, COUNT(*) AS order_count
    FROM orders o
    WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
      AND EXISTS (SELECT 1 FROM lineitem l
                  WHERE l.l_orderkey = o.o_orderkey
                    AND l.l_shipdate > o.o_orderdate)
    GROUP BY o_orderpriority
    """,
)
def q4_order_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q4-style: date-windowed orders with a correlated EXISTS
    (late-shipped line) — semi join + single agg; both date predicates
    push to the scans."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_q4")
    load(spark, sf_dir, "lineitem").createOrReplaceTempView("lineitem_q4")
    return spark.sql(
        """
        SELECT o_orderpriority, COUNT(*) AS order_count
        FROM orders_q4 o
        WHERE o_orderdate >= TIMESTAMP '1996-01-01 00:00:00'
          AND o_orderdate < TIMESTAMP '1996-04-01 00:00:00'
          AND EXISTS (SELECT 1 FROM lineitem_q4 l
                      WHERE l.l_orderkey = o.o_orderkey
                        AND l.l_shipdate > o.o_orderdate)
        GROUP BY o_orderpriority
        """
    )


@_q(
    "q10_returned_revenue",
    f"""
    SELECT c_custkey, c_name,
           CAST(SUM(CAST(l_extendedprice AS {D}) * (CAST(1 AS {D}) - CAST(l_discount AS {D}))) AS DOUBLE) AS revenue
    FROM customer
      JOIN orders ON c_custkey = o_custkey
      JOIN lineitem ON l_orderkey = o_orderkey
    WHERE l_returnflag = 'R'
    GROUP BY c_custkey, c_name
    ORDER BY revenue DESC, c_custkey
    LIMIT 20
    """,
)
def q10_returned_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q10-style: top-20 customers by returned-item revenue.
    Customer dim broadcast into the fact join; decimal-exact revenue;
    unique tie-break key in the sort."""
    cust = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(F.col("l_returnflag") == "R")
    from etl_projects_spark.queries import disc_price

    rev = disc_price()
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .join(F.broadcast(cust), orders.o_custkey == cust.c_custkey)
        .groupBy("c_custkey", "c_name")
        .agg(F.sum(rev).cast("double").alias("revenue"))
        .orderBy(F.desc("revenue"), F.asc("c_custkey"))
        .limit(20)
    )


@_q(
    "percentiles_order_value",
    """
    SELECT o_orderstatus,
           round(quantile_cont(o_totalprice, 0.5), 4) AS p50,
           round(quantile_cont(o_totalprice, 0.9), 4) AS p90,
           round(quantile_cont(o_totalprice, 0.99), 4) AS p99
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def percentiles_order_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact interpolated percentiles per group (`F.percentile` — the
    sort-based exact form; swap to percentile_approx's t-digest sketch
    at 100 TB when a bounded-memory single pass matters more than
    exactness). Rounded to 4 dp: both engines interpolate in double."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_orderstatus").agg(
        F.round(F.percentile("o_totalprice", F.lit(0.5)), 4).alias("p50"),
        F.round(F.percentile("o_totalprice", F.lit(0.9)), 4).alias("p90"),
        F.round(F.percentile("o_totalprice", F.lit(0.99)), 4).alias("p99"),
    )


@_q(
    "ntile_customer_quartiles",
    """
    SELECT q, COUNT(*) AS n,
           round(MIN(c_acctbal), 2) AS min_bal,
           round(MAX(c_acctbal), 2) AS max_bal
    FROM (SELECT c_acctbal,
                 ntile(4) OVER (ORDER BY c_acctbal, c_custkey) AS q
          FROM customer)
    GROUP BY q
    """,
)
def ntile_customer_quartiles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ntile(4) quartile assignment (global sort window with a unique
    tie-break) summarized per bucket — the distribution-profiling
    analytic."""
    c = load(spark, sf_dir, "customer")
    w = W.orderBy("c_acctbal", "c_custkey")
    return (
        c.select("c_acctbal", F.ntile(4).over(w).alias("q"))
        .groupBy("q")
        .agg(
            F.count("*").alias("n"),
            F.round(F.min("c_acctbal"), 2).alias("min_bal"),
            F.round(F.max("c_acctbal"), 2).alias("max_bal"),
        )
    )


@_q(
    "array_agg_customer_priorities",
    """
    SELECT o_custkey,
           to_json(list_sort(list(DISTINCT o_orderpriority))) AS priorities,
           COUNT(*) AS n_orders
    FROM orders
    GROUP BY o_custkey
    """,
)
def array_agg_customer_priorities(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Collection aggregation: per-customer sorted distinct priority
    array. collect_set order is nondeterministic by contract —
    array_sort makes the result stable (and engine-portable). The
    catalog entry serializes the array with to_json so the result is
    hashable by the driver's pandas canonicalizer (raw array cells
    crash it: unhashable list)."""
    o = load(spark, sf_dir, "orders")
    return o.groupBy("o_custkey").agg(
        F.to_json(F.array_sort(F.collect_set("o_orderpriority"))).alias("priorities"),
        F.count("*").alias("n_orders"),
    )


@_q(
    "join_right_outer",
    """
    SELECT o_orderkey, o_totalprice, c_custkey, c_name
    FROM orders RIGHT OUTER JOIN customer ON o_custkey = c_custkey
    """,
)
def join_right_outer(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right outer join (customers kept even with zero orders) — the
    remaining outer-join variant; planned as the mirrored left join."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    return orders.join(
        cust, orders.o_custkey == cust.c_custkey, "right_outer"
    ).select("o_orderkey", "o_totalprice", "c_custkey", "c_name")


@_q(
    "union_distinct_keys",
    """
    SELECT o_custkey AS key FROM orders WHERE year(o_orderdate) = 1996
    UNION
    SELECT c_custkey AS key FROM customer WHERE c_mktsegment = 'BUILDING'
    """,
)
def union_distinct_keys(spark: SparkSession, sf_dir: str) -> DataFrame:
    """UNION (set semantics): distinct-merging two key sets — one
    aggregate over the concatenated inputs (vs union_append's
    shuffle-free UNION ALL)."""
    orders = load(spark, sf_dir, "orders")
    cust = load(spark, sf_dir, "customer")
    a = orders.filter(F.year("o_orderdate") == 1996).select(
        F.col("o_custkey").alias("key")
    )
    b = cust.filter(F.col("c_mktsegment") == "BUILDING").select(
        F.col("c_custkey").alias("key")
    )
    return a.union(b).distinct()


@_q(
    "q12_shipmode_priority",
    """
    SELECT l_returnflag,
           CAST(SUM(CASE WHEN o_orderpriority IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS high_line_count,
           CAST(SUM(CASE WHEN o_orderpriority NOT IN ('1-URGENT','2-HIGH') THEN 1 ELSE 0 END) AS BIGINT) AS low_line_count
    FROM orders JOIN lineitem ON o_orderkey = l_orderkey
    WHERE l_shipdate >= TIMESTAMP '1996-01-01 00:00:00'
      AND l_shipdate < TIMESTAMP '1997-01-01 00:00:00'
    GROUP BY l_returnflag
    """,
)
def q12_shipmode_priority(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q12 shape: fact-to-fact join with date pushdown and
    priority-class conditional counts."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem").filter(
        (F.col("l_shipdate") >= "1996-01-01") & (F.col("l_shipdate") < "1997-01-01")
    )
    high = F.col("o_orderpriority").isin("1-URGENT", "2-HIGH").cast("long")
    return (
        orders.join(li, orders.o_orderkey == li.l_orderkey)
        .groupBy("l_returnflag")
        .agg(
            F.sum(high).alias("high_line_count"),
            F.sum(1 - high).alias("low_line_count"),
        )
    )


@_q(
    "q18_large_orders",
    f"""
    SELECT o_orderkey, o_totalprice, qty_sum
    FROM orders JOIN (
        SELECT l_orderkey, CAST(SUM(CAST(l_quantity AS {D})) AS DOUBLE) AS qty_sum
        FROM lineitem GROUP BY l_orderkey HAVING SUM(CAST(l_quantity AS {D})) > 250
    ) big ON o_orderkey = big.l_orderkey
    """,
)
def q18_large_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TPC-H Q18 shape: HAVING-filtered aggregate joined back to the
    dimension — the aggregate side shrinks drastically before the join,
    so AQE converts it to a broadcast at runtime."""
    orders = load(spark, sf_dir, "orders")
    li = load(spark, sf_dir, "lineitem")
    big = (
        li.groupBy("l_orderkey")
        .agg(F.sum(dec("l_quantity")).alias("qty_dec"))
        .filter(F.col("qty_dec") > 250)
        .select("l_orderkey", F.col("qty_dec").cast("double").alias("qty_sum"))
    )
    return orders.join(big, orders.o_orderkey == big.l_orderkey).select(
        "o_orderkey", "o_totalprice", "qty_sum"
    )


@_q(
    "window_first_last_order",
    """
    SELECT DISTINCT o_custkey,
           first_value(o_orderkey) OVER w AS first_order,
           last_value(o_orderkey) OVER (PARTITION BY o_custkey
                                        ORDER BY o_orderdate, o_orderkey
                                        ROWS BETWEEN UNBOUNDED PRECEDING
                                                 AND UNBOUNDED FOLLOWING) AS last_order
    FROM orders
    WINDOW w AS (PARTITION BY o_custkey ORDER BY o_orderdate, o_orderkey)
    """,
)
def window_first_last_order(spark: SparkSession, sf_dir: str) -> DataFrame:
    """first_value/last_value analytics: each customer's first and most
    recent order in one windowed pass (full-frame for last_value)."""
    o = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_custkey").orderBy("o_orderdate", "o_orderkey")
    wfull = w.rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    return (
        o.select(
            "o_custkey",
            F.first("o_orderkey").over(w).alias("first_order"),
            F.last("o_orderkey").over(wfull).alias("last_order"),
        )
        .distinct()
    )


@_q(
    "date_functions_orders",
    """
    SELECT o_orderkey,
           date_diff('day', o_orderdate, TIMESTAMP '2000-01-01 00:00:00') AS days_to_y2k,
           o_orderdate + INTERVAL 7 DAY AS due_ts,
           CAST(last_day(CAST(o_orderdate AS DATE)) AS TIMESTAMP) AS month_end,
           dayofweek(o_orderdate) + 1 AS dow,
           CAST(year(o_orderdate) AS BIGINT) * 100 + month(o_orderdate) AS yyyymm
    FROM orders
    """,
)
def date_functions_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Date/time scalar surface: datediff, interval arithmetic,
    last_day, dayofweek, composed period keys — all codegen'd
    (DuckDB dayofweek is 0-based Sunday, Spark 1-based: oracle adds 1)."""
    o = load(spark, sf_dir, "orders")
    return o.select(
        "o_orderkey",
        F.datediff(F.lit("2000-01-01").cast("date"), F.col("o_orderdate")).alias(
            "days_to_y2k"
        ),
        (F.col("o_orderdate") + F.expr("INTERVAL 7 DAYS")).alias("due_ts"),
        # timestamp, not date: pandas renders Spark DATE as datetime.date but
        # DuckDB DATE as datetime64 — the driver's hash would never match.
        F.last_day("o_orderdate").cast("timestamp").alias("month_end"),
        F.dayofweek("o_orderdate").alias("dow"),
        (F.year("o_orderdate").cast("long") * 100 + F.month("o_orderdate")).alias(
            "yyyymm"
        ),
    )


@_q(
    "null_handling_functions",
    """
    SELECT o_orderkey,
           nullif(o_orderstatus, 'F') AS status_or_null,
           coalesce(nullif(o_orderstatus, 'F'), 'FINISHED') AS status_filled,
           CASE WHEN nullif(o_orderstatus, 'F') IS NULL THEN 1 ELSE 0 END AS was_f,
           ifnull(nullif(o_orderpriority, '1-URGENT'), 'URGENT!') AS prio_filled
    FROM orders
    """,
)
def null_handling_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Null-handling scalar surface: nullif / coalesce / isnull-CASE /
    ifnull — the three-valued-logic toolkit every SQL port needs."""
    o = load(spark, sf_dir, "orders")
    status_null = F.nullif(F.col("o_orderstatus"), F.lit("F"))
    return o.select(
        "o_orderkey",
        status_null.alias("status_or_null"),
        F.coalesce(status_null, F.lit("FINISHED")).alias("status_filled"),
        F.when(status_null.isNull(), 1).otherwise(0).alias("was_f"),
        F.ifnull(
            F.nullif(F.col("o_orderpriority"), F.lit("1-URGENT")), F.lit("URGENT!")
        ).alias("prio_filled"),
    )


@_q(
    "window_percent_rank",
    """
    SELECT o_orderkey, o_orderpriority,
           round(percent_rank() OVER w, 6) AS pct_rank,
           round(cume_dist() OVER w, 6) AS cume_d
    FROM orders
    WINDOW w AS (PARTITION BY o_orderpriority
                 ORDER BY o_totalprice, o_orderkey)
    """,
)
def window_percent_rank(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Relative-position analytics: percent_rank + cume_dist of each
    order's price within its priority class. Both are rank-count
    ratios — integer counts divided once at the end, so the doubles
    agree across engines; the sort carries the unique o_orderkey
    tie-break. One window shuffle on the partition key."""
    orders = load(spark, sf_dir, "orders")
    w = W.partitionBy("o_orderpriority").orderBy("o_totalprice", "o_orderkey")
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.round(F.percent_rank().over(w), 6).alias("pct_rank"),
        F.round(F.cume_dist().over(w), 6).alias("cume_d"),
    )


@_q(
    "map_functions_props",
    """
    SELECT event_id,
           CAST(len(json_keys(props)) AS INT) AS n_keys,
           array_to_string(list_sort(json_keys(props)), ',') AS keys_csv,
           array_to_string(list_transform(list_sort(json_keys(props)),
                                          k -> json_extract_string(props, '$.' || k)),
                           ',') AS vals_csv
    FROM events WHERE event_type = 'purchase'
    """,
)
def map_functions_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """MapType surface: JSON props → map<string,string> with map_keys /
    element_at / size, serialized to hashable CSV projections (sorted
    key order makes the row deterministic). Per-row codegen'd
    expressions over a pushed-down event_type filter — no shuffle."""
    ev = load(spark, sf_dir, "events").filter(F.col("event_type") == "purchase")
    m = F.from_json("props", "map<string,string>")
    staged = ev.select("event_id", m.alias("m"))
    keys = F.array_sort(F.map_keys(F.col("m")))
    return staged.select(
        "event_id",
        F.size("m").alias("n_keys"),
        F.concat_ws(",", keys).alias("keys_csv"),
        F.concat_ws(
            ",", F.transform(keys, lambda k: F.element_at(F.col("m"), k))
        ).alias("vals_csv"),
    )


@_q(
    "mode_priority_by_segment",
    """
    WITH j AS (
      SELECT c.c_mktsegment, o.o_orderpriority
      FROM orders o JOIN customer c ON o.o_custkey = c.c_custkey),
    cnt AS (
      SELECT c_mktsegment, o_orderpriority, COUNT(*) AS n
      FROM j GROUP BY 1, 2),
    r AS (
      SELECT *, ROW_NUMBER() OVER (
        PARTITION BY c_mktsegment
        ORDER BY n DESC, o_orderpriority) AS rn
      FROM cnt)
    SELECT c_mktsegment, o_orderpriority AS modal_priority, n
    FROM r WHERE rn = 1
    """,
)
def mode_priority_by_segment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact grouped MODE (most frequent value per group): count
    per (group, value), then one rank over the group-value COUNTS —
    never over the raw rows. The tie-break on the value itself makes
    the mode deterministic cross-engine. This is the scale-correct
    mode: the window input is |groups|×|distinct values| rows, not
    the fact table."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    cnt = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_mktsegment")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .groupBy("c_mktsegment", "o_orderpriority")
        .agg(F.count("*").alias("n"))
    )
    w = W.partitionBy("c_mktsegment").orderBy(
        F.desc("n"), "o_orderpriority"
    )
    return (
        cnt.withColumn("rn", F.row_number().over(w))
        .filter(F.col("rn") == 1)
        .select(
            "c_mktsegment",
            F.col("o_orderpriority").alias("modal_priority"),
            "n",
        )
    )


@_q(
    "mad_order_totals",
    """
    WITH med AS (
      SELECT o_orderpriority,
             quantile_disc(o_totalprice, 0.5) AS median_price
      FROM orders GROUP BY 1),
    dev AS (
      SELECT o.o_orderpriority, abs(o.o_totalprice - m.median_price) AS d
      FROM orders o JOIN med m ON o.o_orderpriority = m.o_orderpriority)
    SELECT d.o_orderpriority,
           m.median_price,
           quantile_disc(d.d, 0.5) AS mad
    FROM dev d JOIN med m ON d.o_orderpriority = m.o_orderpriority
    GROUP BY 1, 2
    """,
)
def mad_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Robust dispersion per group: median absolute deviation of order
    totals by priority. Two passes of EXACT discrete percentiles
    (``percentile_disc`` picks an actual data value — deterministic
    cross-engine, unlike interpolating percentile_cont over doubles);
    the group medians are a 5-row aggregate broadcast back for the
    deviation pass, so the fact table shuffles only on the group key.
    MAD is the outlier-detection statistic z-scores can't give you
    when the tail itself is the anomaly."""
    orders = load(spark, sf_dir, "orders").select(
        "o_orderpriority", "o_totalprice"
    )
    med = orders.groupBy("o_orderpriority").agg(
        F.expr(
            "percentile_disc(0.5) WITHIN GROUP (ORDER BY o_totalprice)"
        ).alias("median_price")
    )
    dev = orders.join(F.broadcast(med), "o_orderpriority").select(
        "o_orderpriority",
        "median_price",
        F.abs(F.col("o_totalprice") - F.col("median_price")).alias("d"),
    )
    return dev.groupBy("o_orderpriority", "median_price").agg(
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY d)").alias("mad")
    )


@_q(
    "window_nth_cume",
    """
    SELECT o_orderkey, o_orderpriority,
           cume_dist() OVER (PARTITION BY o_orderpriority
                             ORDER BY o_totalprice) AS cd,
           nth_value(o_totalprice, 2) OVER (
             PARTITION BY o_orderpriority
             ORDER BY o_totalprice DESC, o_orderkey
             ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)
             AS second_highest
    FROM orders
    """,
)
def window_nth_cume(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The remaining analytic-window surface: cume_dist (cumulative
    distribution — deterministic under ties because tied rows share
    the value) and nth_value over the full partition frame with a
    unique tie-break. One shuffle on the partition key; both
    functions ride the same window sort."""
    orders = load(spark, sf_dir, "orders")
    w_cd = W.partitionBy("o_orderpriority").orderBy("o_totalprice")
    w_nth = (
        W.partitionBy("o_orderpriority")
        .orderBy(F.desc("o_totalprice"), "o_orderkey")
        .rowsBetween(W.unboundedPreceding, W.unboundedFollowing)
    )
    return orders.select(
        "o_orderkey",
        "o_orderpriority",
        F.cume_dist().over(w_cd).alias("cd"),
        F.nth_value("o_totalprice", 2).over(w_nth).alias("second_highest"),
    )


@_q(
    "bitmap_user_event_mask",
    """
    WITH m AS (
      SELECT user_id,
             bit_or(CASE event_type
                      WHEN 'click' THEN 1 WHEN 'view' THEN 2
                      WHEN 'purchase' THEN 4 WHEN 'signup' THEN 8
                      WHEN 'error' THEN 16 ELSE 0 END) AS mask
      FROM events GROUP BY user_id)
    SELECT mask, COUNT(*) AS n_users,
           CAST(mask & 4 > 0 AS BOOLEAN) AS has_purchase
    FROM m GROUP BY mask
    """,
)
def bitmap_user_event_mask(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bitmask segment rollup: each user's event-type set packed into
    one integer with the ``bit_or`` aggregate, then segment sizes per
    mask — the bitmap-index representation behind audience/segment
    membership queries (set operations on user segments become
    integer AND/OR instead of joins). Two narrow aggregations; the
    second input is |users| rows of (long, long)."""
    ev = load(spark, sf_dir, "events")
    bit = (
        F.when(F.col("event_type") == "click", 1)
        .when(F.col("event_type") == "view", 2)
        .when(F.col("event_type") == "purchase", 4)
        .when(F.col("event_type") == "signup", 8)
        .when(F.col("event_type") == "error", 16)
        .otherwise(0)
    )
    masks = ev.groupBy("user_id").agg(F.bit_or(bit).alias("mask"))
    return masks.groupBy("mask").agg(
        F.count("*").alias("n_users"),
        (F.col("mask").bitwiseAND(4) > 0).alias("has_purchase"),
    )


@_q(
    "orders_rfm_segmentation",
    """
    WITH per_cust AS (
      SELECT o_custkey,
             date_diff('day', MAX(o_orderdate),
                       TIMESTAMP '1998-12-01 00:00:00') AS recency_days,
             COUNT(*) AS frequency,
             CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2)))
                  AS DECIMAL(28,2)) AS monetary
      FROM orders GROUP BY 1),
    t AS (
      SELECT quantile_disc(recency_days, 1.0/3) AS r1,
             quantile_disc(recency_days, 2.0/3) AS r2,
             quantile_disc(frequency, 1.0/3) AS f1,
             quantile_disc(frequency, 2.0/3) AS f2,
             quantile_disc(monetary, 1.0/3) AS m1,
             quantile_disc(monetary, 2.0/3) AS m2
      FROM per_cust),
    scored AS (
      SELECT o_custkey,
             3 - CAST(recency_days > r1 AS INT)
               - CAST(recency_days > r2 AS INT) AS r_score,
             1 + CAST(frequency > f1 AS INT)
               + CAST(frequency > f2 AS INT) AS f_score,
             1 + CAST(monetary > m1 AS INT)
               + CAST(monetary > m2 AS INT) AS m_score
      FROM per_cust, t)
    SELECT r_score * 100 + f_score * 10 + m_score AS rfm_code,
           COUNT(*) AS n_customers
    FROM scored GROUP BY 1
    """,
)
def orders_rfm_segmentation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """RFM customer segmentation (recency / frequency / monetary) —
    the classic lifecycle-marketing rollup: per-customer aggregates,
    tercile thresholds from ONE tiny ``percentile_disc`` aggregate
    broadcast back (no global ntile sort over the customer relation),
    three comparison-scored dimensions packed into an RFM code, and
    segment sizes out. Recency inverts (smaller gap → higher score).
    Every threshold is an actual data value and monetary is an exact
    decimal, so segment assignment is hash-deterministic."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.datediff(
            F.lit("1998-12-01").cast("timestamp"), F.max("o_orderdate")
        ).alias("recency_days"),
        F.count("*").alias("frequency"),
        F.sum(dec("o_totalprice")).alias("monetary"),
    )
    t = per_cust.agg(
        *[
            # 1.0D forces DOUBLE division: a bare `2.0/3` is DECIMAL
            # arithmetic in Spark SQL and rounds to 0.666667 — ABOVE
            # the true 2/3, shifting the threshold one element vs the
            # oracle's double division.
            F.expr(
                f"percentile_disc({q}D/3) WITHIN GROUP (ORDER BY {c})"
            ).alias(n)
            for c, q, n in [
                ("recency_days", "1.0", "r1"),
                ("recency_days", "2.0", "r2"),
                ("frequency", "1.0", "f1"),
                ("frequency", "2.0", "f2"),
                ("monetary", "1.0", "m1"),
                ("monetary", "2.0", "m2"),
            ]
        ]
    )
    scored = per_cust.crossJoin(F.broadcast(t)).select(
        "o_custkey",
        (
            F.lit(3)
            - (F.col("recency_days") > F.col("r1")).cast("int")
            - (F.col("recency_days") > F.col("r2")).cast("int")
        ).alias("r_score"),
        (
            F.lit(1)
            + (F.col("frequency") > F.col("f1")).cast("int")
            + (F.col("frequency") > F.col("f2")).cast("int")
        ).alias("f_score"),
        (
            F.lit(1)
            + (F.col("monetary") > F.col("m1")).cast("int")
            + (F.col("monetary") > F.col("m2")).cast("int")
        ).alias("m_score"),
    )
    return (
        scored.select(
            (
                F.col("r_score") * 100 + F.col("f_score") * 10
                + F.col("m_score")
            ).alias("rfm_code")
        )
        .groupBy("rfm_code")
        .agg(F.count("*").alias("n_customers"))
    )


@_q(
    "grouping_id_rollup",
    """
    SELECT CAST(year(o_orderdate) AS BIGINT) AS year,
           o_orderpriority,
           GROUPING(year(o_orderdate)) * 2 + GROUPING(o_orderpriority)
             AS gid,
           COUNT(*) AS n
    FROM orders
    GROUP BY ROLLUP (year(o_orderdate), o_orderpriority)
    """,
)
def grouping_id_rollup(spark: SparkSession, sf_dir: str) -> DataFrame:
    """ROLLUP with explicit GROUPING markers: the gid column
    distinguishes detail rows, per-year subtotals, and the grand
    total — how BI layers tell a real NULL group from a subtotal
    NULL. One expand + aggregate, no extra pass per grouping set."""
    orders = load(spark, sf_dir, "orders").select(
        F.year("o_orderdate").alias("year"), "o_orderpriority"
    )
    return (
        orders.rollup("year", "o_orderpriority")
        .agg(
            (
                F.grouping("year") * 2 + F.grouping("o_orderpriority")
            ).alias("gid"),
            F.count("*").alias("n"),
        )
        .select(
            F.col("year").cast("long").alias("year"),
            "o_orderpriority",
            F.col("gid").cast("long").alias("gid"),
            "n",
        )
    )


@_q(
    "decile_lift_table",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS {D})) AS monetary
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT monetary,
             ntile(10) OVER (ORDER BY monetary DESC, o_custkey) AS decile
      FROM per_cust),
    by_dec AS (
      SELECT decile, COUNT(*) AS n_customers,
             SUM(monetary) AS rev
      FROM ranked GROUP BY 1)
    SELECT decile, n_customers, CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (ORDER BY decile
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE)
             / CAST(SUM(rev) OVER () AS DOUBLE) AS cum_share
    FROM by_dec
    """,
)
def decile_lift_table(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Decile lift table — the campaign-targeting report: customers
    ranked by lifetime spend, cut into ntile(10) deciles, each with its
    exact-decimal revenue and the cumulative revenue share ("the top
    20% hold X% of revenue"). The ntile ordering carries o_custkey as
    a unique tie-break so bucket assignment is engine-deterministic;
    shares divide two exact decimal sums as doubles at the very end.

    Scale: ntile here is a global sort over the CUSTOMER aggregate
    (1 row/customer, not the fact table); past ~1e9 customers the
    decile boundaries would come from percentile_disc thresholds
    (one tiny aggregate, see orders_rfm_segmentation) instead of a
    global window sort. The final windows run over exactly 10 rows."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("monetary")
    )
    ranked = per_cust.select(
        "monetary",
        F.ntile(10)
        .over(W.orderBy(F.desc("monetary"), "o_custkey"))
        .alias("decile"),
    )
    by_dec = ranked.groupBy("decile").agg(
        F.count("*").alias("n_customers"), F.sum("monetary").alias("rev")
    )
    w_cum = W.orderBy("decile").rowsBetween(W.unboundedPreceding, 0)
    w_all = W.partitionBy()
    return by_dec.select(
        "decile",
        "n_customers",
        F.col("rev").cast("double").alias("revenue"),
        (
            F.sum("rev").over(w_cum).cast("double")
            / F.sum("rev").over(w_all).cast("double")
        ).alias("cum_share"),
    )


@_q(
    "gini_revenue_concentration",
    f"""
    WITH per_cust AS (
      SELECT o_custkey,
             SUM(CAST(o_totalprice AS {D})) AS monetary
      FROM orders GROUP BY 1),
    ranked AS (
      SELECT monetary,
             row_number() OVER (ORDER BY monetary, o_custkey) AS rn
      FROM per_cust),
    s AS (
      SELECT COUNT(*) AS n,
             SUM(monetary) AS s0,
             SUM(CAST(rn AS DECIMAL(10,0)) * monetary) AS s1
      FROM ranked)
    SELECT n AS n_customers,
           (2.0 * CAST(s1 AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(s0 AS DOUBLE))
           - (CAST(n AS DOUBLE) + 1.0) / CAST(n AS DOUBLE) AS gini
    FROM s
    """,
)
def gini_revenue_concentration(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gini coefficient of customer revenue concentration via the exact
    rank formula G = 2·Σ(i·xᵢ)/(n·Σx) − (n+1)/n over ascending spend.
    Both moments are exact decimals (rank × DECIMAL product stays under
    the 38-digit cap); equal spends contribute identically whatever
    their relative rank order, so ties can't perturb the result. The
    only doubles are the four casts in the final scalar expression,
    written operation-for-operation identically in both engines.

    Scale: row_number is a global sort over the customer AGGREGATE;
    at 1e9+ customers the rank would come from the two-phase
    distributed prefix-rank used by pack_token_spans (per-partition
    counts broadcast as offsets) — the moment algebra is unchanged."""
    orders = load(spark, sf_dir, "orders")
    per_cust = orders.groupBy("o_custkey").agg(
        F.sum(dec("o_totalprice")).alias("monetary")
    )
    ranked = per_cust.select(
        "monetary",
        F.row_number()
        .over(W.orderBy("monetary", "o_custkey"))
        .alias("rn"),
    )
    s = ranked.agg(
        F.count("*").alias("n"),
        F.sum("monetary").alias("s0"),
        F.sum(F.col("rn").cast("decimal(10,0)") * F.col("monetary")).alias(
            "s1"
        ),
    )
    n_d = F.col("n").cast("double")
    return s.select(
        F.col("n").alias("n_customers"),
        (
            (F.lit(2.0) * F.col("s1").cast("double"))
            / (n_d * F.col("s0").cast("double"))
            - (n_d + F.lit(1.0)) / n_d
        ).alias("gini"),
    )


@_q(
    "lateral_top2_orders_per_customer",
    """
    SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
    FROM customer c, LATERAL (
      SELECT o_orderkey, o_totalprice FROM orders o
      WHERE o.o_custkey = c.c_custkey
      ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
    """,
)
def lateral_top2_orders_per_customer(
    spark: SparkSession, sf_dir: str
) -> DataFrame:
    """Correlated LATERAL subquery — each customer's two priciest
    orders via a per-row ORDER BY ... LIMIT subquery, the SQL surface
    ORMs and BI tools emit for "top N related rows". Catalyst
    decorrelates it into a grouped top-k: WindowGroupLimit prunes to 2
    rows per key BEFORE the exchange (map-side), then one broadcast
    join back to customers — no per-customer subquery execution, no
    cartesian. The LIMIT ordering carries o_orderkey as tie-break, so
    which two orders survive is engine-deterministic."""
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_lat")
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_lat")
    return spark.sql(
        """
        SELECT c.c_custkey, t.o_orderkey, t.o_totalprice
        FROM customer_lat c JOIN LATERAL (
          SELECT o_orderkey, o_totalprice FROM orders_lat o
          WHERE o.o_custkey = c.c_custkey
          ORDER BY o_totalprice DESC, o_orderkey LIMIT 2) t
        """
    )


@_q(
    "rolling_7day_revenue",
    f"""
    SELECT o_custkey, o_orderkey, o_orderdate,
           CAST(SUM(CAST(o_totalprice AS {D})) OVER (
               PARTITION BY o_custkey ORDER BY o_orderdate
               RANGE BETWEEN INTERVAL 6 DAY PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS rev_7d
    FROM orders
    """,
)
def rolling_7day_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Time-RANGE window frame — the rolling-revenue surface ROWS
    frames can't express: each order's trailing 7-calendar-day revenue
    per customer, where the frame is bounded by the ORDER VALUE
    (orderdate − 6 days), not a row count, so sparse and dense
    order histories both get true calendar windows. Rows sharing an
    o_orderdate get identical frames (RANGE peers), which also makes
    the result tie-order-independent — no tiebreak column needed.
    Sums are exact decimals cast to double at the end.

    Scale: one shuffle on o_custkey + one sort — identical cost shape
    to a ROWS frame; Spark keeps a sliding frame pointer per
    partition, never re-scanning the window per row."""
    w = (
        W.partitionBy("o_custkey")
        .orderBy(F.col("o_orderdate").cast("timestamp").cast("long"))
        .rangeBetween(-6 * 86400, 0)
    )
    orders = load(spark, sf_dir, "orders")
    return orders.select(
        "o_custkey",
        "o_orderkey",
        "o_orderdate",
        F.sum(dec("o_totalprice")).over(w).cast("double").alias("rev_7d"),
    )


@_q(
    "variant_shred_props",
    """
    SELECT event_id,
           CAST(json_extract(props, '$.k') AS BIGINT) AS k,
           json(props) AS vj
    FROM events
    """,
)
def variant_shred_props(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark 4 VARIANT surface: ``parse_json`` shreds the raw JSON
    string into the binary variant encoding once, then typed access
    (``variant_get`` → BIGINT) and canonical re-serialization
    (``to_json``) both read the shredded form — the modern
    semi-structured path that replaces per-access string re-parsing
    (compare json_explode_props, the schema-inference route). The
    oracle is DuckDB's JSON type doing the same shred + minify, which
    pins the canonical serialization (`{"k":69}`, no whitespace) as
    well as the typed extraction.

    Scale: variant decode is a columnar scan-time operation; no
    shuffle, no Python, and the scan reads only (event_id, props)."""
    ev = load(spark, sf_dir, "events")
    return ev.select(
        "event_id",
        F.expr("variant_get(parse_json(props), '$.k', 'long')").alias("k"),
        F.expr("to_json(parse_json(props))").alias("vj"),
    )


@_q(
    "try_scalar_functions",
    """
    SELECT o_orderkey,
           TRY_CAST(substring(o_orderpriority, 1, 1) AS INT) AS pri_digit,
           TRY_CAST(o_orderstatus AS INT) AS status_num,
           o_orderkey / TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)
             AS per_pri,
           o_orderkey / (TRY_CAST(substring(o_orderpriority, 1, 1) AS INT)
                         - TRY_CAST(substring(o_orderpriority, 1, 1) AS INT))
             AS div_zero,
           CAST(CASE WHEN o_orderkey <= 9223372
                     THEN o_orderkey * 1000000000000
                END AS BIGINT) AS overflowed
    FROM orders
    """,
)
def try_scalar_functions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The ANSI-mode-safe ``try_`` scalar family — the error-as-NULL
    arithmetic a strict-mode pipeline needs so one malformed row
    degrades to NULL instead of failing a 100 TB job: try_cast
    (parseable and unparseable), try_divide (including the
    guaranteed-zero denominator), and try_multiply overflow (×1e12
    overflows to NULL past key 9 223 372 — the oracle guards the same
    boundary in a CASE). All failure paths are data-independent, so
    the NULL pattern is deterministic and hash-checked.

    Overflow is deliberately the EXCEPTIONAL case: the JVM handles a
    try_ overflow by throwing and catching per row, so a query where
    every row overflows runs ~4× slower than the success path
    (measured at sf0.1). try_ semantics are for rare malformed rows;
    expected-on-every-row failure belongs in an explicit guard.

    fan_out first (r15 optimization): the single-row-group orders
    file ran every per-row try_ expression on one core at bench scale
    (measured 1.48 s → 0.73 s at sf0.1, identical rows); no-op once
    the scan carries ≥ cores partitions."""
    from etl_projects_spark.operators.exec_util import fan_out

    orders = fan_out(
        load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderpriority", "o_orderstatus"
        )
    )
    pri = F.expr("try_cast(substring(o_orderpriority, 1, 1) AS INT)")
    return orders.select(
        "o_orderkey",
        pri.alias("pri_digit"),
        F.expr("try_cast(o_orderstatus AS INT)").alias("status_num"),
        F.try_divide(F.col("o_orderkey"), pri).alias("per_pri"),
        F.try_divide(F.col("o_orderkey"), pri - pri).alias("div_zero"),
        F.try_multiply(
            F.col("o_orderkey"), F.lit(1000000000000).cast("long")
        ).alias("overflowed"),
    )


@_q(
    "percent_change_mom",
    f"""
    WITH monthly AS (
      SELECT CAST(CAST(date_trunc('month', o_orderdate) AS DATE) AS VARCHAR)
               AS month,
             SUM(CAST(o_totalprice AS {D})) AS rev
      FROM orders GROUP BY 1)
    SELECT month, CAST(rev AS DOUBLE) AS revenue,
           (CAST(rev AS DOUBLE)
            - CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE))
             / CAST(lag(rev) OVER (ORDER BY month) AS DOUBLE) AS mom_change
    FROM monthly
    """,
)
def percent_change_mom(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Month-over-month revenue growth — the headline BI trend metric:
    exact-decimal monthly sums, lag over the month axis, and the
    percent change computed in doubles only at the final step (a
    decimal/decimal division would round differently per engine). The
    first month's change is NULL by construction. The growth window
    runs over the MONTH relation (tens of rows), not the fact table.
    """
    orders = load(spark, sf_dir, "orders")
    monthly = orders.groupBy(
        F.date_trunc("month", "o_orderdate")
        .cast("date")
        .cast("string")
        .alias("month")
    ).agg(F.sum(dec("o_totalprice")).alias("rev"))
    w = W.orderBy("month")
    rev_d = F.col("rev").cast("double")
    prev_d = F.lag("rev").over(w).cast("double")
    return monthly.select(
        "month",
        rev_d.alias("revenue"),
        ((rev_d - prev_d) / prev_d).alias("mom_change"),
    )


@_q(
    "shuffle_hash_join_hint",
    f"""
    SELECT c_mktsegment,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders JOIN customer ON o_custkey = c_custkey
    GROUP BY 1
    """,
)
def shuffle_hash_join_hint(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-strategy hint surface: ``/*+ SHUFFLE_HASH(c) */`` forces a
    shuffled hash join where the planner would default to broadcast
    (or sort-merge past the broadcast threshold) — the escape hatch
    for when one side is too big to broadcast but small enough per
    partition to hash, saving the sort-merge's two sorts. Hints are a
    plan rewrite only, so the oracle is the PLAIN join; the strategy
    change is pinned by test_plans."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_hint")
    load(spark, sf_dir, "customer").createOrReplaceTempView("customer_hint")
    return spark.sql(
        """
        SELECT /*+ SHUFFLE_HASH(c) */ c_mktsegment,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_orders
        FROM orders_hint o JOIN customer_hint c ON o_custkey = c_custkey
        GROUP BY c_mktsegment
        """
    )


# =========================================================================
# Wave 27: schema drift, bag set ops, GROUP BY ALL / VALUES surface,
# co-occurrence lift, cohort LTV
# =========================================================================


@_q(
    "json_key_drift_daily",
    """
    WITH dk AS (
      SELECT DISTINCT CAST(ts AS DATE) AS day,
             unnest(json_keys(props)) AS key
      FROM events),
    nk AS (SELECT day, COUNT(*) AS n_keys FROM dk GROUP BY 1),
    new AS (
      SELECT a.day, COUNT(*) AS n_new
      FROM dk a LEFT JOIN dk b
        ON b.key = a.key AND b.day = a.day - 1
      WHERE b.key IS NULL
      GROUP BY 1)
    SELECT CAST(nk.day AS VARCHAR) AS day, n_keys,
           COALESCE(n_new, 0) AS n_new
    FROM nk LEFT JOIN new ON nk.day = new.day
    """,
)
def json_key_drift_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Semi-structured schema-drift monitor: the distinct JSON keys in
    the ``props`` payload per day, plus how many were absent the
    previous calendar day — the alarm that catches an upstream service
    silently adding/renaming fields before the new keys hit a typed
    consumer. Key extraction is JVM-side ``json_object_keys`` (no
    Python, no full JSON parse into rows).

    Scale: distinct over (day, key) — a shuffle whose key space is
    days × schema width, NOT event volume (map-side distinct collapses
    per-partition repeats). "Absent the previous day" is a ``lag(day)
    OVER (PARTITION BY key)`` gap test on that tiny relation, so the
    event table is scanned and JSON-parsed ONCE (the anti-join
    formulation re-derives the distinct relation and parses twice)."""
    ev = load(spark, sf_dir, "events")
    dk = ev.select(
        F.to_date("ts").alias("day"),
        F.explode(F.json_object_keys("props")).alias("key"),
    ).distinct()
    prev_day = F.lag("day").over(W.partitionBy("key").orderBy("day"))
    is_new = prev_day.isNull() | (
        F.datediff(F.col("day"), prev_day) > 1
    )
    return (
        dk.withColumn("is_new", is_new)
        .groupBy("day")
        .agg(
            F.count("*").alias("n_keys"),
            F.sum(F.when(F.col("is_new"), 1).otherwise(0))
            .cast("bigint")
            .alias("n_new"),
        )
        .select(
            F.col("day").cast("string").alias("day"), "n_keys", "n_new"
        )
    )


@_q(
    "bag_setops_lineitem",
    """
    WITH a AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'A'),
    r AS (SELECT l_suppkey FROM lineitem WHERE l_returnflag = 'R'),
    ea AS (SELECT l_suppkey FROM a EXCEPT ALL SELECT l_suppkey FROM r),
    ia AS (SELECT l_suppkey FROM a INTERSECT ALL SELECT l_suppkey FROM r)
    SELECT 'except_all' AS op, l_suppkey, COUNT(*) AS n
    FROM ea GROUP BY 2
    UNION ALL
    SELECT 'intersect_all' AS op, l_suppkey, COUNT(*) AS n
    FROM ia GROUP BY 2
    """,
)
def bag_setops_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bag (multiset) set operations — EXCEPT ALL / INTERSECT ALL,
    which preserve duplicate multiplicity where the plain set ops
    collapse it: per supplier, surplus 'A'-flag line occurrences
    beyond the 'R' count, and the overlapping multiplicity. The
    multiplicity semantics (max(m−n,0) / min(m,n)) are what inventory
    reconciliation and replay-vs-expected stream audits need.

    Scale: Catalyst compiles both to one aggregate-style shuffle on
    the value (no join explosion); the two branches share the scan
    via the reused subplan."""
    li = load(spark, sf_dir, "lineitem")
    a = li.filter(F.col("l_returnflag") == "A").select("l_suppkey")
    r = li.filter(F.col("l_returnflag") == "R").select("l_suppkey")
    ea = (
        a.exceptAll(r)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("except_all").alias("op"), "l_suppkey", "n")
    )
    ia = (
        a.intersectAll(r)
        .groupBy("l_suppkey")
        .agg(F.count("*").alias("n"))
        .select(F.lit("intersect_all").alias("op"), "l_suppkey", "n")
    )
    return ea.unionByName(ia)


@_q(
    "groupby_all_revenue",
    f"""
    SELECT l_returnflag, l_linestatus,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_lines
    FROM lineitem GROUP BY ALL
    """,
)
def groupby_all_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """GROUP BY ALL surface — every non-aggregate select item becomes
    a grouping key implicitly (the BI-tool codegen convenience both
    Spark 4 and DuckDB support). Semantically identical to the
    explicit list; this entry pins that the dialect accepts it and
    that the implicit keys resolve to the same plan."""
    load(spark, sf_dir, "lineitem").createOrReplaceTempView(
        "lineitem_gba"
    )
    return spark.sql(
        """
        SELECT l_returnflag, l_linestatus,
               CAST(SUM(CAST(l_extendedprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_lines
        FROM lineitem_gba GROUP BY ALL
        """
    )


@_q(
    "values_clause_dim_join",
    f"""
    SELECT t.tier,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_orders
    FROM orders
    JOIN (VALUES ('1-URGENT', 'rush'), ('2-HIGH', 'rush'),
                 ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'lax'),
                 ('5-LOW', 'lax')) AS t(priority, tier)
      ON o_orderpriority = t.priority
    GROUP BY 1
    """,
)
def values_clause_dim_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Inline VALUES dimension — the literal lookup table pattern for
    small business mappings (priority → SLA tier) that don't merit a
    stored dim. The literal relation broadcast-joins into the fact
    scan for free; at 100 TB this is strictly better than a UDF or a
    CASE ladder because the mapping stays a relation the optimizer
    can reorder, prune, and reuse."""
    load(spark, sf_dir, "orders").createOrReplaceTempView("orders_vals")
    return spark.sql(
        """
        SELECT t.tier,
               CAST(SUM(CAST(o_totalprice AS DECIMAL(18,2))) AS DOUBLE)
                 AS revenue,
               COUNT(*) AS n_orders
        FROM orders_vals
        JOIN (VALUES ('1-URGENT', 'rush'), ('2-HIGH', 'rush'),
                     ('3-MEDIUM', 'standard'), ('4-NOT SPECIFIED', 'lax'),
                     ('5-LOW', 'lax')) AS t(priority, tier)
          ON o_orderpriority = t.priority
        GROUP BY t.tier
        """
    )


@_q(
    "event_cooccurrence_lift",
    """
    WITH ut AS (SELECT DISTINCT user_id, event_type FROM events),
    singles AS (SELECT event_type, COUNT(*) AS n_t FROM ut GROUP BY 1),
    tot AS (SELECT COUNT(DISTINCT user_id) AS n_users FROM ut),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             COUNT(*) AS n_ab
      FROM ut a JOIN ut b
        ON a.user_id = b.user_id AND a.event_type < b.event_type
      GROUP BY 1, 2)
    SELECT type_a, type_b, n_ab,
           CAST(n_ab AS DOUBLE) * n_users
             / (CAST(sa.n_t AS DOUBLE) * sb.n_t) AS lift
    FROM pairs
    JOIN singles sa ON sa.event_type = type_a
    JOIN singles sb ON sb.event_type = type_b
    CROSS JOIN tot
    """,
)
def event_cooccurrence_lift(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Market-basket lift between event types: P(a∧b)/(P(a)·P(b)) over
    users, from exact integer co-occurrence counts — lift > 1 means
    the behaviors attract (view→purchase), < 1 they repel. The
    association-rule primitive, computed set-exactly.

    Scale: the self-join runs on the DISTINCT (user, type) relation —
    bounded at users × |type vocabulary|, with per-user fan-out ≤
    |types|² (tiny constant), never event × event. That relation feeds
    four consumers (both join sides, the marginals, the user total),
    so it is materialized once — without the cache each consumer would
    re-scan and re-distinct the full fact table. One float expression
    per output row; counts broadcast."""
    from etl_projects_spark.operators.exec_util import materialize_scoped

    ev = load(spark, sf_dir, "events")
    ut = materialize_scoped(
        ev.select("user_id", "event_type").distinct(),
        scope="event_cooccurrence_lift.ut",
    )
    singles = ut.groupBy("event_type").agg(F.count("*").alias("n_t"))
    tot = ut.agg(F.count_distinct("user_id").alias("n_users"))
    b = ut.select(
        F.col("user_id").alias("uid_b"), F.col("event_type").alias("type_b")
    )
    pairs = (
        ut.join(
            b,
            (F.col("user_id") == F.col("uid_b"))
            & (F.col("event_type") < F.col("type_b")),
        )
        .groupBy(F.col("event_type").alias("type_a"), "type_b")
        .agg(F.count("*").alias("n_ab"))
    )
    sa = singles.select(
        F.col("event_type").alias("type_a"), F.col("n_t").alias("n_a")
    )
    sb = singles.select(
        F.col("event_type").alias("type_b"), F.col("n_t").alias("n_b")
    )
    return (
        pairs.join(F.broadcast(sa), "type_a")
        .join(F.broadcast(sb), "type_b")
        .crossJoin(F.broadcast(tot))
        .select(
            "type_a",
            "type_b",
            "n_ab",
            (
                F.col("n_ab").cast("double") * F.col("n_users")
                / (F.col("n_a").cast("double") * F.col("n_b"))
            ).alias("lift"),
        )
    )


@_q(
    "cohort_ltv_curve",
    f"""
    WITH o AS (
      SELECT o_custkey,
             year(o_orderdate) * 12 + month(o_orderdate) AS m,
             o_totalprice
      FROM orders),
    cohort AS (SELECT o_custkey, MIN(m) AS cm FROM o GROUP BY 1),
    g AS (
      SELECT cm, o.m - cm AS age,
             CAST(SUM(CAST(o_totalprice AS {D})) AS {D}) AS rev
      FROM o JOIN cohort USING (o_custkey)
      GROUP BY 1, 2)
    SELECT cm AS cohort_month, age,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(SUM(rev) OVER (PARTITION BY cm ORDER BY age
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                AS DOUBLE) AS cum_revenue
    FROM g
    """,
)
def cohort_ltv_curve(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort lifetime-value curve: customers grouped by first-order
    month, revenue accumulated by months-since-first-order — the
    retention-economics table behind every LTV dashboard. The cumsum
    runs in exact DECIMAL over the (cohort × age) relation and casts
    to double only on emit.

    Scale: one aggregate to per-customer first month (map-side
    combinable), one fact-keyed join + aggregate to cohort × age
    (calendar-bounded: months²), then a window over that tiny
    relation — the fact table never enters a window."""
    o = load(spark, sf_dir, "orders").select(
        "o_custkey",
        (F.year("o_orderdate") * 12 + F.month("o_orderdate")).alias("m"),
        "o_totalprice",
    )
    cohort = o.groupBy("o_custkey").agg(F.min("m").alias("cm"))
    g = (
        o.join(cohort, "o_custkey")
        .groupBy("cm", (F.col("m") - F.col("cm")).alias("age"))
        .agg(F.sum(dec("o_totalprice")).cast(D).alias("rev"))
    )
    w = (
        W.partitionBy("cm")
        .orderBy("age")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    return g.select(
        F.col("cm").alias("cohort_month"),
        "age",
        F.col("rev").cast("double").alias("revenue"),
        F.sum("rev").over(w).cast("double").alias("cum_revenue"),
    )


@_q(
    "share_of_parent_revenue",
    f"""
    WITH g AS (
      SELECT n_name, year(o_orderdate) AS o_year,
             CAST(SUM(CAST(o_totalprice AS {D})) AS DECIMAL(38,2)) AS rev
      FROM orders
        JOIN customer ON o_custkey = c_custkey
        JOIN nation ON c_nationkey = n_nationkey
      GROUP BY 1, 2),
    w AS (
      SELECT n_name, o_year, rev,
             CAST(SUM(rev) OVER (PARTITION BY n_name) AS DECIMAL(38,2))
               AS nation_rev,
             CAST(SUM(rev) OVER () AS DECIMAL(38,2)) AS grand_rev
      FROM g)
    SELECT n_name, o_year,
           CAST(rev AS DOUBLE) AS revenue,
           CAST(rev AS DOUBLE) / CAST(nation_rev AS DOUBLE)
             AS share_of_nation,
           CAST(nation_rev AS DOUBLE) / CAST(grand_rev AS DOUBLE)
             AS nation_share_of_total
    FROM w
    """,
)
def share_of_parent_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Share-of-parent ratios down a dimension hierarchy: each
    (nation, year) cell's share of its nation, and each nation's share
    of the grand total — the percent-of-parent metric every drill-down
    BI view shows next to the raw measure. All cross-row sums are
    exact DECIMAL window aggregates over the already-aggregated cell
    relation; each share is one float division on emit.

    Scale: dims broadcast into the fact aggregate (one shuffle); the
    windows run over nations × years cells, never fact rows."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    g = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy("n_name", F.year("o_orderdate").alias("o_year"))
        .agg(F.sum(dec("o_totalprice")).cast("decimal(38,2)").alias("rev"))
    )
    nation_rev = (
        F.sum("rev").over(W.partitionBy("n_name")).cast("decimal(38,2)")
    )
    grand_rev = F.sum("rev").over(W.partitionBy()).cast("decimal(38,2)")
    w = g.select("n_name", "o_year", "rev",
                 nation_rev.alias("nation_rev"), grand_rev.alias("grand_rev"))
    return w.select(
        "n_name",
        "o_year",
        F.col("rev").cast("double").alias("revenue"),
        (F.col("rev").cast("double") / F.col("nation_rev").cast("double"))
        .alias("share_of_nation"),
        (
            F.col("nation_rev").cast("double")
            / F.col("grand_rev").cast("double")
        ).alias("nation_share_of_total"),
    )
