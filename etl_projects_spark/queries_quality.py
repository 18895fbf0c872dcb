"""Query-catalog entries for the data-quality operators (Q1–Q3).

The rule flags are deterministic expressions, so the validation pass
has an exact DuckDB twin: the `_errors` array is built with the same
rule order in both engines.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.operators import quality
from etl_projects_spark.queries import _q, load

EVENT_TYPES_OK = ("click", "view", "purchase")


def event_rules() -> dict:
    """Built lazily: Column expressions need an active SparkContext in
    PySpark 4.x, and this module is imported before the driver's
    session exists."""
    return {
        "event_type_known": quality.in_set("event_type", EVENT_TYPES_OK),
        "value_non_negative": quality.non_negative("value"),
        "user_id_required": quality.required("user_id"),
    }

# Same rules, same order, DuckDB dialect. TRUE = valid.
_ORACLE_FLAGS = """
    list_filter([
        CASE WHEN NOT (event_type IS NULL OR event_type IN ('click','view','purchase'))
             THEN 'event_type_known' END,
        CASE WHEN NOT (value IS NULL OR value >= 0)
             THEN 'value_non_negative' END,
        CASE WHEN NOT (user_id IS NOT NULL)
             THEN 'user_id_required' END
    ], x -> x IS NOT NULL)
"""


@_q(
    "quality_validate_events",
    f"SELECT event_id, to_json({_ORACLE_FLAGS}) AS errors_json FROM events",
)
def quality_validate_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q1 schema/rule validation: one codegen'd projection computes all
    rule flags; `_errors` is empty for valid rows. The catalog entry
    serializes the error array with to_json — array cells are
    unhashable in the driver's pandas canonicalizer."""
    ev = load(spark, sf_dir, "events")
    return quality.validate(ev, event_rules()).select(
        "event_id", F.to_json(quality.ERRORS_COL).alias("errors_json")
    )


@_q(
    "quality_violation_counts",
    f"""
    SELECT rule, COUNT(*) AS n_violations
    FROM (SELECT unnest({_ORACLE_FLAGS}) AS rule FROM events)
    GROUP BY rule
    """,
)
def quality_violation_counts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q3's aggregate view: per-rule violation totals (explode +
    map-side partial count — one narrow shuffle of rule names)."""
    ev = load(spark, sf_dir, "events")
    return quality.violation_counts(quality.validate(ev, event_rules()))


@_q(
    "quality_monitor_gate",
    """
    WITH m AS (
      SELECT CAST(COUNT(*) AS BIGINT) AS n_rows,
             CAST(SUM(CASE WHEN NOT (event_type IS NULL
                        OR event_type IN ('click','view','purchase'))
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_type,
             CAST(SUM(CASE WHEN NOT (value IS NULL OR value >= 0)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_val,
             CAST(SUM(CASE WHEN NOT (user_id IS NOT NULL)
                      THEN 1 ELSE 0 END) AS BIGINT) AS v_uid
      FROM events)
    SELECT 'min_count' AS check_name, n_rows AS observed,
           n_rows >= 1000 AS passed FROM m
    UNION ALL SELECT 'viol:event_type_known', v_type, v_type = 0 FROM m
    UNION ALL SELECT 'viol:value_non_negative', v_val, v_val = 0 FROM m
    UNION ALL SELECT 'viol:user_id_required', v_uid, v_uid = 0 FROM m
    """,
)
def quality_monitor_gate(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Q2/Q3 monitors through the zero-extra-cost ``observe`` path: the
    batch streams through ONE action (a noop sink standing in for the
    write the pipeline would run anyway) with an Observation node
    carrying row count + per-rule violation counts; the gate report —
    (check, observed, passed) per monitor — is built from those
    metrics. No second scan, no per-rule jobs: at 100 TB monitoring
    rides the write for free. The driver's oracle recomputes every
    observed value and verdict from the raw table, so a broken
    metric expression (or a silently-dropped observe node) fails the
    hash, not just a unit test."""
    ev = load(spark, sf_dir, "events")
    rules = event_rules()
    observed, obs = quality.observed_monitor(ev, rules)
    observed.write.format("noop").mode("overwrite").save()
    m = obs.get
    min_rows = 1000
    rows = [("min_count", int(m["n_rows"]), m["n_rows"] >= min_rows)] + [
        (f"viol:{name}", int(m[f"viol_{name}"]), m[f"viol_{name}"] == 0)
        for name in rules
    ]
    return spark.createDataFrame(
        rows, "check_name string, observed long, passed boolean"
    )


@_q(
    "profile_orders",
    """
    SELECT col AS column, n_rows, n_null, n_distinct FROM (
      SELECT 'o_custkey' AS col, COUNT(*) AS n_rows,
             CAST(SUM(CASE WHEN o_custkey IS NULL THEN 1 ELSE 0 END) AS BIGINT)
               AS n_null,
             COUNT(DISTINCT o_custkey) AS n_distinct FROM orders
      UNION ALL
      SELECT 'o_orderstatus', COUNT(*),
             CAST(SUM(CASE WHEN o_orderstatus IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderstatus) FROM orders
      UNION ALL
      SELECT 'o_orderpriority', COUNT(*),
             CAST(SUM(CASE WHEN o_orderpriority IS NULL THEN 1 ELSE 0 END) AS BIGINT),
             COUNT(DISTINCT o_orderpriority) FROM orders)
    """,
)
def profile_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pre-load data profile of orders: one aggregation pass over all
    profiled columns, melted to per-column (n_rows, n_null,
    n_distinct) rows."""
    return quality.profile_table(
        load(spark, sf_dir, "orders"),
        ["o_custkey", "o_orderstatus", "o_orderpriority"],
    )


@_q(
    "referential_integrity_report",
    """
    SELECT 'lineitem.l_orderkey->orders' AS relationship,
           (SELECT COUNT(*) FROM lineitem) AS child_rows,
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM orders o
                              WHERE o.o_orderkey = l.l_orderkey)) AS orphans
    UNION ALL
    SELECT 'orders.o_custkey->customer',
           (SELECT COUNT(*) FROM orders),
           (SELECT COUNT(*) FROM orders o
            WHERE NOT EXISTS (SELECT 1 FROM customer c
                              WHERE c.c_custkey = o.o_custkey))
    UNION ALL
    SELECT 'customer.c_nationkey->nation',
           (SELECT COUNT(*) FROM customer),
           (SELECT COUNT(*) FROM customer c
            WHERE NOT EXISTS (SELECT 1 FROM nation n
                              WHERE n.n_nationkey = c.c_nationkey))
    UNION ALL
    SELECT 'lineitem.l_partkey->part',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM part p
                              WHERE p.p_partkey = l.l_partkey))
    UNION ALL
    SELECT 'lineitem.l_suppkey->supplier',
           (SELECT COUNT(*) FROM lineitem),
           (SELECT COUNT(*) FROM lineitem l
            WHERE NOT EXISTS (SELECT 1 FROM supplier s
                              WHERE s.s_suppkey = l.l_suppkey))
    """,
)
def referential_integrity_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-table referential-integrity audit: orphan counts for every
    foreign-key relationship in the star schema — the DQ gate a DW
    promotion (Q4, ``dw_sub_dag_builder.py:55-57``) runs before
    publishing. All of a child table's foreign keys are audited in
    ONE pass (r15 optimization, guide §2.3/§2.4): each parent key-set
    joins in as a LEFT join carrying a presence flag (dimension
    parents broadcast; the lineitem→orders parent shuffles on the key
    like any fact join — the same bytes the old per-relationship anti
    join moved), and a single aggregate counts rows plus null-flag
    orphans per relationship. Before, every relationship paid its own
    child-table scan AND a second scan for the row count (the
    crossJoin of two 1-row aggregates) — lineitem was scanned 6×.
    Orphan-count-via-left-join IS the anti-join count: the parent
    side is DISTINCT keys, so the left join never duplicates a child
    row, and a null flag marks exactly the anti-join survivors.
    Measured at sf0.1: ~3.5 s → 1.9 s run-to-run, 30 jobs → a
    handful, identical rows; the report stays a unionByName of
    relationship rows in the original order."""

    li = load(spark, sf_dir, "lineitem").select(
        "l_orderkey", "l_partkey", "l_suppkey"
    )
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    part = load(spark, sf_dir, "part")
    supplier = load(spark, sf_dir, "supplier")

    def pflag(parent: DataFrame, pkey: str, ckey: str, flag: str) -> DataFrame:
        return (
            parent.select(F.col(pkey).alias(ckey))
            .distinct()
            .withColumn(flag, F.lit(True))
        )

    li_counts = (
        li.join(pflag(orders, "o_orderkey", "l_orderkey", "_ok"),
                "l_orderkey", "left")
        .join(F.broadcast(pflag(part, "p_partkey", "l_partkey", "_pk")),
              "l_partkey", "left")
        .join(F.broadcast(pflag(supplier, "s_suppkey", "l_suppkey", "_sk")),
              "l_suppkey", "left")
        .agg(
            F.count("*").alias("n"),
            F.sum(F.col("_ok").isNull().cast("long")).alias("orph_ok"),
            F.sum(F.col("_pk").isNull().cast("long")).alias("orph_pk"),
            F.sum(F.col("_sk").isNull().cast("long")).alias("orph_sk"),
        )
    )
    o_counts = (
        orders.select("o_custkey")
        .join(F.broadcast(pflag(customer, "c_custkey", "o_custkey", "_ck")),
              "o_custkey", "left")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("_ck").isNull().cast("long")).alias("orph"))
    )
    c_counts = (
        customer.select("c_nationkey")
        .join(F.broadcast(pflag(nation, "n_nationkey", "c_nationkey", "_nk")),
              "c_nationkey", "left")
        .agg(F.count("*").alias("n"),
             F.sum(F.col("_nk").isNull().cast("long")).alias("orph"))
    )

    def row(name: str, src: DataFrame, ncol: str, ocol: str) -> DataFrame:
        return src.select(
            F.lit(name).alias("relationship"),
            F.col(ncol).alias("child_rows"),
            F.col(ocol).alias("orphans"),
        )

    # stack() pivots the single li_counts row into its three
    # relationship rows INSIDE one plan branch — referencing li_counts
    # from three union branches re-ran the whole lineitem pass per
    # branch (no ReusedExchange across single-row aggregates). Row
    # order differs from the old report; the driver's hash is
    # order-insensitive (oracle_check.canonical_pdf sorts rows).
    li_rows = li_counts.select(
        F.expr(
            "stack(3,"
            " 'lineitem.l_orderkey->orders', n, orph_ok,"
            " 'lineitem.l_partkey->part', n, orph_pk,"
            " 'lineitem.l_suppkey->supplier', n, orph_sk"
            ") AS (relationship, child_rows, orphans)"
        )
    )
    return li_rows.unionByName(
        row("orders.o_custkey->customer", o_counts, "n", "orph")
    ).unionByName(row("customer.c_nationkey->nation", c_counts, "n", "orph"))


@_q(
    "value_drift_report",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(FLOOR(value / 50.0) AS BIGINT) AS bin,
             COUNT(*) AS n_db
      FROM events WHERE value IS NOT NULL GROUP BY 1, 2),
    sided AS (
      SELECT day, n_db,
             SUM(n_db) OVER (PARTITION BY bin) AS n_b,
             SUM(n_db) OVER (PARTITION BY day) AS n_d,
             SUM(n_db) OVER () AS n_tot
      FROM daily),
    terms AS (
      SELECT day, n_d, n_tot,
             abs(CAST(n_db AS DECIMAL(38,0)) * n_tot
                 - CAST(n_b AS DECIMAL(38,0)) * n_d) AS term,
             CAST(n_b AS DECIMAL(38,0)) * n_d AS cov
      FROM sided)
    SELECT CAST(day AS VARCHAR) AS day, CAST(n_d AS BIGINT) AS n_events,
           CAST(SUM(term)
                + CAST(n_tot AS DECIMAL(38,0)) * n_d - SUM(cov)
                AS DOUBLE)
             / (2.0 * CAST(n_d AS DOUBLE) * CAST(n_tot AS DOUBLE)) AS tvd
    FROM terms GROUP BY day, n_d, n_tot
    """,
)
def value_drift_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-drift monitor: per-day total-variation distance
    between that day's `value` histogram (fixed 50-wide bins) and the
    whole-corpus baseline — the Q-family check that catches a feed
    whose *distribution* shifted even when row counts and null rates
    stay green. TVD uses the common denominator
    Σ_bins|n_db·N − n_b·N_d| / (2·N_d·N); bins a day never observed
    are settled algebraically (their contribution is n_b·N_d, and
    Σ_all_bins n_b·N_d = N·N_d, so the missing mass is
    N·N_d − Σ_observed n_b·N_d) — no dense day×bin grid, and every
    summed term is an exact DECIMAL(38,0) integer, immune to float
    summation order. The only float operation is the final division.

    Scale: ONE scan of the fact table into a (day, bin) aggregate;
    the three side sums are windows over that aggregate (day-count ×
    bin-count rows), so nothing fact-sized ever re-shuffles."""
    ev = load(spark, sf_dir, "events").filter(F.col("value").isNotNull())
    daily = (
        ev.select(
            F.col("ts").cast("date").alias("day"),
            F.floor(F.col("value") / 50.0).cast("bigint").alias("bin"),
        )
        .groupBy("day", "bin")
        .agg(F.count("*").alias("n_db"))
    )
    sided = daily.select(
        "day",
        "n_db",
        F.sum("n_db").over(W.partitionBy("bin")).alias("n_b"),
        F.sum("n_db").over(W.partitionBy("day")).alias("n_d"),
        F.sum("n_db").over(W.partitionBy()).alias("n_tot"),
    )
    dec38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    terms = sided.select(
        "day",
        "n_d",
        "n_tot",
        F.abs(
            dec38("n_db") * F.col("n_tot") - dec38("n_b") * F.col("n_d")
        ).alias("term"),
        (dec38("n_b") * F.col("n_d")).alias("cov"),
    )
    return terms.groupBy("day", "n_d", "n_tot").agg(
        F.sum("term").alias("s"), F.sum("cov").alias("c")
    ).select(
        F.col("day").cast("string").alias("day"),
        F.col("n_d").cast("bigint").alias("n_events"),
        (
            (
                F.col("s")
                + dec38("n_tot") * F.col("n_d")
                - F.col("c")
            ).cast("double")
            / (
                F.lit(2.0)
                * F.col("n_d").cast("double")
                * F.col("n_tot").cast("double")
            )
        ).alias("tvd"),
    )


@_q(
    "chi_square_type_by_dow",
    """
    WITH cells AS (
      SELECT event_type, dayofweek(ts) + 1 AS dow, COUNT(*) AS o
      FROM events GROUP BY 1, 2),
    sided AS (
      SELECT event_type, dow, o,
             SUM(o) OVER (PARTITION BY event_type) AS r,
             SUM(o) OVER (PARTITION BY dow) AS c,
             SUM(o) OVER () AS n
      FROM cells),
    terms AS (
      SELECT event_type, dow, n,
             CAST(CAST(CAST(o AS DECIMAL(38,0)) * n
                       - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)
                  * CAST(CAST(o AS DECIMAL(38,0)) * n
                         - CAST(r AS DECIMAL(38,0)) * c AS DOUBLE)
                  / (CAST(n AS DOUBLE) * CAST(r AS DOUBLE)
                     * CAST(c AS DOUBLE)) AS DOUBLE) AS term
      FROM sided),
    folded AS (
      SELECT MAX(n) AS n_events,
             COUNT(*) AS n_cells,
             list(term ORDER BY event_type, dow) AS l
      FROM terms)
    SELECT CAST(n_events AS BIGINT) AS n_events,
           n_cells,
           list_reduce(l, (a, x) -> a + x) AS chi2
    FROM folded
    """,
)
def chi_square_type_by_dow(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chi-square independence audit between event type and day of
    week — the statistical drift test behind "did the weekly traffic
    mix change": χ² = Σ (o·N − r·c)² / (N·r·c) over the contingency
    cells, the common-denominator form whose numerator difference is
    an exact DECIMAL(38,0) cross product. Marginals are windows over
    the CELL relation (|types|×7 rows); each cell's term becomes a
    double only in its own final expression, and the cross-cell sum
    folds in (type, dow) order — both engines reduce the identically
    ordered list, so the statistic is bit-stable. (dayofweek differs
    by one between engines: Spark counts Sunday=1, DuckDB Sunday=0 —
    the oracle adds 1.)

    Scale: one shuffle aggregates the fact table to the contingency
    cells; everything downstream is cell-sized."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy(
        "event_type", F.dayofweek("ts").alias("dow")
    ).agg(F.count("*").alias("o"))
    sided = cells.select(
        "event_type",
        "dow",
        "o",
        F.sum("o").over(W.partitionBy("event_type")).alias("r"),
        F.sum("o").over(W.partitionBy("dow")).alias("c"),
        F.sum("o").over(W.partitionBy()).alias("n"),
    )
    d38 = lambda c: F.col(c).cast("decimal(38,0)")  # noqa: E731
    diff = (d38("o") * F.col("n") - d38("r") * F.col("c")).cast("double")
    term = (
        diff
        * diff
        / (
            F.col("n").cast("double")
            * F.col("r").cast("double")
            * F.col("c").cast("double")
        )
    ).cast("double")
    terms = sided.select("event_type", "dow", "n", term.alias("term"))
    folded = terms.agg(
        F.max("n").alias("n_events"),
        F.count("*").alias("n_cells"),
        F.array_sort(
            F.collect_list(F.struct("event_type", "dow", "term"))
        ).alias("l"),
    )
    fold = F.aggregate(
        "l", F.lit(0.0), lambda a, x: a + x.getField("term")
    )
    return folded.select(
        F.col("n_events").cast("long").alias("n_events"),
        "n_cells",
        fold.alias("chi2"),
    )


@_q(
    "user_activity_entropy",
    """
    WITH cells AS (
      SELECT user_id, event_type, COUNT(*) AS c
      FROM events GROUP BY 1, 2),
    folded AS (
      SELECT user_id,
             CAST(SUM(c) AS BIGINT) AS n_events,
             COUNT(*) AS n_types,
             list(CAST(c AS DOUBLE) * ln(CAST(c AS DOUBLE))
                  ORDER BY event_type) AS l
      FROM cells GROUP BY 1)
    SELECT user_id, n_events, n_types,
           ln(CAST(n_events AS DOUBLE))
             - list_reduce(l, (a, x) -> a + x)
               / CAST(n_events AS DOUBLE) AS entropy
    FROM folded
    """,
)
def user_activity_entropy(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-user behavioral entropy over event types — the
    bot/monoculture detector: H = ln(N) − Σ cᵢ·ln(cᵢ)/N from exact
    integer counts. H = 0 means a single-action account (scraper,
    ping); high H means organically mixed activity. Determinism: each
    cᵢ·ln(cᵢ) term is one float expression per (user, type) cell, the
    cross-cell sum folds in event_type order (both engines reduce the
    identically ordered list), and the final H is one identical
    expression — partitioning cannot perturb it.

    Scale: one shuffle to (user, type) counts with map-side combine,
    then a per-user fold over ≤ |event types| cells — the fold list is
    bounded by the type vocabulary, never by event volume."""
    ev = load(spark, sf_dir, "events")
    cells = ev.groupBy("user_id", "event_type").agg(
        F.count("*").alias("c")
    )
    term = F.col("c").cast("double") * F.log(F.col("c").cast("double"))
    folded = cells.select(
        "user_id", "event_type", term.alias("term"), "c"
    ).groupBy("user_id").agg(
        F.sum("c").cast("bigint").alias("n_events"),
        F.count("*").alias("n_types"),
        F.array_sort(
            F.collect_list(F.struct("event_type", "term"))
        ).alias("l"),
    )
    s = F.aggregate(
        "l", F.lit(0.0), lambda a, x: a + x.getField("term")
    )
    return folded.select(
        "user_id",
        "n_events",
        "n_types",
        (
            F.log(F.col("n_events").cast("double"))
            - s / F.col("n_events").cast("double")
        ).alias("entropy"),
    )
