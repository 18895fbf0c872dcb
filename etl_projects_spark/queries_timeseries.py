"""Time-series resampling, reshaping, and distribution analytics.

Rounds out the relational surface (SURVEY §2.5 — the reference's implied
full-Spark-SQL capability) with shapes common in lake ETL that the other
modules don't cover: calendar gap-filling (the `{{ ds }}` daily-batch
pattern of `datalake_sub_dag_builder.py:111` implies dense daily
partitions; gap-fill reconstructs them when days are missing), wide→long
unpivot, cumulative-distribution window metrics, and fixed-width
histogram binning.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.queries import _q, dec, load


@_q(
    "resample_gap_fill",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type, COUNT(*) AS n
      FROM events GROUP BY day, event_type
    ),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY)) AS DATE) AS day
            FROM bounds),
    types AS (SELECT DISTINCT event_type FROM events)
    SELECT CAST(c.day AS TIMESTAMP) AS day, t.event_type, COALESCE(d.n, 0) AS n
    FROM cal c CROSS JOIN types t
      LEFT JOIN daily d ON d.day = c.day AND d.event_type = t.event_type
    """,
)
def resample_gap_fill(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Daily resample with zero-filled gaps: dense (day × event_type)
    grid via `sequence` + `explode`, left-joined against observed daily
    counts.

    Scale: the aggregate shuffles once on (day, type); the calendar is
    built from a single-row min/max aggregate (`sequence` explodes
    driver-free, executor-side) and the grid is dimension-sized, so it
    broadcasts into the left join — the fact table is never re-scanned.
    """
    ev = load(spark, sf_dir, "events").select(
        F.col("ts").cast("date").alias("day"), "event_type"
    )
    daily = ev.groupBy("day", "event_type").agg(F.count("*").alias("n"))
    cal = (
        daily.agg(F.min("day").alias("lo"), F.max("day").alias("hi"))
        .select(F.explode(F.sequence("lo", "hi")).alias("day"))
    )
    types = ev.select("event_type").distinct()
    # Hint the RIGHT side: a left-outer BroadcastHashJoin can only
    # build the non-preserved (right) side, so a hint on the grid
    # would be silently ignored and the join would fall back to a
    # shuffle. Both relations are days-x-types sized; broadcasting the
    # daily aggregate keeps the plan exchange-free on the grid side.
    grid = cal.crossJoin(types)
    return (
        grid.join(F.broadcast(daily), ["day", "event_type"], "left")
        # timestamp, not date: keeps the pandas representation identical
        # between Spark (datetime.date) and DuckDB (datetime64) outputs.
        .select(
            F.col("day").cast("timestamp").alias("day"),
            "event_type",
            F.coalesce("n", F.lit(0)).alias("n"),
        )
    )


@_q(
    "unpivot_part_measures",
    """
    SELECT p_partkey, 'p_retailprice' AS measure, CAST(p_retailprice AS DOUBLE) AS value
    FROM part
    UNION ALL
    SELECT p_partkey, 'p_size' AS measure, CAST(p_size AS DOUBLE) AS value
    FROM part
    """,
)
def unpivot_part_measures(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Wide→long unpivot (melt): one row per (part, measure). Spark's
    native `unpivot` plans a single Expand over one scan — the oracle's
    UNION ALL spelling would scan twice.
    """
    p = load(spark, sf_dir, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("double").alias("p_retailprice"),
        F.col("p_size").cast("double").alias("p_size"),
    )
    return p.unpivot("p_partkey", ["p_retailprice", "p_size"], "measure", "value")


@_q(
    "window_rank_metrics",
    """
    SELECT c_custkey, c_mktsegment,
           dense_rank()   OVER w AS bal_dense_rank,
           percent_rank() OVER w AS bal_pct_rank,
           cume_dist()    OVER w AS bal_cume_dist
    FROM customer
    WINDOW w AS (PARTITION BY c_mktsegment ORDER BY c_acctbal, c_custkey)
    """,
)
def window_rank_metrics(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distribution-position analytics: dense_rank / percent_rank /
    cume_dist per market segment, unique tie-break so ranks are
    deterministic. percent_rank and cume_dist are ratios of exact
    integers — bit-identical doubles in both engines.

    Scale: all three functions share ONE window spec → a single
    sort-within-partition pass after one shuffle on c_mktsegment.
    """
    c = load(spark, sf_dir, "customer")
    w = W.partitionBy("c_mktsegment").orderBy("c_acctbal", "c_custkey")
    return c.select(
        "c_custkey",
        "c_mktsegment",
        F.dense_rank().over(w).alias("bal_dense_rank"),
        F.percent_rank().over(w).alias("bal_pct_rank"),
        F.cume_dist().over(w).alias("bal_cume_dist"),
    )


@_q(
    "histogram_order_totals",
    """
    SELECT CAST(FLOOR(o_totalprice / 500.0) AS BIGINT) AS bin,
           COUNT(*) AS n,
           CAST(MIN(o_totalprice) AS DOUBLE) AS lo,
           CAST(MAX(o_totalprice) AS DOUBLE) AS hi
    FROM orders
    GROUP BY bin
    ORDER BY bin
    """,
)
def histogram_order_totals(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-width histogram of order totals (500-unit bins) — the
    profiling primitive behind data-quality distribution checks
    (SURVEY §2.8). One map-side-combinable aggregate; the bin count is
    bounded, so the reduce side is tiny regardless of input scale.
    """
    o = load(spark, sf_dir, "orders")
    return (
        o.groupBy(
            F.floor(F.col("o_totalprice") / 500.0).cast("bigint").alias("bin")
        )
        .agg(
            F.count("*").alias("n"),
            F.min("o_totalprice").cast("double").alias("lo"),
            F.max("o_totalprice").cast("double").alias("hi"),
        )
        .orderBy("bin")
    )


@_q(
    "ohlc_hourly_events",
    """
    SELECT date_trunc('hour', ts) AS hour, event_type,
           arg_min(value, epoch_ms(ts) * 1000000 + event_id) AS open,
           max(value) AS high,
           min(value) AS low,
           arg_max(value, epoch_ms(ts) * 1000000 + event_id) AS close,
           COUNT(*) AS n_events
    FROM events GROUP BY 1, 2
    """,
)
def ohlc_hourly_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Hourly OHLC bars per event type — the reference's stock-quote
    domain aggregate (open/close = first/last value by event time,
    high/low = extremes). First/last use ``min_by``/``max_by`` on a
    composite (epoch-ms, event_id) bigint key, so ties at the same
    millisecond break identically in any engine — no nondeterministic
    ``first()``. One partial-aggregated shuffle on (hour, type); no
    window, no sort. (The composite key needs event_id < 1e6 —
    holds for all test SFs; at larger scale widen to a decimal key.)"""
    ev = load(spark, sf_dir, "events")
    # ts is TIMESTAMP_NTZ; unix_millis needs TIMESTAMP. The session-tz
    # cast shifts the epoch by a constant, which cannot change the
    # min_by/max_by ORDER — the key is internal, never compared to the
    # oracle's key, only required to rank events identically.
    key = F.unix_millis(F.col("ts").cast("timestamp")) * F.lit(1_000_000) + F.col(
        "event_id"
    )
    return ev.groupBy(
        F.date_trunc("hour", "ts").alias("hour"), "event_type"
    ).agg(
        F.min_by("value", key).alias("open"),
        F.max("value").alias("high"),
        F.min("value").alias("low"),
        F.max_by("value", key).alias("close"),
        F.count("*").alias("n_events"),
    )


@_q(
    "funnel_user_conversion",
    """
    WITH u AS (
      SELECT user_id,
             MIN(CASE WHEN event_type = 'view' THEN ts END) AS t_v
      FROM events GROUP BY user_id),
    c AS (
      SELECT u.user_id, u.t_v, MIN(e.ts) AS t_c
      FROM u LEFT JOIN events e
        ON e.user_id = u.user_id AND e.event_type = 'click' AND e.ts >= u.t_v
      GROUP BY u.user_id, u.t_v),
    p AS (
      SELECT c.user_id, c.t_v, c.t_c, MIN(e.ts) AS t_p
      FROM c LEFT JOIN events e
        ON e.user_id = c.user_id AND e.event_type = 'purchase' AND e.ts >= c.t_c
      GROUP BY c.user_id, c.t_v, c.t_c)
    SELECT COUNT(*) AS n_users,
           COUNT(t_v) AS n_viewed,
           COUNT(t_c) AS n_clicked_after_view,
           COUNT(t_p) AS n_purchased_after_funnel
    FROM p
    """,
)
def funnel_user_conversion(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Ordered event funnel (view → click → purchase): how many users
    progressed through each stage IN ORDER — the product-analytics
    query every event lake serves daily.

    Spark-first shape: ONE shuffle. Each user's events are collected
    into an array (bounded by that user's activity, never corpus-
    sized) and the stage times fall out of higher-order array
    expressions — ``filter``/``transform``/``array_min`` run inside
    whole-stage codegen, no Python, no per-stage self-join. The
    DuckDB oracle takes the classic 3-level LEFT JOIN cascade; both
    must agree exactly. At 100 TB the sort-of-joins cascade reshuffles
    events three times; the collect form pays the user-key shuffle
    once (same key every stage)."""
    from etl_projects_spark.operators.temporal import funnel_stage_times

    ev = load(spark, sf_dir, "events").select("user_id", "ts", "event_type")
    stages = funnel_stage_times(ev, ["view", "click", "purchase"])
    return stages.agg(
        F.count("*").alias("n_users"),
        F.count("t_0").alias("n_viewed"),
        F.count("t_1").alias("n_clicked_after_view"),
        F.count("t_2").alias("n_purchased_after_funnel"),
    )


@_q(
    "retention_cohorts",
    """
    WITH first_seen AS (
      SELECT user_id, MIN(CAST(ts AS DATE)) AS cohort_day
      FROM events GROUP BY user_id),
    active AS (
      SELECT DISTINCT user_id, CAST(ts AS DATE) AS day FROM events)
    SELECT CAST(f.cohort_day AS VARCHAR) AS cohort_day,
           CAST(date_diff('day', f.cohort_day, a.day) AS BIGINT) AS day_offset,
           COUNT(*) AS n_active
    FROM first_seen f JOIN active a ON a.user_id = f.user_id
    WHERE date_diff('day', f.cohort_day, a.day) BETWEEN 0 AND 7
    GROUP BY 1, 2
    """,
)
def retention_cohorts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cohort retention matrix: users grouped by first-seen day, counted
    on each of their first 8 active days — the engagement report that
    sits on top of every event lake.

    Plan: one shuffle builds (user, cohort_day), one builds the
    distinct (user, day) activity set, and they join on user_id (both
    sides already hash-partitioned by user, AQE coalesces); the final
    (cohort, offset) aggregate is 8×|days| rows. COUNT(*) per
    (cohort, offset) equals COUNT(DISTINCT user) because the activity
    relation is already distinct — cheaper at scale than a distinct
    aggregate over the join."""
    ev = load(spark, sf_dir, "events").select(
        "user_id", F.col("ts").cast("date").alias("day")
    )
    first_seen = ev.groupBy("user_id").agg(F.min("day").alias("cohort_day"))
    active = ev.distinct()
    j = active.join(first_seen, "user_id").withColumn(
        "day_offset", F.datediff("day", "cohort_day").cast("long")
    )
    return (
        j.filter(F.col("day_offset").between(0, 7))
        .groupBy(
            F.col("cohort_day").cast("string").alias("cohort_day"),
            "day_offset",
        )
        .agg(F.count("*").alias("n_active"))
    )


@_q(
    "anomaly_zscore_daily",
    """
    WITH daily AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day, event_type,
             COUNT(*) AS n
      FROM events GROUP BY 1, 2)
    SELECT day, event_type, n,
           round((n - AVG(n) OVER (PARTITION BY event_type))
                 / stddev_samp(n) OVER (PARTITION BY event_type), 6) AS z
    FROM daily
    """,
)
def anomaly_zscore_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Volume-anomaly scoring: each (day, event_type) daily count
    z-scored against that type's distribution — the monitoring query
    a pipeline runs to catch a collapsed or runaway feed (|z| > 3 →
    page someone). Rounded before output so both engines' double
    stddev agrees at 6 dp.

    Plan: one shuffle for the daily aggregate, one type-partitioned
    window over the (days × types)-sized rollup — the window input is
    tiny regardless of event volume, so the anomaly pass costs the
    aggregate and nothing more."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        F.col("ts").cast("date").cast("string").alias("day"), "event_type"
    ).agg(F.count("*").alias("n"))
    w = W.partitionBy("event_type")
    return daily.select(
        "day",
        "event_type",
        "n",
        F.round(
            (F.col("n") - F.avg("n").over(w)) / F.stddev_samp("n").over(w), 6
        ).alias("z"),
    )


@_q(
    "regr_trend_nation",
    """
    WITH daily AS (
      SELECT n.n_name,
             date_diff('day', DATE '1992-01-01', CAST(o.o_orderdate AS DATE))
               AS x,
             CAST(SUM(CAST(CAST(o.o_totalprice AS DECIMAL(18,2)) * 100
                           AS BIGINT)) AS BIGINT) AS y
      FROM orders o
        JOIN customer c ON o.o_custkey = c.c_custkey
        JOIN nation n ON c.c_nationkey = n.n_nationkey
      GROUP BY 1, 2),
    s AS (
      SELECT n_name,
             COUNT(*) AS n, SUM(x) AS sx, SUM(y) AS sy,
             SUM(x * y) AS sxy, SUM(x * x) AS sxx
      FROM daily GROUP BY 1)
    SELECT n_name, n AS n_days,
           (CAST(n AS DOUBLE) * CAST(sxy AS DOUBLE)
              - CAST(sx AS DOUBLE) * CAST(sy AS DOUBLE))
             / (CAST(n AS DOUBLE) * CAST(sxx AS DOUBLE)
                  - CAST(sx AS DOUBLE) * CAST(sx AS DOUBLE))
             AS slope_cents_per_day
    FROM s WHERE n * sxx - sx * sx != 0
    """,
)
def regr_trend_nation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group linear regression (closed form): the daily revenue
    trend slope per nation, the grouped model-fit shape (one tiny
    model per key) that at 100 TB runs as a plain two-level
    aggregation — no applyInPandas, no per-group solver. Exactness:
    x = integer day index, y = revenue in integer cents (via the
    DECIMAL cast), so every regression moment (n, Σx, Σy, Σxy, Σxx)
    is an exact BIGINT in both engines; the slope is one deterministic
    double expression over exact integers, making a floating-point
    regression hash-checkable cross-engine. Spark's builtin
    ``regr_slope`` is double-summed (order-dependent) — this is the
    scale-safe exact twin."""
    orders = load(spark, sf_dir, "orders")
    customer = load(spark, sf_dir, "customer")
    nation = load(spark, sf_dir, "nation")
    daily = (
        orders.join(
            F.broadcast(customer.select("c_custkey", "c_nationkey")),
            orders.o_custkey == F.col("c_custkey"),
        )
        .join(F.broadcast(nation), F.col("c_nationkey") == F.col("n_nationkey"))
        .groupBy(
            "n_name",
            F.datediff(F.col("o_orderdate").cast("date"), F.lit("1992-01-01"))
            .alias("x"),
        )
        .agg(
            F.sum((dec("o_totalprice") * 100).cast("bigint")).alias("y")
        )
    )
    s = daily.groupBy("n_name").agg(
        F.count("*").alias("n"),
        F.sum("x").alias("sx"),
        F.sum("y").alias("sy"),
        F.sum(F.col("x") * F.col("y")).alias("sxy"),
        F.sum(F.col("x") * F.col("x")).alias("sxx"),
    )
    nd, sxd, syd, sxyd, sxxd = (
        F.col(c).cast("double") for c in ("n", "sx", "sy", "sxy", "sxx")
    )
    return s.filter(
        F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx") != 0
    ).select(
        "n_name",
        F.col("n").alias("n_days"),
        ((nd * sxyd - sxd * syd) / (nd * sxxd - sxd * sxd)).alias(
            "slope_cents_per_day"
        ),
    )


@_q(
    "attribution_first_touch",
    """
    WITH p AS (SELECT event_id AS purchase_id, user_id, ts
               FROM events WHERE event_type = 'purchase'),
    c AS (SELECT event_id AS click_id, user_id, ts
          FROM events WHERE event_type = 'click'),
    j AS (
      SELECT p.purchase_id, p.user_id, c.click_id, c.ts AS click_ts,
             ROW_NUMBER() OVER (PARTITION BY p.purchase_id
                                ORDER BY c.ts, c.click_id) AS rn
      FROM p JOIN c
        ON p.user_id = c.user_id
       AND c.ts >= p.ts - INTERVAL 7 DAY AND c.ts < p.ts)
    SELECT purchase_id, user_id, click_id AS first_click_id, click_ts
    FROM j WHERE rn = 1
    """,
)
def attribution_first_touch(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-touch attribution: each purchase credited to the user's
    EARLIEST click inside a 7-day lookback window — the marketing-
    attribution twin of the as-of join (which takes the latest). The
    theta range predicate becomes an equi-join on (user, time-band)
    via ``temporal.banded_range_join`` with ``extra_keys`` — without
    the user in the join key every purchase window would fan out to
    all clicks in its band. Candidates are window-local; one
    row_number per purchase picks the first touch deterministically
    (ts, then click id)."""
    from etl_projects_spark.operators import temporal

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click").select(
        F.col("event_id").alias("click_id"), "user_id", "ts"
    )
    windows = ev.filter(F.col("event_type") == "purchase").select(
        F.col("event_id").alias("purchase_id"),
        "user_id",
        (F.col("ts") - F.expr("INTERVAL 7 DAYS")).alias("start_ts"),
        F.col("ts").alias("end_ts"),
    )
    cand = temporal.banded_range_join(
        clicks,
        windows,
        band_seconds=4 * 86400,
        extra_keys=["user_id"],
    )
    w = W.partitionBy("purchase_id").orderBy("ts", "click_id")
    return (
        cand.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .select(
            "purchase_id",
            "user_id",
            F.col("click_id").alias("first_click_id"),
            F.col("ts").alias("click_ts"),
        )
    )


@_q(
    "session_path_topk",
    """
    WITH flags AS (
      SELECT user_id, ts, event_id, event_type,
             CASE WHEN lag(ts) OVER w IS NULL
                       OR date_diff('second', lag(ts) OVER w, ts) > 1800
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    sess AS (
      SELECT user_id, ts, event_id, event_type,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM flags),
    paths AS (
      SELECT user_id, sid,
             string_agg(event_type, '>' ORDER BY ts, event_id) AS path
      FROM sess GROUP BY 1, 2)
    SELECT path, COUNT(*) AS n
    FROM paths GROUP BY 1 ORDER BY n DESC, path LIMIT 20
    """,
)
def session_path_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """User-journey path mining: events sessionized by 30-min gaps,
    each session rendered as its ordered event-type path, top-20
    paths by frequency. All three stages reuse ONE user-key shuffle
    (lag flag, running-sum session id, and the per-session collect
    share the partitioning); the path strings then aggregate
    path-keyed, and the final top-k is TakeOrderedAndProject with the
    path itself as tie-break — deterministic LIMIT cross-engine."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    gap_s = F.unix_timestamp("ts") - F.unix_timestamp(F.lag("ts").over(w))
    new_s = F.when(F.lag("ts").over(w).isNull() | (gap_s > 1800), 1).otherwise(0)
    wrun = w.rowsBetween(W.unboundedPreceding, W.currentRow)
    sess = ev.withColumn("new_s", new_s).withColumn(
        "sid", F.sum("new_s").over(wrun)
    )
    paths = sess.groupBy("user_id", "sid").agg(
        F.concat_ws(
            ">",
            F.transform(
                F.sort_array(
                    F.collect_list(F.struct("ts", "event_id", "event_type"))
                ),
                lambda x: x["event_type"],
            ),
        ).alias("path")
    )
    return (
        paths.groupBy("path")
        .agg(F.count("*").alias("n"))
        .orderBy(F.desc("n"), "path")
        .limit(20)
    )


@_q(
    "equi_depth_histogram_stats",
    """
    WITH b AS (
      SELECT o_totalprice,
             ntile(16) OVER (ORDER BY o_totalprice, o_orderkey) AS bucket
      FROM orders)
    SELECT bucket, COUNT(*) AS n,
           MIN(o_totalprice) AS lo, MAX(o_totalprice) AS hi
    FROM b GROUP BY 1
    """,
)
def equi_depth_histogram_stats(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Equi-depth histogram collection (the optimizer-statistics shape
    ANALYZE builds): 16 equal-count buckets over order totals with
    per-bucket bounds. ntile is deterministic here because the sort
    carries the unique key as tie-break. The global sort is the
    honest cost of exact equi-depth stats; at 100 TB you run this on
    a fixed-fraction sample (the result schema and everything
    downstream is unchanged) — bounds are estimates either way."""
    orders = load(spark, sf_dir, "orders")
    b = orders.select(
        "o_totalprice",
        F.ntile(16).over(W.orderBy("o_totalprice", "o_orderkey")).alias("bucket"),
    )
    return b.groupBy("bucket").agg(
        F.count("*").alias("n"),
        F.min("o_totalprice").alias("lo"),
        F.max("o_totalprice").alias("hi"),
    )


@_q(
    "event_markov_transitions",
    """
    WITH pairs AS (
      SELECT event_type AS from_type,
             lead(event_type) OVER (PARTITION BY user_id
                                    ORDER BY ts, event_id) AS next_type
      FROM events),
    counts AS (
      SELECT from_type, next_type, COUNT(*) AS n
      FROM pairs WHERE next_type IS NOT NULL GROUP BY 1, 2)
    SELECT from_type, next_type, n,
           CAST(n AS DOUBLE)
             / CAST(SUM(n) OVER (PARTITION BY from_type) AS DOUBLE) AS p
    FROM counts
    """,
)
def event_markov_transitions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """First-order Markov transition matrix over each user's event
    stream: lead() pairs consecutive event types per user (ts ties
    broken by event_id, so pairing is engine-deterministic), one
    aggregate counts (from → to) edges, and row-normalizing the counts
    into probabilities happens on the TYPE×TYPE matrix — a handful of
    rows — never on the event stream. Counts are exact integers; the
    single division to DOUBLE is the last operation.

    Scale: one shuffle on user_id for the lead window (the same
    partitioning sessionization uses), one map-side-combined aggregate
    whose key space is |types|² — the normalize window is free."""
    ev = load(spark, sf_dir, "events")
    w = W.partitionBy("user_id").orderBy("ts", "event_id")
    pairs = ev.select(
        F.col("event_type").alias("from_type"),
        F.lead("event_type").over(w).alias("next_type"),
    ).filter(F.col("next_type").isNotNull())
    counts = pairs.groupBy("from_type", "next_type").agg(
        F.count("*").alias("n")
    )
    return counts.select(
        "from_type",
        "next_type",
        "n",
        (
            F.col("n").cast("double")
            / F.sum("n").over(W.partitionBy("from_type")).cast("double")
        ).alias("p"),
    )


@_q(
    "session_window_builtin",
    """
    WITH s AS (
      SELECT user_id, ts, event_id,
             CASE WHEN lag(ts) OVER w IS NULL
                    OR ts - lag(ts) OVER w >= INTERVAL 30 MINUTE
                  THEN 1 ELSE 0 END AS new_s
      FROM events
      WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)),
    g AS (
      SELECT user_id, ts,
             SUM(new_s) OVER (PARTITION BY user_id ORDER BY ts, event_id
                              ROWS UNBOUNDED PRECEDING) AS sid
      FROM s)
    SELECT user_id, MIN(ts) AS session_start,
           MAX(ts) + INTERVAL 30 MINUTE AS session_end,
           COUNT(*) AS n_events
    FROM g GROUP BY user_id, sid
    """,
)
def session_window_builtin(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Spark's NATIVE ``session_window`` aggregation in batch mode —
    the engine-level session operator (the same one Structured
    Streaming uses stateful), proven equivalent to the classic
    gaps-and-islands SQL: a session closes after 30 idle minutes and
    its end is last_event + gap, with an event exactly at the closing
    boundary starting a NEW session (Spark's [start, end) overlap
    rule — the oracle's ``>= INTERVAL`` mirrors it exactly).

    Scale: one shuffle on user_id; Spark merges overlapping windows
    with a single sort per partition — same cost shape as the manual
    island algorithm (events_sessionize) but fused into one
    aggregate operator instead of two windows + a groupBy."""
    ev = load(spark, sf_dir, "events")
    sw = ev.groupBy(
        "user_id",
        F.session_window(F.col("ts").cast("timestamp"), "30 minutes"),
    ).agg(F.count("*").alias("n_events"))
    return sw.select(
        "user_id",
        F.col("session_window.start").alias("session_start"),
        F.col("session_window.end").alias("session_end"),
        "n_events",
    )


@_q(
    "forward_fill_daily_value",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day, event_type,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(28,2)) AS v
      FROM events WHERE event_type IN ('purchase', 'signup')
      GROUP BY 1, 2),
    bounds AS (SELECT MIN(day) AS lo, MAX(day) AS hi FROM daily),
    cal AS (SELECT CAST(unnest(generate_series(lo, hi, INTERVAL 1 DAY))
                        AS DATE) AS day FROM bounds),
    types AS (SELECT DISTINCT event_type FROM daily),
    grid AS (
      SELECT c.day, t.event_type, d.v
      FROM cal c CROSS JOIN types t
        LEFT JOIN daily d ON d.day = c.day AND d.event_type = t.event_type)
    SELECT CAST(day AS VARCHAR) AS day, event_type,
           CAST(last_value(v IGNORE NULLS) OVER (
               PARTITION BY event_type ORDER BY day
               ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW
           ) AS DOUBLE) AS v_filled,
           v IS NULL AS was_gap
    FROM grid
    """,
)
def forward_fill_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward-fill (LOCF — last observation carried forward) over a
    dense calendar: daily totals per type, gap days reconstructed from
    a `sequence` calendar, missing values carried forward with
    ``last(..., ignorenulls)`` — the imputation step of every
    sensor/market feed. Gap rows stay flagged (`was_gap`) so downstream
    consumers can tell measured from imputed. The carried value is an
    exact decimal; the cast to double happens after the fill, so
    imputed and measured rows hash identically across engines.

    Scale: the fill window partitions by event_type over the DAILY
    aggregate (days × types rows); the daily aggregate broadcasts
    into the grid-preserving left join — the fact table aggregates
    once and is never
    re-scanned."""
    ev = load(spark, sf_dir, "events").filter(
        F.col("event_type").isin("purchase", "signup")
    )
    daily = (
        ev.select(F.col("ts").cast("date").alias("day"), "event_type", "value")
        .groupBy("day", "event_type")
        .agg(F.sum(dec("value")).alias("v"))
    )
    # Calendar bounds AND the type list in ONE aggregate over `daily`,
    # so the events subtree is computed twice total (daily + this),
    # not three times (bounds, types, daily separately).
    grid_dim = (
        daily.agg(
            F.min("day").alias("lo"),
            F.max("day").alias("hi"),
            F.collect_set("event_type").alias("tys"),
        )
        .select(F.explode(F.sequence("lo", "hi")).alias("day"), "tys")
        .select("day", F.explode("tys").alias("event_type"))
    )
    # Right-side hint: left-outer BHJ must build right — hinting the
    # preserved grid side is a silent no-op (see resample_gap_fill).
    grid = grid_dim.join(F.broadcast(daily), ["day", "event_type"], "left")
    w = (
        W.partitionBy("event_type")
        .orderBy("day")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    return grid.select(
        F.col("day").cast("string").alias("day"),
        "event_type",
        F.last("v", ignorenulls=True).over(w).cast("double").alias("v_filled"),
        F.col("v").isNull().alias("was_gap"),
    )


@_q(
    "bollinger_bands_daily",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             COUNT(*) AS cnt,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,2)) AS s1,
             CAST(SUM(CAST(value AS DECIMAL(18,2))
                      * CAST(value AS DECIMAL(18,2))) AS DECIMAL(38,4)) AS s2
      FROM events GROUP BY 1, 2),
    keyed AS (
      SELECT *, date_diff('day', DATE '1970-01-01', day) AS dk FROM daily),
    rolled AS (
      SELECT event_type, day,
             SUM(cnt) OVER w AS n,
             SUM(s1) OVER w AS rs1,
             SUM(s2) OVER w AS rs2
      FROM keyed
      WINDOW w AS (PARTITION BY event_type ORDER BY dk
                   RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT event_type, CAST(day AS VARCHAR) AS day, CAST(n AS BIGINT) AS n,
           CAST(rs1 AS DOUBLE) / CAST(n AS DOUBLE) AS mean,
           CAST(rs1 AS DOUBLE) / CAST(n AS DOUBLE)
             + 2.0 * sqrt((CAST(n AS DOUBLE) * CAST(rs2 AS DOUBLE)
                           - CAST(rs1 AS DOUBLE) * CAST(rs1 AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS upper,
           CAST(rs1 AS DOUBLE) / CAST(n AS DOUBLE)
             - 2.0 * sqrt((CAST(n AS DOUBLE) * CAST(rs2 AS DOUBLE)
                           - CAST(rs1 AS DOUBLE) * CAST(rs1 AS DOUBLE))
                          / (CAST(n AS DOUBLE) * CAST(n AS DOUBLE))) AS lower
    FROM rolled
    """,
)
def bollinger_bands_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Bollinger bands (trailing-7-day mean ± 2σ) per event type — the
    reference's stock-quote domain signal, computed the hash-stable
    way: the rolling window sums exact decimal MOMENTS (n, Σx, Σx²)
    over the daily aggregate with a RANGE frame on the day key (gap
    days shrink the window rather than stretching it), and mean/σ are
    evaluated per row in ONE identical float expression — population
    σ via (n·Σx² − (Σx)²)/n², sqrt being IEEE-exact. No float ever
    crosses rows, so partitioning cannot perturb the bands.

    Scale: the fact table aggregates once to (type, day); the window
    runs over days×types rows. (Σx)² stays inside DECIMAL(38) up to
    ~1e18 in Σx — beyond that, shard the day key and combine moments,
    they are associative."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(
        "event_type", F.col("ts").cast("date").alias("day")
    ).agg(
        F.count("*").alias("cnt"),
        F.sum(dec("value")).cast("decimal(38,2)").alias("s1"),
        F.sum(dec("value") * dec("value")).cast("decimal(38,4)").alias("s2"),
    )
    keyed = daily.withColumn(
        "dk", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    w = (
        W.partitionBy("event_type")
        .orderBy("dk")
        .rangeBetween(-6, 0)
    )
    rolled = keyed.select(
        "event_type",
        "day",
        F.sum("cnt").over(w).alias("n"),
        F.sum("s1").over(w).alias("rs1"),
        F.sum("s2").over(w).alias("rs2"),
    )
    n_d = F.col("n").cast("double")
    s1_d = F.col("rs1").cast("double")
    s2_d = F.col("rs2").cast("double")
    mean = s1_d / n_d
    sigma = F.sqrt((n_d * s2_d - s1_d * s1_d) / (n_d * n_d))
    return rolled.select(
        "event_type",
        F.col("day").cast("string").alias("day"),
        F.col("n").cast("long").alias("n"),
        mean.alias("mean"),
        (mean + F.lit(2.0) * sigma).alias("upper"),
        (mean - F.lit(2.0) * sigma).alias("lower"),
    )


# =========================================================================
# Wave 27: time-range window frames, conversion latency, seasonality
# =========================================================================


@_q(
    "range_interval_window_user",
    """
    WITH e AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CAST(value AS DECIMAL(18,2)) AS v
      FROM events)
    SELECT event_id,
           COUNT(*) OVER w AS n_prev_hour,
           CAST(SUM(v) OVER w AS DOUBLE) AS sum_value_hour
    FROM e
    WINDOW w AS (PARTITION BY user_id ORDER BY us
                 RANGE BETWEEN 3600000000 PRECEDING AND CURRENT ROW)
    """,
)
def range_interval_window_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """TIME-range window frame: per event, the same user's activity in
    the trailing hour (count + value sum, self included) — the rate-
    limit / burst-detection feature that ROWS frames cannot express
    (a row frame counts neighbors, not elapsed time). The frame is
    value-based on EXACT integer microseconds (the repo's epoch_us
    determinism recipe: Spark's long cast of a timestamp TRUNCATES
    sub-second parts while DuckDB's epoch() ROUNDS them, so a
    seconds-granularity frame diverges at window boundaries — both
    engines agree bit-exactly on unix_micros/epoch_us), so tied
    timestamps are all included regardless of physical row order —
    the property that makes the result partition-invariant where a
    ROWS frame would be nondeterministic under ties.

    Scale: one shuffle on user_id; per-user frames slide in one sorted
    pass (Spark's range-frame executor keeps only the in-frame buffer,
    bounded by events-per-user-per-hour, not history)."""
    ev = load(spark, sf_dir, "events")
    e = ev.select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        dec("value").alias("v"),
    )
    w = (
        W.partitionBy("user_id")
        .orderBy("us")
        .rangeBetween(-3_600_000_000, W.currentRow)
    )
    return e.select(
        "event_id",
        F.count("*").over(w).alias("n_prev_hour"),
        F.sum("v").over(w).cast("double").alias("sum_value_hour"),
    )


@_q(
    "funnel_time_to_convert",
    """
    WITH clicks AS (
      SELECT user_id, MIN(ts) AS fc FROM events
      WHERE event_type = 'click' GROUP BY 1),
    conv AS (
      SELECT e.user_id, fc, MIN(ts) AS fp
      FROM events e JOIN clicks USING (user_id)
      WHERE e.event_type = 'purchase' AND e.ts >= fc
      GROUP BY 1, 2),
    d AS (
      SELECT dayofweek(fc) + 1 AS click_dow,
             epoch_us(fp) - epoch_us(fc) AS delta_us
      FROM conv)
    SELECT click_dow,
           COUNT(*) AS n_converted,
           CAST(quantile_disc(delta_us, 0.5) AS BIGINT) AS median_us,
           CAST(SUM(delta_us) AS DOUBLE) / COUNT(*) / 1000000.0
             AS avg_sec
    FROM d GROUP BY 1
    """,
)
def funnel_time_to_convert(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Conversion latency: for every user, seconds from their FIRST
    click to their first purchase at-or-after it, summarized per
    day-of-week of the click — the time-to-convert distribution
    behind funnel SLAs. Median is ``percentile_disc`` (an actual data
    value — exact and engine-portable, unlike interpolated quantiles);
    deltas are exact integer MICROseconds (a seconds cast differs per
    engine: Spark truncates sub-second fractions where DuckDB's
    BIGINT cast rounds), and the mean divides the exact micro sum
    once. (Spark's dayofweek is Sunday=1; DuckDB's Sunday=0 — the
    oracle adds 1.)

    Scale: two per-user aggregates (map-side combinable) and one
    user-keyed join — never an event×event inequality join; the
    summary relation is 7 rows."""
    ev = load(spark, sf_dir, "events")
    clicks = (
        ev.filter(F.col("event_type") == "click")
        .groupBy("user_id")
        .agg(F.min("ts").alias("fc"))
    )
    conv = (
        ev.filter(F.col("event_type") == "purchase")
        .join(clicks, "user_id")
        .filter(F.col("ts") >= F.col("fc"))
        .groupBy("user_id", "fc")
        .agg(F.min("ts").alias("fp"))
    )
    delta = F.unix_micros(F.col("fp").cast("timestamp")) - F.unix_micros(
        F.col("fc").cast("timestamp")
    )
    d = conv.select(
        F.dayofweek("fc").alias("click_dow"), delta.alias("delta_us")
    )
    return d.groupBy("click_dow").agg(
        F.count("*").alias("n_converted"),
        F.expr("percentile_disc(0.5) WITHIN GROUP (ORDER BY delta_us)")
        .cast("bigint")
        .alias("median_us"),
        (
            F.sum("delta_us").cast("double") / F.count("*") / 1000000.0
        ).alias("avg_sec"),
    )


@_q(
    "seasonal_dow_index",
    """
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS v
      FROM events GROUP BY 1),
    per_dow AS (
      SELECT dayofweek(day) + 1 AS dow,
             COUNT(*) AS n_days,
             CAST(SUM(v) AS DECIMAL(38,2)) AS tot
      FROM daily GROUP BY 1),
    g AS (SELECT CAST(SUM(tot) AS DECIMAL(38,2)) AS g_tot,
                 CAST(SUM(n_days) AS BIGINT) AS g_days
          FROM per_dow)
    SELECT dow, n_days,
           CAST(tot AS DOUBLE) / n_days AS avg_daily_value,
           (CAST(tot AS DOUBLE) / n_days)
             / (CAST(g_tot AS DOUBLE) / g_days) AS seasonal_index
    FROM per_dow CROSS JOIN g
    """,
)
def seasonal_dow_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Day-of-week seasonality index: average daily event value per
    weekday divided by the overall average daily value — index > 1 =
    structurally busy day. The multiplicative-decomposition seasonal
    factor every capacity-planning and anomaly-detection baseline
    starts from. All cross-row sums are exact DECIMAL; each output's
    two divisions are one identical float expression per engine.

    Scale: day-level aggregate (one shuffle), 7-row weekday rollup,
    one broadcast scalar — the fact table is scanned once."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.to_date("ts").alias("day")).agg(
        F.sum(dec("value")).cast("decimal(18,2)").alias("v")
    )
    per_dow = daily.groupBy(F.dayofweek("day").alias("dow")).agg(
        F.count("*").alias("n_days"),
        F.sum("v").cast("decimal(38,2)").alias("tot"),
    )
    g = per_dow.agg(
        F.sum("tot").cast("decimal(38,2)").alias("g_tot"),
        F.sum("n_days").cast("bigint").alias("g_days"),
    )
    avg = F.col("tot").cast("double") / F.col("n_days")
    return per_dow.crossJoin(F.broadcast(g)).select(
        "dow",
        "n_days",
        avg.alias("avg_daily_value"),
        (avg / (F.col("g_tot").cast("double") / F.col("g_days"))).alias(
            "seasonal_index"
        ),
    )
