"""Wave-28 catalog entries (round 5): rolling distinct windows,
gaps-and-islands, skyline, change detection, sketch-with-bound,
interval proration, cascade-delete audit, rolling correlation,
budget allocation, nearest-as-of.

Every query keeps the catalog's determinism contract: float math only
in one identical terminal expression per row, exact DECIMAL/BIGINT
arithmetic everywhere upstream, unique tie-break keys in every sort,
and micro-epoch (``unix_micros``/``epoch_us``) for all timestamp
deltas — never second-granularity casts (Spark truncates where DuckDB
rounds).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.queries import D, _q, dec, load


@_q(
    "rolling_wau_daily",
    """
    WITH ud AS (SELECT DISTINCT CAST(ts AS DATE) AS day, user_id FROM events),
    days AS (SELECT DISTINCT day FROM ud),
    c AS (SELECT ud.user_id, ud.day + CAST(i AS INTEGER) AS rday
          FROM ud, UNNEST(generate_series(0, 6)) t(i))
    SELECT CAST(c.rday AS VARCHAR) AS day,
           COUNT(DISTINCT c.user_id) AS wau
    FROM c
    WHERE c.rday IN (SELECT day FROM days)
    GROUP BY 1
    """,
)
def rolling_wau_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Trailing 7-day distinct users per day (rolling WAU) — the
    sliding-distinct window neither engine's RANGE frames can express
    (COUNT(DISTINCT) OVER is unsupported). The scalable shape is
    contribution explosion: each distinct (user, day) pair is exploded
    to the ≤7 report days it contributes to (a bounded 7× equi-join
    fan-out), then a plain count-distinct per report day — never a
    non-equi range join (which Spark would plan as a broadcast
    nested-loop).

    Scale: the pre-distinct collapses events to user-days first (map-
    side combinable), so the explosion is 7× |user-days|, not 7×
    |events|; the final distinct aggregate is the standard two-phase
    shuffle on (day, user)."""
    ev = load(spark, sf_dir, "events")
    ud = ev.select(
        F.col("ts").cast("date").alias("day"), "user_id"
    ).distinct()
    days = ud.select("day").distinct().withColumnRenamed("day", "rday")
    contrib = ud.select(
        "user_id",
        F.explode(F.sequence(F.lit(0), F.lit(6))).alias("i"),
        "day",
    ).select("user_id", F.date_add("day", F.col("i")).alias("rday"))
    return (
        contrib.join(days, "rday", "semi")
        .groupBy("rday")
        .agg(F.countDistinct("user_id").alias("wau"))
        .select(F.col("rday").cast("string").alias("day"), "wau")
    )


@_q(
    "interval_coverage_user",
    """
    WITH iv AS (
      SELECT user_id, event_id, epoch_us(ts) AS su,
             epoch_us(ts) + (event_id % 300 + 60) * 1000000 AS eu
      FROM events),
    marked AS (
      SELECT user_id, su, eu,
             CASE WHEN MAX(eu) OVER (PARTITION BY user_id
                                     ORDER BY su, event_id
                                     ROWS BETWEEN UNBOUNDED PRECEDING
                                              AND 1 PRECEDING) >= su
                  THEN 0 ELSE 1 END AS new_island,
             event_id
      FROM iv),
    isl AS (
      SELECT user_id, su, eu,
             SUM(new_island) OVER (PARTITION BY user_id
                                   ORDER BY su, event_id
                                   ROWS BETWEEN UNBOUNDED PRECEDING
                                            AND CURRENT ROW) AS island_id
      FROM marked),
    per_island AS (
      SELECT user_id, island_id,
             MAX(eu) - MIN(su) AS len_us
      FROM isl GROUP BY 1, 2)
    SELECT user_id,
           CAST(COUNT(*) AS BIGINT) AS n_islands,
           CAST(SUM(len_us) AS BIGINT) AS covered_us
    FROM per_island GROUP BY user_id
    """,
)
def interval_coverage_user(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Gaps-and-islands: merge each user's overlapping activity
    intervals (event start + deterministic duration) and report the
    merged-interval count and total covered time — the machine-
    utilization / uptime-coverage primitive. Island detection is the
    classic single-pass cumulative-max: an interval starts a new
    island iff its start exceeds the running max end of everything
    before it (ties broken by event_id, so both engines walk the same
    order). All arithmetic is integer microseconds.

    Scale: one shuffle on user_id; two window passes over the same
    sort order (Catalyst reuses the sort), then an in-partition
    groupBy. Per-user state is one running max — O(1) memory per
    partition stream."""
    ev = load(spark, sf_dir, "events")
    iv = ev.select(
        "user_id",
        "event_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("su"),
        (
            F.unix_micros(F.col("ts").cast("timestamp"))
            + (F.col("event_id") % 300 + 60) * 1_000_000
        ).alias("eu"),
    )
    order = W.partitionBy("user_id").orderBy("su", "event_id")
    prev_max = F.max("eu").over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    marked = iv.withColumn(
        "new_island",
        F.when(prev_max >= F.col("su"), F.lit(0)).otherwise(F.lit(1)),
    )
    isl = marked.withColumn(
        "island_id",
        F.sum("new_island").over(
            order.rowsBetween(W.unboundedPreceding, 0)
        ),
    )
    per_island = isl.groupBy("user_id", "island_id").agg(
        (F.max("eu") - F.min("su")).alias("len_us")
    )
    return per_island.groupBy("user_id").agg(
        F.count(F.lit(1)).alias("n_islands"),
        F.sum("len_us").cast("long").alias("covered_us"),
    )


@_q(
    "pareto_frontier_parts",
    f"""
    WITH p AS (
      SELECT p_partkey, CAST(p_retailprice AS {D}) AS price, p_size
      FROM part),
    pp AS (SELECT price, MAX(p_size) AS msize FROM p GROUP BY 1),
    r AS (
      SELECT price, msize,
             MAX(msize) OVER (ORDER BY price
                              ROWS BETWEEN UNBOUNDED PRECEDING
                                       AND 1 PRECEDING) AS run
      FROM pp),
    f AS (SELECT price, msize FROM r WHERE run IS NULL OR run < msize)
    SELECT p.p_partkey, CAST(p.price AS DOUBLE) AS price, p.p_size
    FROM p JOIN f ON p.price = f.price AND p.p_size = f.msize
    """,
)
def pareto_frontier_parts(spark: SparkSession, sf_dir: str) -> DataFrame:
    """2-D skyline (Pareto frontier): parts not dominated on
    (price ↓ better, size ↑ better). Never the naive quadratic
    self-join — the frontier is computed on the DISTINCT-PRICE
    aggregate: per price keep the max size, then a price-ordered
    running max; a price level survives iff its max size strictly
    beats every strictly-cheaper level's best. Equal-(price, size)
    rows co-survive (dominance needs one strict inequality), which
    the max-size join-back preserves.

    Scale: the windowed relation is |distinct prices| (domain-
    bounded, tiny vs |part|), so the single-partition window is safe
    at any fact size; the join back is a broadcast of the frontier
    levels into the part scan."""
    part = load(spark, sf_dir, "part")
    p = part.select(
        "p_partkey", dec("p_retailprice").alias("price"), "p_size"
    )
    pp = p.groupBy("price").agg(F.max("p_size").alias("msize"))
    run = F.max("msize").over(
        W.orderBy("price").rowsBetween(W.unboundedPreceding, -1)
    )
    f = (
        pp.withColumn("run", run)
        .filter(F.col("run").isNull() | (F.col("run") < F.col("msize")))
        .select("price", F.col("msize").alias("p_size"))
    )
    return p.join(F.broadcast(f), ["price", "p_size"]).select(
        "p_partkey", F.col("price").cast("double").alias("price"), "p_size"
    )


@_q(
    "cusum_changepoint_daily",
    f"""
    WITH daily AS (
      SELECT CAST(o_orderdate AS DATE) AS day,
             CAST(SUM(CAST(o_totalprice AS {D})) AS {D}) AS r
      FROM orders GROUP BY 1),
    win AS (
      SELECT day,
             CAST(SUM(r) OVER (ORDER BY day
                               ROWS BETWEEN UNBOUNDED PRECEDING
                                        AND CURRENT ROW) AS {D}) AS cum,
             CAST(ROW_NUMBER() OVER (ORDER BY day) AS DECIMAL(10,0)) AS i,
             CAST(SUM(r) OVER () AS {D}) AS tot,
             CAST(COUNT(*) OVER () AS DECIMAL(10,0)) AS n
      FROM daily),
    sc AS (SELECT day, n * cum - i * tot AS scaled, n FROM win)
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(scaled AS DOUBLE) / CAST(n AS DOUBLE) AS cusum,
           CAST(ROW_NUMBER() OVER (ORDER BY abs(scaled) DESC, day)
                AS BIGINT) AS abs_rank
    FROM sc
    """,
)
def cusum_changepoint_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """CUSUM change-point scan over daily order revenue: the cumulative
    sum of deviations from the global mean peaks where the level
    shifts. Computed hash-stably by clearing the mean's division:
    CUSUM_i·n = n·prefix_i − i·total is EXACT decimal arithmetic
    ((10,0)×(18,2) products stay far under the 38-digit cap where the
    engines' truncation rules diverge); the one float division per
    row is identical on both engines. abs_rank orders candidate
    change points (tie-broken by day).

    Scale: one groupBy shuffles orders to day grain; the windows run
    over |days| rows (calendar-bounded), so the partitionless window
    is safe — same contract as the other day-grain statistics."""
    orders = load(spark, sf_dir, "orders")
    daily = orders.groupBy(
        F.col("o_orderdate").cast("date").alias("day")
    ).agg(F.sum(dec("o_totalprice")).cast("decimal(18,2)").alias("r"))
    win = daily.select(
        "day",
        F.sum("r")
        .over(W.orderBy("day").rowsBetween(W.unboundedPreceding, 0))
        .cast("decimal(18,2)")
        .alias("cum"),
        F.row_number().over(W.orderBy("day")).cast("decimal(10,0)").alias("i"),
        F.sum("r").over(W.partitionBy()).cast("decimal(18,2)").alias("tot"),
        F.count(F.lit(1)).over(W.partitionBy()).cast("decimal(10,0)").alias("n"),
    )
    sc = win.select(
        "day",
        (F.col("n") * F.col("cum") - F.col("i") * F.col("tot")).alias("scaled"),
        "n",
    )
    return sc.select(
        F.col("day").cast("string").alias("day"),
        (F.col("scaled").cast("double") / F.col("n").cast("double")).alias(
            "cusum"
        ),
        F.row_number()
        .over(W.orderBy(F.abs(F.col("scaled")).desc(), "day"))
        .cast("long")
        .alias("abs_rank"),
    )


@_q(
    "approx_percentile_tolerance",
    f"""
    WITH p AS (
      SELECT o_orderpriority, CAST(o_totalprice AS {D}) AS price,
             o_orderkey,
             ROW_NUMBER() OVER (PARTITION BY o_orderpriority
                                ORDER BY CAST(o_totalprice AS {D}),
                                         o_orderkey) AS rn,
             COUNT(*) OVER (PARTITION BY o_orderpriority) AS n
      FROM orders)
    SELECT o_orderpriority,
           CAST(price AS DOUBLE) AS exact_median,
           TRUE AS approx_ok
    FROM p WHERE rn = (n + 1) // 2
    """,
)
def approx_percentile_tolerance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Approximate percentile with a FALSIFIABLE bound (the
    approx-distinct recipe applied to quantile sketches): the exact
    discrete median per order priority (row_number = ceil(n/2) under a
    fully tie-broken sort — no interpolation, so both engines agree
    bit-exactly) is hashed, and Spark's ``percentile_approx``
    (Greenwald-Khanna at accuracy 10⁴) must land within 1% of it —
    the boolean is hashed TRUE, so a drifting sketch fails the gate
    rather than being quietly unchecked.

    Scale: the sketch side is the 100 TB path (mergeable, one
    aggregate, no sort); the exact side exists to judge it and costs
    one per-group sort — at real scale you keep only the sketch."""
    orders = load(spark, sf_dir, "orders")
    p = orders.select(
        "o_orderpriority",
        dec("o_totalprice").alias("price"),
        "o_orderkey",
    )
    grp = W.partitionBy("o_orderpriority")
    exact = (
        p.withColumn(
            "rn", F.row_number().over(grp.orderBy("price", "o_orderkey"))
        )
        .withColumn("n", F.count(F.lit(1)).over(grp))
        .filter(F.col("rn") == F.expr("(n + 1) DIV 2"))
        .select(
            "o_orderpriority",
            F.col("price").cast("double").alias("exact_median"),
        )
    )
    approx = orders.groupBy("o_orderpriority").agg(
        F.percentile_approx("o_totalprice", 0.5, 10000).alias("approx_med")
    )
    return (
        exact.join(F.broadcast(approx), "o_orderpriority")
        .select(
            "o_orderpriority",
            "exact_median",
            (
                F.abs(F.col("approx_med") - F.col("exact_median"))
                <= 0.01 * F.col("exact_median")
            ).alias("approx_ok"),
        )
    )


@_q(
    "revenue_proration_daily",
    f"""
    WITH o AS (
      SELECT CAST(o_orderdate AS DATE) AS d0,
             o_orderkey % 7 + 1 AS span,
             CAST(CAST(o_totalprice AS {D}) * 100 AS BIGINT) AS cents
      FROM orders),
    slices AS (
      SELECT d0 + CAST(i AS INTEGER) AS day,
             cents * (420 // span) AS contrib
      FROM o, UNNEST(generate_series(0, span - 1)) t(i))
    SELECT CAST(day AS VARCHAR) AS day,
           CAST(SUM(contrib) AS DOUBLE) / 42000.0 AS revenue,
           CAST(COUNT(*) AS BIGINT) AS n_slices
    FROM slices GROUP BY 1
    """,
)
def revenue_proration_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Interval proration: each order's revenue is spread evenly over
    its 1-7 day service span (span = orderkey mod 7 + 1), the
    calendarized-revenue/cost-allocation primitive. Exactness under
    any partitioning comes from a common denominator: spans divide
    420 (lcm 1..7), so each slice carries cents·(420/span) as an
    INTEGER; per-day sums are integer-exact and the single float
    division by 42000 happens once per output row.

    Scale: explode fan-out is bounded (≤7×); the groupBy is the
    standard two-phase day-grain aggregate. Integer contributions
    stay under 2⁶³ up to ~10⁵× this data; beyond that the sum column
    moves to DECIMAL(38,0) unchanged in shape."""
    orders = load(spark, sf_dir, "orders")
    o = orders.select(
        F.col("o_orderdate").cast("date").alias("d0"),
        (F.col("o_orderkey") % 7 + 1).alias("span"),
        (dec("o_totalprice") * 100).cast("long").alias("cents"),
    )
    slices = o.select(
        F.explode(F.sequence(F.lit(0), F.col("span") - 1)).alias("i"),
        "d0",
        (F.col("cents") * F.expr("420 DIV span")).alias("contrib"),
    ).select(
        F.date_add("d0", F.col("i").cast("int")).alias("day"), "contrib"
    )
    return (
        slices.groupBy("day")
        .agg(
            F.sum("contrib").alias("s"),
            F.count(F.lit(1)).alias("n_slices"),
        )
        .select(
            F.col("day").cast("string").alias("day"),
            (F.col("s").cast("double") / F.lit(42000.0)).alias("revenue"),
            "n_slices",
        )
    )


@_q(
    "gdpr_cascade_delete_audit",
    """
    SELECT 'customer' AS tbl,
           COUNT(*) FILTER (WHERE c_custkey % 97 = 0) AS n_delete,
           COUNT(*) FILTER (WHERE c_custkey % 97 != 0) AS n_keep
    FROM customer
    UNION ALL
    SELECT 'orders',
           COUNT(*) FILTER (WHERE EXISTS
             (SELECT 1 FROM customer c
              WHERE c.c_custkey = o_custkey AND c.c_custkey % 97 = 0)),
           COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM customer c
              WHERE c.c_custkey = o_custkey AND c.c_custkey % 97 = 0))
    FROM orders
    UNION ALL
    SELECT 'lineitem',
           COUNT(*) FILTER (WHERE EXISTS
             (SELECT 1 FROM orders o JOIN customer c
                ON c.c_custkey = o.o_custkey
              WHERE o.o_orderkey = l_orderkey AND c.c_custkey % 97 = 0)),
           COUNT(*) FILTER (WHERE NOT EXISTS
             (SELECT 1 FROM orders o JOIN customer c
                ON c.c_custkey = o.o_custkey
              WHERE o.o_orderkey = l_orderkey AND c.c_custkey % 97 = 0))
    FROM lineitem
    """,
)
def gdpr_cascade_delete_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Right-to-be-forgotten impact audit: given a deletion keylist
    (customers with custkey ≡ 0 mod 97), count the rows each
    downstream table would lose via foreign-key cascade
    (customer → orders → lineitem) and the rows that survive — the
    dry-run report a compliance pipeline emits before destructive
    deletes. The cascade is REAL joins against the keylist (not the
    arithmetic shortcut), so orphan keys are handled faithfully.

    Scale: the keylist broadcasts into each fact scan (flag join +
    conditional count — one pass per table, no row explosion). The
    broadcast is the OPTIMIZER's choice, not a forced hint: the
    keylist and cascaded order keys grow with the data (~1/97 of
    their tables), so past autoBroadcastJoinThreshold the plan
    degrades to a shuffled join on its own instead of OOMing on a
    mandatory multi-GB broadcast build."""
    customer = load(spark, sf_dir, "customer")
    orders = load(spark, sf_dir, "orders")
    lineitem = load(spark, sf_dir, "lineitem")

    victims = customer.filter(F.col("c_custkey") % 97 == 0).select(
        F.col("c_custkey").alias("vk")
    )
    cust_row = customer.agg(
        F.lit("customer").alias("tbl"),
        F.count(F.when(F.col("c_custkey") % 97 == 0, 1)).alias("n_delete"),
        F.count(F.when(F.col("c_custkey") % 97 != 0, 1)).alias("n_keep"),
    )
    ofl = orders.join(victims, orders.o_custkey == victims.vk, "left")
    ord_row = ofl.agg(
        F.lit("orders").alias("tbl"),
        F.count(F.when(F.col("vk").isNotNull(), 1)).alias("n_delete"),
        F.count(F.when(F.col("vk").isNull(), 1)).alias("n_keep"),
    )
    del_orders = ofl.filter(F.col("vk").isNotNull()).select(
        F.col("o_orderkey").alias("dok")
    )
    lfl = lineitem.join(
        del_orders, lineitem.l_orderkey == F.col("dok"), "left"
    )
    line_row = lfl.agg(
        F.lit("lineitem").alias("tbl"),
        F.count(F.when(F.col("dok").isNotNull(), 1)).alias("n_delete"),
        F.count(F.when(F.col("dok").isNull(), 1)).alias("n_keep"),
    )
    return cust_row.unionByName(ord_row).unionByName(line_row)


@_q(
    "rolling_corr_value_count",
    f"""
    WITH daily AS (
      SELECT CAST(ts AS DATE) AS day,
             CAST(CAST(SUM(CAST(value AS {D})) AS {D}) * 100 AS BIGINT)
               AS xs,
             COUNT(*) AS y
      FROM events GROUP BY 1),
    k AS (SELECT day, xs, y,
                 datediff('day', DATE '1970-01-01', day) AS dk
          FROM daily),
    win AS (
      SELECT day,
             CAST(COUNT(*) OVER w AS DOUBLE) AS n_d,
             CAST(COUNT(*) OVER w AS BIGINT) AS n,
             CAST(SUM(xs) OVER w AS DOUBLE) AS sx,
             CAST(SUM(y) OVER w AS DOUBLE) AS sy,
             CAST(SUM(xs * y) OVER w AS DOUBLE) AS sxy,
             CAST(SUM(xs * xs) OVER w AS DOUBLE) AS sx2,
             CAST(SUM(y * y) OVER w AS DOUBLE) AS sy2
      FROM k
      WINDOW w AS (ORDER BY dk RANGE BETWEEN 6 PRECEDING AND CURRENT ROW))
    SELECT CAST(day AS VARCHAR) AS day, n,
           CASE WHEN n_d * sx2 - sx * sx > 0 AND n_d * sy2 - sy * sy > 0
                THEN (n_d * sxy - sx * sy)
                     / sqrt((n_d * sx2 - sx * sx) * (n_d * sy2 - sy * sy))
                END AS corr
    FROM win
    """,
)
def rolling_corr_value_count(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Rolling 7-day Pearson correlation between daily event value and
    daily event count — the co-movement monitor for a metric pair.
    Hash-stable by the moments recipe: the five window sums (Σx, Σy,
    Σxy, Σx², Σy²) accumulate EXACT integers (value in cents), the
    RANGE frame keys on the day ordinal so gap days shrink the window,
    and correlation is one identical float expression per row (zero-
    variance windows → NULL, never a 0/0).

    Scale: day-grain relation after one groupBy shuffle; the window
    is calendar-bounded. Integer moments stay in BIGINT up to ~10⁴×
    this density; past that the moments move to DECIMAL(38,x) with
    the same frame."""
    ev = load(spark, sf_dir, "events")
    daily = ev.groupBy(F.col("ts").cast("date").alias("day")).agg(
        (F.sum(dec("value")).cast("decimal(18,2)") * 100)
        .cast("long")
        .alias("xs"),
        F.count(F.lit(1)).alias("y"),
    )
    k = daily.withColumn(
        "dk", F.datediff("day", F.lit("1970-01-01").cast("date"))
    )
    w = W.orderBy("dk").rangeBetween(-6, 0)
    win = k.select(
        "day",
        F.count(F.lit(1)).over(w).cast("double").alias("n_d"),
        F.count(F.lit(1)).over(w).cast("long").alias("n"),
        F.sum("xs").over(w).cast("double").alias("sx"),
        F.sum("y").over(w).cast("double").alias("sy"),
        F.sum(F.col("xs") * F.col("y")).over(w).cast("double").alias("sxy"),
        F.sum(F.col("xs") * F.col("xs")).over(w).cast("double").alias("sx2"),
        F.sum(F.col("y") * F.col("y")).over(w).cast("double").alias("sy2"),
    )
    vx = F.col("n_d") * F.col("sx2") - F.col("sx") * F.col("sx")
    vy = F.col("n_d") * F.col("sy2") - F.col("sy") * F.col("sy")
    num = F.col("n_d") * F.col("sxy") - F.col("sx") * F.col("sy")
    return win.select(
        F.col("day").cast("string").alias("day"),
        "n",
        F.when((vx > 0) & (vy > 0), num / F.sqrt(vx * vy)).alias("corr"),
    )


@_q(
    "token_budget_allocator",
    """
    WITH w AS (
      SELECT source, CAST(SUM(n_chars) AS BIGINT) AS chars
      FROM documents GROUP BY 1),
    t AS (
      SELECT source, chars,
             CAST(SUM(chars) OVER () AS BIGINT) AS tot
      FROM w),
    b AS (
      SELECT source, chars,
             (1000000 * chars) // tot AS base,
             (1000000 * chars) % tot AS rem
      FROM t),
    r AS (
      SELECT source, chars, base,
             ROW_NUMBER() OVER (ORDER BY rem DESC, source) AS rnk,
             CAST(1000000 - SUM(base) OVER () AS BIGINT) AS leftover
      FROM b)
    SELECT source, chars,
           CAST(base + CASE WHEN rnk <= leftover THEN 1 ELSE 0 END
                AS BIGINT) AS alloc
    FROM r
    """,
)
def token_budget_allocator(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Largest-remainder budget allocation: split a fixed 1M-token
    training budget across corpus sources proportionally to their
    size, with the rounding residue distributed to the largest
    fractional remainders (ties to source name) — allocations sum to
    the budget EXACTLY, the property floor- or round-based splits
    lose. Pure integer arithmetic end to end (the proportional shares
    are kept as (quotient, remainder) pairs, never floats), so the
    allocation is identical under any partitioning.

    Scale: runs on the per-source aggregate (|sources| rows — tiny);
    the fact-table scan is the only large input and collapses in one
    map-side-combinable groupBy."""
    docs = load(spark, sf_dir, "documents")
    w = docs.groupBy("source").agg(F.sum("n_chars").alias("chars"))
    t = w.withColumn(
        "tot", F.sum("chars").over(W.partitionBy()).cast("long")
    )
    b = t.select(
        "source",
        "chars",
        F.expr("(1000000 * chars) DIV tot").alias("base"),
        F.expr("(1000000 * chars) % tot").alias("rem"),
    )
    r = b.select(
        "source",
        "chars",
        "base",
        F.row_number()
        .over(W.orderBy(F.col("rem").desc(), "source"))
        .alias("rnk"),
        (F.lit(1_000_000) - F.sum("base").over(W.partitionBy()))
        .cast("long")
        .alias("leftover"),
    )
    return r.select(
        "source",
        "chars",
        (
            F.col("base")
            + F.when(F.col("rnk") <= F.col("leftover"), 1).otherwise(0)
        )
        .cast("long")
        .alias("alloc"),
    )


@_q(
    "asof_nearest_click",
    """
    WITH u AS (
      SELECT event_id, user_id, epoch_us(ts) AS us,
             CASE WHEN event_type = 'purchase' THEN 1 ELSE 0 END AS is_p,
             CASE WHEN event_type = 'click' THEN epoch_us(ts) END
               AS click_us
      FROM events WHERE event_type IN ('click', 'purchase')),
    w2 AS (
      SELECT event_id, user_id, us, is_p,
             last_value(click_us IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, is_p, event_id
                ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS prev,
             first_value(click_us IGNORE NULLS) OVER
               (PARTITION BY user_id ORDER BY us, is_p, event_id
                ROWS BETWEEN 1 FOLLOWING AND UNBOUNDED FOLLOWING) AS nxt
      FROM u)
    SELECT event_id, user_id,
           CASE WHEN prev IS NOT NULL AND us - prev <= 3600000000
                     AND (nxt IS NULL OR nxt - us > 3600000000
                          OR us - prev <= nxt - us)
                THEN -(us - prev)
                WHEN nxt IS NOT NULL AND nxt - us <= 3600000000
                THEN nxt - us
                END AS delta_us
    FROM w2 WHERE is_p = 1
    """,
)
def asof_nearest_click(spark: SparkSession, sf_dir: str) -> DataFrame:
    """NEAREST-as-of join (both directions): for every purchase, the
    same user's temporally closest click within ±1 h, ties to the
    earlier (backward) side. Completes the as-of family (backward =
    asof_click_before_purchase, forward = asof_forward_purchase_
    window) with the variant finance tick-matching uses. The scalable
    shape is a SINGLE sorted pass over the union — clicks and
    purchases interleave in one per-user sort where ignore-nulls
    last/first window functions carry the nearest click in each
    direction — never a range join (quadratic candidate fan-out) and
    never a per-key collect. Deltas are exact integer microseconds;
    same-instant clicks order before purchases so a 0-delta counts as
    backward on both engines.

    Scale: one shuffle on user_id, one sort, two O(1)-state window
    passes over it — the same single-scan recipe as the island
    queries. At 100 TB the sort is the only cost and it is the
    minimum any ordered-join needs."""
    ev = load(spark, sf_dir, "events")
    u = ev.filter(F.col("event_type").isin("click", "purchase")).select(
        "event_id",
        "user_id",
        F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        F.when(F.col("event_type") == "purchase", 1)
        .otherwise(0)
        .alias("is_p"),
        F.when(
            F.col("event_type") == "click",
            F.unix_micros(F.col("ts").cast("timestamp")),
        ).alias("click_us"),
    )
    order = W.partitionBy("user_id").orderBy("us", "is_p", "event_id")
    prev = F.last("click_us", ignorenulls=True).over(
        order.rowsBetween(W.unboundedPreceding, -1)
    )
    nxt = F.first("click_us", ignorenulls=True).over(
        order.rowsBetween(1, W.unboundedFollowing)
    )
    w2 = u.select("event_id", "user_id", "us", "is_p",
                  prev.alias("prev"), nxt.alias("nxt"))
    h = F.lit(3_600_000_000)
    dprev = F.col("us") - F.col("prev")
    dnext = F.col("nxt") - F.col("us")
    delta = F.when(
        F.col("prev").isNotNull()
        & (dprev <= h)
        & (F.col("nxt").isNull() | (dnext > h) | (dprev <= dnext)),
        -dprev,
    ).when(F.col("nxt").isNotNull() & (dnext <= h), dnext)
    return w2.filter(F.col("is_p") == 1).select(
        "event_id", "user_id", delta.alias("delta_us")
    )
