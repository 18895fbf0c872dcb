"""Query-catalog entries for the skew-mitigation operators and the
composite training-data pipeline.

Salting is a pure plan rewrite — results are bit-identical to the
unsalted equivalent, so the oracles are the PLAIN SQL forms: the
driver proves the rewrite changes the shuffle, not the answer.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup, skew, text
from etl_projects_spark.queries import D, _q, dec, load


@_q(
    "salted_agg_order_revenue",
    f"""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS revenue,
           CAST(SUM(1) AS BIGINT) AS n_orders
    FROM orders
    GROUP BY o_orderstatus
    """,
)
def salted_agg_order_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe two-phase aggregation: phase 1 on (status, salt16)
    spreads any hot status over 16 reducers, phase 2 folds the partials.
    Decimal-exact sums commute across phases → oracle-identical to the
    plain GROUP BY."""
    orders = load(spark, sf_dir, "orders")
    return skew.salted_groupby_sum(
        orders,
        keys=["o_orderstatus"],
        sum_cols={
            "revenue": dec("o_totalprice"),
            "n_orders": F.lit(1),
        },
        salt=16,
        salt_on="o_orderkey",
    ).withColumn("revenue", F.col("revenue").cast("double"))


@_q(
    "salted_join_lineitem_orders",
    f"""
    SELECT l_orderkey,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) AS line_revenue,
           CAST(MAX(o_totalprice) AS DOUBLE) AS order_total
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY l_orderkey
    """,
)
def salted_join_lineitem_orders(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Skew-safe fact-to-dimension join: the big side carries a
    deterministic row-hash salt, the dimension is replicated salt×, so
    a hot order key spreads over 4 reducers. Same rows as the plain
    join — the aggregate on top makes the oracle compact. (Salt factor
    sizes to observed skew: replication cost is |dim|·salt, so use the
    smallest salt that flattens the hot keys.)"""
    # Project BEFORE salting: the salt hashes every column of the big
    # side, so handing salted_join the full table forces a 16-column
    # lineitem scan for a 2-column query (ReadSchema showed the whole
    # struct). Pruned here, the scan reads 2 columns and the row hash
    # prices 2 values instead of 16.
    li = load(spark, sf_dir, "lineitem").select("l_orderkey", "l_extendedprice")
    orders = load(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = skew.salted_join(li, orders.select("l_orderkey", "o_totalprice"),
                              on="l_orderkey", salt=4)
    return joined.groupBy("l_orderkey").agg(
        F.sum(dec("l_extendedprice")).cast("double").alias("line_revenue"),
        F.max("o_totalprice").cast("double").alias("order_total"),
    )


@_q(
    "pipeline_training_corpus",
    f"""
    WITH scored AS (
        SELECT doc_id, text,
               len(string_split(text, ' ')) AS n_tokens,
               {text.lang_id_oracle_case()} AS lang_pred
        FROM documents
    ),
    kept AS (SELECT * FROM scored WHERE n_tokens >= 10 AND lang_pred = 'en'),
    groups AS (
        SELECT md5(text) AS fp, min(doc_id) AS keeper_id, count(*) AS n_copies
        FROM kept GROUP BY 1
    )
    SELECT k.doc_id, g.n_copies, k.n_tokens
    FROM kept k JOIN groups g ON k.doc_id = g.keeper_id
    """,
)
def pipeline_training_corpus(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composite training-data pipeline in ONE Spark job:
    quality-gate (length) → language-ID filter → exact-dedup keeping
    the lowest doc_id per content group. Filters run before the dedup
    shuffle (prune early), the group relation joins back broadcast.
    fan_out ahead of the scoring stage (r15 optimization): the
    single-row-group corpus file priced token-count + lang-ID onto
    one core at bench scale (1.37 s → 1.18 s at sf0.1, identical
    rows); no-op at scan widths ≥ the core count."""
    from etl_projects_spark.operators.exec_util import fan_out

    docs = fan_out(load(spark, sf_dir, "documents").select("doc_id", "text"))
    scored = docs.select(
        "doc_id",
        "text",
        text.token_count("text").alias("n_tokens"),
        text.predicted_lang("text").alias("lang_pred"),
    )
    kept = scored.filter((F.col("n_tokens") >= 10) & (F.col("lang_pred") == "en"))
    groups = dedup.exact_dedup_groups(kept)
    return (
        kept.join(
            F.broadcast(groups),
            kept.doc_id == groups.keeper_id,
        )
        .select("doc_id", "n_copies", "n_tokens")
    )


def _approx_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Raw HLL++ estimate per day — shared by the catalog query and the
    numeric-tolerance test in tests/test_sketches.py."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )


@_q(
    "approx_distinct_users_daily",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           COUNT(DISTINCT user_id) AS exact_users,
           TRUE AS approx_ok
    FROM events GROUP BY 1
    """,
)
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per day (`approx_count_distinct`,
    2% rsd): the bounded-memory sketch that replaces exact
    count-distinct at 100 TB (exact = full shuffle of every user id;
    HLL = 1 KB-scale sketch per group, map-side mergeable).

    Sketch values differ per engine, so the raw estimate can never
    hash-match a DuckDB oracle. Falsifiability comes from folding the
    exact twin into the SAME query: it emits the exact count (hashed
    against the oracle, proving the scan/group pipeline) plus
    ``approx_ok`` — the sketch-within-tolerance predicate, which the
    oracle asserts as TRUE. An HLL regression past the bound flips the
    boolean and fails the driver's value hash; the raw estimate's
    numeric tolerance is additionally pinned by tests/test_sketches.py.
    """
    ev = load(spark, sf_dir, "events")
    both = ev.groupBy(F.to_date("ts").cast("string").alias("day")).agg(
        F.count_distinct("user_id").alias("exact_users"),
        F.approx_count_distinct("user_id", 0.02).alias("_approx"),
    )
    tol = F.greatest(
        F.col("exact_users").cast("double") * 0.10, F.lit(3.0)
    )
    return both.select(
        "day",
        "exact_users",
        (
            F.abs(F.col("_approx") - F.col("exact_users")).cast("double")
            <= tol
        ).alias("approx_ok"),
    )


@_q(
    "exact_distinct_users_daily",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           COUNT(DISTINCT user_id) AS n_users
    FROM events GROUP BY 1
    """,
)
def exact_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact twin of ``approx_distinct_users_daily``: same grouping
    pipeline, exact COUNT(DISTINCT) — gives the sketch query a
    falsifiable contract. The shared scan/group/day logic is
    hash-checked here, and tests/test_sketches.py pins
    |approx−exact|/exact within the configured rsd against THIS
    query's output, so the approx entry is no longer
    unfalsifiable-by-design. (At 100 TB you run the approx one; this
    exact twin is the audit query you run on a sampled day.)"""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").cast("string").alias("day"))
        .agg(F.count_distinct("user_id").alias("n_users"))
    )


@_q(
    "asof_click_before_purchase",
    """
    SELECT p.event_id, c.event_id AS click_id_asof, c.value AS click_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'purchase') p
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'click') c
      ON p.user_id = c.user_id AND c.ts <= p.ts
    """,
)
def asof_click_before_purchase(spark: SparkSession, sf_dir: str) -> DataFrame:
    """As-of join: each purchase matched to the user's latest click
    at-or-before it — one union + window sort (single shuffle on
    user_id), versus DuckDB's native ASOF JOIN as the oracle."""
    from etl_projects_spark.operators import temporal

    ev = load(spark, sf_dir, "events")
    purchases = ev.filter(F.col("event_type") == "purchase")
    clicks = ev.filter(F.col("event_type") == "click")
    return temporal.asof_join(
        purchases, clicks, on="user_id",
        right_cols=["event_id", "value"], tie_break="event_id",
    ).select(
        "event_id",
        F.col("event_id_asof").alias("click_id_asof"),
        F.col("value_asof").alias("click_value_asof"),
    )


@_q(
    "range_join_daily_windows",
    """
    SELECT w.start_ts AS window_start, COUNT(*) AS n_events,
           CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DOUBLE) AS sum_value
    FROM events e
    JOIN (SELECT DISTINCT date_trunc('day', ts) + INTERVAL 4 HOUR AS start_ts,
                          date_trunc('day', ts) + INTERVAL 10 HOUR AS end_ts
          FROM events) w
      ON e.ts >= w.start_ts AND e.ts < w.end_ts
    GROUP BY w.start_ts
    """,
)
def range_join_daily_windows(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Banded range join (no equi key): events inside daily 04:00-10:00
    windows. Both sides band by the hour, so the theta join becomes an
    equi-join on bands + residual filter — never a cartesian."""
    from etl_projects_spark.operators import temporal

    ev = load(spark, sf_dir, "events")
    windows = (
        ev.select(F.date_trunc("day", "ts").alias("day"))
        .distinct()
        .select(
            (F.col("day") + F.expr("INTERVAL 4 HOURS")).alias("start_ts"),
            (F.col("day") + F.expr("INTERVAL 10 HOURS")).alias("end_ts"),
        )
    )
    joined = temporal.banded_range_join(ev, windows)
    return joined.groupBy(F.col("start_ts").alias("window_start")).agg(
        F.count("*").alias("n_events"),
        F.sum(dec("value")).cast("double").alias("sum_value"),
    )


@_q(
    "bucketed_join_revenue",
    f"""
    SELECT year(o_orderdate) AS o_year,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    GROUP BY 1
    """,
)
def bucketed_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Co-bucketed join, END TO END: both sides land as external
    bucketed tables (8 buckets on the join key — the shuffle paid once
    at write time), then join shuffle-free and aggregate. The function
    ASSERTS the joined plan has no Exchange on either side while
    broadcast is disabled — proving the bucket layout co-locates — and
    the oracle proves answer parity with the plain join.

    This is the 100 TB pattern for repeatedly-joined fact tables:
    bucket lineitem and orders identically at ingest and every later
    join/agg on the key skips its shuffle — which is also why the
    bucketed layout here is a ``build_once`` artifact keyed on the
    source snapshot: at scale you bucket ONCE at ingest, so the
    steady-state cost this query represents is the shuffle-free join,
    not a re-bucketing. Warm calls re-run only the bucketed-table DDL
    (bucket metadata lives in the session catalog, the bucket-id file
    naming lives with the data) and the per-call no-Exchange assert
    still proves the re-registered layout co-locates.
    """
    from etl_projects_spark.operators.exec_util import build_once, scratch_path

    scratch = scratch_path(
        "bucketed_join",
        os.path.join(sf_dir, "lineitem.parquet"),
        os.path.join(sf_dir, "orders.parquet"),
    )

    def _build(tmp: str) -> None:
        li = load(spark, sf_dir, "lineitem").select(
            "l_orderkey", "l_extendedprice"
        )
        orders = load(spark, sf_dir, "orders").select(
            "o_orderkey", "o_orderdate"
        )
        for t in ("bj_lineitem", "bj_orders"):
            spark.sql(f"DROP TABLE IF EXISTS {t}")
        skew.write_bucketed(
            li, "bj_lineitem", ["l_orderkey"], n_buckets=8,
            path=f"{tmp}/lineitem",
        )
        skew.write_bucketed(
            orders.withColumnRenamed("o_orderkey", "l_orderkey"),
            "bj_orders", ["l_orderkey"], n_buckets=8,
            path=f"{tmp}/orders",
        )

    build_once(
        scratch, _build, marker=os.path.join("orders", "_SUCCESS")
    )
    # Re-run the bucketed-table DDL against the final scratch location
    # (the build's catalog entries point at the pre-rename dir, and a
    # fresh driver session has no entries at all). CLUSTERED BY must
    # match the write's bucket spec — the no-Exchange assert below
    # fails if it doesn't.
    for name, sub, cols in (
        ("bj_lineitem", "lineitem",
         "l_orderkey BIGINT, l_extendedprice DOUBLE"),
        ("bj_orders", "orders", "l_orderkey BIGINT, o_orderdate TIMESTAMP"),
    ):
        spark.sql(f"DROP TABLE IF EXISTS {name}")
        spark.sql(
            f"CREATE TABLE {name} ({cols}) USING parquet "
            f"CLUSTERED BY (l_orderkey) INTO 8 BUCKETS "
            f"LOCATION '{os.path.join(scratch, sub)}'"
        )
    joined = skew.bucketed_join(spark, "bj_lineitem", "bj_orders", "l_orderkey")
    # Plan contract, checked eagerly with broadcast off so the bucketed
    # sort-merge path is what gets planned: zero shuffle Exchange.
    thresh = spark.conf.get("spark.sql.autoBroadcastJoinThreshold")
    spark.conf.set("spark.sql.autoBroadcastJoinThreshold", "-1")
    try:
        assert skew.assert_no_shuffle_join(joined), (
            "co-bucketed join must plan without a shuffle Exchange"
        )
    finally:
        spark.conf.set("spark.sql.autoBroadcastJoinThreshold", thresh)
    return (
        joined.select(F.year("o_orderdate").alias("o_year"), "l_extendedprice")
        .groupBy("o_year")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


def _zorder_expr(a: str, b: str, bits: int = 16) -> str:
    """Bit-interleave expression for a 2-D Z-order (Morton) key,
    emitted as engine-portable integer SQL — the SAME string serves
    Spark and DuckDB, so oracle parity holds by construction (the
    simhash/minhash pattern). ``a``'s bit i lands at position 2i,
    ``b``'s at 2i+1."""
    terms = []
    for i in range(bits):
        terms.append(f"((({a} >> {i}) & 1) << {2 * i})")
        terms.append(f"((({b} >> {i}) & 1) << {2 * i + 1})")
    return "(" + " + ".join(terms) + ")"


_Z_A = "(user_id & 65535)"
_Z_B = "(event_id & 65535)"


@_q(
    "zorder_cluster_events",
    f"""
    SELECT event_id, user_id,
           {_zorder_expr(_Z_A, _Z_B)} AS zval
    FROM events
    ORDER BY zval, event_id LIMIT 200
    """,
)
def zorder_cluster_events(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Z-order (Morton) clustering key over (user_id, event_id): the
    multi-dimensional sort key behind data-skipping layouts — write a
    table ORDER BY zval and range queries on EITHER dimension prune
    file-level min/max zones (the Delta/Iceberg OPTIMIZE ZORDER
    pattern, built from plain integer expressions). The catalog entry
    returns the first 200 rows of the clustered order as the
    verifiable witness; at scale the same expression feeds a
    repartitionByRange + sortWithinPartitions write.

    Pure integer bit math in one codegen'd projection; the top-200 cut
    is TakeOrderedAndProject — no full sort materializes."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.select(
            "event_id",
            "user_id",
            F.expr(_zorder_expr(_Z_A, _Z_B)).alias("zval"),
        )
        .orderBy("zval", "event_id")
        .limit(200)
    )


@_q(
    "asof_forward_purchase_window",
    """
    SELECT c.event_id,
           CASE WHEN p.ts <= c.ts + INTERVAL 10 MINUTE
                THEN p.event_id END AS purchase_id_asof,
           CASE WHEN p.ts <= c.ts + INTERVAL 10 MINUTE
                THEN p.value END AS purchase_value_asof
    FROM (SELECT * FROM events WHERE event_type = 'click') c
    ASOF LEFT JOIN (SELECT * FROM events WHERE event_type = 'purchase') p
      ON c.user_id = p.user_id AND p.ts >= c.ts
    """,
)
def asof_forward_purchase_window(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Forward as-of join with tolerance — pandas ``merge_asof``
    (direction="forward", tolerance) distributed: each click matched
    to the same user's NEXT purchase, kept only when it lands within
    10 minutes (conversion-window attribution). Same union + window
    sort as the backward as-of (one shuffle on user_id, time traversed
    descending so "last right row seen" is the earliest at-or-after),
    with the matched ts carried so tolerance is a post-filter, not a
    join predicate. Oracle: DuckDB's native ASOF with ``>=`` plus the
    same CASE window."""
    from etl_projects_spark.operators import temporal

    ev = load(spark, sf_dir, "events")
    clicks = ev.filter(F.col("event_type") == "click")
    purchases = ev.filter(F.col("event_type") == "purchase")
    return temporal.asof_join(
        clicks, purchases, on="user_id",
        right_cols=["event_id", "value"], tie_break="event_id",
        direction="forward", tolerance_seconds=600,
    ).select(
        "event_id",
        F.col("event_id_asof").alias("purchase_id_asof"),
        F.col("value_asof").alias("purchase_value_asof"),
    )


@_q(
    "kmv_jaccard_event_types",
    """
    WITH h AS (
      SELECT DISTINCT event_type, md5(CAST(user_id AS VARCHAR)) AS h
      FROM events),
    ranked AS (
      SELECT event_type, h,
             row_number() OVER (PARTITION BY event_type ORDER BY h) AS r
      FROM h),
    sets AS (
      SELECT event_type, list_sort(list(h)) AS hs
      FROM ranked WHERE r <= 64 GROUP BY 1),
    pairs AS (
      SELECT a.event_type AS type_a, b.event_type AS type_b,
             a.hs AS ah, b.hs AS bh,
             list_sort(list_distinct(list_concat(a.hs, b.hs)))[1:64] AS s
      FROM sets a JOIN sets b ON a.event_type < b.event_type)
    SELECT type_a, type_b,
           len(s) AS k_used,
           len(list_filter(s, x -> list_contains(ah, x)
                              AND list_contains(bh, x))) AS n_inter,
           CAST(len(list_filter(s, x -> list_contains(ah, x)
                                   AND list_contains(bh, x))) AS DOUBLE)
             / CAST(len(s) AS DOUBLE) AS jaccard_est
    FROM pairs
    """,
)
def kmv_jaccard_event_types(spark: SparkSession, sf_dir: str) -> DataFrame:
    """KMV (k-minimum-values) sketch Jaccard between the user sets of
    every event-type pair — the mergeable-sketch answer to "how much do
    these two audiences overlap" that never materializes the sets.
    Unlike HLL, KMV with a FIXED hash (md5) is engine-deterministic, so
    this sketch estimate has an exact cross-engine oracle: both engines
    build the same 64 smallest distinct user hashes per type, merge a
    pair's sketches, and count common members of the merged k-min set
    (J ≈ |S∩A∩B| / |S|, Beyer et al.'s unbiased KMV estimator shape).

    Scale: one distinct + one per-type top-k (WindowGroupLimit prunes
    to 64/partition map-side); everything after runs on |types| rows
    of 64-element arrays — the pair join is sketch×sketch, never
    user×user. Sketches this shape union/merge associatively, so at
    100 TB they maintain incrementally per partition."""
    ev = load(spark, sf_dir, "events")
    hashes = ev.select(
        "event_type", F.md5(F.col("user_id").cast("string")).alias("h")
    ).distinct()
    kmin = (
        hashes.select(
            "event_type",
            "h",
            F.row_number()
            .over(W.partitionBy("event_type").orderBy("h"))
            .alias("r"),
        )
        .filter(F.col("r") <= 64)
    )
    sets = kmin.groupBy("event_type").agg(
        F.sort_array(F.collect_list("h")).alias("hs")
    )
    a = sets.select(
        F.col("event_type").alias("type_a"), F.col("hs").alias("ah")
    )
    b = sets.select(
        F.col("event_type").alias("type_b"), F.col("hs").alias("bh")
    )
    pairs = a.join(
        F.broadcast(b), F.col("type_a") < F.col("type_b")
    ).withColumn(
        "s", F.slice(F.array_sort(F.array_union("ah", "bh")), 1, 64)
    )
    inter = F.size(
        F.array_intersect(F.array_intersect("s", "ah"), F.col("bh"))
    )
    return pairs.select(
        "type_a",
        "type_b",
        F.size("s").cast("long").alias("k_used"),
        inter.cast("long").alias("n_inter"),
        (inter.cast("double") / F.size("s").cast("double")).alias(
            "jaccard_est"
        ),
    )


@_q(
    "zonemap_pruning_report",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           min(value) AS vmin, max(value) AS vmax,
           COUNT(*) AS n_rows,
           max(value) < 300.0 AS pruned
    FROM events GROUP BY 1
    """,
)
def zonemap_pruning_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Zone-map (data-skipping) audit: per day-partition min/max of
    `value` plus whether a reader evaluating ``value >= 300`` could
    skip the partition entirely from its footer stats — the report
    that tells you if the table's physical layout actually serves the
    workload's predicates (see zorder_cluster_events for the layout
    that makes these zones tight). min/max of doubles are exact picks,
    so the report hash-matches across engines.

    Scale: at 100 TB this is a parquet-footer/metastore scan, not a
    data scan; the query shape (one aggregate keyed by partition)
    is the same either way."""
    ev = load(spark, sf_dir, "events")
    return ev.groupBy(
        F.to_date("ts").cast("string").alias("day")
    ).agg(
        F.min("value").alias("vmin"),
        F.max("value").alias("vmax"),
        F.count("*").alias("n_rows"),
        (F.max("value") < 300.0).alias("pruned"),
    )


def _bloom_filtered_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The join runtime-bloom-filtering is meant for: a selective
    dimension predicate whose surviving keys prune the FACT scan.
    Built (not materialized) here so tests can pin the injected
    ``might_contain`` filter on the executed plan."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").filter(
        F.col("o_orderpriority") == "1-URGENT"
    )
    return (
        li.join(orders, li.l_orderkey == orders.o_orderkey)
        .groupBy("o_orderpriority")
        .agg(
            F.sum(dec("l_extendedprice")).cast("double").alias("revenue"),
            F.count("*").alias("n_items"),
        )
    )


BLOOM_CONFS = {
    "spark.sql.optimizer.runtime.bloomFilter.enabled": "true",
    # Testdata accommodation ONLY: the default application-side
    # threshold (10 GB scanned) is exactly right at cluster scale and
    # triggers naturally on a 100 TB fact table; sf0.1 never reaches
    # it, so the demo lowers it to 0.
    "spark.sql.optimizer.runtime.bloomFilter.applicationSideScanSizeThreshold": "0",
    # Force the shuffle-join path: with a broadcastable dim the filter
    # is pointless (the hash relation IS the filter). At scale the
    # filtered dim side exceeding the broadcast threshold is the
    # natural state.
    "spark.sql.autoBroadcastJoinThreshold": "-1",
}


@_q(
    "runtime_bloom_join_revenue",
    f"""
    SELECT o_orderpriority,
           CAST(SUM(CAST(l_extendedprice AS {D})) AS DOUBLE) AS revenue,
           COUNT(*) AS n_items
    FROM lineitem JOIN orders ON l_orderkey = o_orderkey
    WHERE o_orderpriority = '1-URGENT'
    GROUP BY 1
    """,
)
def runtime_bloom_join_revenue(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Runtime bloom-filter join pruning (AQE's shuffle-join answer to
    broadcast pruning): Spark builds a bloom filter from the selective
    orders side at runtime and injects ``might_contain(xxhash64(key))``
    into the lineitem SCAN, so ~19/20 of the fact rows die before the
    shuffle instead of after it. Like the salted rewrites, the result
    is bit-identical to the plain join — the oracle is the PLAIN SQL —
    and the plan change is what tests pin.

    The conf context is scoped: the join materializes to scratch while
    the bloom confs are set, then the session is restored, so the
    returned relation is inert to later queries in the same session.
    The scratch path is vintage-stable and OVERWRITTEN per call (the
    bloom join itself must re-execute every invocation — it is the
    thing measured — but a fresh mkdtemp per call would accumulate
    dead result dirs in /tmp forever)."""
    from etl_projects_spark.operators.exec_util import scratch_path

    old = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    out = os.path.join(
        scratch_path(
            "bloom_join",
            os.path.join(sf_dir, "lineitem.parquet"),
            os.path.join(sf_dir, "orders.parquet"),
        ),
        "result",
    )
    try:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v)
        _bloom_filtered_join(spark, sf_dir).write.mode("overwrite").parquet(out)
    finally:
        for k, v in old.items():
            if v is None:
                spark.conf.unset(k)
            else:
                spark.conf.set(k, v)
    return spark.read.parquet(out)


@_q(
    "embedding_norm_topk",
    """
    WITH n AS (
      SELECT vec_id, label, len(embedding) AS dim,
             sqrt(list_reduce(
               list_transform(embedding,
                              x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE)),
               (a, b) -> a + b)) AS l2_norm
      FROM embeddings)
    SELECT vec_id, label, dim, l2_norm
    FROM n ORDER BY l2_norm DESC, vec_id LIMIT 20
    """,
)
def embedding_norm_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding L2-norm outlier scan: the top-20 vectors by norm —
    the sanity probe run before cosine-based dedup/ANN (a handful of
    huge-norm vectors usually means an un-normalized encoder batch or
    corrupted rows, and they poison dot-product top-k). The norm folds
    each vector's squares in POSITION order with a 0-init (0 + s₁ ≡ s₁,
    so Spark's seeded fold and DuckDB's seedless reduce are
    IEEE-identical), making the float fully deterministic; ordering
    ties break on vec_id.

    Scale: row-local JVM higher-order functions over the vector column
    — zero shuffles, zero Python; top-20 via TakeOrderedAndProject."""
    emb = load(spark, sf_dir, "embeddings")
    sq = F.transform(
        "embedding", lambda x: x.cast("double") * x.cast("double")
    )
    norm = F.sqrt(F.aggregate(sq, F.lit(0.0), lambda a, s: a + s))
    return (
        emb.select(
            "vec_id",
            "label",
            F.size("embedding").alias("dim"),
            norm.alias("l2_norm"),
        )
        .orderBy(F.desc("l2_norm"), "vec_id")
        .limit(20)
    )
