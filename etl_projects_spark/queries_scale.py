"""Query-catalog entries for the skew-mitigation operators and the
composite training-data pipeline.

Salting is a pure plan rewrite — results are bit-identical to the
unsalted equivalent, so the oracles are the PLAIN SQL forms: the
driver proves the rewrite changes the shuffle, not the answer.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup, skew, text
from etl_projects_spark.queries import D, _q, dec, load


@_q(
    "salted_agg_order_revenue",
    f"""
    SELECT o_orderstatus,
           CAST(SUM(CAST(o_totalprice AS {D})) AS DOUBLE) AS revenue,
           SUM(1) AS n_orders
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
    a hot order key spreads over 8 reducers. Same rows as the plain
    join — the aggregate on top makes the oracle compact."""
    li = load(spark, sf_dir, "lineitem")
    orders = load(spark, sf_dir, "orders").withColumnRenamed(
        "o_orderkey", "l_orderkey"
    )
    joined = skew.salted_join(li, orders.select("l_orderkey", "o_totalprice"),
                              on="l_orderkey", salt=8)
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
    shuffle (prune early), the group relation joins back broadcast."""
    docs = load(spark, sf_dir, "documents")
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


@_q("approx_distinct_users_daily")  # sketch output — no exact oracle by design
def approx_distinct_users_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """HyperLogLog++ distinct users per day (`approx_count_distinct`,
    2% rsd): the bounded-memory sketch that replaces exact
    count-distinct at 100 TB (exact = full shuffle of every user id;
    HLL = 1 KB-scale sketch per group, map-side mergeable). Accuracy
    bound pinned by tests/test_sketches.py against the exact count."""
    ev = load(spark, sf_dir, "events")
    return (
        ev.groupBy(F.to_date("ts").alias("day"))
        .agg(F.approx_count_distinct("user_id", 0.02).alias("approx_users"))
    )
