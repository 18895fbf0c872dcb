"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``etl_projects_spark.queries`` (and the
extension modules it imports); this file just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import etl_projects_spark.queries_curation  # noqa: F401  (registers into the catalog)
import etl_projects_spark.queries_lifecycle  # noqa: F401
import etl_projects_spark.queries_llm  # noqa: F401
import etl_projects_spark.queries_media  # noqa: F401
import etl_projects_spark.queries_mixing  # noqa: F401
import etl_projects_spark.queries_quality  # noqa: F401
import etl_projects_spark.queries_scale  # noqa: F401
import etl_projects_spark.queries_sql  # noqa: F401
import etl_projects_spark.queries_timeseries  # noqa: F401
import etl_projects_spark.queries_tpch_ext  # noqa: F401
import etl_projects_spark.queries_wave28  # noqa: F401
import etl_projects_spark.queries_wave29  # noqa: F401
import etl_projects_spark.queries_wave30  # noqa: F401
from etl_projects_spark.queries import ORACLE, QUERIES
from etl_projects_spark.queries import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary (scan → filter → 8-agg groupBy)."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


# Coverage rotation: the external checker samples the FIRST 50 entries
# of queries() (CORRECTNESS_r01 == first 50 of r1's dict order, exactly).
# With 100 catalog queries that leaves half unproven per round, so the
# order is managed explicitly: queries fixed since the last round lead
# (their repaired oracles need fresh rows), then every query with no
# CORRECTNESS row yet, then the previously-green remainder. Rounds
# accumulate: r1 proved the first-50 half, r2's window covers the rest.
#
# r1-r5 cumulative: 241/241 driver-green (every query has a row from
# the round its then-current shape was last checked). From r6 on the
# window carries three kinds of entries, in this order:
#   1. queries REWORKED after their last driver row (stale rows);
#   2. new additions (every addition must land inside the window);
#   3. freshness re-checks of the OLDEST rows (r1-era first).
# The churn rule is machine-enforced: tools/window_hashes.py records
# the (source, oracle) hash each window proved, and
# tests/test_window_guard.py fails if any query whose hash changed
# since its recorded window is not in the current first 50.
_ROUND_PRIORITY = [
    # --- r11 window ------------------------------------------------
    # 1-2: r11 reworks. substring_span_pairs dropped its per-invocation
    # persist (r10 ADVICE leaked-pin class; the self-join now rides
    # AQE stage reuse — plan-pinned in tests/test_plans.py), so its
    # source hash changed and it re-proves here. operators/dedup.py
    # changed (r10 ADVICE: the eval-gram snapshot now collect()s Rows
    # instead of round-tripping toPandas(), closing the
    # nullable-long→float64 corruption window, and enforces the
    # small-eval contract with EVAL_SNAPSHOT_MAX_ROWS) —
    # decontaminate_eval_join is that function's only catalog
    # consumer, so it re-proves on the changed path.
    "substring_span_pairs",
    "decontaminate_eval_join",
    # 3-4: r11 additions (every addition lands inside the window):
    # substring_span_prune — the exact-substring family's ACTION query
    # (per-doc keep verdict, min-doc_id canonical holder per span
    # group), completing report → pairs → prune (r10 VERDICT item 3) —
    # and substring_span_trim, the SPAN-level removal accounting
    # (merged-interval token coverage of foreign spans, the Lee et al.
    # remove-the-substring mode prune's docstring scoped out).
    "substring_span_prune",
    "substring_span_trim",
    # 5-6: r11 additions — lsh_recall_report (queries_wave30.py), the
    # banded-LSH candidate-stage recall/efficiency audit against exact
    # df-capped ground truth on the shared sets artifact; and
    # substring_span_incremental, the span family's stored-index
    # admission path (persisted gbucket-partitioned span index +
    # decontaminate_against_index probe).
    "lsh_recall_report",
    "substring_span_incremental",
    # 7-23: the ENTIRE remaining r5-era vintage (r10 VERDICT item 1 —
    # the 17 oldest rows in the record, tools/freshness_report.py
    # order). After this window no row in the durable record is older
    # than r6.
    "range_interval_window_user",
    "regr_trend_nation",
    "revenue_proration_daily",
    "rolling_7day_revenue",
    "rolling_corr_value_count",
    "rolling_wau_daily",
    "seasonal_dow_index",
    "session_path_topk",
    "session_window_builtin",
    "share_of_parent_revenue",
    "shuffle_hash_join_hint",
    "token_budget_allocator",
    "try_scalar_functions",
    "user_activity_entropy",
    "values_clause_dim_join",
    "variant_shred_props",
    "window_nth_cume",
    # 24-50: freshness re-checks of the NOW-oldest (r6-era) rows — the
    # first 27 of the 42 in tools/freshness_report.py order (r10
    # VERDICT item 1: retire the r6 vintage next). The remaining 15
    # queue for r12: salted_join_lineitem_orders, scd2_apply_orders,
    # snapshot_diff_orders, source_quotes_scan,
    # streaming_incremental_dedup, streaming_interval_join,
    # streaming_quotes_ingest, streaming_stateful_running_totals,
    # struct_to_json, text_repetition_ratio, text_stats,
    # training_shard_write, union_append, warehouse_copy_roundtrip,
    # window_dedup_latest.
    "agg_count_distinct",
    "array_to_json",
    "cast_all_to_string",
    "date_parts",
    "dw_promotion_gate",
    "embedding_pca_project",
    "engine_sql_file_build",
    "format_column_names",
    "gopher_repetition_filter",
    "join_anti",
    "join_full_outer",
    "join_inner",
    "join_left_outer",
    "join_semi",
    "json_explode_props",
    "literal_batch_stamp",
    "media_decode_stats",
    "media_frame_sample",
    "media_resize_stub",
    "mixture_weights_temperature",
    "pipeline_dag_build",
    "q1_pricing_summary",
    "q3_top_orders",
    "q5_local_supplier_volume",
    "quality_monitor_gate",
    "repartition_partition_files",
    "salted_agg_order_revenue",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the checker's 50-query window lands on this round's priorities."""
    ordered = {n: QUERIES[n] for n in _ROUND_PRIORITY if n in QUERIES}
    ordered.update({n: q for n, q in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible operators → rows-only check)."""
    return dict(ORACLE)
