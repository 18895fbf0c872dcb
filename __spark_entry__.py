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
    # --- r8 window -------------------------------------------------
    # 1-33: the ENTIRE remaining r2-era vintage (r7 VERDICT item 1 —
    # the 33 oldest rows in the record, tools/freshness_report.py
    # order). Hash-guard-verified unchanged since their r2 proofs, but
    # those predate the r3+ oracle-harness hardening; after this
    # window no row in the record is older than r3.
    "array_agg_customer_priorities",
    "conditional_agg_priority_matrix",
    "date_functions_orders",
    "except_lost_customers",
    "exists_big_lineitem_orders",
    "grouping_sets_status_priority",
    "intersect_repeat_customers",
    "join_right_outer",
    "math_functions_balance",
    "ntile_customer_quartiles",
    "null_handling_functions",
    "percentiles_order_value",
    "q11_important_parts",
    "q12_shipmode_priority",
    "q13_order_count_distribution",
    "q15_top_supplier",
    "q16_supplier_part_counts",
    "q17_small_quantity_revenue",
    "q18_large_orders",
    "q19_disjunctive_revenue",
    "q20_part_promotion_suppliers",
    "q21_sole_returning_supplier",
    "q22_dormant_customers",
    "q2_min_acctbal_supplier",
    "q8_market_share",
    "q9_product_profit",
    "rollup_revenue",
    "scalar_subquery_pricey_parts",
    "string_functions_customer",
    "unpivot_part_measures",
    "vocab_top_terms",
    "window_rank_metrics",
    "window_user_value_delta",
    # 34-36: r8 reworks.
    #   curriculum_schedule — exchange cut (r7 VERDICT item 3): the
    #     quartile thresholds, per-bucket rank offsets, and prefix-sum
    #     boundaries now fold into ONE collected aggregate over the
    #     bounded cume-count relation; in-plan exchanges 9 → 3 (pinned
    #     in tests/test_plans.py), and the prefix sum's separate
    #     approxQuantile corpus pass is gone.
    #   decontaminate_eval_join / split_contamination_report — the
    #     train-gram index is now stored partitioned on
    #     pmod(xxhash64(gram), 64) and the eval probe statically
    #     prunes to its grams' buckets (r7 VERDICT item 4; plan-pinned
    #     PartitionFilters). Same grams, new layout + artifact key —
    #     both consumers re-prove on the bucketed artifact.
    "curriculum_schedule",
    "decontaminate_eval_join",
    "split_contamination_report",
    # 37: r8 addition (inside the window, per the cap rule):
    #   decontaminate_train_prune — the train-side keep-list (the
    #     corpus-pruning deliverable; linear train scan + broadcast
    #     eval gram set, the mirror shape of the eval-side probe).
    "decontaminate_train_prune",
    # 38-50: freshness re-checks of the NOW-oldest (r3-era) rows — the
    # first 13 of the 32 in tools/freshness_report.py order. The
    # remaining 19 queue for r9: jsonl_gz_roundtrip,
    # layer_format_policy, map_functions_props, merge_upsert_orders,
    # neardup_rate_by_source, ngram_bigram_topk, ohlc_hourly_events,
    # pipeline_training_corpus, posexplode_doc_tokens, profile_orders,
    # quality_violation_counts, retention_cohorts, struct_to_string,
    # text_token_entropy, tfidf_top_terms, union_distinct_keys,
    # window_first_last_order, window_percent_rank,
    # zorder_cluster_events.
    "anomaly_zscore_daily",
    "bm25_retrieval",
    "bucketed_join_revenue",
    "cooccurrence_pmi_topk",
    "dedup_keep_best_quality",
    "dedup_keep_list",
    "dedup_minhash_components",
    "doc_length_percentile_filter",
    "embedding_centroids_by_label",
    "embedding_quantize_int8",
    "exact_distinct_users_daily",
    "funnel_user_conversion",
    "histogram_order_totals",
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
