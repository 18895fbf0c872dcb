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
import etl_projects_spark.queries_wave31  # noqa: F401
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
    # --- r12 window ------------------------------------------------
    # 1-4: r12 reworks / changed-module consumers.
    # lsh_recall_report's own source changed twice over (r11 ADVICE:
    # the terminal sums are coalesced to 0 so a degenerate empty
    # corpus matches the oracle's zeros; and its jaccard_pairs call
    # no longer pins a cached relation). dedup_jaccard_df_capped is
    # the other catalog consumer of jaccard_pairs' df-cap path, whose
    # per-invocation persist was removed in favor of ReusedExchange
    # (plan-pinned; measured faster). decontaminate_eval_join and
    # substring_span_incremental are the two catalog consumers of
    # dedup.decontaminate_against_index, whose driver snapshot moved
    # from collect()+Rows to toArrow()+createDataFrame (the r11
    # verdict's +0.76 s drift attributed and recovered — exactness
    # regression pins unchanged and green).
    "lsh_recall_report",
    "decontaminate_eval_join",
    "dedup_jaccard_df_capped",
    "substring_span_incremental",
    # 5-8: r12 additions (every addition lands inside the window):
    # ann_recall_report — the ANN family's recall/efficiency audit
    # (exact knn_join ground truth vs single-bucket and Hamming-1
    # multi-probe hyperplane-LSH candidates, r11 VERDICT item 3);
    # ann_ivf_recall_report — the nprobe half of that readout (stored
    # IVF index candidates vs the same exact ground truth, oracle via
    # the assignment/probe-cluster numpy twins);
    # substring_span_rewrite, the span family's REWRITE query
    # (emits the trimmed corpus itself via the merged foreign-span
    # intervals, r11 VERDICT item 4; reconciliation with trim's
    # accounting is test-pinned); and knn_label_purity, the
    # embedding-SPACE quality audit (exact-neighbor label purity@k per
    # probe label — the readout that validates keying SemDeDup/ANN on
    # this space at all).
    "ann_recall_report",
    "ann_ivf_recall_report",
    "substring_span_rewrite",
    "knn_label_purity",
    # 9-23: the ENTIRE remaining r6-era vintage (r11 VERDICT item 1 —
    # the 15 rows queued in r11's window comment, freshness order).
    # After this window no row in the durable record is older than r7.
    "salted_join_lineitem_orders",
    "scd2_apply_orders",
    "snapshot_diff_orders",
    "source_quotes_scan",
    "streaming_incremental_dedup",
    "streaming_interval_join",
    "streaming_quotes_ingest",
    "streaming_stateful_running_totals",
    "struct_to_json",
    "text_repetition_ratio",
    "text_stats",
    "training_shard_write",
    "union_append",
    "warehouse_copy_roundtrip",
    "window_dedup_latest",
    # 24-50: freshness re-checks of the NOW-oldest (r7-era) rows — the
    # first 27 of the 46 in tools/freshness_report.py order, skipping
    # dedup_jaccard_df_capped which already rides at slot 3 (so 28 of
    # the r7 vintage retire this round; the remaining 18 queue for
    # r13: quality_validate_events, range_join_daily_windows,
    # resample_gap_fill, shard_packing, sliding_window_events,
    # sort_limit_topk, stratified_sample_sources,
    # streaming_tumbling_counts, text_bpe_ish_tokens,
    # text_dup_gram_fraction, text_lang_id, text_normalized_dedup,
    # text_pii_redaction, text_quality_score, tumbling_window_events,
    # window_running_order_total, window_top_suppliers_per_nation,
    # winnow_fingerprints).
    "ann_cosine_topk",
    "ann_knn_join",
    "ann_lsh_multiprobe_topk",
    "ann_lsh_topk",
    "asof_click_before_purchase",
    "contamination_probe",
    "control_file_roundtrip",
    "cube_counts",
    "dedup_edit_distance",
    "dedup_embedding_cosine",
    "dedup_exact",
    "dedup_minhash_lsh",
    "dedup_ngram_jaccard",
    "dedup_simhash",
    "embedding_similarity_join",
    "events_sessionize",
    "media_byte_histogram",
    "media_fingerprint",
    "minhash_jaccard_estimate",
    "pack_token_spans",
    "packing_efficiency_report",
    "pivot_status",
    "q10_returned_revenue",
    "q14_type_revenue_share",
    "q4_order_priority",
    "q6_selective_revenue",
    "q7_nation_trade_volume",
]


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2, ordered so
    the checker's 50-query window lands on this round's priorities."""
    ordered = {n: QUERIES[n] for n in _ROUND_PRIORITY if n in QUERIES}
    ordered.update({n: q for n, q in QUERIES.items() if n not in ordered})
    return ordered


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible operators → rows-only check).

    Values registered as zero-arg callables (data-derived twin oracles)
    are resolved HERE — at gate time, against the oracle corpus in
    effect — not at module import (r12 ADVICE: import-time generation
    read parquet + ran matmuls on every import and baked in whatever
    SPARK_GRAFT_ORACLE_SF_DIR said at import). A callable returning
    None (e.g. the corpus is absent or empty) drops the entry — the
    driver then records its weaker rows-only check for that query.
    """
    out: dict[str, str] = {}
    for name, o in ORACLE.items():
        if callable(o):
            o = o()
        if o is not None:
            out[name] = o
    return out
