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
import etl_projects_spark.queries_wave32  # noqa: F401
import etl_projects_spark.queries_wave33  # noqa: F401
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
    # --- r15 window (OPTIMIZATION round) ---------------------------
    # The build wave's four additions and the three r8-vintage
    # freshness rows keep their slots; the remainder fronts the
    # queries whose ENGINE MODULES this optimization round touched
    # (generator-filter fix in dedup.py/_contam_grams/DSIR evb — see
    # OPTIMIZATION_r15.md), so every reshaped plan gets a fresh
    # driver row. The r14-proven cosine family rotates out (green
    # r14 rows, sources untouched).
    # 1: the r15 ADDITION — the composed curation funnel (also the
    # transitive consumer of every optimized stage: quality → dedup
    # keep-list → decontaminate → DSIR select → pack → promotion).
    "curation_pipeline_run",
    # 2-4: the last three r8-vintage freshness rows (r14 VERDICT item
    # 1 — completes the three-round rotation; after this round the
    # durable record's oldest vintage is r9, and the standing rule is
    # "nothing older than 6 rounds").
    "vocab_top_terms",
    "window_rank_metrics",
    "window_user_value_delta",
    # 5: the second r15 ADDITION — IVF-PQ ANN through the materialized
    # index (r14 VERDICT item 3): ADC shortlist via a codegen'd
    # LUT-fold over the code column, exact re-rank of the shortlist;
    # oracle inlines the numpy twin's bit-identical shortlist.
    "ann_ivf_pq_topk",
    # 6: the recall readout of the PQ candidate stage (same r14 item
    # — what the quantization costs before the exact re-rank).
    "ann_ivf_pq_recall_report",
    # 7: the fourth r15 ADDITION — DoReMi-style domain reweighting
    # (r14 VERDICT item 4): multiplicative-weights over per-source
    # excess LM-surprise, exact-integer iteration with floor-quantized
    # exp. lm_surprise_filter (below, freshness block) doubles as the
    # named consumer of the shared surprise_relation extraction.
    "doremi_domain_reweight",
    # 8-13: the span family — consumers of the r15 optimization's
    # dedup.py changes (word_shingles explode_outer+filter,
    # positional_shingle_hashes explode_outer+filter: the
    # InferFiltersFromGenerate fix; values byte-identical, plans
    # reshaped).
    "substring_span_report",
    "substring_span_pairs",
    "substring_span_prune",
    "substring_span_trim",
    "substring_span_rewrite",
    "substring_span_incremental",
    # 14-15: consumers of the r15 DSIR evb rework (posexplode instead
    # of explode(transform(sequence→struct)) — same pos values, same
    # fold order, same bytes).
    "dsir_importance_weights",
    "dsir_select",
    # 16-18: consumers of the _contam_grams explode_outer fix
    # (queries_curation.py).
    "decontaminate_eval_join",
    "decontaminate_train_prune",
    "split_contamination_report",
    # 19-23: dedup-family consumers of the word_shingles /
    # positional_shingle_hashes reshape (sets artifact builder,
    # minhash chain, LSH audits, winnowing).
    "dedup_ngram_jaccard",
    "dedup_minhash_lsh",
    "dedup_incremental_batch",
    "lsh_recall_report",
    "winnow_fingerprints",
    # 24-30: this optimization round's per-query rewrites — the
    # exchange-sharing q21 (repartition on l_orderkey feeds both agg
    # levels and both joins), the one-pass referential-integrity
    # audit (fact scanned once, stack-pivoted report rows), and the
    # fan_out family (single-row-group scans parallelized ahead of
    # per-row compute; values byte-identical, plans reshaped).
    "q21_sole_returning_supplier",
    "referential_integrity_report",
    "text_repetition_ratio",
    "gopher_repetition_filter",
    "text_token_entropy",
    "try_scalar_functions",
    "pipeline_training_corpus",
    # 31-50: freshness rotation — the oldest r9-vintage rows in
    # tools/freshness_report.py order (engine_partitioned_incremental
    # doubles as the named consumer of the additive
    # LakeEngine.load_dataframe change).
    "asof_forward_purchase_window",
    "cdc_changelog_apply",
    "chi_square_type_by_dow",
    "chunk_dedup_rewrite",
    "compact_small_files",
    "correlation_matrix_lineitem",
    "data_card_report",
    "dedup_component_size_histogram",
    "dedup_graph_triangles",
    "dedup_prefix_containment",
    "engine_partitioned_incremental",
    "events_debounce",
    "ewma_daily_value",
    "fertility_by_source",
    "filter_funnel_report",
    "fixed_size_per_group_sample",
    "higher_order_array_funcs",
    "incremental_agg_maintenance",
    "jsonl_gz_roundtrip",
    "k_anonymity_audit",
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
