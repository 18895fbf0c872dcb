"""Plan regressions: pin the physical properties the headline queries
were tuned for — pushed filters, broadcast dimensions, bounded
shuffles, top-k pushdown, pruned scans."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from etl_projects_spark.plans.audit import assert_plan, audit

SF_DIR = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_q1_pushes_filter_and_prunes(spark):
    df = QS["q1_pricing_summary"](spark, SF_DIR)
    a = audit(df)
    assert a["pushed_filters"]
    # Scan must not read columns the query never touches.
    assert all("l_partkey" not in cols for cols in a["scan_columns"])
    assert not a["cartesian"]


def test_q3_q5_broadcast_dimensions(spark):
    for name in ("q3_top_orders", "q5_local_supplier_volume", "q10_returned_revenue"):
        assert_plan(QS[name](spark, SF_DIR), cartesian=False,
                    broadcast_joins=(">=", 1))


def test_topk_uses_take_ordered(spark):
    assert_plan(QS["sort_limit_topk"](spark, SF_DIR), top_k_pushdown=True)


def test_grouped_topk_uses_window_group_limit(spark):
    assert_plan(QS["window_top_suppliers_per_nation"](spark, SF_DIR),
                window_group_limit=True)


def test_text_ops_stay_jvm_side(spark):
    for name in ("text_stats", "text_quality_score", "text_lang_id"):
        assert_plan(QS[name](spark, SF_DIR), python_stages=0)


def test_scan_agg_single_shuffle(spark):
    # Pure scan→groupBy queries must shuffle at most once.
    for name in ("q1_pricing_summary", "q6_selective_revenue"):
        assert_plan(QS[name](spark, SF_DIR), shuffles=("<=", 1))


def test_bm25_two_shuffles_no_python(spark):
    assert_plan(QS["bm25_retrieval"](spark, SF_DIR),
                python_stages=0, shuffles=("<=", 2), top_k_pushdown=True)


def test_knn_join_single_python_stage(spark):
    # One mapInPandas over the corpus; no corpus-sized shuffle — the
    # only exchange feeds the final queries·k·partitions window.
    assert_plan(QS["ann_knn_join"](spark, SF_DIR),
                python_stages=1, cartesian=False)


def test_incremental_dedup_broadcasts_batch(spark):
    # The batch probes the stored index via broadcast: the index side
    # must never shuffle.
    assert_plan(QS["dedup_incremental_batch"](spark, SF_DIR),
                broadcast_joins=(">=", 1), cartesian=False)


def test_pack_token_spans_no_global_window(spark):
    from etl_projects_spark.plans.audit import plan_string
    df = QS["pack_token_spans"](spark, SF_DIR)
    # The two-phase prefix sum range-partitions; a naive global-window
    # implementation would show an Exchange SinglePartition feeding
    # the full corpus window.
    plan = plan_string(df)
    assert "rangepartitioning" in plan, "expected the range-partitioned scan phase"
    assert_plan(df, python_stages=0, cartesian=False)
