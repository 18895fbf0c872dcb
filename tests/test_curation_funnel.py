"""Composed curation funnel (queries_wave33): stage-flow invariants,
catalog-handoff proof, pin hygiene, and the loud empty-corpus abort.
Value correctness is oracle-gated (driver window + cross-SF rows);
these tests pin the CONTRACTS between the stages."""

from __future__ import annotations

import math
import os

import pytest
from pyspark.sql import functions as F

import __spark_entry__ as entrymod
from etl_projects_spark.queries_mixing import PACK_BUDGET
from etl_projects_spark.queries_wave31 import DSIR_TARGET_SOURCE
from etl_projects_spark.queries_wave32 import DSIR_SELECT_DEN

SF_DIR = "/root/testdata/sf0.001"
QS = entrymod.queries()


def _report(spark) -> dict[str, tuple[int, int]]:
    rows = QS["curation_pipeline_run"](spark, SF_DIR).collect()
    return {r.stage: (r.n_rows, r.n_tokens) for r in rows}


def test_funnel_row_flow_invariants(spark):
    """The funnel only ever REMOVES documents: rows and tokens are
    non-increasing through stages 1→4; packing conserves tokens
    exactly (stage5/6 tokens == the selected tokens); the shard count
    is exactly ceil(selected_tokens / PACK_BUDGET)."""
    rep = _report(spark)
    assert set(rep) == {
        "stage0_raw", "stage1_quality", "stage2_dedup", "stage3_decontam",
        "stage4_dsir_select", "stage5_pack", "stage6_shards",
    }
    chain = ["stage0_raw", "stage1_quality", "stage2_dedup", "stage3_decontam"]
    for a, b in zip(chain, chain[1:]):
        assert rep[b][0] <= rep[a][0], f"{b} grew rows vs {a}"
        assert rep[b][1] <= rep[a][1], f"{b} grew tokens vs {a}"
    # Selection draws from the stage-3 pool (minus the target slice).
    assert rep["stage4_dsir_select"][1] <= rep["stage3_decontam"][1]
    sel_tokens = rep["stage4_dsir_select"][1]
    assert rep["stage5_pack"][1] == sel_tokens, "packing lost/made tokens"
    assert rep["stage6_shards"][1] == sel_tokens
    assert rep["stage6_shards"][0] == math.ceil(sel_tokens / PACK_BUDGET)
    assert sel_tokens > 0, "test corpus must flow through to a shard"


def test_funnel_budget_and_pool_semantics(spark):
    """The DSIR stage's exact-integer budget: selected tokens stay
    within total_pool/DEN plus one document's overshoot (the last
    selected doc may cross the line — the 'select while before < t/4'
    rule), and the pool excludes BOTH the eval stand-in docs (gone at
    stage 3) and the target source (reference distribution, not
    trainable pool)."""
    _report(spark)  # ensure built + registered
    sel = spark.table("curation_pool_selected")
    pool = spark.table("curation_pool_decontam").filter(
        F.col("source") != DSIR_TARGET_SOURCE
    )
    t = pool.agg(F.sum("n_tokens")).collect()[0][0]
    got = sel.agg(
        F.sum("n_tokens").alias("s"), F.max("n_tokens").alias("m")
    ).collect()[0]
    assert got.s * DSIR_SELECT_DEN < t + got.m * DSIR_SELECT_DEN, (
        "selection overshot the token budget by more than one document"
    )
    assert sel.filter(F.col("source") == DSIR_TARGET_SOURCE).count() == 0
    assert sel.filter(F.col("doc_id") % 101 == 0).count() == 0


def test_funnel_catalog_handoffs_and_pin_hygiene(spark):
    """Every stage table is a REGISTERED external table after a run
    (the cross-stage handoff is through the Spark catalog, not passed
    DataFrames), and the selection stage's scoped pin does not outlive
    the build (release_scope in the build's finally)."""
    from etl_projects_spark.operators.exec_util import _SCOPED_PINS
    from etl_projects_spark.queries_wave33 import _SELECT_SCOPE

    _report(spark)
    for name in (
        "curation_pool_quality",
        "curation_pool_dedup",
        "curation_pool_decontam",
        "curation_pool_selected",
        "curation_dw_packed",
    ):
        assert spark.catalog.tableExists(name), f"{name} not registered"
    assert not any(k[1] == _SELECT_SCOPE for k in _SCOPED_PINS), (
        "the funnel's selection pin survived the build"
    )


def test_funnel_report_plan_shape(spark):
    """Warm-path plan: the report is stage-table aggregates — no
    Python stages, no cartesian product (the 1-row token total rides
    a broadcast), and the stage tables are read back as parquet scans
    through the catalog entries."""
    from etl_projects_spark.plans.audit import assert_plan, plan_string

    df = QS["curation_pipeline_run"](spark, SF_DIR)
    assert_plan(df, python_stages=0, cartesian=False)
    assert plan_string(df).count("Scan parquet") >= 6, (
        "report must read the registered stage tables, not recompute"
    )


def test_funnel_aborts_loudly_on_empty_selection(spark, tmp_path):
    """A corpus the quality filter empties out must ABORT the build at
    the gated DW promotion (min_count_monitor) — never land an empty
    training corpus silently. The abort surfaces as PipelineRunner's
    step failure with the promotion block as its cause chain."""
    docs = spark.createDataFrame(
        [
            (i, "kurz und nicht englisch text hier", "de", f"src{i % 3}", 33)
            for i in range(30)
        ],
        "doc_id long, text string, lang string, source string, n_chars long",
    )
    sf = str(tmp_path / "sf_empty")
    docs.coalesce(1).write.parquet(os.path.join(sf, "documents.parquet"))
    with pytest.raises(RuntimeError, match="pack_promote"):
        QS["curation_pipeline_run"](spark, sf)
