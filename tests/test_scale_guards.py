"""Mechanical guards for SCALE.md's held-everywhere invariants.

`tests/test_plans.py` pins the physical plans of specific queries;
these guards pin the SOURCE-LEVEL invariants across the whole engine,
so a future edit can't quietly add a driver-side materialization, a
row-at-a-time UDF, or an RDD hop without consciously updating the
documented allowlist here (and its justification in SCALE.md). AST,
not grep: comments and docstrings that merely mention an API don't
count as call sites.
"""

from __future__ import annotations

import ast
import os

ROOT = os.path.join(os.path.dirname(__file__), "..", "etl_projects_spark")


def _engine_sources():
    for dirpath, _dirs, files in os.walk(ROOT):
        if "__pycache__" in dirpath:
            continue
        for fname in sorted(files):
            if not fname.endswith(".py"):
                continue
            path = os.path.join(dirpath, fname)
            rel = os.path.relpath(path, ROOT).replace(os.sep, "/")
            yield rel, ast.parse(open(path).read())


def _method_call_sites(method_names: set[str]) -> dict[str, int]:
    """Per-file count of ``<expr>.<name>(...)`` call sites."""
    out: dict[str, int] = {}
    for rel, tree in _engine_sources():
        n = sum(
            1
            for node in ast.walk(tree)
            if isinstance(node, ast.Call)
            and isinstance(node.func, ast.Attribute)
            and node.func.attr in method_names
        )
        if n:
            out[rel] = n
    return out


def test_driver_side_materialization_allowlist():
    """SCALE.md invariant 1: every collect()/toPandas()/toArrow()
    pulls a BOUNDED artifact documented as a contract. A new site must
    be justified in SCALE.md ('Known bounded-driver contracts') and
    added here. (toArrow tracked since r12 — it is the same driver
    materialization as collect, just Arrow-batched.)"""
    allowed = {
        # JSON key-name collect + bounded type sample (P7 inference).
        "operators/dataframe_ops.py": 2,
        # gbucket pruning: (a) the eval-gram snapshot (toArrow since
        # r12 — exact int64 + nulls, no pandas hop) — small by the
        # decontamination contract, and the same bytes the F.broadcast
        # ships through the driver anyway; (b)+(c) distinct buckets of
        # the eval grams — ≤ GRAM_INDEX_BUCKETS rows by pigeonhole —
        # one collect per branch of the r16 stable_input split (the
        # stable path collects the same bounded bucket set from the
        # caller's already-stable relation instead of a fresh
        # snapshot).
        "operators/dedup.py": 3,
        # IVF+PQ codebook sample (bounded rows, ONE pull via
        # _sample_matrix since r15), single probe vectors, the SHARED
        # bounded probe-matrix collect behind knn_join and
        # score_all_probes (_probe_matrix_broadcast — one site since
        # the r13 kernel extraction), PCA basis sample,
        # margin_report's default probe draw (n_probes rows collected
        # ONCE so both kernel consumers reuse a local relation instead
        # of re-running the TakeOrdered corpus scan — r14 review), and
        # the IVF-PQ ADC shortlist (exactly PQ_SHORTLIST rows, so the
        # re-rank scan gets a pushed-down IN filter).
        "operators/similarity.py": 6,
        # 1-row skew-stats aggregate.
        "operators/skew.py": 1,
        # S6 control-file roundtrip: a handful of control rows.
        "queries_lifecycle.py": 1,
        # curriculum_schedule's ONE collected aggregate row (the r8
        # exchange cut folded thresholds/offsets/boundaries into it).
        "queries_curation.py": 1,
        # ann_ivf_topk's single probe vector.
        "queries_llm.py": 1,
        # ann_ivf_pq_topk's single probe vector.
        "queries_wave33.py": 1,
        # ann_ivf_recall_report's probe matrix — the SAME bounded
        # eval-set contract as knn_join's (vec_id % 100 probes).
        "queries_wave30.py": 1,
        # substring_span_incremental: (a) the batch-modulus sizing —
        # ONE 1-row aggregate (count + token upper bound) over the
        # 2-column documents projection, the skew-stats class; (b) the
        # batch's OWN token-ub 1-row aggregate (r13 review: the
        # distributed pre-bound that runs BEFORE the snapshot — the
        # corpus-mean modulus argument alone could be beaten by a
        # skewed residue class); (c) the r13 single batch-span
        # snapshot (toArrow), taken only after (b) passes, with
        # decontaminate's loud 5M bound re-checked on the local
        # relation as the backstop.
        "queries_wave29.py": 3,
    }
    got = _method_call_sites({"collect", "toPandas", "toArrow"})
    assert got == allowed, (
        f"driver-side materialization sites changed: {got} != {allowed} — "
        "if the new site pulls a bounded artifact, document it in "
        "SCALE.md 'Known bounded-driver contracts' and update this "
        "allowlist; if it can grow with the data, redesign it."
    )


def test_no_row_at_a_time_python_udfs():
    """SCALE.md invariant 4: Python only in Arrow batches. Row-at-a-time
    ``udf(...)`` is 10-100x slower and has no place in the engine
    (pandas_udf / mapInPandas / applyInPandas are the sanctioned
    Python surfaces)."""
    got = _method_call_sites({"udf"})
    for rel, tree in _engine_sources():
        n = sum(
            1
            for node in ast.walk(tree)
            if isinstance(node, ast.Call)
            and isinstance(node.func, ast.Name)
            and node.func.id == "udf"
        )
        if n:
            got[rel] = got.get(rel, 0) + n
    assert got == {}, f"row-at-a-time Python UDFs introduced: {got}"


def test_rdd_surface_is_partition_introspection_only():
    """DataFrame-first: the only .rdd uses are getNumPartitions reads
    (adaptive repartition / fan_out), never RDD compute hops."""
    bad: dict[str, int] = {}
    for rel, tree in _engine_sources():
        for node in ast.walk(tree):
            if not (isinstance(node, ast.Attribute) and node.attr == "rdd"):
                continue
            # benign shape: <df>.rdd.getNumPartitions() — the parent
            # Call is matched separately below; here flag any .rdd
            # whose enclosing expression is not that exact chain.
            bad[rel] = bad.get(rel, 0) + 1
        for node in ast.walk(tree):
            if (
                isinstance(node, ast.Call)
                and isinstance(node.func, ast.Attribute)
                and node.func.attr == "getNumPartitions"
                and isinstance(node.func.value, ast.Attribute)
                and node.func.value.attr == "rdd"
            ):
                bad[rel] -= 1
                if not bad[rel]:
                    del bad[rel]
    assert bad == {}, f"RDD compute surface introduced: {bad}"


def test_cross_join_sites_are_broadcast_bounded_relations():
    """SCALE.md invariant 2: crossJoin only ever broadcasts tiny
    bounded relations (corpus totals, thresholds, codebooks). Pin the
    count per file so a new cartesian must be consciously justified
    (test_plans.py separately pins cartesian=False on executed
    plans)."""
    got = _method_call_sites({"crossJoin"})
    allowed = {
        "queries_curation.py": 2,
        "queries_llm.py": 7,
        "queries_mixing.py": 1,
        # queries_quality.py dropped to 0 in r15: the referential-
        # integrity report's count-crossJoin-orphans shape became a
        # one-pass left-join + stack audit (no cartesian at all).
        "queries_sql.py": 2,
        "queries_timeseries.py": 2,
        # dsir weights (r16 shape): the 1-row (nt, nr) totals
        # aggregate broadcast onto the ≤DSIR_BUCKETS-row model
        # relation, and the 1-row dense bucket→lnr model array
        # broadcast onto the pool for per-row scoring — both the
        # token_budget_allocator class. (dsir_select's former 1-row
        # total crossJoin moved into prefix_sum's offsets broadcast.)
        "queries_wave31.py": 2,
        # curation_pipeline_run: the 1-row raw-corpus token total
        # broadcast onto the 7-row stage report for token_keep_rate.
        "queries_wave33.py": 1,
    }
    assert got == allowed, (
        f"crossJoin sites changed: {got} != {allowed} — a new site must "
        "broadcast a bounded (usually 1-row) relation; update the "
        "allowlist with why."
    )
