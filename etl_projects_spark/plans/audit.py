"""Physical-plan audit: assert the plan you wanted, not the one you got.

The engine's perf discipline (SURVEY §4) is that Catalyst owns the
physical strategy — but an operator author still has to CHECK that
filters pushed, dimensions broadcast, and nothing silently fell back
to a cartesian or an interpreted path. This module turns those checks
into inspectable data (and tests/test_plans.py pins them for the
headline queries).

Use during development::

    from etl_projects_spark.plans.audit import audit
    print(audit(my_df))   # {'pushed_filters': True, 'broadcast_joins': 1, ...}
"""

from __future__ import annotations

import re

from pyspark.sql import DataFrame


def plan_string(df: DataFrame, executed: bool = True) -> str:
    qe = df._jdf.queryExecution()
    return qe.executedPlan().toString() if executed else qe.optimizedPlan().toString()


def audit(df: DataFrame) -> dict:
    """Summarize the physical plan's scale-relevant properties."""
    plan = plan_string(df)
    # Stop at end-of-line, not just '>': explain truncates wide schemas
    # (spark.sql.maxMetadataStringLength) and drops the closing '>',
    # which would let the match run across lines and corrupt the audit.
    read_schemas = re.findall(r"ReadSchema: struct<([^>\n]*)", plan)
    return {
        "pushed_filters": bool(re.search(r"PushedFilters: \[[^\]]", plan)),
        "broadcast_joins": plan.count("BroadcastHashJoin"),
        "sortmerge_joins": plan.count("SortMergeJoin"),
        "nested_loop_joins": plan.count("BroadcastNestedLoopJoin"),
        "cartesian": "CartesianProduct" in plan,
        # 'shuffles' counts HASH exchanges only (the keyed
        # repartitions joins/aggs introduce). Range and
        # single-partition exchanges are DIFFERENT regressions —
        # a global sort sneaking in, or a relation collapsing to one
        # task — so they get their own counters; a shuffles=0 pin
        # alone does NOT prove exchange-free (pin the other two where
        # that is the claim).
        "shuffles": plan.count("Exchange hashpartitioning"),
        "range_exchanges": plan.count("Exchange rangepartitioning"),
        "single_exchanges": plan.count("Exchange SinglePartition"),
        "scan_columns": [s.split(",") for s in read_schemas],
        "top_k_pushdown": "TakeOrderedAndProject" in plan,
        "window_group_limit": "WindowGroupLimit" in plan,
        "python_stages": plan.count("ArrowEvalPython")
        + plan.count("MapInPandas")
        + plan.count("FlatMapGroupsInPandas"),
    }


def assert_plan(df: DataFrame, **expectations) -> None:
    """Raise AssertionError unless every expectation holds.

    Keys are :func:`audit` fields; values are exact expected values,
    or for the count fields a ``("<=", n)`` / ``(">=", n)`` tuple.
    """
    got = audit(df)
    for key, want in expectations.items():
        have = got[key]
        if isinstance(want, tuple):
            op, n = want
            ok = have <= n if op == "<=" else have >= n
            assert ok, f"{key}: wanted {op}{n}, plan has {have}"
        else:
            assert have == want, f"{key}: wanted {want!r}, plan has {have!r}"
