"""Wave-28 semantic invariants — properties the oracle hash can't
express directly (cross-row conservation laws, dominance soundness,
bound checks), asserted at sf0.001.
"""

from __future__ import annotations

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402

SF = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_token_budget_conserved(spark):
    """Largest-remainder allocation must hit the budget EXACTLY —
    the property floor/round splits lose."""
    rows = QS["token_budget_allocator"](spark, SF).collect()
    assert sum(r["alloc"] for r in rows) == 1_000_000
    # every source gets within 1 of its proportional share's floor
    tot = sum(r["chars"] for r in rows)
    for r in rows:
        base = (1_000_000 * r["chars"]) // tot
        assert r["alloc"] in (base, base + 1)


def test_interval_coverage_bounds(spark):
    """Merged coverage is bounded below by the longest single interval
    and above by the sum of interval lengths; island count ≤ events."""
    from etl_projects_spark.queries import load
    from pyspark.sql import functions as F

    got = {
        r["user_id"]: r
        for r in QS["interval_coverage_user"](spark, SF).collect()
    }
    ev = load(spark, SF, "events").select(
        "user_id", ((F.col("event_id") % 300 + 60) * 1_000_000).alias("d")
    )
    per_user = {
        r["user_id"]: (r["n"], r["sum_d"], r["max_d"])
        for r in ev.groupBy("user_id")
        .agg(
            F.count(F.lit(1)).alias("n"),
            F.sum("d").alias("sum_d"),
            F.max("d").alias("max_d"),
        )
        .collect()
    }
    assert set(got) == set(per_user)
    for uid, (n, sum_d, max_d) in per_user.items():
        r = got[uid]
        assert 1 <= r["n_islands"] <= n
        assert max_d <= r["covered_us"] <= sum_d


def test_rolling_wau_dominates_dau(spark):
    """Trailing-7-day distinct users ≥ same-day distinct users, and is
    monotone-bounded by the 7-day sum of DAUs."""
    from etl_projects_spark.queries import load
    from pyspark.sql import functions as F

    wau = {r["day"]: r["wau"] for r in QS["rolling_wau_daily"](spark, SF).collect()}
    ev = load(spark, SF, "events")
    dau = {
        str(r["day"]): r["dau"]
        for r in ev.groupBy(F.col("ts").cast("date").alias("day"))
        .agg(F.countDistinct("user_id").alias("dau"))
        .collect()
    }
    assert set(wau) == set(dau)
    for day in wau:
        assert wau[day] >= dau[day]


def test_pareto_frontier_sound_and_complete(spark):
    """No frontier part is dominated; every non-frontier part is
    dominated by some frontier part (brute-force check at sf0.001)."""
    from etl_projects_spark.queries import load
    from pyspark.sql import functions as F

    front = QS["pareto_frontier_parts"](spark, SF).collect()
    part = load(spark, SF, "part").select(
        "p_partkey",
        F.col("p_retailprice").cast("decimal(18,2)").alias("price"),
        "p_size",
    )
    allp = [(r["p_partkey"], float(r["price"]), r["p_size"]) for r in part.collect()]
    fset = {r["p_partkey"] for r in front}

    def dominates(a, b):
        return (
            a[1] <= b[1]
            and a[2] >= b[2]
            and (a[1] < b[1] or a[2] > b[2])
        )

    fpts = [p for p in allp if p[0] in fset]
    for f in fpts:
        assert not any(dominates(o, f) for o in allp), f
    for p in allp:
        if p[0] not in fset:
            assert any(dominates(f, p) for f in fpts), p


def test_cusum_closes_at_zero(spark):
    """By construction Σ(x_i − mean) over ALL days is exactly zero —
    the final CUSUM row must be exactly 0.0 (the arithmetic is exact
    decimal until the last division)."""
    rows = QS["cusum_changepoint_daily"](spark, SF).collect()
    last = max(rows, key=lambda r: r["day"])
    assert last["cusum"] == 0.0
    ranks = sorted(r["abs_rank"] for r in rows)
    assert ranks == list(range(1, len(rows) + 1))


def test_proration_conserves_revenue(spark):
    """Prorated daily revenue must sum back to total order revenue
    exactly (at the scaled-integer level)."""
    from etl_projects_spark.queries import dec, load
    from pyspark.sql import functions as F

    daily = QS["revenue_proration_daily"](spark, SF).collect()
    total_prorated = sum(round(r["revenue"] * 42000) for r in daily)
    orders = load(spark, SF, "orders")
    total_cents = orders.agg(
        F.sum((dec("o_totalprice") * 100).cast("long")).alias("c")
    ).collect()[0]["c"]
    assert total_prorated == total_cents * 420


def test_gdpr_counts_partition_tables(spark):
    """delete + keep must equal each table's row count (no row counted
    twice or dropped by the cascade joins)."""
    from etl_projects_spark.queries import load

    rows = {r["tbl"]: r for r in QS["gdpr_cascade_delete_audit"](spark, SF).collect()}
    for tbl in ("customer", "orders", "lineitem"):
        n = load(spark, SF, tbl).count()
        assert rows[tbl]["n_delete"] + rows[tbl]["n_keep"] == n
        assert rows[tbl]["n_delete"] > 0  # keylist non-trivial at sf0.001


def test_rolling_corr_in_range(spark):
    """Pearson correlation is bounded to [-1, 1] (tiny float slack)."""
    rows = QS["rolling_corr_value_count"](spark, SF).collect()
    assert rows
    for r in rows:
        if r["corr"] is not None:
            assert -1.0 - 1e-9 <= r["corr"] <= 1.0 + 1e-9


def test_asof_nearest_within_window_and_correct(spark):
    """Every emitted delta is within ±1 h, and matches a brute-force
    nearest-click scan (ties to the earlier side)."""
    from etl_projects_spark.queries import load
    from pyspark.sql import functions as F

    H = 3_600_000_000
    got = {
        r["event_id"]: r["delta_us"]
        for r in QS["asof_nearest_click"](spark, SF).collect()
    }
    ev = (
        load(spark, SF, "events")
        .filter(F.col("event_type").isin("click", "purchase"))
        .select(
            "event_id",
            "user_id",
            "event_type",
            F.unix_micros(F.col("ts").cast("timestamp")).alias("us"),
        )
        .collect()
    )
    clicks_by_user: dict = {}
    for r in ev:
        if r["event_type"] == "click":
            clicks_by_user.setdefault(r["user_id"], []).append(r["us"])
    for r in ev:
        if r["event_type"] != "purchase":
            continue
        best = None
        for cu in clicks_by_user.get(r["user_id"], []):
            d = cu - r["us"]
            if abs(d) > H:
                continue
            if (
                best is None
                or abs(d) < abs(best)
                or (abs(d) == abs(best) and d < best)
            ):
                best = d
        assert got[r["event_id"]] == best, r["event_id"]
        if best is not None:
            assert abs(best) <= H


def test_approx_percentile_within_tolerance(spark):
    rows = QS["approx_percentile_tolerance"](spark, SF).collect()
    assert len(rows) == 5  # one per order priority
    assert all(r["approx_ok"] for r in rows)
