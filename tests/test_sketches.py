"""Sketch accuracy: the HLL distinct-count entry must stay within its
configured error bound of the exact answer — which is now itself a
driver-checked catalog query (``exact_distinct_users_daily``), so the
approx entry's scan/group pipeline is hash-verified and only the
sketch estimate itself carries tolerance."""

from __future__ import annotations

from etl_projects_spark.queries_scale import (
    _approx_users_daily,
    approx_distinct_users_daily,
    exact_distinct_users_daily,
)

SF_DIR = "/root/testdata/sf0.01"


def test_hll_within_rsd_of_exact_twin(spark):
    # approx emits DATE days; the exact twin emits strings (its oracle
    # comparator can't hash dates portably) — normalize to str.
    approx = {
        str(r["day"]): r["approx_users"]
        for r in _approx_users_daily(spark, SF_DIR).collect()
    }
    exact = {
        r["day"]: r["n_users"]
        for r in exact_distinct_users_daily(spark, SF_DIR).collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        # 2% rsd → allow 5 sigma (10%) plus small-count slack; also the
        # VERDICT-required coarse contract |approx-exact|/exact < 5%
        # on any day big enough for the rsd to mean anything.
        assert abs(approx[day] - n) <= max(0.10 * n, 3), (day, approx[day], n)
        if n >= 500:
            assert abs(approx[day] - n) / n < 0.05, (day, approx[day], n)


def test_approx_query_emits_hashable_contract(spark):
    """The catalog entry folds the exact twin in: exact counts are
    oracle-hashed and the sketch tolerance is a boolean the oracle
    asserts TRUE — every row must carry approx_ok=True here."""
    rows = approx_distinct_users_daily(spark, SF_DIR).collect()
    assert rows and all(r["approx_ok"] for r in rows)
    exact = {
        r["day"]: r["n_users"]
        for r in exact_distinct_users_daily(spark, SF_DIR).collect()
    }
    assert {r["day"]: r["exact_users"] for r in rows} == exact
