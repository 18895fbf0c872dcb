"""Sketch accuracy: the HLL distinct-count entry must stay within its
configured error bound of the exact answer (its effective oracle)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_projects_spark.queries import load
from etl_projects_spark.queries_scale import approx_distinct_users_daily

SF_DIR = "/root/testdata/sf0.01"


def test_hll_within_rsd(spark):
    approx = {
        r["day"]: r["approx_users"]
        for r in approx_distinct_users_daily(spark, SF_DIR).collect()
    }
    exact = {
        r["day"]: r["n"]
        for r in load(spark, SF_DIR, "events")
        .groupBy(F.to_date("ts").alias("day"))
        .agg(F.count_distinct("user_id").alias("n"))
        .collect()
    }
    assert set(approx) == set(exact)
    for day, n in exact.items():
        # 2% rsd → allow 5 sigma (10%) plus small-count slack.
        assert abs(approx[day] - n) <= max(0.10 * n, 3), (day, approx[day], n)
