"""Temporal joins: as-of semantics on a hand-built fixture, banded
range join exactness vs a plain theta join."""

from __future__ import annotations

from datetime import datetime

from pyspark.sql import functions as F

from etl_projects_spark.operators import temporal


def ts(s):
    return datetime.fromisoformat(s)


def test_asof_join_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "a"), (1, ts("2024-01-01 12:00"), "b"),
         (2, ts("2024-01-01 11:00"), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00"), 100), (1, ts("2024-01-01 11:30"), 200),
         (3, ts("2024-01-01 08:00"), 999)],
        "user_id long, ts timestamp, score long",
    )
    out = {
        (r["user_id"], r["tag"]): r["score_asof"]
        for r in temporal.asof_join(
            left, right, on="user_id", right_cols=["score"]
        ).collect()
    }
    assert out[(1, "a")] == 100      # only 09:00 is at-or-before 10:00
    assert out[(1, "b")] == 200      # 11:30 supersedes 09:00
    assert out[(2, "c")] is None     # no right rows for user 2


def test_asof_tie_inclusive(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "x")], "user_id long, ts timestamp, tag string"
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), 7)], "user_id long, ts timestamp, score long"
    )
    row = temporal.asof_join(left, right, on="user_id", right_cols=["score"]).collect()[0]
    assert row["score_asof"] == 7    # ts == ts counts (<= semantics)


def test_banded_range_join_matches_theta(spark):
    from etl_projects_spark.queries import load

    ev = load(spark, "/root/testdata/sf0.001", "events")
    windows = (
        ev.select(F.date_trunc("day", "ts").alias("day")).distinct()
        .select((F.col("day") + F.expr("INTERVAL 4 HOURS")).alias("start_ts"),
                (F.col("day") + F.expr("INTERVAL 10 HOURS")).alias("end_ts"))
    )
    banded = temporal.banded_range_join(ev, windows).count()
    theta = ev.join(
        windows,
        (ev.ts >= windows.start_ts) & (ev.ts < windows.end_ts),
    ).count()
    assert banded == theta
