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


def test_funnel_stage_times_matches_bruteforce(spark):
    """Randomized (seeded) oracle: funnel_stage_times on arbitrary event
    soup must equal the obvious per-user Python scan."""
    import numpy as np

    from etl_projects_spark.operators.temporal import funnel_stage_times

    rng = np.random.RandomState(7)
    stages = ["a", "b", "c"]
    rows = []
    for user in range(150):
        for _ in range(rng.randint(0, 12)):
            rows.append(
                (
                    user,
                    int(rng.randint(0, 50)),
                    ["a", "b", "c", "x"][rng.randint(0, 4)],
                )
            )
    if not rows:
        return
    df = spark.createDataFrame(rows, "user_id long, ts long, event_type string")

    def brute(events):
        out, prev = [], None
        for s in stages:
            cand = [
                t for t, e in events if e == s and (prev is None or t >= prev)
            ]
            cur = min(cand) if cand else None
            out.append(cur)
            prev = cur
            if cur is None:
                # later stages can never fire after a missed stage
                out.extend([None] * (len(stages) - len(out)))
                break
        return out

    per_user: dict[int, list] = {}
    for u, t, e in rows:
        per_user.setdefault(u, []).append((t, e))
    want = {u: brute(ev) for u, ev in per_user.items()}
    got = {
        r["user_id"]: [r["t_0"], r["t_1"], r["t_2"]]
        for r in funnel_stage_times(df, stages).collect()
    }
    assert got == want


def test_banded_range_join_extra_keys_matches_theta(spark):
    import numpy as np

    from etl_projects_spark.operators import temporal

    rng = np.random.RandomState(11)
    base = 1_700_000_000
    points = spark.createDataFrame(
        [
            (i, int(rng.randint(0, 5)), base + int(rng.randint(0, 86400 * 10)))
            for i in range(300)
        ],
        "pid long, user_id long, epoch long",
    ).select("pid", "user_id", F.timestamp_seconds("epoch").alias("ts"))
    intervals = spark.createDataFrame(
        [
            (j, int(rng.randint(0, 5)), base + int(rng.randint(0, 86400 * 9)))
            for j in range(40)
        ],
        "iid long, user_id long, s long",
    ).select(
        "iid",
        "user_id",
        F.timestamp_seconds("s").alias("start_ts"),
        F.timestamp_seconds(F.col("s") + 86400).alias("end_ts"),
    )
    banded = temporal.banded_range_join(
        points, intervals, band_seconds=43200, extra_keys=["user_id"]
    )
    theta = points.alias("p").join(
        intervals.alias("i"),
        (F.col("p.user_id") == F.col("i.user_id"))
        & (F.col("p.ts") >= F.col("i.start_ts"))
        & (F.col("p.ts") < F.col("i.end_ts")),
    )
    got = sorted((r["pid"], r["iid"]) for r in banded.collect())
    want = sorted((r["pid"], r["iid"]) for r in theta.collect())
    assert got == want and len(got) > 0


def test_asof_forward_semantics(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "a"), (1, ts("2024-01-01 12:00"), "b"),
         (2, ts("2024-01-01 11:00"), "c")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:00"), 100), (1, ts("2024-01-01 11:30"), 200),
         (1, ts("2024-01-01 12:00"), 300)],
        "user_id long, ts timestamp, score long",
    )
    out = {
        (r["user_id"], r["tag"]): r["score_asof"]
        for r in temporal.asof_join(
            left, right, on="user_id", right_cols=["score"],
            direction="forward",
        ).collect()
    }
    assert out[(1, "a")] == 200      # earliest at-or-after 10:00 is 11:30
    assert out[(1, "b")] == 300      # ts == ts counts (>= semantics)
    assert out[(2, "c")] is None     # no right rows for user 2


def test_asof_tolerance_nulls_far_matches(spark):
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), "near"), (1, ts("2024-01-01 18:00"), "far")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 09:30"), 100)],
        "user_id long, ts timestamp, score long",
    )
    out = {
        r["tag"]: (r["score_asof"], r["matched_ts_asof"])
        for r in temporal.asof_join(
            left, right, on="user_id", right_cols=["score"],
            tolerance_seconds=3600,
        ).collect()
    }
    assert out["near"] == (100, ts("2024-01-01 09:30"))  # 30 min <= 1 h
    assert out["far"] == (None, None)                    # 8.5 h > 1 h


def test_asof_null_payload_stays_atomic(spark):
    """A matched right row whose payload column is legitimately NULL
    must yield NULL — not an OLDER right row's value stitched in
    (pandas merge_asof semantics; the per-column ignorenulls carry
    bug found in the r5 operator review)."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 10:00"), 10, 5),
         (1, ts("2024-01-01 11:00"), None, 7)],
        "user_id long, ts timestamp, price long, qty long",
    )
    row = temporal.asof_join(
        left, right, on="user_id", right_cols=["price", "qty"]
    ).collect()[0]
    # the 11:00 row matches: its NULL price must NOT fall back to 10
    assert row["qty_asof"] == 7
    assert row["price_asof"] is None
    assert row["matched_ts_asof"] == ts("2024-01-01 11:00")


def test_asof_string_tie_break(spark):
    """tie_break accepts any orderable type (the long-cast bug made a
    string tie column NULL for every row)."""
    left = spark.createDataFrame(
        [(1, ts("2024-01-01 12:00"), "x")],
        "user_id long, ts timestamp, tag string",
    )
    right = spark.createDataFrame(
        [(1, ts("2024-01-01 11:00"), "b", 2),
         (1, ts("2024-01-01 11:00"), "a", 1)],
        "user_id long, ts timestamp, rid string, v long",
    )
    row = temporal.asof_join(
        left, right, on="user_id", right_cols=["rid", "v"],
        tie_break="rid",
    ).collect()[0]
    # deterministic: the LAST in (ts, side, tie) order among the tied
    # rows is rid='b'
    assert (row["rid_asof"], row["v_asof"]) == ("b", 2)
