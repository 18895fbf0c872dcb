"""SCD1 upsert, SCD2 history, and compaction semantics."""

from __future__ import annotations

import datetime as dt
import os

from pyspark.sql import functions as F

from etl_projects_spark.operators.merge import (
    compact_table,
    latest_per_key,
    merge_upsert,
    scd2_apply,
    scd2_init,
)


def _ts(s: str) -> dt.datetime:
    return dt.datetime.fromisoformat(s)


def test_merge_upsert_replaces_and_inserts(spark):
    target = spark.createDataFrame(
        [(1, "a", 10.0), (2, "b", 20.0)], "id INT, name STRING, v DOUBLE"
    )
    updates = spark.createDataFrame(
        [(2, "b2", 21.0), (3, "c", 30.0)], "id INT, name STRING, v DOUBLE"
    )
    out = {r["id"]: (r["name"], r["v"]) for r in merge_upsert(target, updates, ["id"]).collect()}
    assert out == {1: ("a", 10.0), 2: ("b2", 21.0), 3: ("c", 30.0)}


def test_merge_upsert_latest_wins_and_idempotent(spark):
    target = spark.createDataFrame([(1, "a", _ts("2024-01-01"))],
                                   "id INT, name STRING, ts TIMESTAMP")
    updates = spark.createDataFrame(
        [
            (1, "old", _ts("2024-01-02")),
            (1, "new", _ts("2024-01-03")),
        ],
        "id INT, name STRING, ts TIMESTAMP",
    )
    once = merge_upsert(target, updates, ["id"], order_col="ts")
    assert [r["name"] for r in once.collect()] == ["new"]
    twice = merge_upsert(once, updates, ["id"], order_col="ts")
    assert [r["name"] for r in twice.collect()] == ["new"]


def test_latest_per_key_single_shuffle_dedup(spark):
    df = spark.createDataFrame(
        [(1, 1, "x"), (1, 2, "y"), (2, 1, "z")], "k INT, seq INT, v STRING"
    )
    rows = {r["k"]: r["v"] for r in latest_per_key(df, ["k"], "seq").collect()}
    assert rows == {1: "y", 2: "z"}


def test_scd2_lifecycle(spark):
    snap = spark.createDataFrame(
        [(1, "alice", "NYC", _ts("2024-01-01")), (2, "bob", "SF", _ts("2024-01-01"))],
        "id INT, name STRING, city STRING, effective_ts TIMESTAMP",
    )
    dim = scd2_init(snap)

    # bob moves; carol appears; alice unchanged.
    updates = spark.createDataFrame(
        [
            (2, "bob", "LA", _ts("2024-06-01")),
            (3, "carol", "CHI", _ts("2024-06-01")),
            (1, "alice", "NYC", _ts("2024-06-01")),
        ],
        "id INT, name STRING, city STRING, effective_ts TIMESTAMP",
    )
    out = scd2_apply(dim, updates, ["id"], ["name", "city"])
    rows = sorted(
        (r["id"], r["city"], r["is_current"], r["end_ts"].year) for r in out.collect()
    )
    assert rows == [
        (1, "NYC", True, 9999),     # unchanged — still current, not versioned
        (2, "LA", True, 9999),      # new current version
        (2, "SF", False, 2024),     # closed at the update's effective ts
        (3, "CHI", True, 9999),     # brand-new key
    ]

    # Re-applying the same batch is a no-op (idempotent).
    again = scd2_apply(out, updates, ["id"], ["name", "city"])
    assert again.count() == out.count()
    assert again.filter(F.col("is_current")).count() == 3


def test_scd2_null_attribute_transitions(spark):
    dim = scd2_init(
        spark.createDataFrame(
            [(1, None, _ts("2024-01-01"))], "id INT, city STRING, effective_ts TIMESTAMP"
        )
    )
    same_null = spark.createDataFrame(
        [(1, None, _ts("2024-02-01"))], "id INT, city STRING, effective_ts TIMESTAMP"
    )
    assert scd2_apply(dim, same_null, ["id"], ["city"]).count() == 1  # NULL == NULL: no new version
    to_value = spark.createDataFrame(
        [(1, "NYC", _ts("2024-02-01"))], "id INT, city STRING, effective_ts TIMESTAMP"
    )
    out = scd2_apply(dim, to_value, ["id"], ["city"])
    assert out.count() == 2  # NULL → value is a real change
    assert out.filter(F.col("is_current")).head()["city"] == "NYC"


def test_compact_table_merges_small_files(spark, tmp_path):
    path = str(tmp_path / "t")
    # 20 single-row appends → 20+ small files.
    for i in range(20):
        spark.range(i, i + 1).write.mode("append").parquet(path)
    before = sum(1 for f in os.listdir(path) if f.endswith(".parquet"))
    assert before >= 20
    after = compact_table(spark, path)
    assert after < before
    assert spark.read.parquet(path).count() == 20


def test_scd2_multirow_batch_collapses_to_latest(spark):
    """A batch with several rows for one key must not fan out the
    full-outer join: only the latest (highest effective_ts) row
    applies, and exactly one is_current version survives per key."""
    from etl_projects_spark.operators import merge

    dim = merge.scd2_init(
        spark.createDataFrame(
            [(1, "a", "2024-01-01 00:00:00")],
            "k int, attr string, effective_ts string",
        ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    )
    updates = spark.createDataFrame(
        [
            (1, "b", "2024-02-01 00:00:00"),
            (1, "c", "2024-03-01 00:00:00"),
            (2, "x", "2024-02-15 00:00:00"),
        ],
        "k int, attr string, effective_ts string",
    ).withColumn("effective_ts", F.col("effective_ts").cast("timestamp"))
    out = merge.scd2_apply(dim, updates, keys=["k"], attrs=["attr"])
    rows = out.collect()
    current = {r["k"]: r for r in rows if r["is_current"]}
    assert set(current) == {1, 2}
    assert current[1]["attr"] == "c"  # latest batch row won
    assert current[2]["attr"] == "x"
    per_key_current = [r["k"] for r in rows if r["is_current"]]
    assert len(per_key_current) == len(set(per_key_current))
    # key 1: old version closed at the applied row's effective ts
    closed = [r for r in rows if r["k"] == 1 and not r["is_current"]]
    assert len(closed) == 1
    assert str(closed[0]["end_ts"]) == "2024-03-01 00:00:00"


def test_connected_components_random_graph(spark):
    """CC on a random 200-node graph equals a driver-side union-find
    (smallest-member canonical labels)."""
    import random

    from etl_projects_spark.operators import dedup

    random.seed(7)
    edges = [(random.randint(0, 199), random.randint(0, 199)) for _ in range(150)]
    edges = [(a, b) for a, b in edges if a != b]
    pairs = spark.createDataFrame(edges, "id_a long, id_b long")
    got = {r["node"]: r["comp"] for r in dedup.connected_components(pairs).collect()}

    parent: dict = {}

    def find(x):
        parent.setdefault(x, x)
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    from collections import defaultdict

    members = defaultdict(list)
    for n in list(parent):
        members[find(n)].append(n)
    want = {n: min(members[find(n)]) for n in parent}
    assert got == want


def test_snapshot_diff_classes(spark):
    from etl_projects_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame(
        [(1, "a", 1.0), (2, "b", 2.0), (3, "c", 3.0)],
        "k long, s string, v double",
    )
    new = spark.createDataFrame(
        [(1, "a", 1.0), (2, "B", 2.0), (4, "d", 4.0)],
        "k long, s string, v double",
    )
    got = {
        r.k: r.change
        for r in snapshot_diff(old, new, ["k"], ["s", "v"]).collect()
    }
    assert got == {2: "update", 3: "delete", 4: "insert"}


def test_snapshot_diff_null_safe(spark):
    from etl_projects_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(1, None), (2, "x")], "k long, s string")
    new = spark.createDataFrame([(1, None), (2, None)], "k long, s string")
    got = {
        r.k: r.change for r in snapshot_diff(old, new, ["k"], ["s"]).collect()
    }
    # null == null must NOT be an update; x -> null must be.
    assert got == {2: "update"}


def test_snapshot_diff_null_key_sides(spark):
    """NULL keys join null-safely (r6 review; consistent with
    scd2_apply): an identical NULL-keyed row present in both snapshots
    is UNCHANGED — not a spurious delete+insert pair — a changed one
    is an update, and a one-sided one still classifies by presence."""
    from etl_projects_spark.operators.merge import snapshot_diff

    old = spark.createDataFrame([(None, "gone"), (1, "a")], "k long, s string")
    new = spark.createDataFrame([(None, "born"), (1, "a")], "k long, s string")
    got = sorted(
        (r.k, r.change)
        for r in snapshot_diff(old, new, ["k"], ["s"]).collect()
    )
    assert got == [(None, "update")]  # key 1 unchanged drops out

    same = spark.createDataFrame([(None, "kept")], "k long, s string")
    assert snapshot_diff(same, same, ["k"], ["s"]).count() == 0  # no churn

    one_sided = snapshot_diff(
        same, spark.createDataFrame([], "k long, s string"), ["k"], ["s"]
    ).collect()
    assert [(r.k, r.change) for r in one_sided] == [(None, "delete")]


def test_merge_upsert_random_equivalence(spark):
    """Seeded random target/batch: merge_upsert must equal the obvious
    dict-based SCD1 semantics (latest batch row per key wins, unmatched
    keys insert, untouched target rows survive)."""
    import numpy as np

    from etl_projects_spark.operators.merge import merge_upsert

    rng = np.random.RandomState(11)
    target_rows = [(int(k), f"t{k}", float(rng.randint(0, 100))) for k in range(80)]
    batch_rows = [
        (int(rng.randint(0, 120)), f"b{i}", float(rng.randint(0, 100)), i)
        for i in range(60)
    ]
    target = spark.createDataFrame(target_rows, "k long, name string, v double")
    batch = spark.createDataFrame(
        batch_rows, "k long, name string, v double, seq long"
    )
    got = {
        r["k"]: (r["name"], r["v"])
        for r in merge_upsert(target, batch, keys=["k"], order_col="seq").collect()
    }
    want = {k: (n, v) for k, n, v in target_rows}
    latest: dict[int, tuple] = {}
    for k, n, v, seq in batch_rows:
        if k not in latest or seq > latest[k][2]:
            latest[k] = (n, v, seq)
    for k, (n, v, _) in latest.items():
        want[k] = (n, v)
    assert got == want


def test_apply_changelog_semantics(spark):
    from etl_projects_spark.operators.merge import apply_changelog

    log = spark.createDataFrame(
        [
            # key 1: upsert then delete → absent
            (1, "upsert", 10.0, 1),
            (1, "delete", 0.0, 2),
            # key 2: delete then upsert → present with latest payload
            (2, "delete", 0.0, 1),
            (2, "upsert", 20.0, 2),
            (2, "upsert", 25.0, 3),
            # key 3: single upsert
            (3, "upsert", 30.0, 1),
        ],
        "k long, op string, v double, seq long",
    )
    out = apply_changelog(log, keys=["k"], order_cols=["seq"])
    got = {r["k"]: r["v"] for r in out.collect()}
    assert got == {2: 25.0, 3: 30.0}
    assert out.columns == ["k", "v", "seq"]


def test_apply_changelog_replay_idempotent(spark):
    from etl_projects_spark.operators.merge import apply_changelog

    rng = __import__("numpy").random.RandomState(7)
    rows = [
        (
            int(rng.randint(0, 25)),
            "delete" if rng.rand() < 0.3 else "upsert",
            float(rng.randint(0, 100)),
            i,
        )
        for i in range(200)
    ]
    log = spark.createDataFrame(rows, "k long, op string, v double, seq long")
    once = apply_changelog(log, keys=["k"], order_cols=["seq"])
    # replaying the log twice (append of identical entries) must not
    # change the final state — the idempotency contract
    twice = apply_changelog(
        log.unionByName(log), keys=["k"], order_cols=["seq"]
    )
    assert sorted(map(tuple, once.collect())) == sorted(
        map(tuple, twice.collect())
    )
    # python reference: last op per key decides
    last: dict[int, tuple] = {}
    for k, op, v, seq in rows:
        if k not in last or seq > last[k][2]:
            last[k] = (op, v, seq)
    want = {k: v for k, (op, v, _) in last.items() if op != "delete"}
    assert {r["k"]: r["v"] for r in once.collect()} == want


def test_scd1_fold_batch_order_invariant(spark):
    """The foreach_batch_merge fold (latest_per_key over state ∪ batch)
    must produce identical state under any batch arrival order — the
    invariance streaming_scd1_user_state's oracle equivalence rests on."""
    from etl_projects_spark.operators.merge import latest_per_key

    a = spark.createDataFrame(
        [(1, 10, "x"), (2, 5, "y")], "k long, v long, payload string"
    )
    b = spark.createDataFrame(
        [(1, 7, "stale"), (2, 9, "newer"), (3, 1, "z")],
        "k long, v long, payload string",
    )

    def fold(batches):
        state = None
        for batch in batches:
            merged = batch if state is None else state.unionByName(batch)
            state = latest_per_key(merged, ["k"], ["v"])
        return {r["k"]: (r["v"], r["payload"]) for r in state.collect()}

    ab, ba = fold([a, b]), fold([b, a])
    assert ab == ba
    assert ab == {1: (10, "x"), 2: (9, "newer"), 3: (1, "z")}


def test_apply_changelog_null_op_is_upsert(spark):
    """A malformed CDC row with a NULL op must keep its payload (upsert
    semantics), not silently delete the key — `op != 'delete'` alone
    evaluates to NULL and would drop it (ADVICE r3)."""
    from etl_projects_spark.operators.merge import apply_changelog

    log = spark.createDataFrame(
        [
            (1, "upsert", 10.0, 1),
            (1, None, 11.0, 2),  # malformed: NULL op wins on seq
            (2, "delete", 5.0, 1),
            (3, None, 7.0, 1),  # key seen only with a NULL op
        ],
        "k long, op string, v double, seq long",
    )
    got = {r["k"]: r["v"] for r in
           apply_changelog(log, keys=["k"], order_cols=["seq"]).collect()}
    assert got == {1: 11.0, 3: 7.0}


def test_scd2_apply_preserves_null_current_flag_rows(spark):
    """A dim row with is_current=NULL (bad upstream data) must pass
    through with history, never silently vanish (r6 review: plain
    filter(col)/filter(~col) both drop NULL)."""
    from etl_projects_spark.operators.merge import scd2_apply

    dim = spark.createDataFrame(
        [(1, "a", "2024-01-01", "9999-12-31", True),
         (2, "z", "2024-01-01", "9999-12-31", None)],
        "k long, attr string, eff string, end string, is_current boolean",
    )
    upd = spark.createDataFrame(
        [(1, "b", "2024-02-01")], "k long, attr string, eff string"
    )
    out = scd2_apply(dim, upd, keys=["k"], attrs=["attr"],
                     effective_col="eff", end_col="end",
                     current_col="is_current").collect()
    assert any(r.k == 2 for r in out), "NULL-flag row vanished"
