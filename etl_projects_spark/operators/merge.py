"""Incremental-merge operators: SCD1 upsert, SCD2 history, compaction.

The reference's incremental loads re-run a day's batch into a table
(`is_incremental`, reference `etl_projects/base/processors/builders/
datalake_sub_dag_builder.py:71,113`) and promote staging tables into a
final DW schema (`dw_sub_dag_builder.py:49-112`) — but the merge
semantics live in Spark jobs missing from the repo. These operators
define them Spark-first:

- ``merge_upsert``  — SCD type 1: latest record wins per business key.
- ``scd2_apply``    — SCD type 2: keep full history with validity ranges.
- ``compact_table`` — rewrite a table directory at the reference's
  250k-records-per-file policy (`s3_loader.py:13`) to fix small-file
  sprawl from many incremental appends.

Scale notes: both merges are a single shuffle on the business key; the
updates side of an incremental batch is usually ≪ target size, so it is
broadcast where the plan allows. No collects, no loops over partitions.
"""

from __future__ import annotations

import os
import shutil
import tempfile
from collections.abc import Sequence

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

HIGH_TS = "9999-12-31 23:59:59"


def latest_per_key(
    updates: DataFrame, keys: Sequence[str], order_col: str | Sequence[str]
) -> DataFrame:
    """Collapse an update batch to one row per key (highest ``order_col``
    tuple wins; pass a sequence ending in a unique column for a fully
    deterministic "latest"). One shuffle on the key."""
    order_cols = [order_col] if isinstance(order_col, str) else list(order_col)
    w = W.partitionBy(*keys).orderBy(*[F.col(c).desc() for c in order_cols])
    return (
        updates.withColumn("_rn", F.row_number().over(w))
        .filter(F.col("_rn") == 1)
        .drop("_rn")
    )


def apply_changelog(
    changelog: DataFrame,
    keys: Sequence[str],
    order_cols: Sequence[str],
    op_col: str = "op",
    delete_op: str = "delete",
) -> DataFrame:
    """Materialize the final table state from an ordered CDC change log
    (the Debezium / Delta change-data-feed consumption pattern).

    Each log row carries the full payload plus an operation marker; per
    key, the row with the highest ``order_cols`` tuple decides the
    outcome — if its op is ``delete_op`` the key is absent from the
    result, otherwise its payload (sans op column) is the final row.
    Replays are idempotent: applying the same log twice yields the same
    state, and ``order_cols`` must end in a unique column (e.g. a log
    sequence number) so "latest" is deterministic.

    Plan: one shuffle on the key (``latest_per_key``'s window), then a
    local filter — the log is never joined against itself, so the cost
    is O(log size), not O(keys × versions²). At 100 TB the log would be
    date-partitioned and this op applied per partition-pruned slice.
    """
    latest = latest_per_key(changelog, keys, order_cols)
    # Null-safe op compare: a malformed log row with a NULL op must fall
    # through as an upsert (keep the payload), not vanish — a plain
    # `op != delete_op` evaluates to NULL and the filter would drop it.
    return latest.filter(~F.col(op_col).eqNullSafe(delete_op)).drop(op_col)


def merge_upsert(
    target: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    order_col: str | None = None,
) -> DataFrame:
    """SCD1 merge: rows in ``updates`` replace target rows with the same
    key; unmatched update rows are inserted.

    If ``order_col`` is given the update batch is first deduplicated to
    its latest row per key (idempotent re-runs of the same batch).

    Plan: target ⟕anti updates (one shuffle on keys — or broadcast when
    the batch is small) ∪ updates. Columns are aligned by name.
    """
    if order_col is not None:
        updates = latest_per_key(updates, keys, order_col)
    updates = updates.select(*target.columns)
    kept = target.join(updates.select(*keys), list(keys), "left_anti")
    return kept.unionByName(updates)


def scd2_apply(
    dim: DataFrame,
    updates: DataFrame,
    keys: Sequence[str],
    attrs: Sequence[str],
    effective_col: str = "effective_ts",
    end_col: str = "end_ts",
    current_col: str = "is_current",
) -> DataFrame:
    """SCD2 merge: apply an update batch (one row per key, each carrying
    ``effective_col``) to a versioned dimension.

    ``dim`` schema: keys + attrs + effective_col + end_col + current_col.
    ``updates`` schema: keys + attrs + effective_col. A batch carrying
    several rows for one key is first collapsed to its latest row per
    key — ordered by (``effective_col``, then every attr) so rows that
    tie on the effective timestamp still pick one winner
    deterministically under any shuffle order — the full-outer join
    below would otherwise fan out and mint duplicate current versions.

    Semantics (per key):
    - attribute-identical current row → unchanged (idempotent re-run);
    - changed attributes → current row closed at the update's effective
      timestamp, new current row inserted;
    - unknown key → new current row inserted.
    Historical (non-current) rows pass through untouched.

    Plan: one shuffle joining current rows to the batch on the key;
    history rows don't shuffle at all. The change test is a null-safe
    struct comparison (NULL attribute = NULL attribute is "unchanged").
    """
    keys = list(keys)
    attrs = list(attrs)
    updates = latest_per_key(updates, keys, [effective_col, *attrs])
    upd = updates.select(
        *[F.col(k).alias(f"_u_{k}") for k in keys],
        *[F.col(a).alias(f"_u_{a}") for a in attrs],
        F.col(effective_col).alias("_u_eff"),
    )
    # Null-safe split: a row whose current flag is NULL (bad upstream
    # data) must not VANISH — plain filter(col)/filter(~col) both
    # exclude NULL. It passes through with the history rows untouched.
    is_current = F.col(current_col).eqNullSafe(F.lit(True))
    current = dim.filter(is_current)
    history = dim.filter(~is_current)

    cond = [current[k].eqNullSafe(F.col(f"_u_{k}")) for k in keys]
    joined = current.join(upd, cond, "full_outer")

    same = F.struct(*[F.col(a) for a in attrs]).eqNullSafe(
        F.struct(*[F.col(f"_u_{a}") for a in attrs])
    )
    matched = F.col("_u_eff").isNotNull() & F.col(current_col).isNotNull()
    changed = matched & ~same

    # Surviving current rows: untouched rows, or closed-out versions.
    old_rows = (
        joined.filter(F.col(current_col).isNotNull())
        .select(
            *keys,
            *attrs,
            F.col(effective_col),
            F.when(changed, F.col("_u_eff")).otherwise(F.col(end_col)).alias(end_col),
            (~changed).alias(current_col),
        )
    )
    # Inserted versions: changed keys + brand-new keys. The open-ended
    # sentinel is cast to the dimension's OWN end-column dtype (the
    # testdata parquet is TIMESTAMP_NTZ; a hardcoded LTZ cast would make
    # the union's end column bitemporal-schizophrenic).
    end_type = dim.schema[end_col].dataType
    new_rows = (
        joined.filter(changed | F.col(current_col).isNull())
        .select(
            *[F.col(f"_u_{k}").alias(k) for k in keys],
            *[F.col(f"_u_{a}").alias(a) for a in attrs],
            F.col("_u_eff").alias(effective_col),
            F.lit(HIGH_TS).cast(end_type).alias(end_col),
            F.lit(True).alias(current_col),
        )
    )
    return history.unionByName(old_rows).unionByName(new_rows)


def scd2_init(
    snapshot: DataFrame,
    effective_col: str = "effective_ts",
    end_col: str = "end_ts",
    current_col: str = "is_current",
) -> DataFrame:
    """Bootstrap an SCD2 dimension from an initial snapshot that already
    carries ``effective_col``. The open-end sentinel adopts the
    effective column's dtype so NTZ snapshots stay NTZ end-to-end."""
    eff_type = snapshot.schema[effective_col].dataType
    return snapshot.withColumn(
        end_col, F.lit(HIGH_TS).cast(eff_type)
    ).withColumn(current_col, F.lit(True))


def compact_table(
    spark: SparkSession,
    path: str,
    records_per_file: int = 250_000,
) -> int:
    """Rewrite a parquet table directory targeting the reference's
    records-per-file policy; returns the resulting file count.

    Incremental appends leave one-file-per-batch sprawl; at 100 TB the
    small-file tax is paid on every subsequent scan (task-per-file). The
    rewrite is one job: scan → AQE-coalesced shuffle-free repartition →
    write to a scratch dir → swap. ``maxRecordsPerFile`` enforces the
    cap without a driver-side count.

    The swap renames the old directory aside BEFORE the scratch dir
    takes its place, so a crash at any point leaves at least one
    complete copy of the table on disk (old at ``path`` or
    ``path.old``, new at the scratch dir) — never zero. Local/POSIX
    filesystem only (os.rename + os.walk); an object-store deployment
    would swap via the catalog's table location instead.
    """
    df = spark.read.parquet(path)
    # Size the rewrite from file metadata (no data scan): one output
    # partition per ~128 MB of input, floor 1. maxRecordsPerFile then
    # caps row-heavy partitions.
    total_bytes = sum(
        os.path.getsize(os.path.join(root, f))
        for root, _, files in os.walk(path)
        for f in files
        if f.endswith(".parquet")
    )
    n_parts = max(1, total_bytes // (128 * 1024 * 1024))
    scratch = tempfile.mkdtemp(prefix="compact_", dir=os.path.dirname(path.rstrip("/")))
    (
        df.repartition(int(n_parts))
        .write.mode("overwrite")
        .option("maxRecordsPerFile", str(records_per_file))
        .parquet(scratch)
    )
    old = path.rstrip("/") + ".old"
    if os.path.exists(old):
        shutil.rmtree(old)
    os.rename(path, old)
    os.rename(scratch, path)
    shutil.rmtree(old)
    return sum(1 for f in os.listdir(path) if f.endswith(".parquet"))


def snapshot_diff(
    old: DataFrame,
    new: DataFrame,
    keys: Sequence[str],
    compare_cols: Sequence[str],
) -> DataFrame:
    """CDC-style reconciliation of two table snapshots: one row per
    changed key with ``change`` ∈ {insert, update, delete}.

    Full outer join on the key columns; updates are detected with
    null-safe ``IS DISTINCT FROM`` column comparisons — never by
    hashing stringified rows, whose float formatting differs across
    engines. One shuffle per side on the key; unchanged keys drop
    before anything else flows downstream, so the result is
    changed-rows-sized. This is the verification pass a lake runs
    after a merge/backfill (does the table now equal the source?) and
    the generic diff feeding an incremental downstream load.
    """
    # Per-side presence markers: inferring insert/delete from key-column
    # null-ness would misclassify NULL-keyed rows (a NULL key says
    # nothing about which side the row came from); the markers state
    # presence explicitly.
    o = old.select(*keys, *compare_cols).withColumn("_o", F.lit(True))
    n = new.select(*keys, *compare_cols).withColumn("_n", F.lit(True))
    for c in list(keys) + list(compare_cols):
        o = o.withColumnRenamed(c, f"o_{c}")
        n = n.withColumnRenamed(c, f"n_{c}")
    cond = None
    for k in keys:
        # eqNullSafe: an identical NULL-keyed row present in BOTH
        # snapshots must match itself — a null-hostile equi-join would
        # report it as a spurious delete + insert pair (false CDC
        # churn into any downstream incremental load).
        eq = o[f"o_{k}"].eqNullSafe(n[f"n_{k}"])
        cond = eq if cond is None else cond & eq
    joined = o.join(n, cond, "full_outer")
    changed = None
    for c in compare_cols:
        d = ~o[f"o_{c}"].eqNullSafe(n[f"n_{c}"])
        changed = d if changed is None else changed | d
    change = (
        F.when(F.col("_o").isNull(), F.lit("insert"))
        .when(F.col("_n").isNull(), F.lit("delete"))
        .when(changed, F.lit("update"))
    )
    out_keys = [
        F.coalesce(F.col(f"o_{k}"), F.col(f"n_{k}")).alias(k) for k in keys
    ]
    return (
        joined.select(*out_keys, change.alias("change"))
        .filter(F.col("change").isNotNull())
    )
