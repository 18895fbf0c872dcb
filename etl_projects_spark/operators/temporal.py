"""Temporal join operators Spark lacks natively: as-of join and
banded range join.

Neither exists in the reference (its time handling is date-partition
derivation, ``spark_dataframe_service.py:163-195``) nor as a Spark SQL
primitive — both are re-expressed as compositions of existing
DataFrame ops per the engine's custom-operator policy:

- **as-of join** (latest right row at-or-before each left row, per
  key): union the two sides, one window sort per key, carry the last
  non-null right value forward. ONE shuffle+sort total — the scalable
  alternative to the naive ts-inequality join, which Spark plans as a
  per-key cartesian.
- **banded range join** (points in intervals, no equi key): band both
  sides by a time bucket so the theta join becomes an equi-join on the
  band plus a residual range filter. Each point lives in exactly one
  band and each interval explodes to the bands it overlaps, so every
  qualifying pair is produced exactly once and the join fan-out is
  bounded by interval_span/band.
"""

from __future__ import annotations

from collections.abc import Sequence

from pyspark.sql import DataFrame
from pyspark.sql import functions as F
from pyspark.sql import Window as W


def asof_join(
    left: DataFrame,
    right: DataFrame,
    on: str,
    left_ts: str = "ts",
    right_ts: str = "ts",
    right_cols: Sequence[str] = (),
    tie_break: str | None = None,
    direction: str = "backward",
    tolerance_seconds: float | None = None,
) -> DataFrame:
    """For each left row: the nearest right row at-or-before
    (``direction="backward"``, ``right_ts <= left_ts``) or at-or-after
    (``direction="forward"``, ``right_ts >= left_ts``) it with the same
    ``on`` key (left join semantics — misses yield nulls). The pandas
    ``merge_asof`` surface, distributed.

    Implementation: tag sides, union, and per key carry the last
    non-null right ROW — one struct of every requested right column —
    over an order of (ts, side[, tie]); time runs descending for
    "forward", so "last seen right row" is always the nearest
    qualifying one; right rows sort before left rows at equal ts, so
    ties are inclusive either way. Carrying the struct (not each
    column independently) keeps the match atomic: a right row whose
    payload column is legitimately NULL yields NULL for that output
    column, exactly like pandas ``merge_asof``, instead of stitching
    in an older row's value. One shuffle on the key, one sort — no
    inequality join. ``tie_break`` (a right column of any orderable
    type, e.g. its id) makes the choice among equal-ts right rows
    deterministic. ``tolerance_seconds`` nulls out matches farther
    than the tolerance (both ts columns must be timestamps).
    """
    if direction not in ("backward", "forward"):
        raise ValueError(f"direction must be backward|forward, got {direction!r}")
    lcols = left.columns
    rtypes = dict(right.dtypes)
    tie_type = rtypes[tie_break] if tie_break else "int"
    row_struct = F.struct(
        *[F.col(c).alias(c) for c in right_cols],
        F.col(right_ts).alias("_mts"),
    )
    ts_order = F.col("_ts") if direction == "backward" else F.col("_ts").desc()
    win = (
        W.partitionBy("_k")
        .orderBy(ts_order, "_side", "_tie")
        .rowsBetween(W.unboundedPreceding, W.currentRow)
    )
    l_full = left.select(
        F.col(on).alias("_k"),
        F.col(left_ts).alias("_ts"),
        F.lit(1).alias("_side"),
        F.lit(None).cast(tie_type).alias("_tie"),
        *[F.col(c) for c in lcols],
    ).withColumn("_r_all", F.lit(None))
    r_full = right.select(
        F.col(on).alias("_k"),
        F.col(right_ts).alias("_ts"),
        F.lit(0).alias("_side"),
        (F.col(tie_break) if tie_break else F.lit(0).cast("int")).alias("_tie"),
        *[F.lit(None).cast(dict(left.dtypes)[c]).alias(c) for c in lcols],
        row_struct.alias("_r_all"),
    )
    # Left rows carry a NULL of the same struct type (a struct OF
    # nulls would defeat last(ignorenulls) — it must be a null
    # struct).
    l_full = l_full.withColumn(
        "_r_all",
        F.lit(None).cast(
            r_full.schema["_r_all"].dataType.simpleString()
        ),
    )
    carried = l_full.unionByName(r_full).select(
        "*", F.last("_r_all", ignorenulls=True).over(win).alias("_c_all")
    )
    out = carried.filter(F.col("_side") == 1)
    if tolerance_seconds is not None:
        # TIMESTAMP_NTZ (the parquet vintage Spark reads for testdata)
        # can't cast straight to double; hop through TIMESTAMP. Both
        # sides hop identically, so the difference is tz-invariant.
        def _secs(c: F.Column) -> F.Column:
            return c.cast("timestamp").cast("double")

        gap = _secs(F.col("_c_all._mts")) - _secs(F.col("_ts"))
        if direction == "backward":
            gap = -gap
        ok = gap <= F.lit(float(tolerance_seconds))
        out = out.withColumn("_c_all", F.when(ok, F.col("_c_all")))
    return out.select(
        *[F.col(c) for c in lcols],
        *[F.col(f"_c_all.{c}").alias(f"{c}_asof") for c in right_cols],
        F.col("_c_all._mts").alias("matched_ts_asof"),
    )


def banded_range_join(
    points: DataFrame,
    intervals: DataFrame,
    point_ts: str = "ts",
    start_col: str = "start_ts",
    end_col: str = "end_ts",
    band_seconds: int = 3600,
    extra_keys: Sequence[str] = (),
) -> DataFrame:
    """Inner-join points to the intervals containing them
    (``start <= ts < end``) WITHOUT an equi key.

    Both sides get band keys (``epoch div band_seconds``); intervals
    explode to every band they overlap. The join is then an equi-join
    on the band plus the residual range predicate — linear fan-out,
    shuffle keyed on bands, skew-safe under AQE. Pick ``band_seconds``
    near the typical interval length: too small explodes intervals,
    too large inflates residual filtering.

    ``extra_keys`` (present on both sides, e.g. a user id) join as
    additional equi keys alongside the band — essential when many
    intervals share a band but belong to different entities, which
    would otherwise fan out band-wide.
    """
    p = points.withColumn(
        "_band", (F.unix_timestamp(point_ts) / band_seconds).cast("long")
    )
    iv = intervals.withColumn(
        "_band",
        F.explode(
            F.sequence(
                (F.unix_timestamp(start_col) / band_seconds).cast("long"),
                # end is exclusive: a band starting exactly at end holds no rows
                ((F.unix_timestamp(end_col) - 1) / band_seconds).cast("long"),
            )
        ),
    )
    return (
        p.join(iv, ["_band", *extra_keys])
        .filter((F.col(point_ts) >= F.col(start_col)) & (F.col(point_ts) < F.col(end_col)))
        .drop("_band")
    )


def funnel_stage_times(
    df: DataFrame,
    stages: Sequence[str],
    user_col: str = "user_id",
    ts_col: str = "ts",
    type_col: str = "event_type",
) -> DataFrame:
    """Per-user ordered-funnel stage times: one row per user with
    ``t_0..t_{k-1}``, where ``t_i`` is the earliest event of
    ``stages[i]`` at-or-after ``t_{i-1}`` (NULL once a stage is never
    reached — all later stages are then NULL too, since no timestamp
    satisfies ``ts >= NULL``).

    ONE shuffle on the user key: each user's events collect into an
    array (bounded by that user's activity) and every stage time is an
    ``array_min∘transform∘filter`` higher-order expression inside
    whole-stage codegen — no join cascade, no Python, no reshuffle per
    stage. Stage names must be SQL-string-safe literals (they are
    embedded in lambda predicates).
    """
    per_user = df.groupBy(user_col).agg(
        F.collect_list(
            F.struct(F.col(ts_col).alias("ts"), F.col(type_col).alias("et"))
        ).alias("_a")
    )
    for i, stage in enumerate(stages):
        # Backslashes break the embedded SQL literal too (Spark parses
        # escape sequences inside '...'), not just quotes.
        if "'" in stage or "\\" in stage:
            raise ValueError(f"stage name {stage!r} is not SQL-literal-safe")
        after = f" AND x.ts >= _t{i - 1}" if i else ""
        per_user = per_user.withColumn(
            f"_t{i}",
            F.expr(
                f"array_min(transform(filter(_a, x -> x.et = '{stage}'"
                f"{after}), x -> x.ts))"
            ),
        )
    return per_user.select(
        user_col,
        *[F.col(f"_t{i}").alias(f"t_{i}") for i in range(len(stages))],
    )
