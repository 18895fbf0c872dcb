"""Skew-mitigation operators: salted aggregation, salted join, bucketed
co-located joins.

The reference never handles skew (its heaviest key cardinality is a
daily scrape batch); at 100 TB a single hot key can pin one reducer
for hours, so these are first-class engine operators. All of them are
pure plan rewrites — results are bit-identical to the unsalted
equivalents, so every one has an exact DuckDB oracle.

AQE's skew-join splitting (``spark.sql.adaptive.skewJoin.enabled``,
on in session.py) handles *sort-merge join* skew at runtime; explicit
salting is still needed for (a) skewed **aggregations** (AQE does not
split hot groupBy keys) and (b) deterministic layout control when the
skew is known up front.
"""

from __future__ import annotations

import math
from collections.abc import Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F


def choose_salt_factor(
    df: DataFrame,
    on: str,
    sample_rows: int = 100_000,
    max_salt: int = 64,
) -> int:
    """Pick the salt replication factor from OBSERVED key skew instead
    of a guess — the same key-frequency statistic AQE's skew-join
    split uses at runtime, applied up front where AQE can't help
    (aggregations, deterministic layout).

    Rationale: a key holding fraction ``p`` of N rows lands ``p·N``
    rows on ONE of the P shuffle reducers; to cap every reducer near
    the even share N/P, the hot key must spread over ``ceil(p·P)``
    salts. ``p`` comes from a bounded sample (one small scan-side
    aggregation, never a full-table pass), so the chooser costs O(
    sample) regardless of table size. Uniform keys → p≈1/distinct →
    salt 1 (salting disabled, no replication tax); an 80 %-hot key at
    P=200 → salt 64 (clamped) — measured guidance: past ~64 the
    per-salt replication tax on the small side outweighs further
    spreading on every corpus we benched.
    """
    parts = int(df.sparkSession.conf.get("spark.sql.shuffle.partitions"))
    # A seeded Bernoulli sample + limit, NOT a bare limit: limit()
    # takes the first rows of the first partition(s), so key-SORTED
    # input (this repo's own bucketed sortBy layout, say) would see
    # one run of a single key and estimate p_hot≈1 on a uniform
    # table. The row-level sample de-clusters within every scanned
    # partition; limit then bounds the aggregation input. Residual
    # bias: a hot key confined to late partitions can still be
    # under-sampled (limit short-circuits the scan) — raise
    # sample_rows, or let AQE's runtime skew split catch what the
    # up-front estimate missed.
    stats = (
        df.select(on)
        .sample(withReplacement=False, fraction=0.1, seed=13)
        .limit(sample_rows)
        .groupBy(on)
        .count()
        .agg(F.max("count").alias("mx"), F.sum("count").alias("n"))
        .collect()[0]
    )
    if not stats["n"]:
        return 1
    p_hot = stats["mx"] / stats["n"]
    return max(1, min(max_salt, math.ceil(p_hot * parts)))


def salted_groupby_sum(
    df: DataFrame,
    keys: Sequence[str],
    sum_cols: dict[str, Column],
    salt: int = 16,
    salt_on: str | None = None,
) -> DataFrame:
    """Two-phase skew-safe aggregation for decomposable aggregates.

    Phase 1 groups on (keys + salt) — the hot key's rows spread over
    ``salt`` reducers; phase 2 re-aggregates the (tiny) partials on the
    true keys. ``sum_cols`` maps output name → input expression; SUM and
    COUNT (as ``F.lit(1)``) are decomposable this way. Deterministic:
    the salt is a hash of ``salt_on`` (or a whole-row hash), not rand().

    Identical result to ``df.groupBy(keys).agg(sum(...))`` — the salt
    only reshapes the shuffle.
    """
    salt_cols = [F.col(salt_on)] if salt_on else [F.col(c) for c in df.columns]
    # xxhash64 hashes the typed values directly — no string concat
    # pass. spark_partition_id() is mixed in because a hot key whose
    # rows are byte-IDENTICAL (repeated default rows, constant
    # projections) would otherwise hash to ONE salt and defeat the
    # spread entirely; the partition id splits such rows across scan
    # partitions while staying deterministic under task retry (a
    # retried map task re-reads the same split → same id → same salt
    # — rand()/monotonically_increasing_id() here would hit the
    # nondeterministic-repartition retry correctness trap,
    # SPARK-23207). Residual bound: identical rows within ONE scan
    # split still share a salt — at most a split's worth per reducer.
    salted = df.withColumn(
        "_salt",
        F.pmod(F.xxhash64(*salt_cols, F.spark_partition_id()), F.lit(salt)),
    )
    partial = salted.groupBy(*keys, "_salt").agg(
        *[F.sum(expr).alias(f"_p_{name}") for name, expr in sum_cols.items()]
    )
    return partial.groupBy(*keys).agg(
        *[F.sum(f"_p_{name}").alias(name) for name in sum_cols]
    )


def salted_join(
    big: DataFrame,
    small: DataFrame,
    on: str,
    salt: int | None = 8,
    how: str = "inner",
) -> DataFrame:
    """Skew-safe equi-join: salt the big side, replicate the small side.

    The big side gets a deterministic row-hash salt in [0, salt); the
    small side is exploded ``salt``× with every salt value, so each
    (key, salt) bucket joins locally. A hot key's rows land on ``salt``
    reducers instead of one. Replication cost is |small|·salt rows —
    use only when the small side is modest but too big (or too skewed)
    to broadcast outright. ``salt=None`` derives the factor from the
    big side's observed key skew (:func:`choose_salt_factor`), so a
    uniform table pays no replication tax and an 80 %-hot table gets
    spread across enough reducers automatically.

    Result equals ``big.join(small, on, how)`` exactly.

    Project the big side down to the columns the consumer needs BEFORE
    calling: the salt hashes every column of ``big``, so an unpruned
    table both defeats parquet column pruning (the scan must read all
    columns to hash them) and pays the hash over the full row width.
    """
    if how not in ("inner", "left"):
        raise ValueError("salted_join supports inner/left (small side unique key)")
    if salt is None:
        salt = choose_salt_factor(big, on)
    # partition id mixed in for the byte-identical-rows case; see the
    # salt derivation note in salted_groupby_sum.
    salted_big = big.withColumn(
        "_salt",
        F.pmod(
            F.xxhash64(*[F.col(c) for c in big.columns], F.spark_partition_id()),
            F.lit(salt),
        ),
    )
    replicated = small.withColumn(
        "_salt", F.explode(F.sequence(F.lit(0), F.lit(salt - 1)))
    ).withColumn("_salt", F.col("_salt").cast("long"))
    out = salted_big.join(replicated, [on, "_salt"], how)
    return out.drop("_salt")


def write_bucketed(
    df: DataFrame,
    table: str,
    bucket_cols: Sequence[str],
    n_buckets: int = 32,
    sort_cols: Sequence[str] = (),
    mode: str = "overwrite",
    path: str | None = None,
) -> None:
    """Persist a bucketed (and optionally sorted) catalog table.

    Two tables bucketed identically on their join key co-locate: the
    join plans with ZERO Exchange on either side — the shuffle is paid
    once at write time and amortized over every subsequent join/agg on
    that key. This is the 100 TB answer to repeatedly-joined fact
    tables (bucket both sides at ingest).
    """
    writer = df.write.mode(mode).format("parquet").bucketBy(
        int(n_buckets), *bucket_cols
    )
    if sort_cols:
        writer = writer.sortBy(*sort_cols)
    if path is not None:
        # External bucketed table: data under the caller's path, bucket
        # metadata in the session catalog (keeps the warehouse dir —
        # often the process cwd in local mode — untouched).
        writer = writer.option("path", path)
    writer.saveAsTable(table)


def bucketed_join(spark, left_table: str, right_table: str, on: str, how: str = "inner") -> DataFrame:
    """Join two co-bucketed catalog tables (shuffle-free when bucket
    specs match; verify with ``assert_no_shuffle_join``)."""
    return spark.table(left_table).join(spark.table(right_table), on, how)


def assert_no_shuffle_join(df: DataFrame) -> bool:
    """True when the executed join plan contains no shuffle Exchange
    (bucketing did its job). Diagnostic for tests/plan audits."""
    plan = df._jdf.queryExecution().executedPlan().toString()
    return "Exchange hashpartitioning" not in plan
