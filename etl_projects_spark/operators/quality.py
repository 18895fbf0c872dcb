"""Data-quality operators (SURVEY §2.8, Q1–Q4).

The reference validates row-by-row in Python (schematics models,
``scrapers/validators.py:5-13``) and asserts batch counts at spider
close (``scrapers/monitors.py:5-34``). Re-expressed as set-based
DataFrame checks — one codegen'd projection computes every rule flag
for the whole batch; monitors are aggregate predicates usable as
``LakeEngine.promote_to_dw`` gates (Q4, ``dw_sub_dag_builder.py:55-57``).

Scale: validation is a narrow map (no shuffle); monitor counts are a
single partial-aggregated ``count``. Violation sampling uses ``limit``,
never a driver-side scan of all errors.
"""

from __future__ import annotations

from collections.abc import Callable, Mapping, Sequence

from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F

ERRORS_COL = "_errors"

# A rule maps a name → boolean Column predicate that is TRUE when the
# row is VALID. The schematics equivalents:
#   required     → col.isNotNull()
#   typed        → col.cast(t).isNotNull() (when source is non-null)
#   regex-dated  → to_date(col, 'yyyy-MM-dd').isNotNull()
Rule = Column


def required(col: str) -> Rule:
    return F.col(col).isNotNull()


def castable(col: str, to_type: str) -> Rule:
    """Valid when the value is null or casts cleanly (no silent nulls)."""
    return F.col(col).isNull() | F.col(col).cast(to_type).isNotNull()


def date_format_ok(col: str, fmt: str = "yyyy-MM-dd") -> Rule:
    """The reference's regex-validated date string (`curr_date`
    ``\\d{4}-\\d{2}-\\d{2}``, ``validators.py:9-12``) as a real parse."""
    return F.col(col).isNull() | F.try_to_timestamp(
        F.col(col), F.lit(fmt)
    ).isNotNull()


def in_set(col: str, allowed: Sequence) -> Rule:
    return F.col(col).isNull() | F.col(col).isin(list(allowed))


def non_negative(col: str) -> Rule:
    return F.col(col).isNull() | (F.col(col) >= 0)


def validate(df: DataFrame, rules: Mapping[str, Rule]) -> DataFrame:
    """Q1: append ``_errors array<string>`` — names of violated rules.

    One projection over the scan; empty array = valid row. Filtering
    valid rows afterward is ``size(_errors) = 0`` (still pushdown-able
    since the flags are deterministic expressions).
    """
    errs = F.array_compact(
        F.array(
            *[
                F.when(~rule, F.lit(name)).otherwise(F.lit(None))
                for name, rule in rules.items()
            ]
        )
    )
    return df.withColumn(ERRORS_COL, errs)


def valid_rows(validated: DataFrame) -> DataFrame:
    return validated.filter(F.size(ERRORS_COL) == 0).drop(ERRORS_COL)


def violation_counts(validated: DataFrame) -> DataFrame:
    """Per-rule violation totals (one explode + partial-agg count)."""
    return (
        validated.select(F.explode(ERRORS_COL).alias("rule"))
        .groupBy("rule")
        .agg(F.count("*").alias("n_violations"))
    )


# ---- monitors (Q2/Q3): aggregate gates for promote_to_dw -------------------

Check = Callable[[DataFrame], tuple[bool, str]]


def min_count_monitor(threshold: int) -> Check:
    """Q2 (``monitors.py:5-17``): batch must have >= threshold rows."""

    def check(df: DataFrame) -> tuple[bool, str]:
        n = df.limit(threshold).count() if threshold else 0
        ok = n >= threshold
        return ok, f"min_count: got {n}, need >= {threshold}"

    return check


def zero_errors_monitor(rules: Mapping[str, Rule]) -> Check:
    """Q3 (``monitors.py:20-30``): no rule violations in the batch."""

    def check(df: DataFrame) -> tuple[bool, str]:
        validated = df if ERRORS_COL in df.columns else validate(df, rules)
        n_bad = validated.filter(F.size(ERRORS_COL) > 0).limit(1).count()
        return n_bad == 0, "zero_errors: found violating rows" if n_bad else "ok"

    return check


def profile_table(df: DataFrame, cols: Sequence[str]) -> DataFrame:
    """Per-column profile: (column, n_rows, n_null, n_distinct) — the
    standard pre-load data-profiling report.

    ONE aggregation job for every column (Catalyst expands the
    multi-column distinct aggregates into a single shuffled plan with
    partial aggregation); the single metrics row then melts to
    per-column rows with a ``stack`` projection — no per-column jobs,
    no driver loop over columns.
    """
    aggs = []
    for c in cols:
        aggs += [
            F.count(F.lit(1)).alias(f"n_{c}"),
            F.sum(F.col(c).isNull().cast("long")).alias(f"null_{c}"),
            F.count_distinct(F.col(c)).alias(f"dist_{c}"),
        ]
    one = df.agg(*aggs)
    stack_args = ", ".join(f"'{c}', n_{c}, null_{c}, dist_{c}" for c in cols)
    return one.selectExpr(
        f"stack({len(cols)}, {stack_args}) AS "
        "(column, n_rows, n_null, n_distinct)"
    )


def observed_monitor(
    df: DataFrame, rules: Mapping[str, Rule], name: str = "quality"
):
    """Q2/Q3 monitors at ZERO extra cost: attach an ``observe`` node
    carrying row count + per-rule violation counts, so the metrics are
    computed as a side effect of whatever action the pipeline was
    going to run anyway (the write, the export) — no second scan, no
    separate monitor job. At 100 TB that is the difference between
    monitoring for free and paying a full table pass per rule set.

    Returns ``(df_observed, observation)``; read
    ``observation.get`` AFTER an action has materialized the frame:
    ``{"n_rows": ..., "viol_<rule>": ...}``.
    """
    from pyspark.sql import Observation

    obs = Observation(name)
    metrics = [F.count(F.lit(1)).alias("n_rows")] + [
        F.sum((~rule).cast("long")).alias(f"viol_{rule_name}")
        for rule_name, rule in rules.items()
    ]
    return df.observe(obs, *metrics), obs
