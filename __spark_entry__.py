"""Driver contract for the spark-graft builder (PySpark target).

The driver's verify runs ``entry(spark)`` as a smoke check, runs
each ``queries()[name]`` at sf=0.01 and compares it against the
matching ``oracle_sql()[name]`` via DuckDB (row-count + schema +
order-insensitive value-hash → CORRECTNESS_r{N}.json).

The actual catalog lives in ``etl_projects_spark.queries`` (and the
extension modules it imports); this file just re-exports it.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

import etl_projects_spark.queries_llm  # noqa: F401  (registers into the catalog)
import etl_projects_spark.queries_media  # noqa: F401
import etl_projects_spark.queries_mixing  # noqa: F401
import etl_projects_spark.queries_quality  # noqa: F401
import etl_projects_spark.queries_scale  # noqa: F401
import etl_projects_spark.queries_sql  # noqa: F401
import etl_projects_spark.queries_timeseries  # noqa: F401
import etl_projects_spark.queries_tpch_ext  # noqa: F401
from etl_projects_spark.queries import ORACLE, QUERIES
from etl_projects_spark.queries import q1_pricing_summary


def entry(spark: SparkSession) -> DataFrame:
    """Flagship query on /root/testdata/sf0.001: TPC-H Q1-style pricing
    summary (scan → filter → 8-agg groupBy)."""
    return q1_pricing_summary(spark, "/root/testdata/sf0.001")


def queries() -> dict[str, Callable[[SparkSession, str], DataFrame]]:
    """One entry per implemented operator from SURVEY.md §2."""
    return dict(QUERIES)


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable ANSI SQL twin for each query (omitted only for
    genuinely non-SQL-expressible operators → rows-only check)."""
    return dict(ORACLE)
