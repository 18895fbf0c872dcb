"""Metastore naming + table registration.

Pure-function re-expression of the reference's metastore naming services
(``etl_projects/base/db/datalake_metastore_service.py:10-35`` — database
name ↔ storage-path mapping per layer — and
``.../dw_metastore_service.py:4-21`` — dw schema naming), plus helpers to
register the driver's testdata parquet as catalog views.
"""

from __future__ import annotations

import os

from pyspark.sql import SparkSession

from etl_projects_spark.config import Layer

TESTDATA_TABLES = (
    "region",
    "nation",
    "customer",
    "supplier",
    "part",
    "orders",
    "lineitem",
    "events",
    "documents",
    "embeddings",
)


def database_name(source: str, layer: Layer | str) -> str:
    """Lake database name for a source + layer, e.g. ``datalake_sales_raw``."""
    return f"datalake_{source}_{Layer(layer).value}"


def database_location(root: str, source: str, layer: Layer | str) -> str:
    """Storage root for a lake database (path-per-layer-per-source)."""
    return os.path.join(root, Layer(layer).value, source)


def table_location(root: str, source: str, layer: Layer | str, table: str) -> str:
    """Storage path for a single table inside its database location."""
    return os.path.join(database_location(root, source, layer), table)


def dw_schema_name(entity: str, staging: bool = False) -> str:
    """DW schema name; staging entities land in ``<entity>_staging``."""
    return f"{entity}_staging" if staging else entity


def register_testdata(spark: SparkSession, sf_dir: str) -> list[str]:
    """Register every testdata parquet under ``sf_dir`` as a temp view.

    Parquet scans keep full pushdown/pruning through a temp view, so
    registration costs nothing at plan time. Reads route through
    ``queries.load`` so the TIMESTAMP(NANOS) handling for ``events``
    applies here too — a vanilla session (no ``nanosAsLong`` conf)
    would otherwise fail on the events footer.
    """
    from etl_projects_spark.queries import load

    registered = []
    for name in TESTDATA_TABLES:
        path = os.path.join(sf_dir, f"{name}.parquet")
        if os.path.exists(path):
            load(spark, sf_dir, name).createOrReplaceTempView(name)
            registered.append(name)
    return registered


def discover_partition_values(path: str, column: str | None = None) -> list[str]:
    """Partition-value discovery over a Hive-layout table directory
    (parity with ``base_spark.py:17-41``'s ``key=value`` S3 listing;
    Spark's file index does this implicitly at scan time — this is the
    explicit control-plane variant for callers that need the values,
    e.g. to pick the latest ``ds`` batch).

    Returns sorted distinct values for ``column`` (or the first
    partition key found).
    """
    import os

    values = []
    for entry in sorted(os.listdir(path)):
        if "=" not in entry or not os.path.isdir(os.path.join(path, entry)):
            continue
        key, value = entry.split("=", 1)
        if column is None or key == column:
            values.append(value)
    return sorted(set(values))
