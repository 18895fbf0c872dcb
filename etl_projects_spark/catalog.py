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
    """Lake database name for a source + layer, e.g. ``datalake_sales_raw``
    (the reference's name scheme, ``datalake_metastore_service.py:10-20``).
    The layer/source pair lives in the NAME; the storage layout below is
    flat ``<root>/<database>`` — pass this name as the ``database``."""
    return f"datalake_{source}_{Layer(layer).value}"


def database_location(root: str, database: str) -> str:
    """Storage root for a lake database — THE layout the writer uses
    (``TableWriter.table_path`` delegates here, so these helpers can
    never describe a path where no data lives)."""
    return os.path.join(root, database)


def table_location(root: str, database: str, table: str) -> str:
    """Storage path for one table inside its database location."""
    return os.path.join(database_location(root, database), table)


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

    Returns lexicographically sorted distinct values for ``column``
    (or, with ``column=None``, for the FIRST partition key found —
    never a merge across keys). Values are the raw directory strings:
    numeric callers must cast before picking min/max ('9' > '10'
    lexicographically). Naming a column the layout doesn't have raises
    (a typo would otherwise read as an empty table).
    """
    import os

    by_key: dict[str, set[str]] = {}
    for entry in sorted(os.listdir(path)):
        if "=" not in entry or not os.path.isdir(os.path.join(path, entry)):
            continue
        key, value = entry.split("=", 1)
        by_key.setdefault(key, set()).add(value)
    if not by_key:
        return []
    if column is None:
        column = sorted(by_key)[0]
    if column not in by_key:
        raise ValueError(
            f"no partition key {column!r} under {path}; found {sorted(by_key)}"
        )
    return sorted(by_key[column])
