"""JDBC warehouse sink (K5).

The reference's final hop copies DW tables into Redshift via a
Spectrum IAM-role COPY (job params at
``etl_projects/base/orchestration/.../dw_sub_dag_builder.py:93-108``;
the job itself is missing from the repo). The Spark-native equivalent
is a partitioned JDBC write; an S3-unload + COPY path stays the right
choice for Redshift specifically (documented stub below) since row
INSERTs through JDBC don't scale to warehouse volumes.

No JDBC driver jar nor database exists in this environment, so these
are exercised by config-assembly tests only; the call surface is the
stock ``DataFrameWriter`` so any standard driver drops in.
"""

from __future__ import annotations

from pyspark.sql import DataFrame
from pyspark.sql.readwriter import DataFrameWriter

DEFAULT_BATCH_SIZE = 10_000


def jdbc_writer(
    df: DataFrame,
    url: str,
    table: str,
    mode: str = "append",
    num_partitions: int | None = None,
    batch_size: int = DEFAULT_BATCH_SIZE,
    **options: str,
) -> DataFrameWriter:
    """Configured JDBC writer (call ``.save()`` to execute).

    ``num_partitions`` caps concurrent connections (default: the
    DataFrame's partitioning — repartition down for fragile targets);
    ``batchsize`` batches INSERTs per round trip.
    """
    out = df
    if num_partitions is not None:
        # repartition, NOT coalesce: coalesce(4) fuses upstream with
        # no shuffle barrier, collapsing the whole preceding job
        # (scans, joins, map work) onto 4 tasks — a cluster-wide stall
        # at warehouse volume. The repartition shuffle is the price of
        # keeping upstream parallelism while capping connections.
        out = df.repartition(num_partitions)
    writer = (
        out.write.format("jdbc")
        .mode(mode)
        .option("url", url)
        .option("dbtable", table)
        .option("batchsize", str(batch_size))
    )
    for k, v in options.items():
        writer = writer.option(k, v)
    return writer


def redshift_copy_stub(*_args, **_kwargs) -> None:
    """The live-AWS COPY dispatch only. The full stage→manifest→COPY
    pipeline is implemented and offline-tested in
    :mod:`etl_projects_spark.sinks.warehouse_copy` (staging +
    manifest + COPY SQL + a DuckDB warehouse double); what remains
    here is solely issuing that SQL to a real Redshift cluster, which
    needs live AWS credentials this environment lacks.
    """
    raise NotImplementedError(
        "live Redshift COPY dispatch needs AWS infra; use "
        "sinks.warehouse_copy (stage_for_copy + copy_statement) and "
        "issue the statement warehouse-side, or jdbc_writer for "
        "generic JDBC targets"
    )
