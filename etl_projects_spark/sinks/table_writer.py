"""Partitioned table writer (sinks K1–K4).

Re-expresses the reference's S3 table loader
(``etl_projects/base/loaders/s3_loader.py:15-40``): overwrite-mode write
of a DataFrame to ``<database_location>/<table>``, format chosen by the
layer policy, ``maxRecordsPerFile`` cap, optional Hive partitioning —
plus the gzip JSON-lines export (``scrapers/exporters.py:6-30``).

Scale notes (100 TB design):

- ``partitionBy`` + ``spark.sql.sources.partitionOverwriteMode=dynamic``
  (set in session.py) makes incremental re-runs idempotent: only the
  partitions present in the batch are replaced.
- ``maxRecordsPerFile`` bounds file size without an extra shuffle.
- File-count control is a *repartition by the partition columns* before
  the write (one task → one file per Hive partition), not a count-based
  repartition — no extra job, no full scan (SURVEY §3-E2 hazard removed).
"""

from __future__ import annotations

import os
from collections.abc import Sequence

from pyspark.sql import DataFrame

from etl_projects_spark.config import (
    MAX_RECORDS_PER_FILE,
    Layer,
    StorageFormat,
    layer_storage_format,
)


class TableWriter:
    """Writes DataFrames as lake tables under a filesystem root."""

    def __init__(self, root: str, max_records_per_file: int = MAX_RECORDS_PER_FILE):
        self.root = root
        self.max_records_per_file = max_records_per_file

    def table_path(self, database: str, table: str) -> str:
        from etl_projects_spark.catalog import table_location

        return table_location(self.root, database, table)

    def load_table(
        self,
        df: DataFrame,
        database: str,
        table: str,
        layer: Layer | str = Layer.CLEAN,
        partitions: Sequence[str] = (),
        mode: str = "overwrite",
        storage: StorageFormat | None = None,
        one_file_per_partition: bool = True,
        cluster_by: Sequence[str] = (),
        **options: str,
    ) -> str:
        """Write ``df`` as ``<root>/<database>/<table>``; returns the path.

        ``mode="overwrite"`` with ``partitions`` only replaces the incoming
        partitions (dynamic overwrite) — the incremental-load contract.

        ``cluster_by`` sorts rows *within* each write task before the
        write (no extra shuffle): parquet then stores tight min/max
        stats on those columns, so point/range predicates skip whole
        row groups at read time — the poor man's clustering key, and
        the difference between scanning a 100 TB table and skipping
        most of it.
        """
        fmt = storage or layer_storage_format(layer)
        path = self.table_path(database, table)
        if partitions and one_file_per_partition:
            # REBALANCE (not plain repartition) keyed by the Hive
            # partition columns. Default-ON (r8 VERDICT item 6, the
            # sliver-file audit): without the shuffle a partitioned
            # write keeps the upstream partitioning and every task
            # sprays a file into every partition directory —
            # tasks×partitions tiny files at cluster scale. The
            # rebalance hint beats repartition(*partitions) at BOTH
            # ends (measured, SCALE.md invariant 7): small partition
            # values still land wholly in one task → one file per
            # directory, while AQE splits an oversized value across
            # tasks at the advisory partition size (verified: a 98%
            # skewed key wrote 4 advisory-sized files while the tiny
            # keys kept 1 each) — plain repartition would funnel a
            # 100 TB-table's single hot partition through ONE task.
            # Without AQE the hint degrades to the plain hash shuffle,
            # never to the sliver shape. Callers with a pre-co-located
            # df can opt out to skip the redundant exchange.
            df = df.hint("rebalance", *partitions)
        if cluster_by:
            df = df.sortWithinPartitions(*cluster_by)
        writer = (
            df.write.mode(mode)
            .format(fmt.format)
            .option("maxRecordsPerFile", str(self.max_records_per_file))
        )
        for k, v in {**fmt.writer_options, **options}.items():
            writer = writer.option(k, v)
        if partitions:
            writer = writer.partitionBy(*partitions)
        writer.save(path)
        return path


def write_gzip_jsonl(df: DataFrame, path: str, mode: str = "overwrite") -> str:
    """Gzip JSON-lines export (the raw-feed format, sink K4)."""
    df.write.mode(mode).option("compression", "gzip").json(path)
    return path
