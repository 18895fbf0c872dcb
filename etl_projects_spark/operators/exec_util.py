"""Execution helpers shared by operators and catalog queries."""

from __future__ import annotations

from pyspark.sql import DataFrame


def fan_out(df: DataFrame) -> DataFrame:
    """Ensure at least the session's default parallelism ahead of a
    CPU-bound per-row stage.

    A small corpus arriving as one parquet file scans as ONE partition
    and serializes the whole stage on a single core (measured: the
    sf0.1 shingle stage alone was 4.2 s single-task vs ~0.4 s fanned
    out). Rows here are tiny, so the round-robin shuffle is cheap next
    to the compute. At scale the scan already carries more partitions
    than cores and this is a no-op — no added shuffle.
    """
    if df.isStreaming:
        # No partition introspection on a stream; micro-batch
        # parallelism is the source's (maxFilesPerTrigger etc.).
        return df
    target = df.sparkSession.sparkContext.defaultParallelism
    if df.rdd.getNumPartitions() < target:
        return df.repartition(target)
    return df


def materialize(df: DataFrame) -> DataFrame:
    """persist + eager count: a deterministic cache barrier.

    A lazily persisted relation that feeds MULTIPLE branches of one
    job is raced by those branches — each computes the full upstream
    before the cache is populated, duplicating the work
    nondeterministically (measured up to 5× swings on the dedup
    queries). An eager count materializes the cache exactly once,
    while — unlike localCheckpoint — keeping the full lineage visible
    to the plan audit (InMemoryTableScan retains the cached subtree).
    """
    df = df.persist()
    df.count()
    return df
