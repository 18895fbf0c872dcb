"""Execution helpers shared by operators and catalog queries."""

from __future__ import annotations

from pyspark.sql import DataFrame


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
