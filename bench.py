#!/usr/bin/env python
"""Benchmark harness: runs the engine's query catalog at
``$SPARK_GRAFT_SF_DIR`` (default /root/testdata/sf0.1) on
``local[$SPARK_GRAFT_CPUS]`` and prints ONE JSON line:

    {"metric": "catalog_total", "value": N, "unit": "sec",
     "queries": {"q1_pricing_summary": sec, ...}, "sf": 0.1}

Each query is materialized with a count-free full execution
(``write.format("noop")``) so the measured time is the real plan,
not a count shortcut. Session build / JVM spin-up is excluded.
"""

from __future__ import annotations

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")

# Headline set: every catalog query, heaviest shapes included — joins,
# window funcs, shingle/minhash dedup, cosine pair joins.
SKIP: set[str] = set()


def main() -> None:
    from etl_projects_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session(app_name="etl_projects_spark_bench")
    qs = entrymod.queries()

    # Warm the JVM + file-listing caches with the flagship once, and the
    # Python/Arrow UDF workers with a tiny pandas_udf pass — otherwise
    # the alphabetically-first Pandas-UDF query is billed ~1.5 s of
    # one-time worker spin-up that is not its cost.
    entrymod.entry(spark).write.format("noop").mode("overwrite").save()
    from pyspark.sql import functions as F

    from etl_projects_spark.operators.similarity import pair_dot

    (
        spark.range(64)
        .select(F.array(F.col("id").cast("double")).alias("v"))
        .select(pair_dot("v", "v"))
        .write.format("noop")
        .mode("overwrite")
        .save()
    )

    timings: dict[str, float] = {}
    for name in sorted(qs):
        if name in SKIP:
            continue
        t0 = time.perf_counter()
        qs[name](spark, SF_DIR).write.format("noop").mode("overwrite").save()
        timings[name] = round(time.perf_counter() - t0, 3)
        # Isolate queries (untimed): drop persisted frames, then force a
        # JVM GC so the ContextCleaner releases the previous query's
        # shuffle/broadcast state now instead of asynchronously inside
        # some later query's timed window.
        spark.catalog.clearCache()
        spark.sparkContext._jvm.System.gc()

    sf = None
    base = os.path.basename(SF_DIR.rstrip("/"))
    if base.startswith("sf"):
        try:
            sf = float(base[2:])
        except ValueError:
            pass

    print(
        json.dumps(
            {
                "metric": "catalog_total",
                "value": round(sum(timings.values()), 3),
                "unit": "sec",
                "queries": timings,
                "sf": sf,
            }
        )
    )


if __name__ == "__main__":
    main()
