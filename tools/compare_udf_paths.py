#!/usr/bin/env python
"""Measure execution-path cost (builtin expressions vs Arrow Python UDF
vs legacy pickled UDF) on two workloads that bracket the engine's hot
paths — the MEASURED evidence behind SCALE.md's UDF-policy section.

Workload A — flat column arithmetic (`length/split/when` scoring):
the shape most catalog queries have. Builtins win: the whole
projection stays inside whole-stage codegen, no Python worker, no
serialization.

Workload B — nested-array string work (word 3-gram shingle hashing,
the dedup family's first stage): Spark's higher-order functions
(`transform`, lambda expressions) are INTERPRETED, not codegen'd, and
each shingle materializes through several expression nodes — so a
tight Python loop over the same tokens can actually beat the
expression chain at local scale. The repo keeps the expression path
because (a) it needs md5 for bit-exact DuckDB-oracle parity, and
(b) no Python workers means no per-executor worker memory at 1000
executors; but the honest local measurement is recorded here, and the
shingle stage is the first candidate for an Arrow-batched rewrite if
cluster profiling shows it hot.

Run:  python tools/compare_udf_paths.py       (defaults to sf0.1)
Prints one JSON line; input relation is exploded REPEAT x and cached
so timings measure ONLY the projection. Each path runs twice, min
kept. Results are cross-checked equal before timing is reported.
"""

# NOTE: no `from __future__ import annotations` — pandas_udf/udf infer
# eval types from RUNTIME type hints; stringified annotations break it.
import hashlib
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

SF_DIR = os.environ.get("SPARK_GRAFT_SF_DIR", "/root/testdata/sf0.1")
REPEAT = int(os.environ.get("SPARK_GRAFT_UDF_BENCH_REPEAT", "32"))


def main() -> None:
    from pyspark.sql import functions as F
    from pyspark.sql.functions import udf
    from pyspark.sql.types import ArrayType, DoubleType, LongType

    from etl_projects_spark.operators import dedup
    from etl_projects_spark.queries import load
    from etl_projects_spark.session import build_session

    spark = build_session(app_name="udf_path_bench")
    spark.sparkContext.setLogLevel("ERROR")
    docs = load(spark, SF_DIR, "documents").select("doc_id", "text")
    big = (
        docs.withColumn("_r", F.explode(F.expr(f"sequence(1, {REPEAT})")))
        .repartition(32)
        .select("doc_id", "text")
        .persist()
    )
    n_rows = big.count()  # materialize: timings measure ONLY the projection

    # ---- workload A: flat scoring ------------------------------------
    def a_builtin(df):
        n = F.size(F.split("text", " "))
        return df.select(
            (F.length("text").cast("double") / n
             + F.when(n > 50, 1.0).otherwise(0.0)).alias("score")
        )

    def py_score(text: str) -> float:
        toks = text.split(" ")
        return len(text) / len(toks) + (1.0 if len(toks) > 50 else 0.0)

    a_arrow = udf(DoubleType(), useArrow=True)(py_score)
    a_legacy = udf(DoubleType(), useArrow=False)(py_score)

    # ---- workload B: shingle hashing ---------------------------------
    def b_builtin(df):
        # The production path: staged token array, HOF transform, md5
        # (md5 is the cross-engine-parity choice; see dedup.hex60).
        return dedup.word_shingle_sets(df).select(F.size("sh_set").alias("n"))

    def py_shingles(text: str):
        toks = text.split(" ")
        out = set()
        for i in range(max(0, len(toks) - 2)):
            s = " ".join(toks[i:i + 3])
            out.add(int(hashlib.md5(s.encode()).hexdigest()[:15], 16))
        return sorted(out)

    b_arrow = udf(ArrayType(LongType()), useArrow=True)(py_shingles)
    b_legacy = udf(ArrayType(LongType()), useArrow=False)(py_shingles)

    # ---- workload C: the FULL shingle-stage contract ------------------
    # (id, sh_set) with array_distinct's first-occurrence order — what
    # word_shingle_sets actually returns and what the stored `sets`
    # artifact persists. Workload B sizes the arrays away; this one
    # carries them, so it measures the real candidate swap (r9 VERDICT
    # item 6: Arrow-batched mapInPandas vs the interpreted HOF chain).
    def c_builtin(df):
        return dedup.word_shingle_sets(df)

    def c_map_in_pandas(df):
        return dedup.word_shingle_sets_arrow(df)

    workloads = {
        "flat_scoring": {
            "builtin": a_builtin,
            "arrow_udf": lambda df: df.select(a_arrow("text").alias("score")),
            "legacy_udf": lambda df: df.select(a_legacy("text").alias("score")),
        },
        "shingle_hashing": {
            "builtin": b_builtin,
            "arrow_udf": lambda df: df.select(
                F.size(b_arrow("text")).alias("n")),
            "legacy_udf": lambda df: df.select(
                F.size(b_legacy("text")).alias("n")),
        },
        "shingle_sets_full": {
            "builtin": c_builtin,
            "map_in_pandas": c_map_in_pandas,
        },
        # ---- workload D: span-width sets on the REAL corpus ----------
        # n=20, straight off the parquet scan — no REPEAT explode, no
        # persist: the exact shape the substring_span_* family runs
        # (r10 VERDICT item 6: the twin was measured at n=3 parity and
        # on the synthetic 32×-repeated relation; the adoption decision
        # needs the production shape, scan cost included).
        "span_sets_real_n20": {
            "builtin": lambda df: dedup.word_shingle_sets(df, n=20),
            "map_in_pandas": lambda df: dedup.word_shingle_sets_arrow(
                df, n=20
            ),
        },
    }
    # Workloads timed on the RAW scan instead of the cached 32× blow-up.
    raw_input_workloads = {"span_sets_real_n20"}

    # Cross-check each workload's paths agree on the small relation.
    for wname, paths in workloads.items():
        ref = None
        for pname, fn in paths.items():
            got = sorted(tuple(r) for r in fn(docs).collect())
            if ref is None:
                ref = got
            assert got == ref or all(
                abs(a[0] - b[0]) < 1e-9 for a, b in zip(got, ref)
            ), f"{wname}/{pname} disagrees"

    results = {}
    for wname, paths in workloads.items():
        results[wname] = {}
        rel = docs if wname in raw_input_workloads else big
        for pname, fn in paths.items():
            best = float("inf")
            for _ in range(2):
                t0 = time.perf_counter()
                fn(rel).write.format("noop").mode("overwrite").save()
                best = min(best, time.perf_counter() - t0)
            results[wname][pname] = round(best, 3)

    print(json.dumps({
        "metric": "udf_path_seconds",
        "sf_dir": SF_DIR,
        "rows": n_rows,
        "workloads": results,
    }))


if __name__ == "__main__":
    main()
