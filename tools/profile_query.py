"""Per-query optimization profiler (r15 optimization round).

Runs named catalog queries in bench-identical conditions (build_session,
noop sink, untimed warm pass available) and reports, per query:

- wall seconds for N timed executions (first + min),
- Spark job/stage/task counts for one execution (REST-free: the
  status-tracker deltas),
- the ``explain("formatted")`` text, optionally written to
  ``plans/r15/<query>_<tag>.txt`` for the judge's plan-claims check.

Usage:
    python tools/profile_query.py --names dsir_select,dedup_minhash_lsh \
        [--sf-dir /root/testdata/sf0.1] [--runs 2] [--save-plans before]
"""

from __future__ import annotations

import argparse
import json
import os
import sys
import time

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--names", required=True)
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.1")
    ap.add_argument("--runs", type=int, default=2)
    ap.add_argument(
        "--save-plans",
        default="",
        help="tag (e.g. 'before'/'after'): write plans/<round>/<q>_<tag>.txt",
    )
    ap.add_argument(
        "--plans-round",
        default="r16",
        help="plans/<round>/ subdirectory for --save-plans output",
    )
    ap.add_argument(
        "--no-warm",
        action="store_true",
        help="skip the bench-style warm-up passes",
    )
    args = ap.parse_args()
    names = [n for n in args.names.split(",") if n]

    from etl_projects_spark.session import build_session

    import __spark_entry__ as entrymod

    spark = build_session(app_name="etl_projects_spark_profile")
    spark.sparkContext.setLogLevel("ERROR")
    qs = entrymod.queries()
    sc = spark.sparkContext
    tracker = sc.statusTracker()

    if not args.no_warm:
        entrymod.entry(spark).write.format("noop").mode("overwrite").save()
        spark.createDataFrame(
            [(1, "warm")], "i int, s string"
        ).write.format("noop").mode("overwrite").save()

    results = {}
    for name in names:
        fn = qs[name]

        def run_once() -> float:
            t0 = time.perf_counter()
            fn(spark, args.sf_dir).write.format("noop").mode(
                "overwrite"
            ).save()
            dt = time.perf_counter() - t0
            spark.catalog.clearCache()
            sc._jvm.System.gc()
            return dt

        sc.setJobDescription(f"profile:{name}")
        jobs_before = set(tracker.getJobIdsForGroup(None) or [])
        times = [run_once()]
        jobs_after = set(tracker.getJobIdsForGroup(None) or [])
        n_jobs = len(jobs_after - jobs_before)
        for _ in range(args.runs - 1):
            times.append(run_once())
        sc.setJobDescription(None)

        df = fn(spark, args.sf_dir)
        plan_txt = df._jdf.queryExecution().explainString(
            spark._jvm.org.apache.spark.sql.execution.ExplainMode.fromString(
                "formatted"
            )
        )
        n_exchange = plan_txt.count("Exchange")
        n_reused = plan_txt.count("ReusedExchange")
        n_python = (
            plan_txt.count("BatchEvalPython")
            + plan_txt.count("ArrowEvalPython")
            + plan_txt.count("MapInArrow")
            + plan_txt.count("FlatMapGroupsInPandas")
        )
        if args.save_plans:
            dest_dir = os.path.join(ROOT, "plans", args.plans_round)
            os.makedirs(dest_dir, exist_ok=True)
            with open(
                os.path.join(dest_dir, f"{name}_{args.save_plans}.txt"), "w"
            ) as f:
                f.write(plan_txt)
        results[name] = {
            "first_s": round(times[0], 3),
            "min_s": round(min(times), 3),
            "all_s": [round(t, 3) for t in times],
            "n_jobs_first_run": n_jobs,
            "plan_exchanges": n_exchange,
            "plan_reused_exchanges": n_reused,
            "plan_python_nodes": n_python,
        }
        print(f"PROFILE {name} {json.dumps(results[name])}", flush=True)

    print("SUMMARY " + json.dumps(results))
    return 0


if __name__ == "__main__":
    sys.exit(main())
