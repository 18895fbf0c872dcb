"""Simulate the external driver's correctness gate exactly: a VANILLA
SparkSession (none of our build_session configs) runs the first N
catalog queries and compares each against its DuckDB oracle with the
driver-faithful hash (tests/oracle_check.compare).

This is the pre-rotation gate every round runs before committing a
new `_ROUND_PRIORITY` window — pytest's conftest session can mask
session-config assumptions (the nanosAsLong lesson), so the check
must use a bare session.

Usage:
    python tools/verify_window.py                 # first 50 at sf0.01
    python tools/verify_window.py --n 241         # whole catalog
    python tools/verify_window.py --sf-dir /root/testdata/sf0.1
    python tools/verify_window.py --names q1_pricing_summary,rolling_wau_daily
"""

from __future__ import annotations

import argparse
import os
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)
sys.path.insert(0, os.path.join(ROOT, "tests"))


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--n", type=int, default=50, help="window size")
    ap.add_argument("--sf-dir", default="/root/testdata/sf0.01")
    ap.add_argument(
        "--names", default="", help="comma-separated subset (overrides --n)"
    )
    ap.add_argument(
        "--cold",
        action="store_true",
        help="clear this repo's scratch artifacts (spark_graft_*) "
        "first, emulating the driver's fresh box: every build_once "
        "index (LSH bands, IVF clusters, train grams, stored sets) is "
        "rebuilt by the queries themselves — catches first-build and "
        "artifact-layout defects that warm local runs mask (r9 gate)",
    )
    args = ap.parse_args()

    if args.cold:
        import glob
        import shutil

        # Same root scratch_path() builds under (r9 ADVICE: a literal
        # /tmp glob deletes nothing when TMPDIR points elsewhere, and
        # a 'cold' run is then silently warm).
        from etl_projects_spark.operators.exec_util import (
            scratch_glob_pattern,
        )

        pattern = scratch_glob_pattern()
        cleared = 0
        for d in glob.glob(pattern):
            shutil.rmtree(d, ignore_errors=True)
            cleared += 1
        print(f"cold: cleared {cleared} scratch artifact(s) under {pattern}")

    from pyspark.sql import SparkSession

    spark = SparkSession.builder.master("local[8]").getOrCreate()
    spark.sparkContext.setLogLevel("ERROR")

    import __spark_entry__ as entrymod
    from oracle_check import compare

    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    names = (
        [n for n in args.names.split(",") if n]
        if args.names
        else list(qs)[: args.n]
    )
    bad = 0
    for name in names:
        try:
            if name not in osql:
                n_rows = qs[name](spark, args.sf_dir).count()
                print(f"{name}: rows-only ({n_rows} rows)")
                continue
            problems = compare(qs[name](spark, args.sf_dir), osql[name], args.sf_dir)
            if problems:
                bad += 1
                print(f"{name}: MISMATCH {problems}")
        except Exception as ex:  # surface, keep going
            bad += 1
            print(f"{name}: ERROR {str(ex).splitlines()[0][:200]}")
    print(f"window check: {len(names) - bad}/{len(names)} MATCH")
    return 1 if bad else 0


if __name__ == "__main__":
    sys.exit(main())
