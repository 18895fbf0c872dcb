"""Per-query proof-freshness report: which driver round last proved
each catalog query, oldest first — the input to every round's window
composition (the rotation rule retires the OLDEST rows first once
stale rows and additions are queued).

Reads the committed CORRECTNESS_r{N}.json records (each holds the 50
queries of that round's driver window). A query's freshness is the
LATEST round in which it appeared; queries with no row yet (new this
round) print as round 0 — they MUST be in the current window (the
churn guard enforces this independently).

Usage:
    python tools/freshness_report.py             # full table, oldest first
    python tools/freshness_report.py --counts    # rows per round only
    python tools/freshness_report.py --round 2   # only rows last proven in r2
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import re
import sys

ROOT = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, ROOT)


def _row_is_green(row) -> bool:
    """Only a PASSING driver row is a proof — a failed row in a record
    must NOT bump freshness, or the rotation rule would never re-queue
    the query and the stale-green-row problem recurs (r7 review; the
    r01/r03 records really do contain failed rows). ``hash_match`` may
    be absent for rows-only checks; only an explicit False fails."""
    if not isinstance(row, dict):
        return False
    return (
        row.get("rows_match") is True
        and row.get("schema_match") is True
        and row.get("err") in (None, "")
        and row.get("hash_match") is not False
    )


def latest_proof_rounds() -> dict[str, int]:
    import __spark_entry__ as entrymod

    latest = {name: 0 for name in entrymod.queries()}
    for path in sorted(glob.glob(os.path.join(ROOT, "CORRECTNESS_r*.json"))):
        m = re.search(r"CORRECTNESS_r(\d+)\.json$", path)
        if not m:
            continue
        rnd = int(m.group(1))
        with open(path) as f:
            for name, row in json.load(f).items():
                if name in latest and _row_is_green(row):
                    latest[name] = max(latest[name], rnd)
    return latest


def main() -> int:
    ap = argparse.ArgumentParser()
    ap.add_argument("--counts", action="store_true")
    ap.add_argument("--round", type=int, default=None)
    args = ap.parse_args()
    latest = latest_proof_rounds()
    if args.counts:
        from collections import Counter

        counted = [
            r for r in latest.values()
            if args.round is None or r == args.round
        ]
        for rnd, n in sorted(Counter(counted).items()):
            print(f"r{rnd}: {n} queries")
        return 0
    rows = sorted(latest.items(), key=lambda kv: (kv[1], kv[0]))
    for name, rnd in rows:
        if args.round is not None and rnd != args.round:
            continue
        print(f"r{rnd}  {name}")
    return 0


if __name__ == "__main__":
    sys.exit(main())
