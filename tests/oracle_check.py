"""Local replica of the driver's correctness gate: run a Spark query and
its DuckDB oracle side-by-side and compare row count, schema (column
names), and an order-insensitive value hash.

Used by tests to catch oracle drift before the driver does.
"""

from __future__ import annotations

import math
import os

import duckdb

TABLES = (
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


def duckdb_con(sf_dir: str) -> duckdb.DuckDBPyConnection:
    con = duckdb.connect()
    for t in TABLES:
        path = os.path.join(sf_dir, f"{t}.parquet")
        if os.path.exists(path):
            con.execute(f"CREATE VIEW {t} AS SELECT * FROM read_parquet('{path}')")
    return con


def _norm(v):
    if isinstance(v, float):
        if math.isnan(v):
            return "NaN"
        return repr(round(v, 9))
    if hasattr(v, "isoformat"):
        return v.isoformat()
    return repr(v)


def canonical(rows, columns):
    """Sort columns by name, normalize values, sort rows → list of tuples."""
    order = sorted(range(len(columns)), key=lambda i: columns[i])
    out = [tuple(_norm(r[i]) for i in order) for r in rows]
    out.sort()
    return sorted(columns), out


def compare(spark_df, oracle_sql: str, sf_dir: str) -> list[str]:
    """Returns a list of mismatch descriptions (empty = match)."""
    problems = []
    srows = [tuple(r) for r in spark_df.collect()]
    scols = list(spark_df.columns)
    con = duckdb_con(sf_dir)
    res = con.execute(oracle_sql)
    ocols = [d[0] for d in res.description]
    orows = res.fetchall()
    if sorted(scols) != sorted(ocols):
        problems.append(f"schema mismatch: spark={sorted(scols)} oracle={sorted(ocols)}")
        return problems
    if len(srows) != len(orows):
        problems.append(f"row count mismatch: spark={len(srows)} oracle={len(orows)}")
    _, s_can = canonical(srows, scols)
    _, o_can = canonical(orows, ocols)
    if s_can != o_can:
        diffs = [
            f"  spark={s} oracle={o}" for s, o in zip(s_can, o_can) if s != o
        ][:5]
        only_s = [r for r in s_can if r not in set(o_can)][:3]
        only_o = [r for r in o_can if r not in set(s_can)][:3]
        problems.append(
            "value mismatch:\n"
            + "\n".join(diffs)
            + f"\n  only-in-spark={only_s}\n  only-in-oracle={only_o}"
        )
    return problems
