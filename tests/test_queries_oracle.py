"""End-to-end correctness: every catalog query vs its DuckDB oracle at
sf0.01 — a local replica of the driver's t2 gate."""

import os
import sys

import pytest

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import __spark_entry__ as entrymod  # noqa: E402
from tests.conftest import SF_DIR_ORACLE  # noqa: E402
from tests.oracle_check import compare  # noqa: E402

QUERIES = entrymod.queries()
ORACLES = entrymod.oracle_sql()


def test_entry_smoke(spark):
    df = entrymod.entry(spark)
    rows = df.collect()
    assert len(rows) > 0
    assert df.columns


@pytest.mark.parametrize("name", sorted(QUERIES))
def test_query_matches_oracle(spark, name):
    df = QUERIES[name](spark, SF_DIR_ORACLE)
    if name not in ORACLES:
        # rows-only check for non-SQL-expressible ops
        assert df.count() >= 0
        return
    problems = compare(df, ORACLES[name], SF_DIR_ORACLE)
    assert not problems, f"{name}: " + "; ".join(problems)
