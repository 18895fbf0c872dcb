"""Property-based tests (hypothesis): invariants that hold for ALL
inputs, not just fixtures — name normalization, winnowing guarantee,
quality-score bounds."""

from __future__ import annotations

import hashlib
import re

from hypothesis import given, settings, strategies as st

from etl_projects_spark.functions.names import format_column_name

NAME_CHARS = st.text(
    alphabet=st.characters(whitelist_categories=("Lu", "Ll", "Nd"),
                           whitelist_characters=" .()-_%/"),
    min_size=0, max_size=40,
)


@given(NAME_CHARS)
@settings(max_examples=300, deadline=None)
def test_format_column_name_idempotent(name):
    once = format_column_name(name)
    assert format_column_name(once) == once


@given(NAME_CHARS)
@settings(max_examples=300, deadline=None)
def test_format_column_name_shape(name):
    out = format_column_name(name)
    # Output is snake_case-safe: word chars only (Unicode letters kept,
    # per the reference's strip semantics), lowercase, no separators.
    assert re.fullmatch(r"\w*", out), out
    assert out == out.lower()
    assert "__" not in out and " " not in out and "." not in out


@given(st.integers(0, 2**60 - 1), st.integers(0, 2**60 - 1))
@settings(max_examples=200, deadline=None)
def test_minhash_perm_stays_in_range(h, _):
    from etl_projects_spark.operators.dedup import HASH_PRIME, MINHASH_COEFFS

    for a, b in MINHASH_COEFFS:
        v = (a * (h % HASH_PRIME) + b) % HASH_PRIME
        assert 0 <= v < HASH_PRIME
        # no Python-int overflow concerns map to Spark longs:
        assert a * (HASH_PRIME - 1) + b < 2**63


def test_winnowing_shared_run_guarantee(spark):
    """Winnowing's core guarantee: two docs sharing a run of
    >= w + n - 1 tokens share at least one fingerprint."""
    from etl_projects_spark.operators import dedup

    shared = "alpha beta gamma delta epsilon zeta"  # 6 tokens = w+n-1
    docs = spark.createDataFrame(
        [(1, f"one two three {shared} x y z"),
         (2, f"{shared} p q r s t u v w")],
        "doc_id long, text string",
    )
    fps = dedup.winnow_fingerprints(docs).collect()
    fp1 = {r["fp"] for r in fps if r["id"] == 1}
    fp2 = {r["fp"] for r in fps if r["id"] == 2}
    assert fp1 & fp2, "shared 6-token run must yield a shared fingerprint"


@given(
    st.lists(
        st.text(
            alphabet=st.characters(blacklist_categories=("Cs",), max_codepoint=0x2FFF),
            min_size=0,
            max_size=40,
        ),
        min_size=1,
        max_size=25,
        unique=True,
    )
)
@settings(max_examples=25, deadline=None)
def test_hex60_matches_duckdb_md5_cast(strings):
    """Cross-engine hash parity is load-bearing for the whole dedup
    family: Spark's conv(substr(md5,1,15),16,10) must equal DuckDB's
    CAST('0x'||substr(md5,1,15) AS BIGINT) for arbitrary unicode."""
    import duckdb

    con = duckdb.connect()
    duck = [
        con.execute(
            "SELECT CAST(('0x' || substr(md5(?), 1, 15)) AS BIGINT)", [s]
        ).fetchone()[0]
        for s in strings
    ]
    py = [int(hashlib.md5(s.encode()).hexdigest()[:15], 16) for s in strings]
    assert duck == py
