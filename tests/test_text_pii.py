"""Normalization and PII-redaction operator semantics on crafted rows
(the synthetic corpus may contain no PII at all — these pin the
patterns themselves)."""

from __future__ import annotations

from pyspark.sql import functions as F

from etl_projects_spark.operators.text import (
    normalize_text,
    pii_counts,
    redact_pii,
)


def test_normalize_text(spark):
    df = spark.createDataFrame(
        [("  Hello,   WORLD!! 42 ",), ("hello world 42",)], "t STRING"
    )
    out = [r["n"] for r in df.select(normalize_text("t").alias("n")).collect()]
    assert out == ["hello world 42", "hello world 42"]


def test_redact_pii_patterns(spark):
    df = spark.createDataFrame(
        [
            ("mail bob.smith+x@example.co.uk now", 1, 0, 0),
            ("call 555-123-4567 or 555 987 6543", 0, 2, 0),
            ("ssn-ish 123456789 and card 4111111111111111", 0, 0, 2),
            ("id 12345678 is too short", 0, 0, 0),  # 8 digits: not a long id
            ("none here", 0, 0, 0),
        ],
        "t STRING, e INT, p INT, i INT",
    )
    ne, np_, ni = pii_counts("t")
    rows = df.select(
        "t", "e", "p", "i",
        ne.alias("ne"), np_.alias("np"), ni.alias("ni"),
        redact_pii("t").alias("red"),
    ).collect()
    for r in rows:
        assert (r["ne"], r["np"], r["ni"]) == (r["e"], r["p"], r["i"]), r["t"]
        for marker, n in (("<EMAIL>", r["e"]), ("<PHONE>", r["p"]), ("<ID>", r["i"])):
            assert r["red"].count(marker) == n, (r["t"], r["red"])


def test_redaction_does_not_count_email_digits_as_ids(spark):
    # The email local part contains a 9-digit run; counts must attribute
    # it to the email, not double-report an <ID>.
    df = spark.createDataFrame([("reach me: a123456789@example.com",)], "t STRING")
    ne, np_, ni = pii_counts("t")
    r = df.select(ne.alias("ne"), np_.alias("np"), ni.alias("ni"),
                  redact_pii("t").alias("red")).head()
    assert (r["ne"], r["np"], r["ni"]) == (1, 0, 0)
    assert r["red"] == "reach me: <EMAIL>"
