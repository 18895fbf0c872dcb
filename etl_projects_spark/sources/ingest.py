"""Ingestion sources: declared-schema item ingest + gzip JSONL feeds.

Spark-first re-expression of the reference's scrape→validate→export
path (SURVEY §3-E3):

- the Scrapy/Selenium Yahoo-Finance spider
  (``etl_projects/scrapers/spiders/yahoo_finance.py:26-99``) becomes a
  driver-side fetcher producing plain rows — HTML fetching is not a
  Spark operator; the FETCH is stubbed with a deterministic fake (no
  network/Selenium here) but the PARSE is real:
  ``sources/quote_html.py`` extracts the same fields from a rendered
  page, tested offline against ``tests/fixtures/quote_page.html``;
- the schematics item models (``scrapers/items.py:11-14``,
  ``validators.py:5-13``) become declared ``StructType`` schemas at
  ``createDataFrame`` — the schema contract enforced at the raw
  boundary;
- the string-coercion pipeline (``scrapers/pipelines.py:10-17``)
  becomes one cast projection;
- the gzip JSON-lines feed exporter (``scrapers/exporters.py:6-30``)
  becomes ``df.write.option("compression","gzip").json(path)``.

Scale: ingest parallelism comes from ``spark.createDataFrame`` slicing
rows across partitions; for continuous feeds use
``streaming.jobs.stream_from_directory`` over the landed JSONL.
"""

from __future__ import annotations

import hashlib
from collections.abc import Callable, Iterable, Mapping
from datetime import date
from typing import NamedTuple

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.types import (
    DoubleType,
    StringType,
    StructField,
    StructType,
)

# The scraped stock-quote item: name/ticker/currency/price plus the
# quote-summary key/values and the batch date (validators.py:5-13 — the
# campaign model's int/float/string + regex-dated fields, generalized).
QUOTE_SCHEMA = StructType(
    [
        StructField("ticker", StringType(), False),
        StructField("company_name", StringType(), True),
        StructField("currency", StringType(), True),
        StructField("current_price", DoubleType(), True),
        StructField("previous_close", DoubleType(), True),
        StructField("market_cap", StringType(), True),
        StructField("curr_date", StringType(), False),  # YYYY-MM-DD (regex-validated)
    ]
)


def fetch_quotes_stub(tickers: Iterable[str], ds: date | str) -> list[dict]:
    """Deterministic stand-in for the Selenium quote scraper (S4).

    Real implementation renders finance pages and parses the quote
    summary; neither a browser nor network exists here, so prices are
    derived from a stable hash of (ticker, ds). Swap this function for
    a real fetcher without touching any Spark code downstream.
    """
    out = []
    for t in tickers:
        seed = int.from_bytes(
            hashlib.sha256(f"{t}|{ds}".encode()).digest()[:6], "big"
        )
        price = round(10 + (seed % 100_000) / 100.0, 2)
        out.append(
            {
                "ticker": t,
                "company_name": f"{t} Inc.",
                "currency": "USD",
                "current_price": price,
                "previous_close": round(price * 0.99, 2),
                "market_cap": f"{(seed % 900) + 100}B",
                "curr_date": str(ds),
            }
        )
    return out


def ingest_items(
    spark: SparkSession,
    rows: Iterable[Mapping],
    schema: StructType = QUOTE_SCHEMA,
) -> DataFrame:
    """Declared-schema ingest (S5): rows → DataFrame, no inference."""
    return spark.createDataFrame(list(rows), schema=schema)


def cast_all_to_string(df: DataFrame) -> DataFrame:
    """The raw-boundary string-coercion pipeline (P11,
    ``pipelines.py:10-17``): one cast projection, fully codegen'd."""
    return df.select([F.col(c).cast("string").alias(c) for c in df.columns])


def export_jsonl_gz(df: DataFrame, path: str) -> None:
    """Gzip JSON-lines feed export (K4, ``exporters.py:6-30``).

    Delegates to :func:`~etl_projects_spark.sinks.table_writer.
    write_gzip_jsonl` — one implementation of the K4 format, so a
    format change cannot silently fork between the source-side and
    sink-side export paths."""
    from etl_projects_spark.sinks.table_writer import write_gzip_jsonl

    write_gzip_jsonl(df, path)


def read_jsonl_gz(
    spark: SparkSession, path: str, schema: StructType | str | None = None
) -> DataFrame:
    """Read a landed JSONL feed back; pass the declared schema to skip
    the inference scan (required on a 100 TB raw layer)."""
    reader = spark.read
    if schema is not None:
        reader = reader.schema(schema)
    return reader.json(path)


class QuarantineSplit(NamedTuple):
    """``(good, quarantined, unpersist)`` — both splits share one cached
    parse of the feed; the caller owns that cache and must call
    ``unpersist()`` once both sides are consumed (materialized or
    written), or repeated ingests accumulate cached relations."""

    good: DataFrame
    quarantined: DataFrame
    unpersist: Callable[[], None]


def read_jsonl_quarantine(
    spark: SparkSession, path: str, schema: str
) -> QuarantineSplit:
    """Read a raw JSONL feed with per-record fault isolation: returns
    ``QuarantineSplit(good, quarantined, unpersist)``.

    The Spark-native form of the reference's per-item validation
    (``scrapers/validators.py:5-13`` rejects bad items one at a time;
    ``monitors.py`` counts them): PERMISSIVE mode routes malformed
    lines into ``_corrupt_record`` instead of failing the job — on a
    100 TB raw layer one broken line must never kill the load. The
    good side drops the marker column; the quarantine side carries the
    raw line for replay/debug and feeds the zero-errors monitor
    (``operators/quality.py``).

    The frame is cached before splitting: Spark disallows filtering on
    ONLY the internal corrupt-record column of a just-read JSON
    relation (the pushed-down parser would need to re-parse), and the
    cache also means the feed is parsed once for both sides. Cache
    ownership transfers to the caller via the returned ``unpersist``
    handle — call it after both splits are consumed.
    """
    full = f"{schema}, _corrupt_record STRING"
    df = (
        spark.read.schema(full)
        .option("mode", "PERMISSIVE")
        .option("columnNameOfCorruptRecord", "_corrupt_record")
        .json(path)
        .cache()
    )
    good = df.filter(F.col("_corrupt_record").isNull()).drop("_corrupt_record")
    bad = df.filter(F.col("_corrupt_record").isNotNull()).select(
        F.col("_corrupt_record").alias("raw_line")
    )
    return QuarantineSplit(good, bad, lambda: df.unpersist())


def put_json_object(obj: Mapping, path: str) -> str:
    """Small JSON control-file put (S6 parity: the reference uploads a
    dict as an S3 object, ``s3_loader.py:43-50``). Local/NFS paths
    here; the call shape is storage-agnostic."""
    import json
    import os

    os.makedirs(os.path.dirname(path) or ".", exist_ok=True)
    with open(path, "w") as f:
        json.dump(dict(obj), f, sort_keys=True)
    return path


def get_json_object(path: str) -> dict:
    import json

    with open(path) as f:
        return json.load(f)
