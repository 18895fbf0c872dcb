"""Custom Python DataSource for the quote feed (S4, Spark-4-native).

The reference ingests stock quotes by driving a browser in a Scrapy
spider (``etl_projects/scrapers/spiders/yahoo_finance.py:26-99``) and
handing items to a validation pipeline. The idiomatic Spark 4 shape is
a registered Python DataSource: ``spark.read.format("stub_quotes")``
plans ONE input partition PER TICKER, so the fetch itself distributes
across executors (a 10k-ticker universe fans out cluster-wide instead
of looping on a driver), lands directly as a typed DataFrame, and
composes with every downstream operator with no intermediate files.

The fetch body is the deterministic stub
(:func:`etl_projects_spark.sources.ingest.fetch_quotes_stub` — no
network in this environment); a real deployment swaps that one
function for the Selenium/HTTP fetcher and keeps the source class,
options, and schema unchanged.
"""

from __future__ import annotations

from pyspark.sql.datasource import (
    DataSource,
    DataSourceReader,
    InputPartition,
    SimpleDataSourceStreamReader,
)

from etl_projects_spark.sources.ingest import QUOTE_SCHEMA

# Derived from the ONE schema definition (ingest.QUOTE_SCHEMA) so the
# registered DataSource can never drift from the ingest boundary or
# the stub fetcher — the same no-hand-copies rule the streaming module
# applies to its expression builders.
QUOTE_DDL = ", ".join(
    f"{f.name} {f.dataType.simpleString()}" for f in QUOTE_SCHEMA.fields
)
_COLS = [f.name for f in QUOTE_SCHEMA.fields]


class QuoteDataSource(DataSource):
    """``spark.read.format("stub_quotes").option("tickers", "A,B")
    .option("ds", "2024-01-05").load()``"""

    @classmethod
    def name(cls) -> str:
        return "stub_quotes"

    def schema(self) -> str:
        return QUOTE_DDL

    def reader(self, schema) -> "QuoteReader":
        return QuoteReader(self.options)


class QuoteReader(DataSourceReader):
    def __init__(self, options):
        self.tickers = [
            t for t in options.get("tickers", "").split(",") if t
        ]
        if not self.tickers:
            raise ValueError("stub_quotes requires option 'tickers' (csv)")
        self.ds = options.get("ds", "2024-01-05")

    def partitions(self) -> list[InputPartition]:
        # One partition per ticker: the unit of parallel fetch.
        return [InputPartition(t) for t in self.tickers]

    def read(self, partition: InputPartition):
        from etl_projects_spark.sources.ingest import fetch_quotes_stub

        for item in fetch_quotes_stub([partition.value], self.ds):
            yield tuple(item[c] for c in _COLS)


def register(spark) -> None:
    spark.dataSource.register(QuoteDataSource)
    spark.dataSource.register(QuoteStreamDataSource)


class QuoteStreamDataSource(DataSource):
    """Streaming twin of :class:`QuoteDataSource`: a bounded day-by-day
    quote ticker — each micro-batch is one trading day's quotes for
    the configured tickers, offsets are day indices.

    ``spark.readStream.format("stub_quotes_stream")
    .option("tickers", "A,B").option("start_ds", "2024-01-01")
    .option("n_days", "5").load()``

    The day-index offset makes replay exact (``readBetweenOffsets``
    re-fetches deterministically), which is the real contract a
    production feed source must honor for exactly-once sinks. The
    stream is bounded by ``n_days`` so a drain terminates — a live
    deployment would instead advance with the clock.
    """

    @classmethod
    def name(cls) -> str:
        return "stub_quotes_stream"

    def schema(self) -> str:
        return QUOTE_DDL

    def simpleStreamReader(self, schema) -> "QuoteStreamReader":
        return QuoteStreamReader(self.options)


class QuoteStreamReader(SimpleDataSourceStreamReader):
    def __init__(self, options):
        self.tickers = [t for t in options.get("tickers", "").split(",") if t]
        if not self.tickers:
            raise ValueError("stub_quotes_stream requires option 'tickers'")
        self.start_ds = options.get("start_ds", "2024-01-01")
        self.n_days = int(options.get("n_days", "3"))

    def initialOffset(self) -> dict:
        return {"day": 0}

    def _rows(self, day: int):
        import datetime

        from etl_projects_spark.sources.ingest import fetch_quotes_stub

        ds = (
            datetime.date.fromisoformat(self.start_ds)
            + datetime.timedelta(days=day)
        ).isoformat()
        for item in fetch_quotes_stub(self.tickers, ds):
            yield tuple(item[c] for c in _COLS)

    def read(self, start: dict):
        day = start["day"]
        if day >= self.n_days:
            return iter(()), start  # bounded: no further batches
        # list-backed iterator: the runner's prefetch cache copy.copy()s
        # it, which a generator cannot survive (one day is tiny anyway).
        return iter(list(self._rows(day))), {"day": day + 1}

    def readBetweenOffsets(self, start: dict, end: dict):
        for day in range(start["day"], end["day"]):
            yield from self._rows(day)
