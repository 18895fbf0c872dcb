"""Ingestion (declared-schema ingest, gzip JSONL feed) and quality
(validation rules, monitors, DW promotion gate)."""

from __future__ import annotations

import pytest
from pyspark.sql import functions as F

from etl_projects_spark.engine import LakeEngine
from etl_projects_spark.operators import quality
from etl_projects_spark.sources import ingest


@pytest.fixture(scope="module")
def quotes(spark):
    rows = ingest.fetch_quotes_stub(["AAA", "BBB", "CCC"], "2024-01-02")
    return ingest.ingest_items(spark, rows)


def test_fetch_stub_deterministic():
    a = ingest.fetch_quotes_stub(["AAA"], "2024-01-02")
    b = ingest.fetch_quotes_stub(["AAA"], "2024-01-02")
    c = ingest.fetch_quotes_stub(["AAA"], "2024-01-03")
    assert a == b
    assert a[0]["current_price"] != c[0]["current_price"]


def test_ingest_declared_schema(quotes):
    assert dict(quotes.dtypes)["current_price"] == "double"
    assert quotes.count() == 3


def test_jsonl_gz_roundtrip(spark, quotes, tmp_path):
    path = str(tmp_path / "feed")
    ingest.export_jsonl_gz(quotes, path)
    import glob

    assert glob.glob(path + "/*.json.gz"), "feed files must be gzip"
    back = ingest.read_jsonl_gz(spark, path, ingest.QUOTE_SCHEMA)
    assert sorted(r["ticker"] for r in back.collect()) == ["AAA", "BBB", "CCC"]
    assert dict(back.dtypes) == dict(quotes.dtypes)


def test_cast_all_to_string(quotes):
    out = ingest.cast_all_to_string(quotes)
    assert set(t for _, t in out.dtypes) == {"string"}


def test_validate_flags_bad_rows(spark):
    df = spark.createDataFrame(
        [("ok", 1.0, "2024-01-02"), (None, -5.0, "not-a-date")],
        "ticker string, price double, curr_date string",
    )
    rules = {
        "ticker_required": quality.required("ticker"),
        "price_non_negative": quality.non_negative("price"),
        "date_ok": quality.date_format_ok("curr_date"),
    }
    v = quality.validate(df, rules).collect()
    by_ticker = {r["ticker"]: r[quality.ERRORS_COL] for r in v}
    assert by_ticker["ok"] == []
    assert sorted(by_ticker[None]) == [
        "date_ok",
        "price_non_negative",
        "ticker_required",
    ]
    assert quality.valid_rows(quality.validate(df, rules)).count() == 1


def test_monitors(quotes):
    ok, _ = quality.min_count_monitor(3)(quotes)
    assert ok
    bad, _ = quality.min_count_monitor(4)(quotes)
    assert not bad
    rules = {"ticker_required": quality.required("ticker")}
    ok, _ = quality.zero_errors_monitor(rules)(quotes)
    assert ok


def test_promote_to_dw_gated(spark, quotes, tmp_path):
    eng = LakeEngine(spark, root=str(tmp_path / "lake"))
    quotes.createOrReplaceTempView("staging_quotes")
    rules = {"price_positive": quality.non_negative("current_price")}
    out = eng.promote_to_dw(
        "staging_quotes",
        "dw_market",
        "quotes",
        checks=[quality.min_count_monitor(1), quality.zero_errors_monitor(rules)],
    )
    assert out.count() == 3
    # A failing gate must block the promotion.
    with pytest.raises(ValueError, match="quality check"):
        eng.promote_to_dw(
            "staging_quotes", "dw_market", "quotes2",
            checks=[quality.min_count_monitor(99)],
        )


def test_parse_quote_page_fixture():
    """S4 parse core: the fixture page yields the same field set the
    reference spider accumulates (summary k/v + header name/ticker/
    currency/price) — pure logic, no network."""
    import os

    from etl_projects_spark.sources.quote_html import (
        parse_quote_page,
        quote_row_from_html,
    )

    html = open(
        os.path.join(os.path.dirname(__file__), "fixtures", "quote_page.html")
    ).read()
    raw = parse_quote_page(html)
    assert raw["company_name"] == "iShares S&P/TSX 60 Index ETF"
    assert raw["ticker"] == "XIU.TO"
    assert raw["currency"] == "CAD"
    assert raw["current_price"] == "27.15"
    assert raw["Previous Close"] == "27.03"
    assert raw["Market Cap"] == "11.2B"
    assert raw["Volume"] == "1,234,567"
    assert "Noise" not in raw  # tables outside #quote-summary ignored

    row = quote_row_from_html(html, ds="2026-08-13")
    assert row["current_price"] == 27.15
    assert row["previous_close"] == 27.03
    assert row["curr_date"] == "2026-08-13"


def test_quote_row_ingests_with_declared_schema(spark):
    import os

    from etl_projects_spark.sources.ingest import QUOTE_SCHEMA, ingest_items
    from etl_projects_spark.sources.quote_html import quote_row_from_html

    html = open(
        os.path.join(os.path.dirname(__file__), "fixtures", "quote_page.html")
    ).read()
    df = ingest_items(spark, [quote_row_from_html(html, ds="2026-08-13")])
    assert df.schema == QUOTE_SCHEMA
    got = df.collect()[0]
    assert got["ticker"] == "XIU.TO" and got["current_price"] == 27.15


def test_read_jsonl_quarantine_splits_bad_lines(spark, tmp_path):
    from etl_projects_spark.sources.ingest import read_jsonl_quarantine

    feed = tmp_path / "feed.jsonl"
    feed.write_text(
        '{"id": 1, "name": "a", "price": 1.5}\n'
        '{"id": 2, "name": "b", "price": 2.5}\n'
        'not json at all\n'
        '{"id": 3, "name": "c", "price": 3.5}\n'
        '{"id": broken\n'
    )
    good, bad, unpersist = read_jsonl_quarantine(
        spark, str(feed), "id INT, name STRING, price DOUBLE"
    )
    assert sorted(r.id for r in good.collect()) == [1, 2, 3]
    assert "_corrupt_record" not in good.columns
    raws = [r.raw_line for r in bad.collect()]
    assert len(raws) == 2 and any("not json" in r for r in raws)
    unpersist()  # cache ownership is the caller's; release after both splits


def test_quote_datasource_partitions_per_ticker(spark):
    from etl_projects_spark.sources import quote_source

    quote_source.register(spark)
    df = (
        spark.read.format("stub_quotes")
        .option("tickers", "AAA,BBB,CCC")
        .option("ds", "2024-02-02")
        .load()
    )
    assert df.rdd.getNumPartitions() == 3
    rows = {r.ticker: r for r in df.collect()}
    assert set(rows) == {"AAA", "BBB", "CCC"}
    assert all(r.current_price > 0 for r in rows.values())


def test_observed_monitor_counts_without_extra_job(spark):
    """observe() metrics must equal the explicit violation counts and
    be produced by the SAME action that materializes the frame."""
    from etl_projects_spark.operators import quality
    from etl_projects_spark.queries import load
    from pyspark.sql import functions as F

    ev = load(spark, "/root/testdata/sf0.001", "events")
    rules = {
        "type_known": quality.in_set(
            "event_type", ("click", "view", "purchase")
        ),
        "value_non_negative": quality.non_negative("value"),
    }
    observed, obs = quality.observed_monitor(ev, rules)
    observed.write.format("noop").mode("overwrite").save()
    got = obs.get
    expected_rows = ev.count()
    expected_viol = ev.select(
        F.sum((~rules["type_known"]).cast("long")).alias("a"),
        F.sum((~rules["value_non_negative"]).cast("long")).alias("b"),
    ).collect()[0]
    assert got["n_rows"] == expected_rows
    assert got["viol_type_known"] == expected_viol["a"]
    assert got["viol_value_non_negative"] == (expected_viol["b"] or 0)


def test_parse_quote_page_survives_implicit_close_tags():
    """Legal HTML with omitted end tags (<p>, <td>, <tr> close
    implicitly) must not corrupt the section scope: an unclosed <p>
    inside quote-summary previously left the scope open forever, so
    unrelated later tables polluted the summary dict (r5 review)."""
    from etl_projects_spark.sources.quote_html import parse_quote_page

    html = """
    <html><body>
      <div id="quote-summary">
        <table><tbody>
          <tr><td><p>Previous Close<td>123.45
          <tr><td>Open</td><td>124.00</td></tr>
        </tbody></table>
      </div>
      <div id="unrelated">
        <table><tr><td>Junk Key</td><td>JUNK</td></tr></table>
      </div>
      <div id="Lead-3-QuoteHeader-Proxy">
        <h1>Acme Corp (ACME)</h1>
        <span>Currency in USD</span><span>x</span><span>y</span>
        <span>99.87</span>
      </div>
    </body></html>
    """
    out = parse_quote_page(html)
    assert out["Previous Close"] == "123.45"
    assert out["Open"] == "124.00"
    assert "Junk Key" not in out  # scope closed with the section
    assert out["company_name"] == "Acme Corp"
    assert out["ticker"] == "ACME"
    assert out["currency"] == "USD"
    assert out["current_price"] == "99.87"


def test_parse_quote_page_nested_structures():
    """r6 review regressions: nested spans concatenate into the outer
    header span (no truncation, no phantom entries), a nested table
    inside a summary cell is opaque content (no phantom key/value, the
    outer row survives), and the ticker comes from the LAST
    parenthesized group."""
    from etl_projects_spark.sources.quote_html import parse_quote_page

    html = """
    <div id="Lead-3-QuoteHeader-Proxy">
      <h1>Alphabet Inc. (Class A) (GOOGL)</h1>
      <span>Currency in <span>USD</span></span>
      <span>NasdaqGS</span><span>delayed</span><span>181.58</span>
    </div>
    <div id="quote-summary">
      <table><tr>
        <td>Market Cap</td>
        <td><table><tr><td>2.1T</td><td>note</td></tr></table></td>
      </tr><tr>
        <td>Previous Close</td><td>180.00</td>
      </tr></table>
    </div>
    """
    raw = parse_quote_page(html)
    assert raw["company_name"] == "Alphabet Inc. (Class A)"
    assert raw["ticker"] == "GOOGL"
    assert raw["currency"] == "USD"      # nested span did not truncate
    assert raw["current_price"] == "181.58"  # span indexing unshifted
    assert raw["Previous Close"] == "180.00"
    assert "2.1T" not in raw             # nested table is not a k/v row
    assert "2.1T" in raw["Market Cap"]   # ...its text feeds the cell


def test_quote_source_ddl_derived_from_schema():
    from etl_projects_spark.sources.ingest import QUOTE_SCHEMA
    from etl_projects_spark.sources.quote_source import QUOTE_DDL, _COLS

    assert _COLS == [f.name for f in QUOTE_SCHEMA.fields]
    assert "current_price double" in QUOTE_DDL
