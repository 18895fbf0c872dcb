"""HTML → quote-item parsing: the pure-logic core of the reference's
scraper, testable offline against a fixture page.

Re-expresses what ``etl_projects/scrapers/spiders/yahoo_finance.py``
extracts from a rendered quote page (S4), WITHOUT Selenium/BS4 (neither
exists in this environment) — a stdlib ``html.parser`` state machine
instead:

- every ``<tr>`` under the element with id ``quote-summary`` yields a
  (first-td-text → second-td-text) key/value (``yahoo_finance.py:58-70``);
- under id ``Lead-3-QuoteHeader-Proxy``: the first ``<h1>`` text is
  ``"Company Name (TICKER)"`` → company_name + ticker
  (``yahoo_finance.py:77-85``); the first ``<span>`` decides the
  currency — USD iff it contains ``"Currency in USD"``, else CAD
  (``yahoo_finance.py:86-90``); the fourth ``<span>`` is the current
  price (``yahoo_finance.py:92-99``).

The output row feeds :func:`etl_projects_spark.sources.ingest.ingest_items`
(declared-schema boundary) — no Spark code in this module; fetching is
driver-side by design.
"""

from __future__ import annotations

from html.parser import HTMLParser

# Tags that never wrap content — must not affect depth tracking.
_VOID_TAGS = frozenset(
    {"area", "base", "br", "col", "embed", "hr", "img", "input",
     "link", "meta", "source", "track", "wbr"}
)

SUMMARY_ID = "quote-summary"
HEADER_ID = "Lead-3-QuoteHeader-Proxy"


class _QuotePageParser(HTMLParser):
    """One pass over the page; collects summary-table rows and header
    h1/span texts in document order."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.summary_rows: list[list[str]] = []
        self.header_h1: list[str] = []
        self.header_spans: list[str] = []
        # depth>0 means "inside the element with that id"
        self._summary_depth = 0
        self._header_depth = 0
        # current capture target: list of text chunks, or None
        self._capture: list[str] | None = None
        self._capture_tag: str | None = None
        self._row: list[str] | None = None

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        attr_id = dict(attrs).get("id")
        if self._summary_depth:
            self._summary_depth += 1
            if tag == "tr":
                self._row = []
            elif tag == "td" and self._row is not None:
                self._capture, self._capture_tag = [], "td"
        elif attr_id == SUMMARY_ID:
            self._summary_depth = 1
        if self._header_depth:
            self._header_depth += 1
            if tag in ("h1", "span") and self._capture is None:
                self._capture, self._capture_tag = [], tag
        elif attr_id == HEADER_ID:
            self._header_depth = 1

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if self._capture is not None and tag == self._capture_tag:
            text = "".join(self._capture).strip()
            if tag == "td" and self._row is not None:
                self._row.append(text)
            elif tag == "h1":
                self.header_h1.append(text)
            elif tag == "span":
                self.header_spans.append(text)
            self._capture = self._capture_tag = None
        if tag == "tr" and self._row is not None:
            if len(self._row) >= 2:
                self.summary_rows.append(self._row)
            self._row = None
        if self._summary_depth:
            self._summary_depth -= 1
        if self._header_depth:
            self._header_depth -= 1

    def handle_data(self, data):
        if self._capture is not None:
            self._capture.append(data)


def parse_quote_page(html: str) -> dict:
    """Extract the raw quote fields from a rendered quote page.

    Returns the union of the summary-table key/values with
    ``company_name`` / ``ticker`` / ``currency`` / ``current_price`` —
    the same dict shape the reference spider accumulates in
    ``self.data`` (``yahoo_finance.py:55-99``). All values are strings;
    typing happens at the declared-schema ingest boundary.
    """
    p = _QuotePageParser()
    p.feed(html)
    out: dict[str, str] = {}
    for row in p.summary_rows:
        out[row[0]] = row[1]
    if p.header_h1:
        name, _, rest = p.header_h1[0].partition("(")
        out["company_name"] = name.strip()
        out["ticker"] = rest.replace(")", "").strip()
    if p.header_spans:
        out["currency"] = "USD" if "Currency in USD" in p.header_spans[0] else "CAD"
    if len(p.header_spans) > 3:
        out["current_price"] = p.header_spans[3]
    return out


def _to_float(s: str | None) -> float | None:
    if s is None:
        return None
    try:
        return float(s.replace(",", ""))
    except ValueError:
        return None


def quote_row_from_html(html: str, ds: str) -> dict:
    """Parsed page → one row in the QUOTE_SCHEMA contract (the
    validate/coerce step, ``scrapers/pipelines.py:9-17`` +
    ``validators.py:5-13``): numeric strings become doubles, the batch
    date is stamped, summary keys map to their schema columns."""
    raw = parse_quote_page(html)
    return {
        "ticker": raw.get("ticker"),
        "company_name": raw.get("company_name"),
        "currency": raw.get("currency"),
        "current_price": _to_float(raw.get("current_price")),
        "previous_close": _to_float(raw.get("Previous Close")),
        "market_cap": raw.get("Market Cap"),
        "curr_date": str(ds),
    }
