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


# Start tags that implicitly close open elements (HTML allows omitted
# end tags): a new <td>/<th> closes the open cell AND everything
# unclosed inside it (e.g. a dangling <p>), a new <tr> closes the
# open row, <li> the open item. Modeled as "pop until a container
# tag": the closing cascades through the cell's unclosed descendants,
# which a single-level same-tag check cannot do. Without this, a
# legal page with an unclosed <p> inside the tracked section would
# leave the scope "open" forever and pull unrelated tables into the
# summary dict.
_POP_UNTIL_CONTAINER = {
    "td": {"tr", "tbody", "thead", "tfoot", "table"},
    "th": {"tr", "tbody", "thead", "tfoot", "table"},
    "tr": {"tbody", "thead", "tfoot", "table"},
    "li": {"ul", "ol", "menu"},
    "dt": {"dl"},
    "dd": {"dl"},
    "option": {"select", "optgroup", "datalist"},
}


class _QuotePageParser(HTMLParser):
    """One pass over the page; collects summary-table rows and header
    h1/span texts in document order.

    Scope tracking uses an explicit OPEN-TAG STACK with implicit-close
    recovery (``_CLOSES_BEFORE`` on start tags; pop-until-match on end
    tags), not bare depth counters — counters desync on legal HTML
    whose elements close implicitly, corrupting the section scope."""

    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.summary_rows: list[list[str]] = []
        self.header_h1: list[str] = []
        self.header_spans: list[str] = []
        self._stack: list[str] = []
        # stack index of each tracked section's element, while open
        self._summary_at: int | None = None
        self._header_at: int | None = None
        # current capture target: list of text chunks, or None. The
        # _at indices anchor capture/row to the stack depth of the
        # element that OPENED them: emission happens only when that
        # exact element pops, so nested same-name tags (a <span>
        # inside a header <span>, a <table> inside a summary cell)
        # concatenate into the outer capture instead of truncating it
        # or injecting phantom rows.
        self._capture: list[str] | None = None
        self._capture_tag: str | None = None
        self._capture_at: int | None = None
        self._row: list[str] | None = None
        self._row_at: int | None = None

    def _in_summary(self) -> bool:
        return self._summary_at is not None

    def _in_header(self) -> bool:
        return self._header_at is not None

    def _pop_one(self) -> str:
        """Close the innermost open element with full bookkeeping."""
        tag = self._stack.pop()
        depth = len(self._stack)  # index the popped element occupied
        if self._capture is not None and depth == self._capture_at:
            text = "".join(self._capture).strip()
            if self._capture_tag == "td" and self._row is not None:
                self._row.append(text)
            elif self._capture_tag == "h1":
                self.header_h1.append(text)
            elif self._capture_tag == "span":
                self.header_spans.append(text)
            self._capture = self._capture_tag = self._capture_at = None
        if self._row is not None and depth == self._row_at:
            if len(self._row) >= 2:
                self.summary_rows.append(self._row)
            self._row = self._row_at = None
        if self._summary_at is not None and len(self._stack) <= self._summary_at:
            self._summary_at = None
        if self._header_at is not None and len(self._stack) <= self._header_at:
            self._header_at = None
        return tag

    def handle_starttag(self, tag, attrs):
        if tag in _VOID_TAGS:
            return
        containers = _POP_UNTIL_CONTAINER.get(tag)
        if containers is not None and any(t in containers for t in self._stack):
            while self._stack and self._stack[-1] not in containers:
                self._pop_one()
        elif tag == "p" and self._stack and self._stack[-1] == "p":
            self._pop_one()
        in_summary, in_header = self._in_summary(), self._in_header()
        self._stack.append(tag)
        attr_id = dict(attrs).get("id")
        if attr_id == SUMMARY_ID and self._summary_at is None:
            self._summary_at = len(self._stack) - 1
        if attr_id == HEADER_ID and self._header_at is None:
            self._header_at = len(self._stack) - 1
        # While a cell capture is open, nested table structure is
        # OPAQUE CONTENT: its text concatenates into the outer cell
        # instead of resetting the row or starting a new capture.
        if in_summary and self._capture is None:
            if tag == "tr":
                self._row, self._row_at = [], len(self._stack) - 1
            elif tag == "td" and self._row is not None:
                self._capture, self._capture_tag = [], "td"
                self._capture_at = len(self._stack) - 1
        if in_header and tag in ("h1", "span") and self._capture is None:
            self._capture, self._capture_tag = [], tag
            self._capture_at = len(self._stack) - 1

    def handle_endtag(self, tag):
        if tag in _VOID_TAGS:
            return
        if tag not in self._stack:
            return  # stray end tag: ignore
        while self._stack:
            if self._pop_one() == tag:
                break

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
        # rpartition: the ticker is the LAST parenthesized group —
        # company names may themselves contain parentheses
        # ("Alphabet Inc. (Class A) (GOOGL)").
        name, sep, rest = p.header_h1[0].rpartition("(")
        if sep:
            out["company_name"] = name.strip()
            out["ticker"] = rest.replace(")", "").strip()
        else:  # no parenthesized ticker at all
            out["company_name"] = p.header_h1[0].strip()
            out["ticker"] = ""
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
