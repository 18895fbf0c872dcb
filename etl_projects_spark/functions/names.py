"""Column-name normalization (operator P2).

Snake-cases a column name the way the reference's formatter does
(``spark_dataframe_service.py:46-56``): strip non-word characters
(keeping spaces and dots), spaces/dots → underscores, CamelCase →
camel_case, lowercase. Pure Python — runs driver-side on schema only.
"""

from __future__ import annotations

import re

_STRIP_RE = re.compile(r"[^\w \.]")
_SEP_RE = re.compile(r"[ \.]+")
_CAMEL1_RE = re.compile(r"(.)([A-Z][a-z]+)")
_CAMEL2_RE = re.compile(r"([a-z0-9])([A-Z])")


def format_column_name(column_name: str) -> str:
    """``'Avg. Vol (3 month)'`` → ``'avg_vol_3_month'``; ``'fooBar'`` → ``'foo_bar'``."""
    name = _STRIP_RE.sub("", column_name)
    name = _SEP_RE.sub("_", name.strip())
    name = _CAMEL1_RE.sub(r"\1_\2", name)
    name = _CAMEL2_RE.sub(r"\1_\2", name)
    name = name.lower()
    # Re-strip after lowercasing: idempotency. lower() can emit
    # characters the strip pass removes (e.g. 'İ' → 'i' + combining
    # dot), so a second normalize pass would otherwise differ.
    name = _STRIP_RE.sub("", name)
    return re.sub(r"_+", "_", name)
