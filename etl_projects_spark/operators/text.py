"""Text-analysis operators for large-scale training-data pipelines.

All expressions are built-in ``pyspark.sql.functions`` (JVM-side,
whole-stage-codegen'd) — no Python UDFs anywhere, so they run at full
scan speed on a 100 TB documents table. Every operator has an exact
ANSI-SQL twin (see queries_llm.py) so the DuckDB oracle hash-matches.

Determinism: all scores are integer counts with at most one final
double division — identical bits in any engine.
"""

from __future__ import annotations

from pyspark.sql import Column
from pyspark.sql import functions as F

# Tiny per-language stopword lists for the n-gram/stopword language-ID
# heuristic. Order matters: ties break in this order (deterministic).
LANG_STOPWORDS: dict[str, list[str]] = {
    "en": ["the", "a", "of", "and", "to", "in", "is", "it"],
    "es": ["el", "la", "de", "y", "que", "en", "un", "es"],
    "de": ["der", "die", "und", "das", "ist", "ein", "zu", "den"],
    "fr": ["le", "la", "et", "les", "des", "un", "une", "est"],
}


def tokens(text: Column | str) -> Column:
    """Single-space tokenization — the one split definition shared by
    every oracle (``string_split(text, ' ')``), word_shingle_sets and
    bm25_retrieval. NOT ``\\s+``: on text with consecutive or non-space
    whitespace a regex split diverges from the oracles, so parity would
    hold only by testdata construction."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, " ")


def token_count(text: Column | str) -> Column:
    return F.size(tokens(text))


def char_count(text: Column | str) -> Column:
    c = F.col(text) if isinstance(text, str) else text
    return F.length(c)


def unique_token_count(text: Column | str) -> Column:
    return F.size(F.array_distinct(tokens(text)))


def stopword_hits(text: Column | str, lang: str) -> Column:
    """Occurrences (with multiplicity) of ``lang``'s stopwords."""
    words = LANG_STOPWORDS[lang]
    return F.size(F.filter(tokens(text), lambda t: t.isin(*words)))


def quality_score(text: Column | str) -> Column:
    """Lexical-diversity quality score in [0,1]:
    ``unique_tokens / tokens * min(tokens, 100)/100``.

    Short docs are penalized linearly; repetitive docs by the
    type/token ratio. Exact integer counts + double division.
    """
    n = token_count(text).cast("double")
    u = unique_token_count(text).cast("double")
    return (u / n) * (F.least(n, F.lit(100.0)) / F.lit(100.0))


def predicted_lang(text: Column | str) -> Column:
    """Stopword-vote language ID with deterministic tie-break
    (declaration order of LANG_STOPWORDS; no hits at all → 'und')."""
    hits = {lang: stopword_hits(text, lang) for lang in LANG_STOPWORDS}
    langs = list(LANG_STOPWORDS)
    expr = F.lit("und")
    total = None
    for lang in langs:
        total = hits[lang] if total is None else total + hits[lang]
    # build CASE from last to first so earlier langs win ties
    for lang in reversed(langs):
        cond = None
        for other in langs:
            if other == lang:
                continue
            later = langs.index(other) > langs.index(lang)
            c = hits[lang] >= hits[other] if later else hits[lang] > hits[other]
            cond = c if cond is None else cond & c
        expr = F.when((total > 0) & cond, F.lit(lang)).otherwise(expr)
    return expr


def fingerprint(text: Column | str) -> Column:
    """Content fingerprint: md5 hex digest (exact-dedup key)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.md5(c)


def lang_id_oracle_case(text_expr: str = "text") -> str:
    """DuckDB SQL twin of :func:`predicted_lang` (same constants)."""
    langs = list(LANG_STOPWORDS)

    def hits(lang: str) -> str:
        arr = ", ".join(f"'{w}'" for w in LANG_STOPWORDS[lang])
        return (
            f"len(list_filter(string_split({text_expr}, ' '), "
            f"t -> list_contains([{arr}], t)))"
        )

    total = " + ".join(hits(lang) for lang in langs)
    whens = []
    for lang in langs:
        conds = []
        for other in langs:
            if other == lang:
                continue
            op = ">=" if langs.index(other) > langs.index(lang) else ">"
            conds.append(f"{hits(lang)} {op} {hits(other)}")
        whens.append(f"WHEN ({total}) > 0 AND {' AND '.join(conds)} THEN '{lang}'")
    return "CASE " + " ".join(whens) + " ELSE 'und' END"


# -- Normalization & PII redaction -------------------------------------

# Java-regex and RE2 (DuckDB) compatible patterns: explicit character
# classes only, no lookaround, no \p{...} classes.
EMAIL_RE = "[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+[.][A-Za-z]{2,}"
PHONE_RE = "[0-9]{3}[-. ][0-9]{3}[-. ][0-9]{4}"
LONG_ID_RE = "[0-9]{9,}"


def normalize_text(text: Column | str) -> Column:
    """Canonical form for near-exact dedup: lowercase, strip everything
    but [a-z0-9 ], collapse runs of spaces, trim. Pure codegen'd
    expressions — runs at scan speed over a 100 TB corpus; dedup on
    ``md5(normalize_text(text))`` catches case/punct/whitespace dupes
    that byte-exact hashing misses."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.lower(c)
    c = F.regexp_replace(c, "[^a-z0-9 ]", " ")
    c = F.regexp_replace(c, " +", " ")
    return F.trim(c)


def normalize_oracle_sql(text_expr: str = "text") -> str:
    """DuckDB twin of :func:`normalize_text` (note the 'g' flag —
    DuckDB's regexp_replace is first-match-only by default)."""
    return (
        "trim(regexp_replace(regexp_replace(lower("
        f"{text_expr}), '[^a-z0-9 ]', ' ', 'g'), ' +', ' ', 'g'))"
    )


def redact_pii(text: Column | str) -> Column:
    """Replace emails → <EMAIL>, phone-shaped numbers → <PHONE>, and
    9+-digit runs → <ID>. Order matters: emails first (their local
    part may contain digit runs), then phones, then bare ID runs."""
    c = F.col(text) if isinstance(text, str) else text
    c = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    c = F.regexp_replace(c, PHONE_RE, "<PHONE>")
    c = F.regexp_replace(c, LONG_ID_RE, "<ID>")
    return c


def pii_counts(text: Column | str) -> tuple[Column, Column, Column]:
    """(n_emails, n_phones, n_long_ids) match counts per row."""
    c = F.col(text) if isinstance(text, str) else text
    no_email = F.regexp_replace(c, EMAIL_RE, "<EMAIL>")
    return (
        F.regexp_count(c, F.lit(EMAIL_RE)),
        F.regexp_count(no_email, F.lit(PHONE_RE)),
        F.regexp_count(F.regexp_replace(no_email, PHONE_RE, "<PHONE>"), F.lit(LONG_ID_RE)),
    )
