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
    """Whitespace tokenization (the BPE-ish regex split)."""
    c = F.col(text) if isinstance(text, str) else text
    return F.split(c, r"\s+")


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
