"""Wave-29 catalog entries (round 10): exact-substring span dedup
reporting — the word-level analog of exact-substring training-data
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better"), which removes verbatim runs above a fixed token width that
n-gram Jaccard and MinHash both under-count (no single pair need clear
a similarity threshold for a verbatim 20-token span to be memorizable).

Keeps the catalog's determinism contract: exact BIGINT counting
everywhere upstream, one identical terminal integer-quotient double
per row (emitted RAW — the comparator rounds), and the md5 60-bit
shingle hash shared bit-for-bit with the DuckDB oracle via
``dedup.shingles_cte``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup
from etl_projects_spark.queries import _q, load

# Span width: 20 word tokens. The reference technique operates on ~50
# BPE tokens; on this whitespace-token corpus (docs 10-100 tokens,
# median ~55) 20 words is the same "too long to collide by chance"
# regime while still covering mid-length documents. Parameterizes the
# SAME tokenize/offset/concat/md5 pipeline as the 3-gram dedup family
# (dedup.word_shingles / dedup.shingles_cte), so the cross-engine hash
# contract is inherited, not re-proved.
SPAN_N = 20
# Doc-frequency cap for the pair query (the family's max_doc_freq
# pattern): a span in more than this many documents is boilerplate —
# pairing inside its group would cost df² rows; the cap bounds every
# group's expansion at a constant. Never binds on this corpus
# (measured max span df is well under it at every SF), so it is purely
# the 100 TB guard.
SPAN_MAX_DF = 8


@_q(
    "substring_span_report",
    f"""
    WITH {dedup.shingles_cte(SPAN_N)},
    marked AS (SELECT id,
                      CASE WHEN count(*) OVER (PARTITION BY shingle) >= 2
                           THEN 1 ELSE 0 END AS is_shared
               FROM shingles),
    per_doc AS (SELECT id, count(*) AS n_spans, sum(is_shared) AS n_shared
                FROM marked GROUP BY id)
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN coalesce(p.n_spans, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_spanned,
           CAST(sum(CASE WHEN coalesce(p.n_shared, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_contaminated,
           CAST(sum(coalesce(p.n_spans, 0)) AS BIGINT) AS n_spans,
           CAST(sum(coalesce(p.n_shared, 0)) AS BIGINT) AS n_shared_spans,
           CASE WHEN sum(coalesce(p.n_spans, 0)) > 0
                THEN CAST(sum(coalesce(p.n_shared, 0)) AS DOUBLE)
                     / CAST(sum(coalesce(p.n_spans, 0)) AS DOUBLE)
                ELSE 0.0 END AS shared_frac
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
    GROUP BY d.source
    """,
)
def substring_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-substring contamination report: how many
    documents share a verbatim SPAN_N(=20)-token span with ANY other
    document, and what fraction of each source's distinct spans are
    cross-document duplicates. The curation view of exact-substring
    dedup — sources dominated by shared verbatim runs (mirrors,
    boilerplate, templated pages) surface here even when no document
    pair clears a near-dup similarity threshold.

    Spark shape (the dedup-family standard, cf.
    ``text_dup_gram_fraction``): distinct per-doc span hashes from the
    shared shingle pipeline, span doc-frequency as ``count(*) OVER
    (PARTITION BY shingle)`` — ONE shuffle keyed on the 8-byte span
    hash instead of an agg + join-back that would rescan the
    corpus-sized exploded relation — then a per-doc aggregation and a
    tiny per-source rollup. Linear end to end, no pairwise expansion;
    docs shorter than the span width contribute zero spans through the
    left join (never dropped from n_docs). At 100 TB the span-hash
    shuffle is the only corpus-scale exchange, and 20-token spans are
    orders of magnitude sparser than the 3-gram keys the family
    already bounds.
    """
    docs = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=SPAN_N)  # (id, span-hash), per-doc distinct
    marked = sh.select(
        "id",
        (F.count("*").over(W.partitionBy("shingle")) >= 2)
        .cast("int")
        .alias("is_shared"),
    )
    per_doc = marked.groupBy("id").agg(
        F.count("*").alias("n_spans"),
        F.sum("is_shared").alias("n_shared"),
    )
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0))
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0))
    return (
        docs.select(F.col("doc_id").alias("id"), "source")
        .join(per_doc, "id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(n_spans > 0, 1).otherwise(0)).alias("n_docs_spanned"),
            F.sum(F.when(n_shared > 0, 1).otherwise(0)).alias(
                "n_docs_contaminated"
            ),
            F.sum(n_spans).alias("n_spans"),
            F.sum(n_shared).alias("n_shared_spans"),
        )
        .withColumn(
            "shared_frac",
            F.when(
                F.col("n_spans") > 0,
                F.col("n_shared_spans").cast("double")
                / F.col("n_spans").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


@_q(
    "substring_span_pairs",
    f"""
    WITH {dedup.shingles_cte(SPAN_N)},
    freq AS (SELECT shingle, count(*) AS df_ FROM shingles GROUP BY shingle),
    capped AS (SELECT id, shingle FROM shingles JOIN freq USING (shingle)
               WHERE df_ BETWEEN 2 AND {SPAN_MAX_DF}),
    pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared_spans
              FROM capped a JOIN capped b
                ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2)
    SELECT id_a, id_b, n_shared_spans
    FROM pairs
    ORDER BY n_shared_spans DESC, id_a, id_b
    LIMIT 50
    """,
)
def substring_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 document pairs by count of shared verbatim SPAN_N(=20)-
    token spans — the pair-level EVIDENCE view of exact-substring
    dedup (which near-dup pair actually contains duplicated text, and
    how much of it), complementing ``substring_span_report``'s
    per-source rollup. Distinct from the Jaccard/MinHash pair lists:
    two documents can share a memorizable verbatim run while their
    full shingle sets sit far below any similarity threshold.

    Scale shape is the family's candidates-through-a-bounded-key
    pattern (SCALE.md invariant 3): span doc-frequency via one window
    over the span hash, a doc-frequency cap (SPAN_MAX_DF) that bounds
    every span group's pair expansion at a constant df² — boilerplate
    spans above the cap are dropped, exactly like
    ``dedup.jaccard_pairs``'s max_doc_freq — then a self-equi-join ON
    the span hash (never all-pairs) and a per-pair count. The capped
    relation is materialized once (two join branches would otherwise
    recompute the md5 window subtree, the documented cache-worthy
    class). Final order is fully tie-broken (count DESC, id_a, id_b),
    so the top-50 SET is deterministic in both engines.
    """
    docs = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=SPAN_N)
    capped = dedup.materialize(
        sh.withColumn(
            "df_", F.count("*").over(W.partitionBy("shingle"))
        )
        .filter((F.col("df_") >= 2) & (F.col("df_") <= SPAN_MAX_DF))
        .select("id", "shingle")
    )
    a = capped.select(F.col("id").alias("id_a"), "shingle")
    b = capped.select(F.col("id").alias("id_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_spans"))
        .orderBy(F.desc("n_shared_spans"), "id_a", "id_b")
        .limit(50)
    )
