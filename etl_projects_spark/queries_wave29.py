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
