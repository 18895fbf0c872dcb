"""Corpus-curation operators, wave 2: chunk-level cross-document
dedup (RefinedWeb-style line dedup re-expressed over token chunks),
SemDeDup-style semantic cluster pruning, deterministic train/val/test
splitting, the curation filter funnel, join-key skew profiling,
tokenizer fertility stats, and the higher-order array-function surface.

Registered into the same QUERIES/ORACLE catalog as queries.py; every
oracle is generated from the same constants as the Spark
implementation. The semantic-prune oracle inlines the numpy-twin
cluster assignment (``similarity.ivf_assignments``) and verifies the
within-cluster prune logic in pure SQL — the same
twin-candidates-then-SQL-verification pattern as ``ann_ivf_topk``.

Design inputs are public: RefinedWeb/Dolma-style exact-substring &
line dedup motivates ``chunk_dedup_rewrite``; SemDeDup (Abbas et al.,
2023, arXiv:2303.09540) motivates ``semdedup_prune``. The reference
repo has no dedup surface (its Spark layer is the DataFrame-service
methods covered in operators/dataframe_ops.py) — these extend SURVEY
§2's training-data-pipeline track.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup, similarity
from etl_projects_spark.queries import _q, dec, load
from etl_projects_spark.queries_llm import ivf_index_dir
from etl_projects_spark.queries_mixing import mix_unit, mix_unit_sql

CHUNK_TOKENS = 8  # chunk_dedup_rewrite: tokens per non-overlapping chunk
CHUNK_MAX_DF = 1  # keep a chunk instance only if doc-frequency <= this
SEMDEDUP_TAU = 0.45  # semdedup_prune: within-cluster cosine threshold


# =========================================================================
# Chunk-level cross-document dedup (RefinedWeb/Dolma line dedup)
# =========================================================================


@_q(
    "chunk_dedup_rewrite",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    ch AS (
      SELECT doc_id, i AS pos,
             array_to_string(
               a[(i - 1) * {CHUNK_TOKENS} + 1:(i - 1) * {CHUNK_TOKENS} + {CHUNK_TOKENS}],
               ' ') AS chunk
      FROM toks,
           UNNEST(generate_series(
             1, CAST(ceil(len(a) / {CHUNK_TOKENS}.0) AS BIGINT))) t(i)),
    freq AS (SELECT chunk, COUNT(DISTINCT doc_id) AS df_ FROM ch GROUP BY 1)
    SELECT doc_id,
           COUNT(*) AS n_chunks,
           CAST(SUM(CASE WHEN df_ > {CHUNK_MAX_DF} THEN 1 ELSE 0 END) AS BIGINT)
             AS n_removed,
           md5(COALESCE(array_to_string(
             list(chunk ORDER BY pos) FILTER (WHERE df_ <= {CHUNK_MAX_DF}),
             ' '), '')) AS kept_md5
    FROM ch JOIN freq USING (chunk)
    GROUP BY doc_id
    """,
)
def chunk_dedup_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Chunk-level cross-document dedup: the corpus REWRITE step of
    RefinedWeb/Dolma-style line dedup, re-expressed over fixed
    8-token chunks (this corpus has no newlines). Every document is
    cut into non-overlapping chunks; any chunk that occurs in MORE
    THAN ONE distinct document is removed from all of them; the
    surviving chunks are re-joined in order. Output per doc: chunk
    counts and the md5 of the rewritten text (the hash proves the
    order-preserving reassembly, not just the counts).

    Scale shape: explode to ~n_tokens/8 chunk rows, one doc-frequency
    aggregation keyed on the chunk text (map-side combined — at 100 TB
    key on md5(chunk) instead to bound shuffle width), one join back,
    one per-doc re-aggregation. All linear; no pairwise expansion —
    exactly how production line-dedup passes run, and the pass that
    catches boilerplate that document-level near-dup misses.
    """
    docs = load(spark, sf_dir, "documents")
    toks = docs.select("doc_id", F.split("text", " ").alias("a"))
    ch = toks.select(
        "doc_id",
        F.posexplode(
            F.expr(
                f"transform(sequence(1, CAST(ceil(size(a) / {CHUNK_TOKENS}.0) AS INT)),"
                f" i -> array_join(slice(a, (i - 1) * {CHUNK_TOKENS} + 1,"
                f" {CHUNK_TOKENS}), ' '))"
            )
        ).alias("pos", "chunk"),
    )
    freq = ch.groupBy("chunk").agg(
        F.countDistinct("doc_id").alias("df_")
    )
    return (
        ch.join(freq, "chunk")
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_chunks"),
            F.sum(
                F.when(F.col("df_") > CHUNK_MAX_DF, 1).otherwise(0)
            ).cast("bigint").alias("n_removed"),
            F.expr(
                f"md5(array_join(transform(array_sort(collect_list("
                f"CASE WHEN df_ <= {CHUNK_MAX_DF} THEN struct(pos, chunk) END)),"
                f" x -> x.chunk), ' '))"
            ).alias("kept_md5"),
        )
    )


# =========================================================================
# SemDeDup: semantic dedup by cluster-local cosine pruning
# =========================================================================


def _semdedup_oracle() -> str | None:
    """Oracle for semdedup_prune: the cluster assignment is reproducible
    from the codebook constants + data (numpy twin, no Spark), so the
    oracle inlines the (vec_id, cluster) map as VALUES and verifies the
    within-cluster prune rule in pure SQL. Registered as a CALLABLE
    (resolved by oracle_sql() at gate time against the oracle corpus
    then in effect — r13, the lazy-oracle sweep); None if that corpus
    is absent (bench-only environments)."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    pairs = similarity.ivf_assignments(path)
    vals = ", ".join(f"({i}, {c})" for i, c in pairs)
    cos = similarity.cosine_sql("a.embedding", "b.embedding")
    return f"""
    WITH assign(vec_id, cluster) AS (VALUES {vals}),
    e AS (SELECT s.vec_id, s.cluster, em.embedding
          FROM assign s JOIN embeddings em USING (vec_id)),
    p AS (SELECT b.vec_id AS vec_id, b.cluster AS cluster,
                 a.vec_id AS nn_id, round({cos}, 6) AS score
          FROM e a JOIN e b ON a.cluster = b.cluster AND a.vec_id < b.vec_id
          WHERE round({cos}, 6) >= {SEMDEDUP_TAU}),
    r AS (SELECT *, row_number() OVER (
            PARTITION BY vec_id ORDER BY score DESC, nn_id) AS rn FROM p)
    SELECT vec_id, CAST(cluster AS INT) AS cluster, nn_id, score
    FROM r WHERE rn = 1
    """


@_q("semdedup_prune", _semdedup_oracle)
def semdedup_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """SemDeDup (Abbas et al. 2023): semantic near-dup pruning that
    scopes the pairwise cosine check to k-means clusters. A vector is
    pruned when a LOWER-id vector in the SAME cluster has cosine ≥ τ
    (keep-first rule); the output lists each pruned vector with its
    best surviving justification (max score, ties to the smaller id).
    Corpus caveat (TESTDATA.md §Embedding-space structure): the test
    embeddings are isotropic (z10 ≈ 2, label purity = chance), so τ
    fires only on the bulk tail here — the gate verifies the
    cluster-blocked plumbing; τ binds semantically on real corpora.

    Serves from the SAME materialized cluster-partitioned index as
    ``ann_ivf_topk`` (built once per corpus via ``build_once``), so the
    expensive step amortizes across the ANN and dedup queries. Per
    cluster the check is ONE BLAS gram matrix inside ``applyInPandas``
    — at 100 TB the cluster count grows with the corpus (√N-ish), so
    per-task memory stays bounded while total FLOPs drop from N² to
    Σ c_i² ≈ N²/k, which is the entire point of SemDeDup over
    brute-force cosine dedup. Scores are rounded to 6 dp BEFORE the
    τ-compare and the argmax so the decision is reproducible across
    engines."""
    import numpy as np
    import pandas as pd

    idx = spark.read.parquet(ivf_index_dir(spark, sf_dir))

    def prune(key, pdf):
        pdf = pdf.sort_values("vec_id").reset_index(drop=True)
        ids = pdf["vec_id"].to_numpy()
        out = {"vec_id": [], "cluster": [], "nn_id": [], "score": []}
        if len(ids) >= 2:
            v = np.vstack(pdf["embedding"].to_numpy()).astype(np.float64)
            # Zero-norm floor (r12 ADVICE parity sweep): a zero vector
            # scores ~0 against everything — never a NaN gram row that
            # would pass/fail the τ-compare nondeterministically.
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )
            gram = np.round(vn @ vn.T, 6)
            for i in range(1, len(ids)):
                s = gram[i, :i]
                hit = s >= SEMDEDUP_TAU
                if hit.any():
                    best = s[hit].max()
                    nn = ids[:i][hit][s[hit] == best].min()
                    out["vec_id"].append(int(ids[i]))
                    out["cluster"].append(int(key[0]))
                    out["nn_id"].append(int(nn))
                    out["score"].append(float(best))
        return pd.DataFrame(out)

    return idx.groupBy("cluster").applyInPandas(
        prune, schema="vec_id long, cluster int, nn_id long, score double"
    )


# =========================================================================
# Deterministic corpus splitting & the curation funnel
# =========================================================================


@_q(
    "train_split_assign",
    f"""
    SELECT source,
           CASE WHEN {mix_unit_sql("doc_id")} < 0.96 THEN 'train'
                WHEN {mix_unit_sql("doc_id")} < 0.98 THEN 'valid'
                ELSE 'test' END AS split,
           COUNT(*) AS n_docs,
           CAST(SUM(len(string_split(text, ' '))) AS BIGINT) AS n_tokens
    FROM documents
    GROUP BY 1, 2
    """,
)
def train_split_assign(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic train/valid/test split (96/2/2) via the
    multiplicative id hash — the assignment is a pure function of
    doc_id, so it is reproducible across runs, engines, and
    re-partitionings (rand()-based splits are none of those). Output:
    per source × split document and token counts — the table a
    pretraining run's data card reports.

    Scale: a scan-side projection plus one aggregation; the split
    column can be used directly as a write partition key so each split
    lands in its own directory without an extra shuffle."""
    docs = load(spark, sf_dir, "documents")
    u = mix_unit("doc_id")
    split = (
        F.when(u < 0.96, F.lit("train"))
        .when(u < 0.98, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return (
        docs.select(
            "source",
            split.alias("split"),
            F.size(F.split("text", " ")).alias("n_tok"),
        )
        .groupBy("source", "split")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum("n_tok").alias("n_tokens"),
        )
    )


@_q(
    "filter_funnel_report",
    """
    WITH flags AS (
      SELECT (lang = 'en') AS c1,
             (lang = 'en' AND n_chars BETWEEN 100 AND 500) AS c2,
             (lang = 'en' AND n_chars BETWEEN 100 AND 500
              AND len(string_split(text, ' ')) >= 30) AS c3,
             (lang = 'en' AND n_chars BETWEEN 100 AND 500
              AND len(string_split(text, ' ')) >= 30
              AND len(list_distinct(string_split(text, ' ')))
                  >= 0.5 * len(string_split(text, ' '))) AS c4
      FROM documents),
    agg AS (
      SELECT COUNT(*) AS n0,
             CAST(SUM(CASE WHEN c1 THEN 1 ELSE 0 END) AS BIGINT) AS n1,
             CAST(SUM(CASE WHEN c2 THEN 1 ELSE 0 END) AS BIGINT) AS n2,
             CAST(SUM(CASE WHEN c3 THEN 1 ELSE 0 END) AS BIGINT) AS n3,
             CAST(SUM(CASE WHEN c4 THEN 1 ELSE 0 END) AS BIGINT) AS n4
      FROM flags)
    SELECT stage, n_docs, round(CAST(n_docs AS DOUBLE) / n0, 6) AS keep_rate
    FROM (
      SELECT 'stage0_all' AS stage, n0 AS n_docs, n0 FROM agg
      UNION ALL SELECT 'stage1_lang_en', n1, n0 FROM agg
      UNION ALL SELECT 'stage2_len_100_500', n2, n0 FROM agg
      UNION ALL SELECT 'stage3_min_30_tokens', n3, n0 FROM agg
      UNION ALL SELECT 'stage4_unique_ratio_50', n4, n0 FROM agg)
    """,
)
def filter_funnel_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curation funnel: how many documents survive each CUMULATIVE
    filter stage (language → length band → token floor → lexical
    diversity) and the keep-rate vs the raw corpus — the first report
    a data-curation run produces, and the one that catches a filter
    that silently drops 90% of a source.

    Scale: ONE scan with conditional aggregation (no per-stage passes,
    no self-joins); the 5-row report is a driver-side stack of the
    single aggregate row. Adding a stage is one more flag column, still
    one scan."""
    docs = load(spark, sf_dir, "documents")
    toks = F.split("text", " ")
    c1 = F.col("lang") == "en"
    c2 = c1 & F.col("n_chars").between(100, 500)
    c3 = c2 & (F.size(toks) >= 30)
    c4 = c3 & (
        F.size(F.array_distinct(toks)) >= 0.5 * F.size(toks)
    )
    agg = docs.agg(
        F.count("*").alias("n0"),
        F.sum(c1.cast("long")).alias("n1"),
        F.sum(c2.cast("long")).alias("n2"),
        F.sum(c3.cast("long")).alias("n3"),
        F.sum(c4.cast("long")).alias("n4"),
    )
    return agg.selectExpr(
        "stack(5,"
        " 'stage0_all', n0,"
        " 'stage1_lang_en', n1,"
        " 'stage2_len_100_500', n2,"
        " 'stage3_min_30_tokens', n3,"
        " 'stage4_unique_ratio_50', n4) AS (stage, n_docs)",
        "n0",
    ).select(
        "stage",
        "n_docs",
        F.round(F.col("n_docs").cast("double") / F.col("n0"), 6).alias(
            "keep_rate"
        ),
    )


# =========================================================================
# Skew profiling & tokenizer fertility
# =========================================================================


@_q(
    "skew_key_report",
    """
    WITH c AS (SELECT user_id, COUNT(*) AS n_rows FROM events GROUP BY 1),
    s AS (SELECT MAX(n_rows) AS max_c, SUM(n_rows) AS tot,
                 COUNT(*) AS nk FROM c)
    SELECT user_id, n_rows,
           round(CAST(n_rows AS DOUBLE) / tot, 6) AS share,
           round(CAST(max_c AS DOUBLE) * nk / tot, 6) AS skew_factor
    FROM c, s
    ORDER BY n_rows DESC, user_id LIMIT 10
    """,
)
def skew_key_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Join-key skew profile: the top-10 hottest keys with their row
    share, plus the corpus skew factor (hottest key ÷ mean rows/key) —
    the diagnostic that decides whether a join needs salting
    (``operators/skew.py``) BEFORE it blows an executor at 100 TB.

    Scale: one key-count aggregation (map-side combined), a 1-row
    global stat broadcast via crossJoin, TakeOrderedAndProject for the
    top-10 — no full sort, no driver materialization."""
    ev = load(spark, sf_dir, "events")
    counts = ev.groupBy("user_id").agg(F.count("*").alias("n_rows"))
    stats = counts.agg(
        F.max("n_rows").alias("max_c"),
        F.sum("n_rows").alias("tot"),
        F.count("*").alias("nk"),
    )
    return (
        counts.crossJoin(F.broadcast(stats))
        .select(
            "user_id",
            "n_rows",
            F.round(F.col("n_rows").cast("double") / F.col("tot"), 6).alias(
                "share"
            ),
            F.round(
                F.col("max_c").cast("double") * F.col("nk") / F.col("tot"), 6
            ).alias("skew_factor"),
        )
        .orderBy(F.desc("n_rows"), "user_id")
        .limit(10)
    )


@_q(
    "fertility_by_source",
    """
    WITH per AS (
      SELECT source,
             len(string_split(text, ' ')) AS n_tok,
             length(text) AS n_ch
      FROM documents)
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_tok) AS BIGINT) AS n_tokens,
           CAST(SUM(n_ch) AS BIGINT) AS n_chars,
           round(CAST(SUM(n_tok) AS DOUBLE) / SUM(n_ch), 6)
             AS tokens_per_char,
           round(CAST(SUM(n_ch) - SUM(n_tok) + COUNT(*) AS DOUBLE)
                 / SUM(n_tok), 6) AS avg_token_len
    FROM per GROUP BY source
    """,
)
def fertility_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Tokenizer fertility stats per source: tokens-per-char and mean
    token length (chars net of separators) — the metric that predicts
    how many training tokens a source yields per stored byte, i.e.
    what a token-budgeted data mix actually buys from each source.

    Scale: scan-side projections + one aggregation; all cross-row sums
    are exact integer arithmetic (the divisions happen once, on the
    aggregated totals), so the result is bit-stable across engines and
    partitionings."""
    docs = load(spark, sf_dir, "documents")
    per = docs.select(
        "source",
        F.size(F.split("text", " ")).alias("n_tok"),
        F.length("text").alias("n_ch"),
    )
    return per.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_tok").alias("n_tokens"),
        F.sum("n_ch").alias("n_chars"),
        F.round(
            F.sum("n_tok").cast("double") / F.sum("n_ch"), 6
        ).alias("tokens_per_char"),
        F.round(
            (F.sum("n_ch") - F.sum("n_tok") + F.count("*")).cast("double")
            / F.sum("n_tok"),
            6,
        ).alias("avg_token_len"),
    )


# =========================================================================
# Higher-order array-function surface
# =========================================================================


@_q(
    "higher_order_array_funcs",
    """
    WITH s AS (
      SELECT vec_id,
             list_transform(embedding, x -> CAST(x AS DOUBLE)) AS v
      FROM embeddings)
    SELECT vec_id,
           round(sqrt(list_sum(list_transform(v, x -> x * x))), 6) AS l2_norm,
           CAST(len(list_filter(v, x -> x > 0)) AS BIGINT) AS n_pos,
           len(list_filter(v, x -> x > 1.5)) > 0 AS has_gt,
           to_json(list_transform(list_reverse_sort(v)[1:3],
                                  x -> CAST(round(x * 1000000.0) AS BIGINT)))
             AS top3_e6,
           round(list_sum(list_transform(list_zip(v, list_reverse(v)),
                                         p -> p[1] * p[2])), 6) AS rev_dot
    FROM s
    """,
)
def higher_order_array_funcs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Higher-order function surface over array columns: aggregate
    (fold), filter, exists, transform, zip_with, array_sort/reverse,
    slice — the lambda-expression toolkit that keeps vector math
    JVM-side (whole-stage codegen) instead of dropping to Python.
    Top-3 magnitudes are emitted as 1e-6-scaled integers inside JSON so
    the cell is hashable and float-formatting-neutral across engines.

    Scale: a single codegen'd projection over the scan — zero shuffles,
    zero Python; this is the fast path every per-vector feature should
    take before reaching for a pandas UDF."""
    emb = load(spark, sf_dir, "embeddings")
    return emb.select(
        "vec_id", F.expr("transform(embedding, x -> CAST(x AS DOUBLE))").alias("v")
    ).select(
        "vec_id",
        F.round(
            F.expr(
                "sqrt(aggregate(v, CAST(0.0 AS DOUBLE), (acc, x) -> acc + x * x))"
            ),
            6,
        ).alias("l2_norm"),
        F.expr("CAST(size(filter(v, x -> x > 0)) AS BIGINT)").alias("n_pos"),
        F.expr("exists(v, x -> x > 1.5D)").alias("has_gt"),
        F.expr(
            "to_json(transform(slice(reverse(array_sort(v)), 1, 3),"
            " x -> CAST(round(x * 1000000.0) AS BIGINT)))"
        ).alias("top3_e6"),
        F.round(
            F.expr(
                "aggregate(zip_with(v, reverse(v), (x, y) -> x * y),"
                " CAST(0.0 AS DOUBLE), (acc, x) -> acc + x)"
            ),
            6,
        ).alias("rev_dot"),
    )


# =========================================================================
# Wave 3: entity-resolution verify, weighted windows, weighted sampling
# =========================================================================


@_q(
    "dedup_edit_distance",
    f"""
    WITH {dedup.lsh_cand_cte()}
    SELECT c.id_a, c.id_b,
           levenshtein(da.text, db.text) AS edit_distance,
           round(CAST(levenshtein(da.text, db.text) AS DOUBLE)
                 / greatest(length(da.text), length(db.text)), 6)
             AS rel_distance
    FROM cand c
    JOIN documents da ON da.doc_id = c.id_a
    JOIN documents db ON db.doc_id = c.id_b
    WHERE levenshtein(da.text, db.text)
          <= 0.2 * greatest(length(da.text), length(db.text))
    """,
)
def dedup_edit_distance(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Entity-resolution-style fuzzy dedup: MinHash-LSH candidate
    generation, then EDIT-DISTANCE verification (Levenshtein ≤ 20% of
    the longer text) — the verify primitive record-linkage systems use
    when set-similarity (Jaccard) is too coarse for near-identical
    strings with small in-place edits.

    Scale: the O(len²) Levenshtein only ever runs on the LSH candidate
    list (bounded band buckets — sub-quadratic), never corpus×corpus;
    the two text lookups are equi-joins on doc_id. Candidate
    generation is shared code (and shared oracle CTEs) with
    ``dedup_minhash_lsh``, reading the family-shared stored shingle
    sets (``sets_cached``, r7)."""
    from etl_projects_spark.queries_llm import sets_cached

    docs = load(spark, sf_dir, "documents")
    sets = sets_cached(spark, sf_dir)
    sigs = dedup.minhash_signatures_from_sets(sets)
    cand = dedup.lsh_candidate_pairs(sigs)
    a = docs.select(F.col("doc_id").alias("id_a"), F.col("text").alias("ta"))
    b = docs.select(F.col("doc_id").alias("id_b"), F.col("text").alias("tb"))
    lev = F.levenshtein("ta", "tb")
    mx = F.greatest(F.length("ta"), F.length("tb"))
    return (
        cand.join(a, "id_a")
        .join(b, "id_b")
        .filter(lev <= 0.2 * mx)
        .select(
            "id_a",
            "id_b",
            lev.alias("edit_distance"),
            F.round(lev.cast("double") / mx, 6).alias("rel_distance"),
        )
    )


@_q(
    "ewma_daily_value",
    """
    WITH daily AS (
      SELECT event_type, CAST(ts AS DATE) AS day,
             CAST(SUM(CAST(value AS DECIMAL(18,2))) AS DECIMAL(18,2)) AS total
      FROM events GROUP BY 1, 2)
    SELECT a.event_type, CAST(a.day AS VARCHAR) AS day,
           CAST(SUM(b.total * CAST(pow(0.5, a.day - b.day)
                                   AS DECIMAL(9,7))) AS DOUBLE)
           / CAST(SUM(CAST(pow(0.5, a.day - b.day)
                           AS DECIMAL(9,7))) AS DOUBLE) AS ewma,
           COUNT(*) AS n_days_in_window
    FROM daily a JOIN daily b
      ON a.event_type = b.event_type
     AND b.day BETWEEN a.day - 6 AND a.day
    GROUP BY a.event_type, a.day
    """,
)
def ewma_daily_value(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exponentially weighted trailing average (α = 1/2, 7-day
    window) of daily event value per type — the smoothing pass behind
    trend dashboards and drift monitors, as a DISTANCE-WEIGHTED window
    (plain window frames can't weight members by their distance to the
    current row, so the trailing window is a banded self-join).

    Determinism: weights 0.5^d are exact binary fractions, cast to
    DECIMAL(9,7) (exact for d ≤ 7), and the daily totals are exact
    DECIMAL(18,2) — so every product and cross-row sum is exact
    integer-scaled arithmetic in BOTH engines; the only float ops are
    the final two casts and one division. Scale: the band self-join
    fans each daily row into ≤ 7 copies (bounded), keyed on
    (event_type) — the same shape as ``range_join_daily_windows``."""
    ev = load(spark, sf_dir, "events")
    # The 18,2 re-cast after the SUM keeps the (total × weight) product
    # inside DECIMAL(28,9) — within both engines' 38-digit cap, so the
    # weighted sum stays EXACT; at sum-type precision (28,2) the product
    # would overflow 38 and each engine truncates the scale differently.
    daily = ev.groupBy(
        "event_type", F.to_date("ts").alias("day")
    ).agg(F.sum(dec("value")).cast("decimal(18,2)").alias("total"))
    a = daily.select(
        "event_type", F.col("day").alias("day_a")
    )
    b = daily.select(
        F.col("event_type").alias("et_b"),
        F.col("day").alias("day_b"),
        F.col("total").alias("total_b"),
    )
    w = F.pow(F.lit(0.5), F.datediff("day_a", "day_b")).cast("decimal(9,7)")
    joined = a.join(
        b,
        (F.col("event_type") == F.col("et_b"))
        & F.col("day_b").between(
            F.date_sub(F.col("day_a"), 6), F.col("day_a")
        ),
    )
    return (
        joined.groupBy(
            "event_type", F.col("day_a").cast("string").alias("day")
        )
        .agg(
            (
                F.sum(F.col("total_b") * w).cast("double")
                / F.sum(w).cast("double")
            ).alias("ewma"),
            F.count("*").alias("n_days_in_window"),
        )
    )


@_q(
    "weighted_sample_topk",
    f"""
    WITH keyed AS (
      SELECT source, doc_id, n_chars,
             ln((({mix_unit_sql("doc_id")}) * 1000000 + 1) / 1000001.0)
               / n_chars AS k
      FROM documents),
    r AS (SELECT source, doc_id, n_chars,
                 row_number() OVER (PARTITION BY source
                                    ORDER BY ROUND(k, 9) DESC, doc_id) AS rk
          FROM keyed)
    SELECT source, rk, doc_id, n_chars FROM r WHERE rk <= 3
    """,
)
def weighted_sample_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Deterministic weighted sampling (Efraimidis–Spiliotis A-ES):
    per source, the 3 documents with the largest ln(u)/w key, where u
    is the reproducible multiplicative id hash and w = n_chars — i.e.
    a weighted reservoir sample that prefers longer documents but is a
    pure function of the data (re-runs, engines, and repartitionings
    all agree; rand()-based weighted sampling is none of those).

    Scale: scan-side key computation + one per-source top-k
    (WindowGroupLimit — no global sort); this is exactly how a
    size-weighted corpus subsample is drawn from 100 TB in one pass."""
    docs = load(spark, sf_dir, "documents")
    u = mix_unit("doc_id")
    k = F.log((u * 1000000 + 1) / 1000001.0) / F.col("n_chars")
    # Rank on the ROUNDED key: raw ln() can differ by 1 ulp between
    # engines' libm, which would flip the rk=3 boundary; at 9 dp the
    # near-ties collapse to exact ties broken by doc_id.
    win = W.partitionBy("source").orderBy(
        F.desc(F.round("k", 9)), "doc_id"
    )
    return (
        docs.select("source", "doc_id", "n_chars", k.alias("k"))
        .withColumn("rk", F.row_number().over(win))
        .filter(F.col("rk") <= 3)
        .select("source", "rk", "doc_id", "n_chars")
    )


# =========================================================================
# Wave 4: positional phrase search, single-pass statistics, dedup-graph
# observability
# =========================================================================

PHRASE = ("table", "value")  # phrase_search_positions query phrase


@_q(
    "phrase_search_positions",
    f"""
    WITH toks AS (SELECT doc_id, string_split(text, ' ') AS a FROM documents),
    pos AS (SELECT doc_id, a[i] AS term, i
            FROM toks, UNNEST(generate_series(1, len(a))) t(i)
            WHERE a[i] IN ('{PHRASE[0]}', '{PHRASE[1]}'))
    SELECT p1.doc_id,
           COUNT(*) AS n_matches,
           CAST(MIN(p1.i) AS BIGINT) AS first_pos
    FROM pos p1 JOIN pos p2
      ON p1.doc_id = p2.doc_id AND p2.i = p1.i + 1
     AND p1.term = '{PHRASE[0]}' AND p2.term = '{PHRASE[1]}'
    GROUP BY p1.doc_id
    """,
)
def phrase_search_positions(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Positional-index phrase search: find documents containing the
    exact phrase "{w1} {w2}" by intersecting the two terms' positional
    posting lists (pos₂ = pos₁ + 1) — the adjacency-join primitive
    full-text engines run over positional inverted indexes, where
    substring scanning is impossible because the index, not the text,
    is what's stored.

    Scale: the term filter prunes the exploded postings to the two
    query terms BEFORE any shuffle (two terms' postings ≪ corpus), the
    adjacency join is an equi-join on (doc, position), and at 100 TB
    the postings relation is the materialized term-partitioned table
    this query's first stage emits (same persisted-index lifecycle as
    ``bm25_retrieval``/``ann_ivf_topk``). The oracle verifies through
    the identical positional formulation over DuckDB's lambda-free
    UNNEST — independent of Spark's posexplode machinery."""
    docs = load(spark, sf_dir, "documents")
    pos = (
        docs.select(
            "doc_id",
            F.posexplode(F.split("text", " ")).alias("i0", "term"),
        )
        .filter(F.col("term").isin(*PHRASE))
        # DuckDB's generate_series positions are 1-based; align.
        .select("doc_id", "term", (F.col("i0") + 1).alias("i"))
    )
    p1 = pos.filter(F.col("term") == PHRASE[0]).select(
        "doc_id", F.col("i").alias("i1")
    )
    p2 = pos.filter(F.col("term") == PHRASE[1]).select(
        F.col("doc_id").alias("d2"), F.col("i").alias("i2")
    )
    return (
        p1.join(
            p2,
            (F.col("doc_id") == F.col("d2"))
            & (F.col("i2") == F.col("i1") + 1),
        )
        .groupBy("doc_id")
        .agg(
            F.count("*").alias("n_matches"),
            F.min("i1").cast("bigint").alias("first_pos"),
        )
    )


_CORR_COLS = ("l_quantity", "l_extendedprice", "l_discount", "l_tax")


def _corr_oracle() -> str:
    """Single-pass Pearson correlation matrix oracle, generated from
    the same column list as the Spark query: every sum is exact
    DECIMAL, the corr formula runs once on the aggregated totals in
    DOUBLE (identical inputs → identical doubles in both engines)."""
    sums = [f"CAST(COUNT(*) AS DOUBLE) AS n"]
    for c in _CORR_COLS:
        sums.append(f"CAST(SUM(CAST({c} AS DECIMAL(18,2))) AS DOUBLE) AS s_{c}")
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            sums.append(
                f"CAST(SUM(CAST({a} AS DECIMAL(18,2)) * CAST({b} AS DECIMAL(18,2))) AS DOUBLE) AS p_{a}_{b}"
            )
    pairs = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            pairs.append(
                f"SELECT '{a}' AS col_a, '{b}' AS col_b,"
                f" (n * p_{a}_{b} - s_{a} * s_{b})"
                f" / (sqrt(n * p_{a}_{a} - s_{a} * s_{a})"
                f"    * sqrt(n * p_{b}_{b} - s_{b} * s_{b})) AS corr"
                f" FROM agg"
            )
    return (
        "WITH agg AS (SELECT "
        + ", ".join(sums)
        + " FROM lineitem) "
        + " UNION ALL ".join(pairs)
    )


@_q("correlation_matrix_lineitem", _corr_oracle())
def correlation_matrix_lineitem(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Pearson correlation matrix over the lineitem measures in ONE
    pass: a single aggregation computes every Σx, Σx², Σxy in exact
    DECIMAL (order-independent), and the 6 pairwise correlations are a
    driver-free projection of that one row — the statistics pass a
    feature-engineering pipeline runs before model training, without
    6 separate corr() scans.

    Scale: one scan, one (map-side combined) aggregate to a single
    row, however wide the matrix; adding a column adds sums, not
    passes. The final double arithmetic runs on identical exact inputs
    in both engines, so no rounding is needed for parity."""
    li = load(spark, sf_dir, "lineitem")
    aggs = [F.count("*").cast("double").alias("n")]
    for c in _CORR_COLS:
        aggs.append(F.sum(dec(c)).cast("double").alias(f"s_{c}"))
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i:]:
            aggs.append(
                F.sum(dec(a) * dec(b)).cast("double").alias(f"p_{a}_{b}")
            )
    agg = li.agg(*aggs)
    stack_args = []
    for i, a in enumerate(_CORR_COLS):
        for b in _CORR_COLS[i + 1 :]:
            corr = (
                f"(n * p_{a}_{b} - s_{a} * s_{b})"
                f" / (sqrt(n * p_{a}_{a} - s_{a} * s_{a})"
                f"    * sqrt(n * p_{b}_{b} - s_{b} * s_{b}))"
            )
            stack_args.append(f"'{a}', '{b}', {corr}")
    n_pairs = len(stack_args)
    return agg.selectExpr(
        f"stack({n_pairs}, "
        + ", ".join(stack_args)
        + ") AS (col_a, col_b, corr)"
    )


@_q(
    "dedup_component_size_histogram",
    f"""
    WITH comp AS ({dedup.components_sql()}),
    sizes AS (SELECT comp.comp, COUNT(*) AS sz FROM comp GROUP BY 1)
    SELECT sz AS component_size,
           COUNT(*) AS n_components,
           CAST(SUM(sz) AS BIGINT) AS n_docs
    FROM sizes GROUP BY sz
    """,
)
def dedup_component_size_histogram(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dedup-graph observability: the near-duplicate component-size
    histogram — how many clusters of 2, 3, …, k near-identical
    documents the corpus contains, and how many documents they bind.
    A heavy tail here is the signal that one template/boilerplate
    source is flooding the corpus (and that LSH band settings may need
    tightening before the keep-list pass).

    Consumes the SAME persisted component labels as
    ``dedup_minhash_components`` / ``dedup_keep_list`` /
    ``neardup_rate_by_source`` (built at most once per corpus
    snapshot): the histogram itself is two tiny aggregations over the
    label read."""
    from etl_projects_spark.queries_llm import _components_cached

    comps = _components_cached(spark, sf_dir)
    sizes = comps.groupBy("comp").agg(F.count("*").alias("sz"))
    return sizes.groupBy(F.col("sz").alias("component_size")).agg(
        F.count("*").alias("n_components"),
        F.sum("sz").cast("bigint").alias("n_docs"),
    )


# =========================================================================
# Wave 5: telemetry debouncing, fixed-size stratified sampling,
# weighted median
# =========================================================================

DEBOUNCE_US = 21_600 * 1_000_000  # 6 h, in microseconds


@_q(
    "events_debounce",
    f"""
    WITH e AS (SELECT user_id, event_type, event_id, epoch_us(ts) AS us
               FROM events),
    l AS (SELECT *, lag(us) OVER (PARTITION BY user_id, event_type
                                  ORDER BY us, event_id) AS prev
          FROM e)
    SELECT user_id, event_type,
           COUNT(*) AS n_events,
           CAST(COUNT(*) FILTER (WHERE prev IS NULL
                                 OR us - prev >= {DEBOUNCE_US}) AS BIGINT)
             AS n_kept
    FROM l GROUP BY user_id, event_type
    """,
)
def events_debounce(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Telemetry debouncing: per (user, event type), keep an event only
    if ≥ 6 h passed since the PREVIOUS event of that stream — the
    repeated-signal suppression every event pipeline runs before
    counting "real" actions (retries, double-clicks, crash loops all
    collapse to one).

    One lag window inside the natural (user, type) partitioning — the
    same single shuffle any per-stream operator pays; time math is
    exact integer microseconds (no float epochs, no DST sensitivity —
    only differences are compared). At 100 TB the stream key
    partitioning bounds every task to one user-type's history."""
    ev = load(spark, sf_dir, "events")
    us = F.unix_micros(F.col("ts").cast("timestamp"))
    win = W.partitionBy("user_id", "event_type").orderBy("us", "event_id")
    l = ev.select("user_id", "event_type", "event_id", us.alias("us")
                  ).withColumn("prev", F.lag("us").over(win))
    keep = F.col("prev").isNull() | (
        F.col("us") - F.col("prev") >= F.lit(DEBOUNCE_US)
    )
    return l.groupBy("user_id", "event_type").agg(
        F.count("*").alias("n_events"),
        F.sum(keep.cast("long")).alias("n_kept"),
    )


@_q(
    "fixed_size_per_group_sample",
    f"""
    WITH r AS (
      SELECT source, doc_id,
             row_number() OVER (PARTITION BY source
                                ORDER BY {mix_unit_sql("doc_id")}, doc_id)
               AS rn
      FROM documents)
    SELECT source, rn, doc_id FROM r WHERE rn <= 5
    """,
)
def fixed_size_per_group_sample(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Fixed-size stratified sample: EXACTLY 5 documents per source,
    chosen by the deterministic id hash — the eval-set construction
    primitive (rate-based sampling can't guarantee per-stratum counts;
    this does, reproducibly across runs, engines, and partitionings).

    Plans as WindowGroupLimit (per-group top-k, no full per-partition
    sort) over the scan — one shuffle on the stratum key."""
    docs = load(spark, sf_dir, "documents")
    win = W.partitionBy("source").orderBy(mix_unit("doc_id"), "doc_id")
    return (
        docs.select("source", "doc_id")
        .withColumn("rn", F.row_number().over(win))
        .filter(F.col("rn") <= 5)
        .select("source", "rn", "doc_id")
    )


@_q(
    "weighted_median_price",
    """
    WITH w AS (SELECT l_returnflag,
                      CAST(l_extendedprice AS DECIMAL(18,2)) AS v,
                      CAST(l_quantity AS DECIMAL(18,2)) AS wt
               FROM lineitem),
    c AS (SELECT *,
                 SUM(wt) OVER (PARTITION BY l_returnflag
                               ORDER BY v, wt
                               ROWS UNBOUNDED PRECEDING) AS cum,
                 SUM(wt) OVER (PARTITION BY l_returnflag) AS tot
          FROM w)
    SELECT l_returnflag, CAST(MIN(v) AS DOUBLE) AS wmedian
    FROM c WHERE 2 * cum >= tot GROUP BY l_returnflag
    """,
)
def weighted_median_price(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Exact weighted median (quantity-weighted extendedprice per
    return flag) via the cumulative-weight window: the first value
    whose running weight crosses half the partition total. The
    order-statistic that `percentile_approx` only approximates, exact
    and engine-portable because every weight is DECIMAL (the crossing
    comparison 2·cum ≥ tot is integer-exact, immune to float summation
    order).

    Scale: one shuffle on the group key, one ordered window pass —
    same cost as any per-group running total; no global sort. Ties on
    (value, weight) cannot flip the result: tied rows share v, and the
    answer is MIN(v) over crossing rows."""
    li = load(spark, sf_dir, "lineitem")
    w = li.select(
        "l_returnflag",
        dec("l_extendedprice").alias("v"),
        dec("l_quantity").alias("wt"),
    )
    cum_w = W.partitionBy("l_returnflag").orderBy("v", "wt").rowsBetween(
        W.unboundedPreceding, W.currentRow
    )
    tot_w = W.partitionBy("l_returnflag")
    c = w.select(
        "l_returnflag",
        "v",
        F.sum("wt").over(cum_w).alias("cum"),
        F.sum("wt").over(tot_w).alias("tot"),
    )
    return (
        c.filter(2 * F.col("cum") >= F.col("tot"))
        .groupBy("l_returnflag")
        .agg(F.min("v").cast("double").alias("wmedian"))
    )


# =========================================================================
# Wave 6: graph analytics on the dedup pair graph, multi-agg pivot
# =========================================================================


@_q(
    "dedup_graph_triangles",
    f"""
    WITH edges AS (SELECT id_a AS a, id_b AS b
                   FROM ({dedup.minhash_pairs_sql()}))
    SELECT e1.a AS node_a, e1.b AS node_b, e2.b AS node_c
    FROM edges e1
    JOIN edges e2 ON e1.b = e2.a
    JOIN edges e3 ON e3.a = e1.a AND e3.b = e2.b
    """,
)
def dedup_graph_triangles(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Distributed triangle listing over the verified near-duplicate
    pair graph: triangles are the strong-transitivity signal that a
    component is a genuine template cluster rather than a chain of
    borderline pairs (chains break when one edge is spurious;
    triangles don't).

    The classic oriented-edge algorithm: edges already satisfy a < b
    (the dedup pair convention), so each triangle {{a<b<c}} is counted
    exactly once by joining wedge (a,b)-(b,c) against closing edge
    (a,c) — two equi-joins on node keys, no enumeration of 2-paths
    through high-degree nodes outside the join. At 100 TB-scale graphs
    the standard refinement (orient by degree instead of id) drops the
    wedge count to O(m^1.5); on near-dup graphs edge count ≪ corpus so
    the joins are broadcast-sized. Reads the PERSISTED pair-list
    artifact (``queries_llm.pairs_cached`` — built once per corpus
    snapshot, shared with the connected-components family), so the
    triangle pass costs two joins over the edge table, not a re-run of
    the shingle→signature→verify chain."""
    from etl_projects_spark.queries_llm import pairs_cached

    edges = pairs_cached(spark, sf_dir).select(
        F.col("id_a").alias("a"), F.col("id_b").alias("b")
    )
    e1 = edges.select(F.col("a").alias("node_a"), F.col("b").alias("node_b"))
    e2 = edges.select(F.col("a").alias("node_b"), F.col("b").alias("node_c"))
    e3 = edges.select(F.col("a").alias("node_a"), F.col("b").alias("node_c"))
    return e1.join(e2, "node_b").join(e3, ["node_a", "node_c"]).select(
        "node_a", "node_b", "node_c"
    )


@_q(
    "pivot_multi_agg_daily",
    """
    SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
           CAST(COUNT(*) FILTER (WHERE event_type = 'click') AS BIGINT)
             AS click_n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
                 FILTER (WHERE event_type = 'click'), 0) AS DOUBLE)
             AS click_sum,
           CAST(COUNT(*) FILTER (WHERE event_type = 'purchase') AS BIGINT)
             AS purchase_n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
                 FILTER (WHERE event_type = 'purchase'), 0) AS DOUBLE)
             AS purchase_sum,
           CAST(COUNT(*) FILTER (WHERE event_type = 'error') AS BIGINT)
             AS error_n,
           CAST(COALESCE(SUM(CAST(value AS DECIMAL(18,2)))
                 FILTER (WHERE event_type = 'error'), 0) AS DOUBLE)
             AS error_sum
    FROM events GROUP BY 1
    """,
)
def pivot_multi_agg_daily(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Multi-aggregate pivot: day × event-type matrix carrying BOTH a
    count and an exact-decimal sum per pivoted column — the wide
    activity table BI dashboards read, where single-agg ``pivot()``
    (see ``pivot_status``) forces two scans. Spark's
    ``pivot().agg(count, sum)`` plans this as ONE pass; the oracle
    replays it as conditional aggregation.

    Scale: ONE scan regardless of how many (type × agg) columns the
    matrix has; Spark plans the pivot as a two-level aggregation
    ((day, type) partial agg, then pivot-to-columns), so what shuffles
    twice is the compact day×type matrix — never the raw events. The
    pivoted value list is declared explicitly so the plan skips the
    distinct-values pre-query a dynamic pivot pays."""
    ev = load(spark, sf_dir, "events")
    piv = (
        ev.select(
            F.to_date("ts").cast("string").alias("day"),
            "event_type",
            dec("value").alias("v"),
        )
        .groupBy("day")
        .pivot("event_type", ["click", "purchase", "error"])
        .agg(F.count(F.lit(1)).alias("n"), F.sum("v").alias("sum"))
    )
    out = piv.select(
        "day",
        F.coalesce(F.col("click_n"), F.lit(0)).cast("bigint").alias("click_n"),
        F.coalesce(F.col("click_sum"), F.lit(0)).cast("double").alias("click_sum"),
        F.coalesce(F.col("purchase_n"), F.lit(0)).cast("bigint").alias("purchase_n"),
        F.coalesce(F.col("purchase_sum"), F.lit(0)).cast("double").alias("purchase_sum"),
        F.coalesce(F.col("error_n"), F.lit(0)).cast("bigint").alias("error_n"),
        F.coalesce(F.col("error_sum"), F.lit(0)).cast("double").alias("error_sum"),
    )
    return out


# =========================================================================
# Wave 7: partition-level anti-entropy checksums
# =========================================================================

_CK_MOD = 1 << 20  # per-row 20-bit residue: sums stay exact far past 10^12 rows


@_q(
    "partition_checksums",
    f"""
    WITH r AS (
      SELECT CAST(CAST(ts AS DATE) AS VARCHAR) AS day,
             {dedup.hex60_sql(
                 "event_id || '|' || epoch_us(ts) || '|' || user_id || '|' "
                 "|| event_type || '|' "
                 "|| CAST(CAST(value AS DECIMAL(18,2)) AS VARCHAR)")} AS h
      FROM events)
    SELECT day,
           COUNT(*) AS n_rows,
           CAST(SUM(h % {_CK_MOD}) AS BIGINT) AS checksum,
           MIN(h) AS min_h,
           MAX(h) AS max_h
    FROM r GROUP BY day
    """,
)
def partition_checksums(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Anti-entropy partition fingerprints: per day-partition, an
    ORDER-INSENSITIVE content checksum (sum of 20-bit row-hash
    residues), the row count, and the hash extrema — the Merkle-leaf
    table two replicas exchange to find which partitions diverged
    before shipping any data (the cheap first step of table repair /
    cross-region sync / migration validation).

    The row hash is the md5-derived 60-bit integer whose cross-engine
    parity the dedup family already proves (``dedup.hex60``); the
    summed residue is 20-bit so the per-partition sum stays exact far
    beyond 10¹² rows in both engines' integer types. Scale: one scan,
    one aggregation keyed on the partition value — the checksum table
    for a 100 TB table is a few thousand rows."""
    ev = load(spark, sf_dir, "events")
    repr_ = F.concat_ws(
        "|",
        F.col("event_id"),
        F.unix_micros(F.col("ts").cast("timestamp")),
        F.col("user_id"),
        F.col("event_type"),
        dec("value").cast("string"),
    )
    h = dedup.hex60(repr_)
    return (
        ev.select(
            F.to_date("ts").cast("string").alias("day"), h.alias("h")
        )
        .groupBy("day")
        .agg(
            F.count("*").alias("n_rows"),
            F.sum(F.col("h") % _CK_MOD).alias("checksum"),
            F.min("h").alias("min_h"),
            F.max("h").alias("max_h"),
        )
    )


# =========================================================================
# Wave 9: PCA projection (dimensionality reduction)
# =========================================================================


def _pca_oracle() -> str | None:
    """Oracle for embedding_pca_project: the basis is reproducible from
    the sample contract + data (numpy twin), so the oracle inlines the
    mean and eigenvectors as constants and replays the projection in
    SQL list arithmetic. Registered as a CALLABLE (resolved by
    oracle_sql() at gate time against the oracle corpus then in effect
    — r13, the lazy-oracle sweep); None if that corpus is absent."""
    sf_dir = os.environ.get("SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01")
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    mu, basis = similarity.pca_basis_twin(path)
    mu_l = "[" + ",".join(repr(float(x)) for x in mu) + "]"
    cols = []
    for j in range(basis.shape[1]):
        ej = "[" + ",".join(repr(float(x)) for x in basis[:, j]) + "]"
        cols.append(
            f"round(list_sum(list_transform(list_zip(v, {ej}),"
            f" p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE))), 6)"
            f" AS p{j + 1}"
        )
    return f"""
    WITH s AS (
      SELECT vec_id,
             list_transform(list_zip(embedding, {mu_l}),
                            p -> CAST(p[1] AS DOUBLE) - CAST(p[2] AS DOUBLE))
               AS v
      FROM embeddings)
    SELECT vec_id, {', '.join(cols)} FROM s
    """


@_q("embedding_pca_project", _pca_oracle)
def embedding_pca_project(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dimensionality reduction for corpus-scale embedding work: PCA
    basis from a BOUNDED id-ordered sample (2048 rows — same driver
    contract as the IVF codebook), then every vector projected onto
    the top 4 components in one broadcast + BLAS matmul per Arrow
    batch. The 64-d→4-d cut is what makes billion-vector
    visualization, coarse clustering, and cheap prefilters tractable
    before exact rescoring on the full vectors.

    Determinism: eigenvector signs are fixed (max-|x| component
    positive), the basis is a pure function of the capped sample, and
    the oracle replays the projection from inlined constants — so the
    whole reduction is hash-checkable, unusual for PCA pipelines."""
    emb = load(spark, sf_dir, "embeddings")
    mu, basis = similarity.pca_basis(emb)
    return similarity.pca_project(emb, mu, basis)


@_q(
    "dedup_prefix_containment",
    """
    SELECT a.doc_id AS short_id, b.doc_id AS long_id,
           a.n_chars AS short_len, b.n_chars AS long_len
    FROM documents a
    JOIN documents b
      ON substring(a.text, 1, 32) = substring(b.text, 1, 32)
     AND a.n_chars >= 32
     AND a.n_chars < b.n_chars
     AND starts_with(b.text, a.text)
    """,
)
def dedup_prefix_containment(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Containment dedup: documents that are a strict PREFIX of a
    longer document (truncated re-crawls, partial copies — pairs
    MinHash under-weights because the longer doc dilutes the
    Jaccard). Blocking is semantics-preserving, not approximate: a
    prefix relation with len(short) ≥ 32 forces the two 32-char heads
    to be identical, so the equi-join on the head key loses no pair —
    the shuffle is bounded by head-cluster sizes instead of
    all-pairs. Verification (startswith) is candidate-local. At
    100 TB the head key distributes like a hash key except for
    boilerplate heads, which are exactly the pairs being hunted."""
    docs = load(spark, sf_dir, "documents").select("doc_id", "text", "n_chars")
    a = docs.filter(F.col("n_chars") >= 32).select(
        F.col("doc_id").alias("short_id"),
        F.col("text").alias("a_text"),
        F.col("n_chars").alias("short_len"),
        F.substring("text", 1, 32).alias("head"),
    )
    b = docs.select(
        F.col("doc_id").alias("long_id"),
        F.col("text").alias("b_text"),
        F.col("n_chars").alias("long_len"),
        F.substring("text", 1, 32).alias("head"),
    )
    return (
        a.join(b, "head")
        .filter(
            (F.col("short_len") < F.col("long_len"))
            & F.col("b_text").startswith(F.col("a_text"))
        )
        .select("short_id", "long_id", "short_len", "long_len")
    )


@_q(
    "zscore_doc_length_by_source",
    """
    WITH s AS (
      SELECT source, COUNT(*) AS n,
             CAST(SUM(n_chars) AS BIGINT) AS sx,
             CAST(SUM(n_chars * n_chars) AS BIGINT) AS sxx
      FROM documents GROUP BY 1)
    SELECT doc_id, d.source, n_chars,
           CAST(n_chars * n - sx AS DOUBLE)
             / sqrt(CAST(n * sxx - sx * sx AS DOUBLE)) AS z
    FROM documents d JOIN s ON d.source = s.source
    WHERE n * sxx - sx * sx > 0
    """,
)
def zscore_doc_length_by_source(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-group feature standardization (z-score of document length
    within each source) — the normalize-before-filter step of quality
    pipelines, done the 100 TB way: group moments (n, Σx, Σx²) are one
    small aggregate BROADCAST back onto the corpus, not a window that
    reshuffles every row by source (skewed sources would straggle).
    Exactness: the moments are exact BIGINTs and
    z = (x·n − Σx) / √(n·Σx² − Σx²) evaluates (x−μ)/σ as ONE
    deterministic double expression over exact integers — a
    hash-checkable float normalization, immune to summation order."""
    docs = load(spark, sf_dir, "documents")
    stats = docs.groupBy("source").agg(
        F.count("*").alias("n"),
        F.sum("n_chars").alias("sx"),
        F.sum(F.col("n_chars") * F.col("n_chars")).alias("sxx"),
    )
    joined = docs.select("doc_id", "source", "n_chars").join(
        F.broadcast(stats), "source"
    )
    var_n2 = F.col("n") * F.col("sxx") - F.col("sx") * F.col("sx")
    return (
        joined.filter(var_n2 > 0)
        .select(
            "doc_id",
            "source",
            "n_chars",
            (
                (F.col("n_chars") * F.col("n") - F.col("sx")).cast("double")
                / F.sqrt(var_n2.cast("double"))
            ).alias("z"),
        )
    )


@_q(
    "data_card_report",
    """
    SELECT source,
           COUNT(*) AS n_docs,
           CAST(SUM(n_chars) AS BIGINT) AS total_chars,
           CAST(CAST(SUM(n_chars) AS DOUBLE) / COUNT(*) AS DOUBLE)
             AS avg_chars,
           COUNT(DISTINCT lang) AS n_langs,
           CAST(SUM(CASE WHEN lang = 'en' THEN 1 ELSE 0 END) AS DOUBLE)
             / COUNT(*) AS en_share,
           MIN(n_chars) AS min_chars,
           MAX(n_chars) AS max_chars
    FROM documents GROUP BY source
    """,
)
def data_card_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Dataset-card rollup: the per-source summary block of a data
    card (docs, volume, length profile, language mix) in ONE
    aggregation pass — the report every corpus release ships. All
    ratios divide exact integers, so the doubles are deterministic;
    single shuffle on the source key."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("source").agg(
        F.count("*").alias("n_docs"),
        F.sum("n_chars").alias("total_chars"),
        (F.sum("n_chars").cast("double") / F.count("*")).alias("avg_chars"),
        F.countDistinct("lang").alias("n_langs"),
        (
            F.sum(F.when(F.col("lang") == "en", 1).otherwise(0)).cast("double")
            / F.count("*")
        ).alias("en_share"),
        F.min("n_chars").alias("min_chars"),
        F.max("n_chars").alias("max_chars"),
    )


@_q(
    "curriculum_schedule",
    """
    WITH c AS (
      SELECT n_chars, COUNT(*) AS cnt FROM documents GROUP BY n_chars),
    cum AS (
      SELECT n_chars, SUM(cnt) OVER (ORDER BY n_chars) AS rc FROM c),
    tot AS (SELECT MAX(rc) AS n FROM cum),
    t AS (
      SELECT MIN(CASE WHEN 4 * rc >= n THEN n_chars END) AS t25,
             MIN(CASE WHEN 2 * rc >= n THEN n_chars END) AS t50,
             MIN(CASE WHEN 4 * rc >= 3 * n THEN n_chars END) AS t75
      FROM cum, tot),
    b AS (
      SELECT doc_id, n_chars,
             1 + CAST(n_chars > t25 AS INT) + CAST(n_chars > t50 AS INT)
               + CAST(n_chars > t75 AS INT) AS bucket
      FROM documents, t),
    r AS (
      SELECT doc_id, bucket,
             ROW_NUMBER() OVER (PARTITION BY bucket
                                ORDER BY n_chars, doc_id) AS rn
      FROM b)
    SELECT doc_id, bucket,
           CAST((rn - 1) * 4 + (bucket - 1) AS BIGINT) AS emit_pos
    FROM r
    """,
)
def curriculum_schedule(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Curriculum-learning emission order: docs bucketed into 4
    difficulty quartiles (length as the difficulty proxy; thresholds
    are exact data values from integer cume-count arithmetic), then
    interleaved round-robin across buckets so training sees a
    difficulty mix at every step: emit_pos = rank_within_bucket·4 +
    bucket. The within-bucket rank uses the two-phase distributed
    prefix sum (``exec_util.prefix_sum`` over a composite bucket-major
    key), NOT a 4-partition window — the per-bucket single-task
    collapse is exactly what kills curriculum assignment at corpus
    scale. Fully deterministic: thresholds are data values, ranks
    tie-break on doc_id.

    Exchange budget (r7 VERDICT item 3 — this was the most
    shuffle-heavy catalog row at 9 exchanges): the quartile
    thresholds, the per-bucket rank offsets, AND the prefix-sum bucket
    boundaries all fold into ONE aggregate over the distinct-lengths
    cume-count relation, collected as a single driver row (bounded:
    one output row however large the corpus). The cume-count relation
    already determines all three — rc(t_q) IS the count of docs at or
    below the q-th threshold, so the per-bucket emit offsets need no
    second pass over the corpus, and equal-frequency prefix-sum
    boundaries are the same smallest-value-crossing-a-count-fraction
    arithmetic at fractions i/n_parts. Everything downstream is
    literal-driven: the corpus pays exactly ONE doc-scale exchange
    (the prefix sum's bucket-keyed window partitioning; plan-pinned in
    tests/test_plans.py)."""
    from etl_projects_spark.operators.exec_util import prefix_sum

    docs = load(spark, sf_dir, "documents").select("doc_id", "n_chars")
    # Discrete quartiles via EXPLICIT integer cume-count arithmetic
    # (smallest value whose running count rc satisfies k*rc >= m*n) —
    # NOT percentile_disc: Spark's percentile_disc and DuckDB's
    # quantile_disc disagree on which element a quantile picks when
    # the boundary lands on a run of ties (observed at sf0.1: one
    # engine's t25 was one tie-run lower, shifting 60 docs' buckets).
    # The k*rc >= m*n form is Spark percentile_disc's own definition
    # (cume_dist >= p) in exact integers, so both engines now compute
    # it from the same arithmetic. The distinct-lengths relation is
    # bounded by max doc length, so its single-task running-sum
    # window is safe at any corpus size.
    cum = (
        docs.groupBy("n_chars")
        .agg(F.count("*").alias("_cnt"))
        .withColumn(
            "_rc",
            F.sum("_cnt").over(
                W.orderBy("n_chars").rowsBetween(W.unboundedPreceding, 0)
            ),
        )
    )

    def _crossing(num: int, den: int, col: str):
        # Smallest `col` value on the cume-count row where den*rc >= num*n.
        # _rc strictly increases with n_chars, so min() lands on the
        # crossing row for n_chars and rc alike.
        return F.min(
            F.when(
                F.lit(den) * F.col("_rc") >= F.lit(num) * F.col("_n"),
                F.col(col),
            )
        )

    n_parts = spark.sparkContext.defaultParallelism
    aggs = [
        _crossing(q, 4, "n_chars").alias(f"t{q}") for q in (1, 2, 3)
    ] + [
        _crossing(q, 4, "_rc").alias(f"c{q}") for q in (1, 2, 3)
    ] + [
        _crossing(i, n_parts, "n_chars").alias(f"b{i}")
        for i in range(1, n_parts)
    ]
    stats = (
        cum.crossJoin(F.broadcast(cum.agg(F.max("_rc").alias("_n"))))
        .agg(*aggs)
        .collect()[0]  # exactly one row, by construction
    )
    # Empty corpus: every aggregate is NULL — zero literals keep the
    # downstream expressions well-typed; the result is empty anyway.
    t25, t50, t75 = (stats[f"t{q}"] or 0 for q in (1, 2, 3))
    c25, c50, c75 = (stats[f"c{q}"] or 0 for q in (1, 2, 3))
    bucket = (
        F.lit(1)
        + (F.col("n_chars") > F.lit(t25)).cast("int")
        + (F.col("n_chars") > F.lit(t50)).cast("int")
        + (F.col("n_chars") > F.lit(t75)).cast("int")
    )
    b = docs.select("doc_id", "n_chars", bucket.alias("bucket"))
    # Composite bucket-major order key for the single-column prefix
    # sum. Field widths: bucket (1-4) in bits 60+, n_chars in bits
    # 30-59 (exact below 2^30 ≈ 1e9 chars/doc), doc_id in bits 0-29
    # (exact below 2^30 ≈ 1e9 docs) — 4*2^60 + 2^60 stays inside the
    # signed-long range. A field overflowing its width would corrupt
    # the bucket-major order silently, so the bounds are asserted at
    # the key's construction, not assumed.
    key = (
        F.col("bucket").cast("long") * F.lit(1 << 60)
        + F.col("n_chars").cast("long") * F.lit(1 << 30)
        + F.col("doc_id")
    )
    key = F.when(
        (F.col("n_chars") < F.lit(1 << 30)) & (F.col("doc_id") < F.lit(1 << 30)),
        key,
    ).otherwise(
        F.raise_error(
            F.lit("curriculum_schedule: n_chars or doc_id exceeds the "
                  "2^30 packing width; widen the composite key fields")
        )
    )
    keyed = b.withColumn("_k", key).withColumn("_one", F.lit(1))

    def _key_at(v: int) -> int:
        bv = 1 + (v > t25) + (v > t50) + (v > t75)
        return (bv << 60) + (v << 30)

    # Equal-frequency boundaries in composite-key space: passing them
    # skips prefix_sum's approxQuantile — that call was a second full
    # pass over the corpus per run.
    bounds = [
        _key_at(stats[f"b{i}"])
        for i in range(1, n_parts)
        if stats[f"b{i}"] is not None
    ]
    ranked = prefix_sum(keyed, "_k", "_one", out_col="_grank", bounds=bounds)
    # rc(t_q) is exactly the number of docs in buckets 1..q, so the
    # per-bucket exclusive offsets are the collected literals — no
    # second corpus aggregation, no offsets join.
    boff = (
        F.when(F.col("bucket") == 1, F.lit(0))
        .when(F.col("bucket") == 2, F.lit(c25))
        .when(F.col("bucket") == 3, F.lit(c50))
        .otherwise(F.lit(c75))
    )
    return ranked.select(
        "doc_id",
        "bucket",
        ((F.col("_grank") - boff) * 4 + (F.col("bucket") - 1))
        .cast("long")
        .alias("emit_pos"),
    )


@_q(
    "k_anonymity_audit",
    """
    SELECT lang, source, COUNT(*) AS group_size,
           COUNT(*) < 10 AS below_k
    FROM documents GROUP BY 1, 2
    """,
)
def k_anonymity_audit(spark: SparkSession, sf_dir: str) -> DataFrame:
    """k-anonymity audit over the (lang, source) quasi-identifier
    tuple: group sizes plus a below-k flag (k = 10) — the
    re-identification-risk report a privacy review runs before a
    corpus release (small quasi-identifier groups single out
    individuals; those slices get suppressed or generalized). One
    aggregation; the report is |quasi-identifier combinations| rows,
    so at 100 TB it is still tiny."""
    docs = load(spark, sf_dir, "documents")
    return docs.groupBy("lang", "source").agg(
        F.count("*").alias("group_size"),
        (F.count("*") < 10).alias("below_k"),
    )


CONTAM_NGRAM = 8


def _contam_split_relation(spark: SparkSession, sf_dir: str) -> DataFrame:
    """(doc_id, source, split, toks, n) over documents long enough to
    carry at least one CONTAM_NGRAM-gram, with the deterministic
    96/2/2 train/valid/test split — the shared input of the
    decontamination family."""
    docs = load(spark, sf_dir, "documents")
    u = mix_unit("doc_id")
    split = (
        F.when(u < 0.96, F.lit("train"))
        .when(u < 0.98, F.lit("valid"))
        .otherwise(F.lit("test"))
    )
    return docs.select(
        "doc_id",
        "source",
        split.alias("split"),
        F.split("text", " ").alias("toks"),
        F.size(F.split("text", " ")).alias("n"),
    ).filter(F.col("n") >= CONTAM_NGRAM)


def _contam_grams(rel: DataFrame) -> DataFrame:
    """(doc_id, gram): each document's DISTINCT md5'd word
    CONTAM_NGRAM-grams — scan-side array math, exploded once.

    explode_outer + null-filter (r15 optimization, the word_shingles
    fix): plain explode let InferFiltersFromGenerate clone the whole
    md5 gram transform into a size(...)>0 filter at the scan — every
    decontamination probe paid the gram chain twice more. md5 over
    non-null slices is never null, so the null-filter removes exactly
    the empty-array rows plain explode dropped (none: callers filter
    n >= CONTAM_NGRAM first)."""
    return (
        rel.select(
            "doc_id",
            F.explode_outer(
                F.array_distinct(
                    F.expr(
                        f"transform(sequence(1, n - {CONTAM_NGRAM} + 1),"
                        f" i -> md5(concat_ws(' ', slice(toks, i,"
                        f" {CONTAM_NGRAM}))))"
                    )
                )
            ).alias("gram"),
        )
        .filter(F.col("gram").isNotNull())
    )


# Kind carries the layout (g{N} = gbucket-partitioned, N buckets),
# DERIVED from the one bucket constant (r8 ADVICE): a literal here let
# someone raise dedup.GRAM_INDEX_BUCKETS while build_once kept serving
# the stale 64-bucket artifact — probes would hash grams mod the new
# count and the static gbucket PartitionFilter would silently drop
# true contamination hits. Deriving the key means a bucket bump
# retires the old artifact by construction. Exported so bench.py can
# locate the artifact to attribute its cold-build cost without
# duplicating the string.
CONTAM_INDEX_KIND = f"contam_train_grams_g{dedup.GRAM_INDEX_BUCKETS}"


def train_gram_index(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The persisted distinct train-gram index: built AT MOST ONCE per
    corpus vintage (``build_once``, like the LSH band index) and read
    as parquet by every decontamination consumer — in a real pipeline
    the train index is built at corpus admission and probed by every
    evaluation set, so steady-state cost is eval-sized.

    Layout (r7 VERDICT item 4): partitioned on
    ``gbucket = pmod(xxhash64(gram), dedup.GRAM_INDEX_BUCKETS)`` — the
    100 TB layout SCALE.md names for the decontamination family. A
    probe computes its own grams' buckets with the SAME function
    (``dedup.gram_bucket``) and statically prunes the scan to those
    directories (plan-pinned in tests/test_plans.py), so a small eval
    suite reads only the index slices it can possibly hit instead of
    the full gram table."""
    from etl_projects_spark.operators.exec_util import build_once, scratch_path

    scratch = scratch_path(
        CONTAM_INDEX_KIND, os.path.join(sf_dir, "documents.parquet")
    )

    def _build(tmp: str) -> None:
        t = _contam_split_relation(spark, sf_dir)
        (
            _contam_grams(t.filter(F.col("split") == "train"))
            .select("gram")
            .distinct()
            .withColumn("gbucket", dedup.gram_bucket("gram"))
            # One shuffle task per bucket → ONE file per directory
            # (the lsh band index's pattern): without it every
            # distinct task writes a sliver into every bucket dir —
            # tasks×buckets tiny files, measured +0.5 s per probe at
            # sf0.1 from listing/open overhead alone.
            .repartition(dedup.GRAM_INDEX_BUCKETS, "gbucket")
            .write.mode("overwrite")
            .partitionBy("gbucket")
            .parquet(os.path.join(tmp, "grams"))
        )

    # No marker arg: partitioned writes emit no top-level _SUCCESS
    # under dynamic partition overwrite — build_once's own sentinel is
    # the completion signal.
    build_once(scratch, _build)
    return spark.read.parquet(os.path.join(scratch, "grams"))


# bench.py warms this artifact untimed when a consumer is in the chunk
# (the one-time 96%-train gram explode+distinct+write is the documented
# corpus-admission cost, not the probe's); the list lives next to the
# artifact builder and is tripwire-tested against the actual transitive
# call sites in tests/test_window_guard.py, same as
# STORED_SET_CONSUMERS / PAIR_GRAPH_CONSUMERS (r7 ADVICE).
CONTAM_INDEX_CONSUMERS = frozenset(
    {"decontaminate_eval_join", "split_contamination_report"}
)


@_q(
    "split_contamination_report",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n,
             CASE WHEN {mix_unit_sql("doc_id")} < 0.96 THEN 'train'
                  WHEN {mix_unit_sql("doc_id")} < 0.98 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id, source, split,
             md5(array_to_string(
               list_slice(toks, CAST(i AS BIGINT),
                          CAST(i + {CONTAM_NGRAM} - 1 AS BIGINT)),
               ' ')) AS gram
      FROM t, UNNEST(generate_series(1, n - {CONTAM_NGRAM} + 1)) s(i)
      WHERE n >= {CONTAM_NGRAM}),
    tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
    te AS (SELECT doc_id, source, gram FROM g WHERE split = 'test'),
    hit AS (
      SELECT DISTINCT te.doc_id
      FROM te JOIN tr USING (gram)),
    docs AS (
      SELECT source, doc_id FROM t
      WHERE split = 'test' AND n >= {CONTAM_NGRAM})
    SELECT d.source,
           COUNT(*) AS n_test_docs,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS BIGINT) AS n_contaminated,
           CAST(SUM(CASE WHEN h.doc_id IS NOT NULL THEN 1 ELSE 0 END)
                AS DOUBLE) / COUNT(*) AS contamination_rate
    FROM docs d LEFT JOIN hit h ON d.doc_id = h.doc_id
    GROUP BY 1
    """,
)
def split_contamination_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Train→test leakage audit on the deterministic 96/2/2 split: a
    test document is CONTAMINATED if any of its {CONTAM_NGRAM}-grams
    also occurs in any train document — the decontamination check run
    before every evaluation (complements ``contamination_probe``,
    which checks fixed external benchmark strings; this one sweeps the
    corpus's own held-out split). Reports per-source test-doc counts
    and contamination rate.

    Scale: grams are md5'd scan-side; the train gram set is reached by
    a SEMI join from the (far smaller, 2%) test gram relation — the
    probe is test-sized, the train side is the big-but-linear build.
    Nothing pairwise; the same shape as the dedup band joins. The
    distinct train gram set is a PERSISTED per-vintage artifact
    (``build_once``, like the LSH band index): in a real
    decontamination pipeline the train index is built once at corpus
    admission and probed by every evaluation set, so steady-state
    cost is test-sized — the 96% train explode is not re-paid per
    sweep. The split relation, gram extraction, and the index build
    are the module-shared helpers also probed by
    ``decontaminate_eval_join`` — ONE builder, so the two consumers
    can never write diverging content to the same artifact path."""
    t = _contam_split_relation(spark, sf_dir)
    tr = train_gram_index(spark, sf_dir)
    te = _contam_grams(t.filter(F.col("split") == "test"))
    hit = (
        te.join(tr, "gram", "semi")
        .select("doc_id")
        .distinct()
        .withColumn("contam", F.lit(1))
    )
    test_docs = t.filter(F.col("split") == "test").select("source", "doc_id")
    contam = F.sum(F.coalesce("contam", F.lit(0)))
    return (
        test_docs.join(hit, "doc_id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_test_docs"),
            contam.cast("bigint").alias("n_contaminated"),
            (contam.cast("double") / F.count("*")).alias(
                "contamination_rate"
            ),
        )
    )


@_q(
    "decontaminate_eval_join",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n,
             CASE WHEN {mix_unit_sql("doc_id")} < 0.96 THEN 'train'
                  WHEN {mix_unit_sql("doc_id")} < 0.98 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id, split,
             md5(array_to_string(
               list_slice(toks, CAST(i AS BIGINT),
                          CAST(i + {CONTAM_NGRAM} - 1 AS BIGINT)),
               ' ')) AS gram
      FROM t, UNNEST(generate_series(1, n - {CONTAM_NGRAM} + 1)) s(i)
      WHERE n >= {CONTAM_NGRAM}),
    tr AS (SELECT DISTINCT gram FROM g WHERE split = 'train'),
    ev AS (SELECT doc_id, gram FROM g WHERE doc_id % 101 = 0),
    evd AS (SELECT doc_id, source FROM t
            WHERE n >= {CONTAM_NGRAM} AND doc_id % 101 = 0),
    ng AS (SELECT doc_id, COUNT(*) AS n_grams FROM ev GROUP BY doc_id),
    hit AS (SELECT ev.doc_id, COUNT(*) AS n_hit
            FROM ev JOIN tr USING (gram) GROUP BY ev.doc_id)
    SELECT evd.doc_id, evd.source,
           CAST(ng.n_grams AS BIGINT) AS n_grams,
           CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
           COALESCE(hit.n_hit, 0) > 0 AS contaminated
    FROM evd JOIN ng USING (doc_id) LEFT JOIN hit USING (doc_id)
    """,
)
def decontaminate_eval_join(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Cross-corpus decontamination JOIN: an arriving evaluation suite
    (stand-in: every 101st document, ~1% of the corpus — benchmarks
    are MBs while the train corpus is the 100 TB side) is probed
    against the PERSISTED train-gram index, returning one verdict row
    per eval document: its distinct-gram count, how many of those
    grams appear in the index, and the contaminated flag. The
    two-table analog of ``contamination_probe`` (which checks three
    fixed strings) with ``dedup_incremental_batch``'s physical shape,
    gram-keyed: broadcast the small arriving side, never reshuffle the
    stored side.

    Scale: the index (``train_gram_index``, the same build_once
    artifact ``split_contamination_report`` probes) is scanned in
    place — the eval gram relation broadcasts into an INNER hash join,
    so no index-sized exchange exists anywhere in the plan
    (plan-pinned); only eval-sized matched rows reach the aggregation,
    and the eval relation is materialized once since it feeds both the
    per-doc totals and the probe."""
    from etl_projects_spark.operators import dedup

    t = _contam_split_relation(spark, sf_dir)
    tr = train_gram_index(spark, sf_dir)
    ev_docs = t.filter(F.col("doc_id") % 101 == 0)
    # Two consumers (total-gram counts + the broadcast probe): left
    # lazy, each branch re-runs the gram explode and the broadcast
    # exchange races the cache. Eval-sized, so the barrier is cheap.
    n_ev: list[int] = []
    ev = dedup.materialize_scoped(
        _contam_grams(ev_docs),
        scope="decontaminate_eval_join.ev",
        action=lambda d: n_ev.append(d.count()),
    )
    # stable_input (r16): ``ev`` is persisted + eagerly counted by the
    # barrier above, so the probe's internal pre-count + toArrow +
    # createDataFrame round trip (two extra driver jobs over an
    # already-pinned relation) is skipped; the count the barrier needs
    # anyway doubles as the driver-size bound check.
    hits = dedup.decontaminate_against_index(
        ev, tr, stable_input=True, n_rows=n_ev[0]
    )
    ng = ev.groupBy("doc_id").agg(F.count("*").alias("n_grams"))
    return (
        ev_docs.select("doc_id", "source")
        .join(ng, "doc_id")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            "n_grams",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) > 0).alias("contaminated"),
        )
    )


@_q(
    "decontaminate_train_prune",
    f"""
    WITH t AS (
      SELECT doc_id, source, string_split(text, ' ') AS toks,
             len(string_split(text, ' ')) AS n,
             CASE WHEN {mix_unit_sql("doc_id")} < 0.96 THEN 'train'
                  WHEN {mix_unit_sql("doc_id")} < 0.98 THEN 'valid'
                  ELSE 'test' END AS split
      FROM documents),
    g AS (
      SELECT DISTINCT doc_id, split,
             md5(array_to_string(
               list_slice(toks, CAST(i AS BIGINT),
                          CAST(i + {CONTAM_NGRAM} - 1 AS BIGINT)),
               ' ')) AS gram
      FROM t, UNNEST(generate_series(1, n - {CONTAM_NGRAM} + 1)) s(i)
      WHERE n >= {CONTAM_NGRAM}),
    ev AS (SELECT DISTINCT gram FROM g WHERE doc_id % 101 = 0),
    trd AS (SELECT doc_id, source FROM t
            WHERE split = 'train' AND n >= {CONTAM_NGRAM}
              AND doc_id % 101 <> 0),
    hit AS (
      SELECT g.doc_id, COUNT(*) AS n_hit
      FROM g JOIN ev USING (gram)
      WHERE g.split = 'train' AND g.doc_id % 101 <> 0
      GROUP BY g.doc_id)
    SELECT trd.doc_id, trd.source,
           CAST(COALESCE(hit.n_hit, 0) AS BIGINT) AS n_hit,
           COALESCE(hit.n_hit, 0) = 0 AS keep
    FROM trd LEFT JOIN hit USING (doc_id)
    """,
)
def decontaminate_train_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The decontamination pipeline's actual DELIVERABLE: the
    train-corpus keep-list. Every train document sharing any
    {CONTAM_NGRAM}-gram with the arriving evaluation suite (the same
    every-101st-doc stand-in as ``decontaminate_eval_join``; eval
    members are excluded from the train side — a benchmark trivially
    'contaminates' itself) is flagged for removal before training:
    one (doc_id, source, n_hit, keep) verdict per train doc.

    Scale shape — the mirror image of the eval-side probe: here the
    TRAIN side is the 100 TB relation, so it is scanned LINEARLY
    exactly once (gram explode is scan-side array math) while the
    eval gram set — MBs by definition — broadcasts into the inner
    probe join; only hit-sized rows reach the per-doc aggregation and
    the keep verdict rejoins on the train doc key. Nothing pairwise,
    no index required (the persisted train-gram index has no doc_id —
    pruning needs per-doc attribution), and the broadcast side is the
    small one by construction at any corpus size."""
    t = _contam_split_relation(spark, sf_dir)
    is_eval = F.col("doc_id") % 101 == 0
    ev_grams = (
        _contam_grams(t.filter(is_eval)).select("gram").distinct()
    )
    train = t.filter((F.col("split") == "train") & ~is_eval)
    hits = (
        _contam_grams(train)
        .join(F.broadcast(ev_grams), "gram")
        .groupBy("doc_id")
        .agg(F.count("*").alias("n_hit"))
    )
    return (
        train.select("doc_id", "source")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            F.coalesce("n_hit", F.lit(0)).cast("long").alias("n_hit"),
            (F.coalesce("n_hit", F.lit(0)) == 0).alias("keep"),
        )
    )
