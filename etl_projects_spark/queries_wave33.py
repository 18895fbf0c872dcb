"""Wave-33 catalog entries (round 15): the COMPOSED curation funnel,
IVF-PQ ANN serving, and DoReMi domain reweighting.

1. ``curation_pipeline_run`` — every individually-oracled stage of
   the LLM-data pipeline chained end-to-end through ``LakeEngine`` /
   ``PipelineRunner`` as ONE driver-checked query (r14 VERDICT item
   2: the stages exist and are individually green; what was unproven
   is their composition — schema and contract handoffs between
   stages, catalog round-trips, scoped pin lifetimes in one session).
2. ``ann_ivf_pq_topk`` — product quantization on top of the IVF
   partitioning (r14 VERDICT item 3); operator kernels live in
   ``operators/similarity.py``.
3. ``doremi_domain_reweight`` — multiplicative-weights domain
   reweighting over per-source excess LM-surprise (r14 VERDICT item
   4); shares the bigram model with ``lm_surprise_filter``.

The funnel design (its stage semantics and contracts):

Funnel (each stage lands a REGISTERED lake table; the next stage reads
the previous stage's table back through the Spark catalog, exactly how
``pipeline_dag_build`` chains the medallion layers):

  raw documents
    → stage1 quality filter        (lang / token floor / lexical div.)
    → stage2 dedup keep-list       (MinHash-LSH components verdicts)
    → stage3 decontamination       (eval-suite n-gram exclusion)
    → stage4 DSIR selection        (Gumbel-top-k to a ¼-token budget)
    → stage5 concat-and-cut pack   (PACK_BUDGET-token sequences)
    → stage6 DW shard promotion    (quality-gated promote_to_dw)

The catalog query returns the per-stage FLOW REPORT — (stage, n_rows,
n_tokens, token_keep_rate) — recomputed from the REGISTERED stage
tables, so a stage that wrote wrong/partial/stale rows fails the
DuckDB oracle (which re-derives every stage from the raw corpus in
one staged CTE chain, reusing the exact CTE builders each standalone
stage query verifies against: ``dedup.components_sql``,
``dsir_weights_cte``, ``dsir_select_ctes``, the contamination gram
shape, and the pack-span arithmetic).

Stage-semantics notes (the contracts the composition pins down):

- Dedup consumes the CORPUS-LEVEL keep-list (``_components_cached`` —
  the same once-per-vintage artifact ``dedup_keep_list`` reads): each
  cluster keeps its smallest doc_id. A survivor whose cluster
  representative was dropped by the QUALITY stage is still removed —
  the keep-list is computed at corpus admission and its verdicts are
  immutable downstream, the stored-artifact lifecycle of a production
  dedup pipeline (recomputing keep-lists per funnel permutation would
  make the corpus build order-dependent).
- Decontamination treats the eval suite (the family-standard
  ``doc_id % 101 = 0`` stand-in) as EXTERNAL: its grams come from the
  raw corpus, not the filtered pool — an eval benchmark doesn't
  shrink because the train-side funnel dropped documents.
- DSIR's target slice is the RAW trusted corpus (the
  ``DSIR_TARGET_SOURCE`` slice); its POOL is the funnel's stage-3
  survivors from every other source (the model's raw-side counts
  describe the distribution actually being selected from). Target
  documents leave the funnel at this stage — they are the reference
  distribution, not training pool.
- Packing concatenates the selected docs in doc_id order and cuts
  every PACK_BUDGET tokens (``pack_token_spans`` semantics); the
  packed spans are PROMOTED to the DW layer behind a
  ``min_count_monitor`` quality gate — an empty selection aborts the
  build loudly instead of landing an empty training corpus.

Scale shape: every stage is the same plan its standalone query pins
(linear scans, broadcast-small-side probes, the two-phase distributed
prefix sum — nothing quadratic, no global single-task window); the
lake build runs ONCE per corpus vintage (``build_once`` keyed on the
documents snapshot, like ``pipeline_dag_build``'s lake), warm
invocations re-run only the external-table DDL and the stage-table
aggregates; stage tables store (doc_id, source, n_tokens) verdicts —
ids and metadata, never the text payload (at 100 TB the payload stays
in the source table; stages re-join it by id when they need it, which
is the columnar-lake pattern, not a copy-per-stage).
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F
from pyspark.sql.window import Window

from etl_projects_spark import config
from etl_projects_spark.operators import dedup, similarity, text
from etl_projects_spark.queries import _q, load
from etl_projects_spark.queries_curation import CONTAM_NGRAM, _contam_grams
from etl_projects_spark.queries_mixing import PACK_BUDGET
from etl_projects_spark.queries_wave31 import (
    DSIR_TARGET_SOURCE,
    dsir_weights_cte,
    dsir_weights_relation,
)
from etl_projects_spark.queries_wave32 import (
    dsir_select_ctes,
    dsir_select_from_weights,
)

# Quality-stage knobs. The unique-token ratio is an EXACT-INTEGER
# comparison (5·distinct ≥ 2·total, i.e. ratio ≥ 0.4) — the funnel's
# keep/drop verdicts must be bit-identical across engines, and a float
# threshold on a ratio of two integers is the classic place they
# drift. 20-token floor + 0.4 ratio keeps ~24% of the synthetic corpus
# (vs filter_funnel_report's deliberately-strict 9% band filter) so
# every later stage sees a meaningful population at every test SF.
QUALITY_MIN_TOKENS = 20


def _quality_keep() -> F.Column:
    n = text.token_count("text")
    uniq = text.unique_token_count("text")
    return (
        (F.col("lang") == "en")
        & (n >= QUALITY_MIN_TOKENS)
        & (uniq * 5 >= n * 2)
    )


_QUALITY_KEEP_SQL = (
    "lang = 'en' "
    f"AND len(string_split(text, ' ')) >= {QUALITY_MIN_TOKENS} "
    "AND 5 * len(list_distinct(string_split(text, ' '))) "
    ">= 2 * len(string_split(text, ' '))"
)

# One md5'd word-n-gram, the decontamination family's exact shape
# (queries_curation CONTAM_NGRAM convention).
_GRAM_SQL = (
    "md5(array_to_string(list_slice(string_split(text, ' '), "
    f"CAST(i AS BIGINT), CAST(i + {CONTAM_NGRAM} - 1 AS BIGINT)), ' '))"
)


def _funnel_oracle() -> str:
    """The whole funnel as one DuckDB CTE chain — every stage reuses
    the CTE builder its standalone query verifies against, so the
    composed oracle and the per-stage oracles cannot drift apart."""
    pool_rel = (
        "(SELECT doc_id, source, text FROM q3 "
        f"WHERE source <> '{DSIR_TARGET_SOURCE}')"
    )
    return f"""
    WITH raw AS (
      SELECT doc_id, source, lang, text,
             len(string_split(text, ' ')) AS n_tokens
      FROM documents),
    q1 AS (
      SELECT doc_id, source, text, n_tokens FROM raw
      WHERE {_QUALITY_KEEP_SQL}),
    comp AS ({dedup.components_sql()}),
    q2 AS (
      SELECT q1.* FROM q1 LEFT JOIN comp c ON c.node = q1.doc_id
      WHERE c.comp IS NULL OR c.comp = q1.doc_id),
    eg AS (
      SELECT DISTINCT {_GRAM_SQL} AS gram
      FROM raw, UNNEST(generate_series(1, n_tokens - {CONTAM_NGRAM} + 1)) s(i)
      WHERE doc_id % 101 = 0 AND n_tokens >= {CONTAM_NGRAM}),
    q2g AS (
      SELECT DISTINCT doc_id, {_GRAM_SQL} AS gram
      FROM q2, UNNEST(generate_series(1, n_tokens - {CONTAM_NGRAM} + 1)) s(i)
      WHERE n_tokens >= {CONTAM_NGRAM}),
    hit AS (SELECT DISTINCT q2g.doc_id FROM q2g JOIN eg USING (gram)),
    q3 AS (
      SELECT q2.* FROM q2
      WHERE doc_id % 101 <> 0
        AND doc_id NOT IN (SELECT doc_id FROM hit)),
    {dsir_weights_cte(pool_rel=pool_rel)},
    {dsir_select_ctes()},
    pos AS (
      SELECT doc_id, n_tokens,
             COALESCE(SUM(n_tokens) OVER (ORDER BY doc_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING), 0)
               AS start
      FROM selected),
    spans AS (
      SELECT doc_id, CAST(shard_id AS BIGINT) AS shard_id,
             CAST(GREATEST(start, shard_id * {PACK_BUDGET}) AS BIGINT)
               AS tok_start,
             CAST(LEAST(start + n_tokens, (shard_id + 1) * {PACK_BUDGET})
                  AS BIGINT) AS tok_end
      FROM pos, UNNEST(generate_series(
             CAST(FLOOR(start / {PACK_BUDGET}) AS BIGINT),
             CAST(FLOOR((start + n_tokens - 1) / {PACK_BUDGET}) AS BIGINT)))
           AS t(shard_id)
      WHERE n_tokens > 0),
    t0 AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS tok0 FROM raw),
    rep AS (
      SELECT 'stage0_raw' AS stage, COUNT(*) AS n_rows,
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) AS n_tokens
      FROM raw
      UNION ALL SELECT 'stage1_quality', COUNT(*),
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM q1
      UNION ALL SELECT 'stage2_dedup', COUNT(*),
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM q2
      UNION ALL SELECT 'stage3_decontam', COUNT(*),
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM q3
      UNION ALL SELECT 'stage4_dsir_select', COUNT(*),
             CAST(COALESCE(SUM(n_tokens), 0) AS BIGINT) FROM selected
      UNION ALL SELECT 'stage5_pack', COUNT(*),
             CAST(COALESCE(SUM(tok_end - tok_start), 0) AS BIGINT)
             FROM spans
      UNION ALL SELECT 'stage6_shards', COUNT(DISTINCT shard_id),
             CAST(COALESCE(SUM(tok_end - tok_start), 0) AS BIGINT)
             FROM spans)
    SELECT stage, CAST(n_rows AS BIGINT) AS n_rows, n_tokens,
           round(CAST(n_tokens AS DOUBLE) / CAST(tok0 AS DOUBLE), 6)
             AS token_keep_rate
    FROM rep, t0
    """


def ivf_pq_index_dir(spark: SparkSession, sf_dir: str) -> str:
    """Materialized IVF-PQ index scratch path for ``sf_dir``'s
    embeddings — built AT MOST ONCE per corpus vintage (``build_once``
    keyed on the parquet's mtime+size, the ``ivf_index_dir``
    lifecycle), amortizing the codebook train + encode across every
    query exactly as a persisted index would on a cluster."""
    from etl_projects_spark.operators.exec_util import build_once, scratch_path

    idx_dir = scratch_path("ivf_pq", os.path.join(sf_dir, "embeddings.parquet"))
    emb = load(spark, sf_dir, "embeddings")
    build_once(
        idx_dir,
        lambda tmp: similarity.ivf_pq_write_index(emb, tmp),
        marker="_ivf_pq_codebooks.json",
    )
    return idx_dir


def _ivf_pq_oracle() -> str | None:
    """Oracle for ann_ivf_pq_topk. The ADC shortlist — probed IVF
    cells, PQ codes, literal-LUT fold, top-``PQ_SHORTLIST`` cut — is
    reproducible from the codebook constants + data alone
    (:func:`similarity.ivf_pq_shortlist`, the numpy twin running the
    SAME kernels as the index build and serve path, no Spark), so the
    oracle inlines the twin's (vec_id, adc_score) pairs as a VALUES
    relation and verifies the exact re-rank in pure SQL: exact-cosine
    top-k restricted to the shortlist ids, carrying the ADC score
    through. The inlined adc doubles go through a VARCHAR→DOUBLE cast
    (repr round-trips exactly; a bare decimal literal would land as
    DECIMAL and re-round). Registered as a CALLABLE (resolved at gate
    time against the oracle corpus then in effect); None if that
    corpus is absent or empty (rows-only check in bench-only envs)."""
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    if pq.ParquetFile(path).metadata.num_rows == 0:
        return None
    short = similarity.ivf_pq_shortlist(path, query_id=7)
    if not short:
        return None
    vals = ", ".join(
        f"({i}, CAST('{float(a)!r}' AS DOUBLE))" for i, a in short
    )
    return f"""
    WITH short(vec_id, adc_score) AS (VALUES {vals}),
    q AS (SELECT embedding AS qvec FROM embeddings WHERE vec_id = 7)
    SELECT e.vec_id, s.adc_score,
           round({similarity.cosine_sql('e.embedding', 'qvec')}, 6) AS score
    FROM embeddings e JOIN short s ON e.vec_id = s.vec_id, q
    ORDER BY score DESC, e.vec_id LIMIT 10
    """


@_q("ann_ivf_pq_topk", _ivf_pq_oracle)
def ann_ivf_pq_topk(spark: SparkSession, sf_dir: str) -> DataFrame:
    """IVF-PQ ANN top-k through the materialized index — the vector
    family's 100 TB serve path (r14 VERDICT item 3): IVF cell probing
    bounds the SCAN, the 8-byte product-quantization code bounds the
    BYTES per scanned row, and only the ``PQ_SHORTLIST`` survivors
    ever touch a full vector.

    Spark shape (``similarity.ivf_pq_topk_indexed``): the probed-cell
    scan reads ONLY (vec_id, codes) — column pruning over the
    cluster-partitioned index does PQ's memory job; the asymmetric
    distance is a codegen'd ``aggregate`` fold over a (M·K)-double
    LUT literal (JVM expression, zero Python); the top-shortlist cut
    is TakeOrderedAndProject; the exact re-rank reads full vectors
    for the shortlist ids only (pushed-down IN + the same partition
    pruning) and Arrow pair-cosines them. No shuffle end to end; the
    one driver hop is the shortlist-bounded id list. Output: final
    top-10 with both the ADC estimate and the exact score — the
    readout that shows what the quantization cost at the top.
    Codebooks: deterministic, trained on the bounded 2048-row
    id-ordered sample (one pull serves IVF and PQ). Recall vs the
    exact top-k is pinned in tests/test_ivf.py; plan pinned in
    tests/test_plans.py."""
    idx_dir = ivf_pq_index_dir(spark, sf_dir)
    emb = load(spark, sf_dir, "embeddings")
    qvec = (
        emb.filter(F.col("vec_id") == 7).select("embedding").toPandas()
    )["embedding"].iloc[0]
    return similarity.ivf_pq_topk_indexed(
        spark, idx_dir, qvec, k=10, exclude_id=7
    )


def _ivf_pq_recall_oracle() -> str | None:
    """Oracle for ann_ivf_pq_recall_report — the ``_ivf_recall_oracle``
    derivation class: the PQ candidate stage (probed cells → pair ADC
    → per-probe top-``PQ_SHORTLIST`` cut) is reproducible from the
    codebook constants + data (:func:`similarity.ivf_pq_probe_pairs`,
    same kernels as the engine's Arrow stage, no Spark), so the
    candidate relation inlines as VALUES and the exact side is
    brute-force top-k in SQL. None (rows-only) without a corpus."""
    from etl_projects_spark.queries_wave30 import ANN_RECALL_K

    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    if pq.ParquetFile(path).metadata.num_rows == 0:
        return None
    pairs = similarity.ivf_pq_probe_pairs(path)
    if not pairs:
        return None
    cand_vals = ", ".join(f"({q}, {n})" for q, n in pairs)
    return f"""
    WITH cand(qid, nbr) AS (VALUES {cand_vals}),
    q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
          WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, c.vec_id AS nbr,
             round({similarity.cosine_sql('c.embedding', 'q.qv')}, 6) AS score
      FROM embeddings c, q WHERE c.vec_id != q.qid),
    ranked AS (
      SELECT qid, nbr,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nbr) AS rnk
      FROM scored),
    exact AS (SELECT qid, nbr FROM ranked WHERE rnk <= {ANN_RECALL_K}),
    tagged AS (
      SELECT qid, nbr, 1 AS is_true, 0 AS in_pq FROM exact
      UNION ALL
      SELECT qid, nbr, 0, 1 FROM cand),
    per_pair AS (
      SELECT qid, nbr, max(is_true) AS is_true, max(in_pq) AS in_pq
      FROM tagged GROUP BY 1, 2)
    SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_probes,
           CAST(coalesce(sum(is_true), 0) AS BIGINT) AS n_true_pairs,
           CAST(coalesce(sum(in_pq), 0) AS BIGINT) AS n_cand_pq,
           CAST(coalesce(sum(is_true * in_pq), 0) AS BIGINT) AS n_hit_pq,
           CASE WHEN coalesce(sum(is_true), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_pq), 0) AS DOUBLE)
                     / CAST(sum(is_true) AS DOUBLE)
                ELSE 1.0 END AS recall_pq,
           CASE WHEN coalesce(sum(in_pq), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_pq), 0) AS DOUBLE)
                     / CAST(sum(in_pq) AS DOUBLE)
                ELSE 0.0 END AS efficiency_pq
    FROM per_pair
    """


@_q("ann_ivf_pq_recall_report", _ivf_pq_recall_oracle)
def ann_ivf_pq_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the IVF-PQ candidate stage — what the
    quantization costs BEFORE the exact re-rank can repair it (the
    re-rank only reorders candidates; a true neighbor the ADC
    shortlist dropped is gone). Completes the nprobe-audit family:
    ``ann_recall_report`` audits hyperplane-LSH probing,
    ``ann_ivf_recall_report`` audits the raw IVF cell probe, THIS
    audits the cell probe + the per-probe top-PQ_SHORTLIST ADC cut.
    recall_pq below recall_ivf at the same knobs = the quantization's
    own loss; efficiency_pq above efficiency_ivf = what the code cut
    buys in verify work.

    Spark shape: exact side is the bounded ``knn_join``; the per-probe
    cell selection is the driver-side codebook argsort over the index
    sidecar (bounded by the eval-set contract); the candidate relation
    scans ONLY the probed cluster partitions of the materialized PQ
    index reading (vec_id, codes, cluster) — never the vector column —
    broadcast-joins the (qid, cluster) probe map, and scores each
    (candidate, probe) pair in ONE Arrow stage via reconstructed
    codes (`similarity.pq_adc_pairs`; the probe matrix rides the same
    shared broadcast knn_join uses). The per-probe shortlist cut is a
    window over the PAIR relation (probes × cell population — eval-
    sized, never corpus-sized). Aggregation mirrors the IVF audit
    row-for-row."""
    import json

    import numpy as np

    from etl_projects_spark.queries_wave30 import ANN_RECALL_K

    emb = load(spark, sf_dir, "embeddings")
    probes_df = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.knn_join(emb, probes_df, k=ANN_RECALL_K).select(
        "qid", "nbr"
    )
    idx_dir = ivf_pq_index_dir(spark, sf_dir)
    with open(os.path.join(idx_dir, "_ivf_pq_codebooks.json")) as f:
        side = json.load(f)
    cents = np.array(side["centroids"], dtype=np.float64)
    books = np.array(side["pq_codebooks"], dtype=np.float64)
    probe_bc = similarity._probe_matrix_broadcast(
        emb, probes_df, "embedding", "vec_id"
    )
    if probe_bc is None:
        return exact.select(
            F.lit(0).cast("long").alias("n_probes"),
            F.lit(0).cast("long").alias("n_true_pairs"),
            F.lit(0).cast("long").alias("n_cand_pq"),
            F.lit(0).cast("long").alias("n_hit_pq"),
            F.lit(1.0).alias("recall_pq"),
            F.lit(0.0).alias("efficiency_pq"),
        ).limit(1)
    qids, qnt = probe_bc.value
    pairs = []
    for qid, qn in zip(qids, qnt.T):
        for c in np.argsort(-(cents @ qn))[: similarity.IVF_PROBE]:
            pairs.append((int(qid), int(c)))
    probe_map = spark.createDataFrame(pairs, "qid long, cluster int")
    probed_set = sorted({c for _, c in pairs})
    idx = spark.read.parquet(idx_dir).filter(
        F.col("cluster").isin(probed_set)
    )
    joined = (
        idx.select("vec_id", "cluster", "codes")
        .join(F.broadcast(probe_map), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
    )
    adc = similarity.pq_adc_pairs(joined, books, probe_bc)
    w = Window.partitionBy("qid").orderBy(F.desc("adc"), F.col("nbr"))
    cand = (
        adc.withColumn("rnk", F.row_number().over(w))
        .filter(F.col("rnk") <= similarity.PQ_SHORTLIST)
        .select("qid", "nbr")
    )
    tagged = exact.select(
        "qid", "nbr", F.lit(1).alias("is_true"), F.lit(0).alias("in_pq")
    ).unionByName(
        cand.select(
            "qid", "nbr", F.lit(0).alias("is_true"),
            F.lit(1).alias("in_pq"),
        )
    )
    per_pair = tagged.groupBy("qid", "nbr").agg(
        F.max("is_true").alias("is_true"), F.max("in_pq").alias("in_pq")
    )
    n_true = F.coalesce(F.sum("is_true"), F.lit(0))
    n_pq = F.coalesce(F.sum("in_pq"), F.lit(0))
    n_hit = F.coalesce(F.sum(F.col("is_true") * F.col("in_pq")), F.lit(0))
    return per_pair.agg(
        F.count_distinct("qid").cast("long").alias("n_probes"),
        n_true.cast("long").alias("n_true_pairs"),
        n_pq.cast("long").alias("n_cand_pq"),
        n_hit.cast("long").alias("n_hit_pq"),
        F.when(n_true > 0, n_hit.cast("double") / n_true.cast("double"))
        .otherwise(F.lit(1.0))
        .alias("recall_pq"),
        F.when(n_pq > 0, n_hit.cast("double") / n_pq.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("efficiency_pq"),
    )


# ---------------------------------------------------------------------------
# DoReMi-style domain reweighting (Xie et al. 2023, "DoReMi:
# Optimizing Data Mixtures Speeds Up Language Model Pretraining") —
# completes the mixing family: temperature mixing reweights by SIZE,
# DSIR selects by target-likeness, THIS reweights domains by excess
# model loss (multiplicative-weights / Group-DRO update).
# ---------------------------------------------------------------------------

DOREMI_ITERS = 5  # fixed small iteration count (oracle-unrollable)
DOREMI_ETA_DEN = 4  # step size η = 1/4 (exact binary)
DOREMI_SMOOTH_DEN = 50  # uniform smoothing ε = 1/50 (DoReMi's mixer)
_PPM = 1_000_000


def _doremi_iter_ctes() -> str:
    """The unrolled multiplicative-weights iteration as DuckDB CTEs —
    generated by the same loop structure the Spark path runs, over a
    ``stats`` relation (source, n_docs, n_bigrams, s_micro,
    avg_micro). Every step is exact BIGINT arithmetic except ONE
    ``exp`` per source per iteration, whose output is immediately
    FLOOR-quantized to integer micro-units (floor operates on the
    exact binary double in BOTH engines — never ``round()``, the
    shortest-repr trap of DETERMINISM rule 4), so a 1-ulp libm
    difference cannot survive except on a measure-zero boundary."""
    # AS MATERIALIZED throughout: DuckDB inlines plain CTEs, and each
    # iteration references its predecessor from TWO places (the
    # scalar aggregate and the spine) — un-materialized, the corpus-
    # sized stats pipeline re-inlines 4^T-fold and the oracle hangs
    # (the same exponential re-reference the Spark side avoids with
    # the single-row array-fold formulation).
    out = f"""it0 AS MATERIALIZED (
      SELECT source, n_docs, n_bigrams, s_micro, avg_micro, k,
             {_PPM} // k AS w_micro
      FROM stats CROSS JOIN (SELECT COUNT(*) AS k FROM stats))"""
    prev = "it0"
    for t in range(DOREMI_ITERS):
        out += f""",
    m{t} AS MATERIALIZED (
      SELECT CAST(SUM(w_micro * avg_micro) AS BIGINT) // {_PPM}
             AS m_micro FROM {prev}),
    u{t} AS MATERIALIZED (
      SELECT p.*,
             CAST(FLOOR(CAST(w_micro AS DOUBLE)
                  * exp(CAST(avg_micro - m_micro AS DOUBLE)
                        / {DOREMI_ETA_DEN * _PPM}.0)) AS BIGINT) AS u_q
      FROM {prev} p CROSS JOIN m{t}),
    z{t} AS MATERIALIZED (
      SELECT CAST(SUM(u_q) AS BIGINT) AS z FROM u{t}),
    it{t + 1} AS MATERIALIZED (
      SELECT source, n_docs, n_bigrams, s_micro, avg_micro, k,
             ({DOREMI_SMOOTH_DEN - 1} * {_PPM} * u_q)
               // ({DOREMI_SMOOTH_DEN} * z)
               + {_PPM} // ({DOREMI_SMOOTH_DEN} * k) AS w_micro
      FROM u{t} CROSS JOIN z{t})"""
        prev = f"it{t + 1}"
    return out


def _doremi_oracle() -> str:
    from etl_projects_spark.queries_llm import surprise_ctes

    return f"""
    WITH {surprise_ctes()},
    stats0 AS (
      SELECT source, COUNT(*) AS n_docs,
             CAST(SUM(n_bigrams) AS BIGINT) AS nb,
             CAST(SUM(CAST(FLOOR(s_total * {_PPM}) AS BIGINT))
                  AS BIGINT) AS sm
      FROM doc_surprise GROUP BY source),
    stats AS (
      SELECT source, CAST(n_docs AS BIGINT) AS n_docs,
             nb AS n_bigrams, sm AS s_micro, sm // nb AS avg_micro
      FROM stats0),
    {_doremi_iter_ctes()}
    SELECT source, n_docs, n_bigrams,
           CAST(avg_micro AS DOUBLE) / {_PPM}.0 AS avg_surprise,
           w_micro AS weight_ppm,
           CAST(w_micro AS DOUBLE) / {_PPM}.0 AS weight
    FROM it{DOREMI_ITERS}
    """


@_q("doremi_domain_reweight", _doremi_oracle())
def doremi_domain_reweight(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DoReMi-style domain reweighting: iterate a multiplicative-
    weights (Group-DRO) update over per-source excess loss, using the
    engine's bigram LM-surprise as the proxy loss (the shared
    ``surprise_relation`` / ``surprise_ctes`` model — ONE definition
    for this query, ``lm_surprise_filter``, and both oracles). A
    domain whose per-bigram surprise sits above the current MIXTURE
    mean gains weight each round — the hard-domain up-weighting DoReMi
    trains its proxy for — then the weights are smoothed toward
    uniform (ε = 1/{DOREMI_SMOOTH_DEN}) so no domain starves.

    Update (t = 1..{DOREMI_ITERS}, η = 1/{DOREMI_ETA_DEN}):
      m_t   = Σ_i w_i · avg_i          (current mixture mean loss)
      u_i   = w_i · exp(η · (avg_i − m_t))
      w_i'  = (1−ε) · u_i / Z + ε / k

    Cross-engine float discipline: every quantity is an exact BIGINT
    in micro-units — per-doc total-surprise floors to micro-nats at
    the stage boundary, per-source sums/divisions are integer, the
    mixture mean is an exact integer dot product (order-independent,
    no float fold needed) — except ONE exp per source per iteration,
    FLOOR-quantized back to integers immediately (never round(): the
    engine-side round on full-precision values is the shortest-repr
    trap, DETERMINISM rule 4; floor of the identical double is exact
    in both engines). The emitted ``weight_ppm`` is an exact integer;
    the two DOUBLE readouts are single divisions of exact integers.

    Scale shape: the corpus-sized work is the shared surprise model
    (one bigram-count shuffle + model-keyed scoring joins — the
    lm_surprise plan); everything after collapses to ONE row holding
    the source-sorted stats array (collect_list — bounded by the
    sources contract, the ``funnel_user_conversion`` collect+HOF
    pattern), and the {DOREMI_ITERS} iterations are a linear chain of
    array expressions over that row (each scalar — the mixture dot
    product, the normalizer — is an exact-BIGINT ``aggregate`` fold;
    a crossJoin-per-aggregate formulation re-references the corpus
    subtree exponentially and OOMs the planner at T=5). At 100 TB the
    iteration cost is k array elements × {DOREMI_ITERS} steps —
    nothing — and the corpus pipeline is planned exactly once."""
    from etl_projects_spark.queries_llm import surprise_relation

    rel = surprise_relation(spark, sf_dir, with_source=True)
    stats = (
        rel.groupBy("source")
        .agg(
            F.count("*").cast("long").alias("n_docs"),
            F.sum("n_bigrams").cast("long").alias("n_bigrams"),
            F.sum(F.floor(F.col("s_total") * _PPM)).cast("long").alias(
                "s_micro"
            ),
        )
        .withColumn("avg_micro", F.expr("s_micro DIV n_bigrams"))
    )
    one = (
        stats.agg(
            F.sort_array(
                F.collect_list(
                    F.struct(
                        "source", "n_docs", "n_bigrams", "s_micro",
                        "avg_micro",
                    )
                )
            ).alias("arr")
        )
        .withColumn("k", F.size("arr").cast("long"))
        .withColumn("avgs", F.expr("transform(arr, x -> x.avg_micro)"))
        .withColumn(
            "w", F.expr(f"transform(arr, x -> {_PPM} DIV k)")
        )
    )
    for _ in range(DOREMI_ITERS):
        one = (
            one.withColumn(
                "wa",
                F.expr(
                    "aggregate(zip_with(w, avgs, (a, b) -> a * b), "
                    "CAST(0 AS BIGINT), (acc, x) -> acc + x)"
                ),
            )
            .withColumn("m", F.expr(f"wa DIV {_PPM}"))
            .withColumn(
                "u",
                F.expr(
                    "zip_with(w, avgs, (wi, ai) -> "
                    "CAST(FLOOR(CAST(wi AS DOUBLE) "
                    f"* EXP(CAST(ai - m AS DOUBLE) "
                    f"/ {DOREMI_ETA_DEN * _PPM}.0)) AS BIGINT))"
                ),
            )
            .withColumn(
                "z",
                F.expr(
                    "aggregate(u, CAST(0 AS BIGINT), (acc, x) -> acc + x)"
                ),
            )
            .withColumn(
                "w",
                F.expr(
                    f"transform(u, uq -> "
                    f"({DOREMI_SMOOTH_DEN - 1} * {_PPM} * uq)"
                    f" DIV ({DOREMI_SMOOTH_DEN} * z)"
                    f" + {_PPM} DIV ({DOREMI_SMOOTH_DEN} * k))"
                ),
            )
        )
    out = one.select(
        "w", F.posexplode("arr").alias("pos", "x")
    )
    return out.select(
        F.col("x.source").alias("source"),
        F.col("x.n_docs").alias("n_docs"),
        F.col("x.n_bigrams").alias("n_bigrams"),
        (F.col("x.avg_micro").cast("double") / _PPM).alias("avg_surprise"),
        F.element_at("w", F.col("pos") + 1).alias("weight_ppm"),
        (
            F.element_at("w", F.col("pos") + 1).cast("double") / _PPM
        ).alias("weight"),
    )


# The funnel's scoped-pin name (released at the end of every build —
# the cross-stage pin-lifetime contract the r14 verdict asked to see
# exercised inside one session).
_SELECT_SCOPE = "curation_pipeline_run.select"

_DB = "curation"
_DW_DB = "curation_dw"
_STAGE_TABLES = ("pool_quality", "pool_dedup", "pool_decontam", "pool_selected")


def _build_funnel_lake(spark: SparkSession, sf_dir: str, tmp: str) -> None:
    """Run the five-stage funnel into a fresh lake root via
    ``PipelineRunner`` (each stage a retried unit, O1 semantics) —
    every stage writes through :meth:`LakeEngine.load_dataframe` and
    the NEXT stage reads the registered table back through the Spark
    catalog (the handoff under test)."""
    from etl_projects_spark.engine import LakeEngine, PipelineRunner
    from etl_projects_spark.operators.exec_util import release_scope
    from etl_projects_spark.operators.quality import min_count_monitor
    from etl_projects_spark.queries_llm import _components_cached

    eng = LakeEngine(spark, root=tmp)
    docs = load(spark, sf_dir, "documents")

    def stage_quality() -> DataFrame:
        q = docs.filter(_quality_keep()).select(
            "doc_id", "source", text.token_count("text").alias("n_tokens")
        )
        return eng.load_dataframe(q, _DB, "pool_quality")

    def stage_dedup() -> DataFrame:
        q = spark.table(f"{_DB}_pool_quality")
        comp = _components_cached(spark, sf_dir)
        d = (
            q.join(comp, q.doc_id == comp.node, "left")
            .filter(F.col("comp").isNull() | (F.col("comp") == F.col("doc_id")))
            .select(q["doc_id"], "source", "n_tokens")
        )
        return eng.load_dataframe(d, _DB, "pool_dedup")

    def stage_decontam() -> DataFrame:
        d = spark.table(f"{_DB}_pool_dedup")
        with_text = d.join(docs.select("doc_id", "text"), "doc_id").select(
            "doc_id",
            "source",
            "n_tokens",
            F.split("text", " ").alias("toks"),
            F.col("n_tokens").alias("n"),
        )
        eval_rel = docs.filter(F.col("doc_id") % 101 == 0).select(
            "doc_id",
            F.split("text", " ").alias("toks"),
            text.token_count("text").alias("n"),
        ).filter(F.col("n") >= CONTAM_NGRAM)
        # Eval suites are MBs at any corpus size — the gram set
        # broadcasts into the pool-side probe (the
        # decontaminate_train_prune shape).
        eval_grams = _contam_grams(eval_rel).select("gram").distinct()
        hits = (
            _contam_grams(with_text.filter(F.col("n") >= CONTAM_NGRAM))
            .join(F.broadcast(eval_grams), "gram")
            .select("doc_id")
            .distinct()
        )
        c = (
            d.filter(F.col("doc_id") % 101 != 0)
            .join(hits, "doc_id", "left_anti")
            .select("doc_id", "source", "n_tokens")
        )
        return eng.load_dataframe(c, _DB, "pool_decontam")

    def stage_select() -> DataFrame:
        c = spark.table(f"{_DB}_pool_decontam")
        pool = (
            c.filter(F.col("source") != DSIR_TARGET_SOURCE)
            .join(docs.select("doc_id", "text"), "doc_id")
            .select("doc_id", "source", "text")
        )
        w = dsir_weights_relation(spark, sf_dir, pool=pool)
        sel = dsir_select_from_weights(w, scope=_SELECT_SCOPE)
        return eng.load_dataframe(sel, _DB, "pool_selected")

    def stage_pack_promote() -> DataFrame:
        from etl_projects_spark.operators.exec_util import prefix_sum

        sel = spark.table(f"{_DB}_pool_selected").select("doc_id", "n_tokens")
        pos = prefix_sum(
            sel.filter(F.col("n_tokens") > 0), "doc_id", "n_tokens",
            out_col="start",
        )
        first = F.floor(F.col("start") / PACK_BUDGET).cast("long")
        last = F.floor(
            (F.col("start") + F.col("n_tokens") - 1) / PACK_BUDGET
        ).cast("long")
        packed = (
            pos.select(
                "doc_id", "start", "n_tokens",
                F.explode(F.sequence(first, last)).alias("shard_id"),
            )
            .select(
                "doc_id",
                "shard_id",
                F.greatest("start", F.col("shard_id") * PACK_BUDGET)
                .cast("long").alias("tok_start"),
                F.least(
                    F.col("start") + F.col("n_tokens"),
                    (F.col("shard_id") + 1) * PACK_BUDGET,
                ).cast("long").alias("tok_end"),
            )
        )
        packed.createOrReplaceTempView("curation_packed_staging")
        # Quality-gated DW promotion (Q4/O4): an empty pack — every
        # document filtered away upstream — aborts the build loudly
        # instead of landing an empty training corpus.
        return eng.promote_to_dw(
            "curation_packed_staging", _DW_DB, "packed",
            checks=[min_count_monitor(1)],
        )

    try:
        runner = PipelineRunner(retries=1)
        runner.run(
            [
                ("quality", stage_quality),
                ("dedup", stage_dedup),
                ("decontam", stage_decontam),
                ("select", stage_select),
                ("pack_promote", stage_pack_promote),
            ]
        )
    finally:
        # End-of-build pin hygiene: the selection stage's weights pin
        # must not outlive the build (the cross-stage scoped-pin
        # lifetime contract, r14 VERDICT item 2).
        release_scope(_SELECT_SCOPE, session=spark)


# Registered as a RESOLVED string, not a callable: the builder is pure
# string composition (no parquet reads / corpus-derived constants), and
# callable oracles are reserved for data-derived twins that must rekey
# per swept corpus (test_lazy_twin_oracles_rekey_to_gate_time_env).
@_q("curation_pipeline_run", _funnel_oracle())
def curation_pipeline_run(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The composed curation funnel (module docstring has the full
    design): build the five-stage lake ONCE per corpus vintage, then
    report per-stage flow — (stage, n_rows, n_tokens,
    token_keep_rate) — from the REGISTERED stage tables. The oracle
    re-derives every stage from the raw corpus, so any stage writing
    wrong rows, any broken catalog handoff, or any stale re-use fails
    the value hash."""
    from etl_projects_spark.engine import LakeEngine
    from etl_projects_spark.operators.exec_util import build_once, scratch_path

    scratch = scratch_path(
        "curation_funnel", os.path.join(sf_dir, "documents.parquet")
    )
    build_once(
        scratch,
        lambda tmp: _build_funnel_lake(spark, sf_dir, tmp),
        marker=os.path.join(_DW_DB, "packed", "_SUCCESS"),
    )
    # Re-run the external-table DDL against the final scratch root
    # (pure metadata — the K3 register step; build-time entries point
    # at the pre-rename build dir, exactly like pipeline_dag_build).
    eng = LakeEngine(spark, root=scratch)
    for t in _STAGE_TABLES:
        eng.register_existing(_DB, t, config.Layer.CLEAN)
    eng.register_existing(_DW_DB, "packed", config.Layer.DW)

    docs = load(spark, sf_dir, "documents")
    raw = docs.agg(
        F.count("*").alias("n_rows"),
        F.coalesce(F.sum(text.token_count("text")), F.lit(0))
        .cast("long")
        .alias("n_tokens"),
    )

    def stage_row(stage: str, df: DataFrame) -> DataFrame:
        return df.agg(
            F.count("*").alias("n_rows"),
            F.coalesce(F.sum("n_tokens"), F.lit(0))
            .cast("long")
            .alias("n_tokens"),
        ).select(F.lit(stage).alias("stage"), "n_rows", "n_tokens")

    packed = spark.table(f"{_DW_DB}_packed").withColumn(
        "n_tokens", F.col("tok_end") - F.col("tok_start")
    )
    shards = packed.agg(
        F.countDistinct("shard_id").alias("n_rows"),
        F.coalesce(F.sum("n_tokens"), F.lit(0)).cast("long").alias("n_tokens"),
    ).select(F.lit("stage6_shards").alias("stage"), "n_rows", "n_tokens")

    rep = (
        raw.select(F.lit("stage0_raw").alias("stage"), "n_rows", "n_tokens")
        .unionByName(
            stage_row("stage1_quality", spark.table(f"{_DB}_pool_quality"))
        )
        .unionByName(
            stage_row("stage2_dedup", spark.table(f"{_DB}_pool_dedup"))
        )
        .unionByName(
            stage_row("stage3_decontam", spark.table(f"{_DB}_pool_decontam"))
        )
        .unionByName(
            stage_row(
                "stage4_dsir_select", spark.table(f"{_DB}_pool_selected")
            )
        )
        .unionByName(stage_row("stage5_pack", packed))
        .unionByName(shards)
    )
    t0 = raw.select(F.col("n_tokens").alias("tok0"))
    return rep.crossJoin(F.broadcast(t0)).select(
        "stage",
        F.col("n_rows").cast("long").alias("n_rows"),
        "n_tokens",
        F.round(
            F.col("n_tokens").cast("double") / F.col("tok0").cast("double"), 6
        ).alias("token_keep_rate"),
    )
