"""Wave-31 catalog entries (round 13): the embedding-space MARGIN
audit — the query that quantifies WHY the r12 ANN recall readouts
(hyperplane-LSH 0.14/0.54, IVF 0.62 at default knobs) are a property
of the test corpus rather than the indexes, per the r12 verdict's
"tune or bound" order. The companion analysis (predicted-vs-measured
collision probabilities, the IVF recall-vs-scanned-fraction curve, and
the structured-corpus counter-proof) lives in SCALE.md §"ANN recall is
data-bounded on the isotropic test corpus" and TESTDATA.md
§"Embedding-space structure"; the proof that the SAME operators at the
SAME knobs reach multiprobe recall ≥ 0.9 when the data has neighbor
structure is tests/test_similarity.py.

Keeps the catalog's determinism contract: the bulk moments accumulate
as EXACT BIGINT sums of 1e6-scaled (already-6dp-rounded) scores —
float sums over thousands of rows would drift with accumulation order
across engines — and the terminal doubles (mean, std, z10) are each
ONE deterministic float expression over those exact integers, written
with the same shape in Spark and DuckDB.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.operators import similarity
from etl_projects_spark.queries import _q, load
from etl_projects_spark.queries_wave30 import ANN_RECALL_K


@_q(
    "embedding_margin_report",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, c.vec_id AS nbr,
             round({similarity.cosine_sql('c.embedding', 'q.qv')}, 6) AS score
      FROM embeddings c, q WHERE c.vec_id != q.qid),
    ranked AS (
      SELECT qid, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nbr) AS rnk
      FROM scored),
    stats AS (SELECT qid, max(score) AS s1, min(score) AS s10
              FROM ranked WHERE rnk <= {ANN_RECALL_K} GROUP BY qid),
    bulk AS (
      SELECT qid,
             CAST(count(*) AS BIGINT) AS n_scored,
             CAST(sum(CAST(round(score * 1000000, 0) AS BIGINT))
                  AS BIGINT) AS s_e6,
             CAST(sum(CAST(round(score * 1000000, 0) AS BIGINT)
                      * CAST(round(score * 1000000, 0) AS BIGINT))
                  AS BIGINT) AS ss_e12
      FROM scored GROUP BY qid)
    SELECT b.qid AS qid, b.n_scored AS n_scored,
           s.s1 AS top1_score, s.s10 AS top10_score,
           ((CAST(b.s_e6 AS DOUBLE) / CAST(b.n_scored AS DOUBLE))
            / 1000000.0) AS bulk_mean,
           (sqrt((CAST(b.ss_e12 AS DOUBLE)
                  - (CAST(b.s_e6 AS DOUBLE) * CAST(b.s_e6 AS DOUBLE))
                    / CAST(b.n_scored AS DOUBLE))
                 / CAST(b.n_scored AS DOUBLE))
            / 1000000.0) AS bulk_std,
           CASE WHEN sqrt((CAST(b.ss_e12 AS DOUBLE)
                           - (CAST(b.s_e6 AS DOUBLE)
                              * CAST(b.s_e6 AS DOUBLE))
                             / CAST(b.n_scored AS DOUBLE))
                          / CAST(b.n_scored AS DOUBLE)) > 0.0
                THEN (s.s10
                      - ((CAST(b.s_e6 AS DOUBLE)
                          / CAST(b.n_scored AS DOUBLE)) / 1000000.0))
                     / (sqrt((CAST(b.ss_e12 AS DOUBLE)
                              - (CAST(b.s_e6 AS DOUBLE)
                                 * CAST(b.s_e6 AS DOUBLE))
                                / CAST(b.n_scored AS DOUBLE))
                             / CAST(b.n_scored AS DOUBLE))
                        / 1000000.0)
                ELSE 0.0 END AS z10
    FROM bulk b JOIN stats s ON b.qid = s.qid
    """,
)
def embedding_margin_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k score-GAP audit of the embedding space — the
    "quantify the bound" readout the r12 verdict ordered alongside the
    recall audits: per standard probe (vec_id % 100 = 0), the exact
    top-1 / top-{ANN_RECALL_K} cosine scores, the probe's BULK score
    moments (mean and std of its cosine against the whole corpus), and
    ``z10`` — how many bulk standard deviations the {ANN_RECALL_K}th
    TRUE neighbor stands above the bulk mean. This is the
    relative-contrast statistic of the ANN literature: an index-able
    space shows z10 ≳ 6-7 (true neighbors stand clear of the score
    continuum — on the structured proof corpus in
    tests/test_similarity.py, within-cluster cosine ≈ 0.95 over a
    ±0.125σ bulk); THIS corpus reads z10 ≈ 2.0-2.8, i.e. the 10th
    neighbor sits INSIDE the bulk's upper tail (expected bulk count
    above it ≈ N·Φ(-2.3) ≈ 1% of the corpus ≫ {ANN_RECALL_K}), so ANY
    partition-and-prune index — hyperplane LSH, IVF — can only beat a
    linear scan by that sliver. That is the data-inherent bound behind
    the r12 recall readouts (SCALE.md §ANN-bound has the
    predicted-vs-measured table; TESTDATA.md the label-structure
    companion). A healthy corpus regresses this report toward large
    z10 — making it THE admission check before keying retrieval or
    SemDeDup decisions on a new embedding column.

    Determinism shape: bulk moments are EXACT BIGINT sums of
    1e6-scaled scores (scores are 6-dp-rounded first, so the scaling
    is integer-exact; float sums would drift with accumulation order
    across engines — ss_e12 stays < 2^63 up to ~10^10 corpus rows per
    probe, switch to DECIMAL(38) sums past that); mean/std/z10 are
    each one deterministic float expression over those integers,
    written with the same shape in both engines.

    Scale shape: the exact top-k side is the family's bounded-probe
    :func:`similarity.knn_join`; the bulk side is
    :func:`similarity.score_all_probes` — the SAME broadcast-matrix /
    Arrow-BLAS corpus pass WITHOUT the k-cut (identical floats by
    construction). probes × corpus rows flow straight into a map-side
    partial aggregate keyed by the probe id — no corpus shuffle, no
    window over the corpus, nothing quadratic; the only small shuffle
    is the probe-keyed aggregate and the broadcast of the probe-sized
    stats relation.
    """
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    topk = similarity.knn_join(emb, probes, k=ANN_RECALL_K)
    stats = topk.groupBy("qid").agg(
        F.max("score").alias("s1"), F.min("score").alias("s10")
    )
    scored = similarity.score_all_probes(emb, probes)
    e6 = F.round(F.col("score") * 1000000, 0).cast("long")
    bulk = scored.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum(e6).cast("long").alias("s_e6"),
        F.sum(e6 * e6).cast("long").alias("ss_e12"),
    )
    n_d = F.col("n_scored").cast("double")
    s_d = F.col("s_e6").cast("double")
    ss_d = F.col("ss_e12").cast("double")
    mean = (s_d / n_d) / F.lit(1000000.0)
    std = F.sqrt((ss_d - (s_d * s_d) / n_d) / n_d) / F.lit(1000000.0)
    return (
        bulk.join(F.broadcast(stats), "qid")
        .select(
            "qid",
            "n_scored",
            F.col("s1").alias("top1_score"),
            F.col("s10").alias("top10_score"),
            mean.alias("bulk_mean"),
            std.alias("bulk_std"),
            F.when(std > 0.0, (F.col("s10") - mean) / std)
            .otherwise(F.lit(0.0))
            .alias("z10"),
        )
    )
