"""Wave-30 catalog entries (round 11): dedup-pipeline QUALITY audits —
queries that measure the engine's own approximate operators against
exact ground truth on the same relation, the numbers an operator of a
100 TB curation pipeline needs before trusting (or re-tuning) the
approximations.

Keeps the catalog's determinism contract: exact BIGINT counting
everywhere upstream, terminal double quotients emitted RAW (the
comparator rounds), and the md5 60-bit shingle / MinHash-permutation
constants shared bit-for-bit with the DuckDB oracle via the
``dedup.*_sql`` generators.
"""

from __future__ import annotations

import os

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup, similarity
from etl_projects_spark.queries import _q, load
from etl_projects_spark.queries_llm import sets_cached

# Ground-truth doc-frequency cap: the SAME guard dedup_jaccard_df_capped
# ships (shingles in >10 docs are dropped before pair expansion), so the
# audit compares the LSH candidate stage against the exact pass a 100 TB
# pipeline could actually afford to run on a sample.
_AUDIT_MAX_DF = 10


@_q(
    "lsh_recall_report",
    f"""
    WITH {dedup.lsh_cand_cte()},
    capped AS (
      SELECT id, shingle FROM shingles
      WHERE shingle IN (SELECT shingle FROM shingles
                        GROUP BY shingle HAVING COUNT(*) <= {_AUDIT_MAX_DF})),
    sizes AS (SELECT id, count(*) AS n_sh FROM capped GROUP BY id),
    common AS (
      SELECT a.id AS id_a, b.id AS id_b, count(*) AS common
      FROM capped a JOIN capped b ON a.shingle = b.shingle AND a.id < b.id
      GROUP BY 1, 2),
    exact AS (
      SELECT id_a, id_b
      FROM common JOIN sizes x ON id_a = x.id JOIN sizes y ON id_b = y.id
      WHERE 2 * common >= 1 * (x.n_sh + y.n_sh - common)),
    hit AS (SELECT count(*) AS n_hit
            FROM exact JOIN cand ON exact.id_a = cand.id_a
                                AND exact.id_b = cand.id_b)
    SELECT CAST((SELECT count(*) FROM exact) AS BIGINT) AS n_true_pairs,
           CAST((SELECT count(*) FROM cand) AS BIGINT) AS n_lsh_candidates,
           CAST((SELECT n_hit FROM hit) AS BIGINT) AS n_hit,
           CASE WHEN (SELECT count(*) FROM exact) > 0
                THEN CAST((SELECT n_hit FROM hit) AS DOUBLE)
                     / CAST((SELECT count(*) FROM exact) AS DOUBLE)
                ELSE 1.0 END AS recall,
           CASE WHEN (SELECT count(*) FROM cand) > 0
                THEN CAST((SELECT n_hit FROM hit) AS DOUBLE)
                     / CAST((SELECT count(*) FROM cand) AS DOUBLE)
                ELSE 0.0 END AS candidate_efficiency
    """,
)
def lsh_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the banded MinHash-LSH candidate stage against
    exact df-capped Jaccard ground truth — ONE row: how many true
    duplicate pairs exist (exact verify over df≤10 shingle groups, the
    affordable exact pass), how many candidate pairs the 4×2 banding
    surfaces, how many true pairs the banding catches (recall), and
    what fraction of candidates are true (candidate_efficiency, the
    verify-stage cost multiplier). THE tuning readout for band/row
    choices: recall too low → more bands or fewer rows per band;
    efficiency too low → the verify stage burns shuffle on junk.

    Scale shape: both sides are the family's bounded-key patterns
    (exact pairs through the doc-frequency cap — SCALE.md invariant 3;
    candidates through the single melted-band self-equi-join) read off
    the SAME stored shingle-set artifact (``sets_cached``), so the
    audit adds no new expansion class. The two pair relations join on
    the pair key and collapse to one row — at 100 TB this runs on a
    sampled partition exactly like the exact side itself would.
    Single-row totals use one left join + aggregate, no crossJoin, no
    collect.
    """
    sets = sets_cached(spark, sf_dir)
    sh = sets.select("id", F.explode("sh_set").alias("shingle"))
    exact = dedup.jaccard_pairs(
        sh, threshold_num=1, threshold_den=2, max_doc_freq=_AUDIT_MAX_DF
    ).select("id_a", "id_b")
    sigs = dedup.minhash_signatures_from_sets(sets)
    # dedupe=False (r16, guide §2.4): the terminal per-pair groupBy
    # below collapses a pair that agrees on several bands to one row
    # anyway (max(is_cand) and the distinct-pair counts are identical
    # with or without the upstream distinct), so the candidate list's
    # own distinct — a full Exchange pair of the pair stream — is
    # dropped from the plan and the same rows are exchanged once.
    cand = dedup.lsh_candidate_pairs(sigs, dedupe=False)
    # Tag each side, union, and aggregate once: n_true counts exact
    # rows, n_cand counts candidate rows, n_hit counts pair keys seen
    # from BOTH sides — one shuffle on the pair key, no scalar
    # subqueries, no crossJoin of 1-row aggregates.
    tagged = exact.select(
        "id_a", "id_b", F.lit(1).alias("is_true"), F.lit(0).alias("is_cand")
    ).unionByName(
        cand.select(
            "id_a", "id_b", F.lit(0).alias("is_true"),
            F.lit(1).alias("is_cand"),
        )
    )
    per_pair = tagged.groupBy("id_a", "id_b").agg(
        F.max("is_true").alias("is_true"), F.max("is_cand").alias("is_cand")
    )
    # coalesce(…, 0): on a degenerate corpus with zero exact AND zero
    # candidate pairs, per_pair is empty and bare sums would emit NULL
    # counts where the oracle's scalar subqueries emit 0 (r11 ADVICE);
    # the zeroed counts also route the quotients to their otherwise()
    # branches (recall 1.0, efficiency 0.0), matching the oracle.
    n_true = F.coalesce(F.sum("is_true"), F.lit(0))
    n_cand = F.coalesce(F.sum("is_cand"), F.lit(0))
    n_hit = F.coalesce(F.sum(F.col("is_true") * F.col("is_cand")), F.lit(0))
    return per_pair.agg(
        n_true.cast("long").alias("n_true_pairs"),
        n_cand.cast("long").alias("n_lsh_candidates"),
        n_hit.cast("long").alias("n_hit"),
        F.when(
            n_true > 0, n_hit.cast("double") / n_true.cast("double")
        )
        .otherwise(F.lit(1.0))
        .alias("recall"),
        F.when(
            n_cand > 0, n_hit.cast("double") / n_cand.cast("double")
        )
        .otherwise(F.lit(0.0))
        .alias("candidate_efficiency"),
    )


# Recall-audit contract for the ANN family: exact top-k per probe at
# the family's standard k, probes = the eval-set stand-in predicate
# every batch-retrieval query uses (vec_id % 100 = 0 — bounded by
# contract, the same "benchmarks are MBs" shape as the knn probe set).
ANN_RECALL_K = 10


def _multiprobe_xor_sql() -> str:
    """DuckDB list literal of the multi-probe bucket set for one probe
    row: the query's own bucket plus every Hamming-1 bit flip — the
    SAME (n_planes+1)-element set ``similarity.lsh_multiprobe_topk``
    scans, derived from the same LSH_N_PLANES constant."""
    flips = ", ".join(
        f"xor(qbucket, {1 << i})" for i in range(similarity.LSH_N_PLANES)
    )
    return f"[qbucket, {flips}]"


@_q(
    "ann_recall_report",
    f"""
    WITH b AS (SELECT vec_id, embedding,
                      {similarity.bucket_sql('embedding')} AS bucket
               FROM embeddings),
    q AS (SELECT vec_id AS qid, embedding AS qv, bucket AS qbucket
          FROM b WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, c.vec_id AS nbr,
             round({similarity.cosine_sql('c.embedding', 'q.qv')}, 6) AS score
      FROM b c, q WHERE c.vec_id != q.qid),
    ranked AS (
      SELECT qid, nbr,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nbr) AS rnk
      FROM scored),
    exact AS (SELECT qid, nbr FROM ranked WHERE rnk <= {ANN_RECALL_K}),
    c1 AS (SELECT q.qid, c.vec_id AS nbr
           FROM b c JOIN q ON c.bucket = q.qbucket
           WHERE c.vec_id != q.qid),
    p AS (SELECT qid, unnest({_multiprobe_xor_sql()}) AS pbucket FROM q),
    cm AS (SELECT p.qid, c.vec_id AS nbr
           FROM b c JOIN p ON c.bucket = p.pbucket
           WHERE c.vec_id != p.qid),
    tagged AS (
      SELECT qid, nbr, 1 AS is_true, 0 AS in_bucket, 0 AS in_multi FROM exact
      UNION ALL
      SELECT qid, nbr, 0, 1, 0 FROM c1
      UNION ALL
      SELECT qid, nbr, 0, 0, 1 FROM cm),
    per_pair AS (
      SELECT qid, nbr, max(is_true) AS is_true,
             max(in_bucket) AS in_bucket, max(in_multi) AS in_multi
      FROM tagged GROUP BY 1, 2)
    SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_probes,
           CAST(coalesce(sum(is_true), 0) AS BIGINT) AS n_true_pairs,
           CAST(coalesce(sum(in_bucket), 0) AS BIGINT) AS n_cand_bucket,
           CAST(coalesce(sum(is_true * in_bucket), 0) AS BIGINT) AS n_hit_bucket,
           CASE WHEN coalesce(sum(is_true), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_bucket), 0) AS DOUBLE)
                     / CAST(sum(is_true) AS DOUBLE)
                ELSE 1.0 END AS recall_bucket,
           CASE WHEN coalesce(sum(in_bucket), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_bucket), 0) AS DOUBLE)
                     / CAST(sum(in_bucket) AS DOUBLE)
                ELSE 0.0 END AS efficiency_bucket,
           CAST(coalesce(sum(in_multi), 0) AS BIGINT) AS n_cand_multiprobe,
           CAST(coalesce(sum(is_true * in_multi), 0) AS BIGINT) AS n_hit_multiprobe,
           CASE WHEN coalesce(sum(is_true), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_multi), 0) AS DOUBLE)
                     / CAST(sum(is_true) AS DOUBLE)
                ELSE 1.0 END AS recall_multiprobe,
           CASE WHEN coalesce(sum(in_multi), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_multi), 0) AS DOUBLE)
                     / CAST(sum(in_multi) AS DOUBLE)
                ELSE 0.0 END AS efficiency_multiprobe
    FROM per_pair
    """,
)
def ann_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the ANN candidate stages against the exact k-NN
    answer — the embeddings-side twin of ``lsh_recall_report`` (r11
    VERDICT: the ANN family shipped tunable knobs with no readout).
    ONE row over the standard probe set (vec_id % 100 = 0): how many
    exact top-{ANN_RECALL_K} (probe, neighbor) pairs exist, how many
    candidates single-bucket hyperplane LSH scans and how many of the
    true pairs it catches (recall@k + candidate efficiency), and the
    same pair of numbers for Hamming-1 multi-probe — THE tuning
    readout for the hyperplane-count / probe-width knobs before
    trusting either index at 100 TB (recall too low → fewer planes or
    wider probing; efficiency too low → the verify stage scans junk).

    Scale shape: the exact side is the family's bounded-probe k-NN
    join (``similarity.knn_join`` — probes collected into ONE
    broadcast matrix by the eval-set contract, corpus streamed once
    through Arrow batches, per-partition top-k); both candidate sides
    are broadcast hash equi-joins on the bucket column (multi-probe
    via an EXPLODED (qid, probed-bucket) relation rather than an
    array_contains nested-loop — the probe set is (n_planes+1)·probes
    rows, still broadcast-sized). The three relations union, collapse
    on the pair key (one eval-sized shuffle), and aggregate to one
    row; counts are coalesced to 0 so a degenerate empty corpus
    matches the oracle's zeros. No crossJoin, no collect beyond the
    bounded probe matrix, nothing corpus-quadratic anywhere.
    """
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.knn_join(emb, probes, k=ANN_RECALL_K).select(
        "qid", "nbr"
    )
    b = emb.select(
        "vec_id",
        similarity.hyperplane_bucket(F.col("embedding")).alias("bucket"),
    )
    qb = b.filter(F.col("vec_id") % 100 == 0).select(
        F.col("vec_id").alias("qid"), F.col("bucket").alias("qbucket")
    )
    cand1 = (
        b.join(F.broadcast(qb), F.col("bucket") == F.col("qbucket"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nbr"))
    )
    qexp = qb.select(
        "qid",
        F.explode(
            F.array(
                F.col("qbucket"),
                *[
                    F.col("qbucket").bitwiseXOR(1 << i)
                    for i in range(similarity.LSH_N_PLANES)
                ],
            )
        ).alias("pbucket"),
    )
    candm = (
        b.join(F.broadcast(qexp), F.col("bucket") == F.col("pbucket"))
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nbr"))
    )
    tagged = (
        exact.select(
            "qid", "nbr", F.lit(1).alias("is_true"),
            F.lit(0).alias("in_bucket"), F.lit(0).alias("in_multi"),
        )
        .unionByName(
            cand1.select(
                "qid", "nbr", F.lit(0).alias("is_true"),
                F.lit(1).alias("in_bucket"), F.lit(0).alias("in_multi"),
            )
        )
        .unionByName(
            candm.select(
                "qid", "nbr", F.lit(0).alias("is_true"),
                F.lit(0).alias("in_bucket"), F.lit(1).alias("in_multi"),
            )
        )
    )
    per_pair = tagged.groupBy("qid", "nbr").agg(
        F.max("is_true").alias("is_true"),
        F.max("in_bucket").alias("in_bucket"),
        F.max("in_multi").alias("in_multi"),
    )
    n_true = F.coalesce(F.sum("is_true"), F.lit(0))
    n_c1 = F.coalesce(F.sum("in_bucket"), F.lit(0))
    h_c1 = F.coalesce(F.sum(F.col("is_true") * F.col("in_bucket")), F.lit(0))
    n_cm = F.coalesce(F.sum("in_multi"), F.lit(0))
    h_cm = F.coalesce(F.sum(F.col("is_true") * F.col("in_multi")), F.lit(0))
    return per_pair.agg(
        F.count_distinct("qid").cast("long").alias("n_probes"),
        n_true.cast("long").alias("n_true_pairs"),
        n_c1.cast("long").alias("n_cand_bucket"),
        h_c1.cast("long").alias("n_hit_bucket"),
        F.when(n_true > 0, h_c1.cast("double") / n_true.cast("double"))
        .otherwise(F.lit(1.0))
        .alias("recall_bucket"),
        F.when(n_c1 > 0, h_c1.cast("double") / n_c1.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("efficiency_bucket"),
        n_cm.cast("long").alias("n_cand_multiprobe"),
        h_cm.cast("long").alias("n_hit_multiprobe"),
        F.when(n_true > 0, h_cm.cast("double") / n_true.cast("double"))
        .otherwise(F.lit(1.0))
        .alias("recall_multiprobe"),
        F.when(n_cm > 0, h_cm.cast("double") / n_cm.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("efficiency_multiprobe"),
    )


def _ivf_recall_oracle() -> str | None:
    """Oracle for ann_ivf_recall_report: the stored index's (vec_id,
    cluster) assignment and each probe's probed-cluster set are both
    reproducible from the codebook constants + data (the numpy twins
    ``ivf_assignments`` / ``ivf_probe_clusters``, no Spark — the same
    derivation class as ``ann_ivf_topk``'s oracle), so the IVF
    candidate relation is a pure SQL join of two inlined VALUES
    relations, and the exact side is brute-force top-k in SQL.

    Registered as a CALLABLE (resolved by ``oracle_sql()`` at gate
    time, r12 ADVICE): the parquet read + corpus×centroid matmul and
    the corpus-sized VALUES string are paid only when a gate actually
    asks for oracles, and the twin is generated against the oracle
    scale factor in effect THEN. None — i.e. a rows-only check — if
    that corpus is absent (bench-only environments) or EMPTY (zero
    vectors would render malformed ``VALUES ''`` SQL)."""
    sf_dir = os.environ.get(
        "SPARK_GRAFT_ORACLE_SF_DIR", "/root/testdata/sf0.01"
    )
    path = os.path.join(sf_dir, "embeddings.parquet")
    if not os.path.exists(path):
        return None
    import pyarrow.parquet as pq

    # Footer-metadata row count — no column read; guards the twins
    # (np.vstack crashes on zero vectors) and the VALUES strings.
    if pq.ParquetFile(path).metadata.num_rows == 0:
        return None
    assignments = similarity.ivf_assignments(path)
    assign_vals = ", ".join(f"({i}, {c})" for i, c in assignments)
    probe_vals = ", ".join(
        f"({q}, {c})" for q, c in similarity.ivf_probe_clusters(path)
    )
    if not probe_vals:
        return None
    return f"""
    WITH assign(vec_id, cluster) AS (VALUES {assign_vals}),
    probes(qid, pcluster) AS (VALUES {probe_vals}),
    cand AS (SELECT p.qid, a.vec_id AS nbr
             FROM probes p JOIN assign a ON a.cluster = p.pcluster
             WHERE a.vec_id != p.qid),
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
      SELECT qid, nbr, 1 AS is_true, 0 AS in_ivf FROM exact
      UNION ALL
      SELECT qid, nbr, 0, 1 FROM cand),
    per_pair AS (
      SELECT qid, nbr, max(is_true) AS is_true, max(in_ivf) AS in_ivf
      FROM tagged GROUP BY 1, 2)
    SELECT CAST(count(DISTINCT qid) AS BIGINT) AS n_probes,
           CAST(coalesce(sum(is_true), 0) AS BIGINT) AS n_true_pairs,
           CAST(coalesce(sum(in_ivf), 0) AS BIGINT) AS n_cand_ivf,
           CAST(coalesce(sum(is_true * in_ivf), 0) AS BIGINT) AS n_hit_ivf,
           CASE WHEN coalesce(sum(is_true), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_ivf), 0) AS DOUBLE)
                     / CAST(sum(is_true) AS DOUBLE)
                ELSE 1.0 END AS recall_ivf,
           CASE WHEN coalesce(sum(in_ivf), 0) > 0
                THEN CAST(coalesce(sum(is_true * in_ivf), 0) AS DOUBLE)
                     / CAST(sum(in_ivf) AS DOUBLE)
                ELSE 0.0 END AS efficiency_ivf
    FROM per_pair
    """


@_q("ann_ivf_recall_report", _ivf_recall_oracle)
def ann_ivf_recall_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Recall audit of the MATERIALIZED IVF index's candidate stage —
    the nprobe half of the ANN readout (``ann_recall_report`` audits
    the hyperplane-LSH probing): over the standard probe set
    (vec_id % 100 = 0), how many candidates the ``IVF_PROBE``-cluster
    probe of the stored index surfaces, and what fraction of the exact
    top-{ANN_RECALL_K} it catches. THE nprobe/n_centroids tuning
    readout: recall too low → probe more cells or re-train a larger
    codebook; efficiency too low → cells are too coarse and the verify
    stage scans junk.

    Spark shape: the probed-cluster selection per query is the ENGINE
    path (`ivf_topk_indexed`'s driver-side codebook argsort — codebook
    16x64 from the index sidecar, probe matrix bounded by the eval-set
    contract), the candidate relation is a scan of ONLY the probed
    cluster directories of the stored index (static partition
    pruning via the isin filter, then a broadcast equi-join against
    the (qid, cluster) probe map), and the exact side is the bounded
    knn_join. Union, collapse on the pair key, one terminal 1-row
    aggregate (counts coalesced to 0). Nothing corpus-quadratic; the
    stored index is never reshuffled.
    """
    import json

    import numpy as np

    from etl_projects_spark.queries_llm import ivf_index_dir

    emb = load(spark, sf_dir, "embeddings")
    probes_df = emb.filter(F.col("vec_id") % 100 == 0)
    exact = similarity.knn_join(emb, probes_df, k=ANN_RECALL_K).select(
        "qid", "nbr"
    )
    idx_dir = ivf_index_dir(spark, sf_dir)
    with open(os.path.join(idx_dir, "_ivf_centroids.json")) as f:
        cents = np.array(json.load(f), dtype=np.float64)
    # Bounded by the eval-set contract (the same probe matrix knn_join
    # collects); the per-probe cell selection is ivf_topk_indexed's
    # driver-side argsort, one row per (probe, probed cell).
    qpdf = probes_df.select("vec_id", "embedding").toPandas()
    pairs = []
    for qid, vec in zip(qpdf["vec_id"], qpdf["embedding"]):
        qn = np.asarray(vec, dtype=np.float64)
        # Same zero-norm floor as every other probe normalization in
        # the family (r12 ADVICE): a zero probe selects cells
        # deterministically (~0 scores) instead of NaN-argsorting.
        qn /= np.maximum(np.linalg.norm(qn), 1e-12)
        for c in np.argsort(-(cents @ qn))[: similarity.IVF_PROBE]:
            pairs.append((int(qid), int(c)))
    probe_map = spark.createDataFrame(pairs, "qid long, cluster int")
    probed_set = sorted({c for _, c in pairs})
    idx = spark.read.parquet(idx_dir).filter(
        F.col("cluster").isin(probed_set)
    )
    cand = (
        idx.join(F.broadcast(probe_map), "cluster")
        .filter(F.col("vec_id") != F.col("qid"))
        .select("qid", F.col("vec_id").alias("nbr"))
    )
    tagged = exact.select(
        "qid", "nbr", F.lit(1).alias("is_true"), F.lit(0).alias("in_ivf")
    ).unionByName(
        cand.select(
            "qid", "nbr", F.lit(0).alias("is_true"),
            F.lit(1).alias("in_ivf"),
        )
    )
    per_pair = tagged.groupBy("qid", "nbr").agg(
        F.max("is_true").alias("is_true"), F.max("in_ivf").alias("in_ivf")
    )
    n_true = F.coalesce(F.sum("is_true"), F.lit(0))
    n_ivf = F.coalesce(F.sum("in_ivf"), F.lit(0))
    n_hit = F.coalesce(F.sum(F.col("is_true") * F.col("in_ivf")), F.lit(0))
    return per_pair.agg(
        F.count_distinct("qid").cast("long").alias("n_probes"),
        n_true.cast("long").alias("n_true_pairs"),
        n_ivf.cast("long").alias("n_cand_ivf"),
        n_hit.cast("long").alias("n_hit_ivf"),
        F.when(n_true > 0, n_hit.cast("double") / n_true.cast("double"))
        .otherwise(F.lit(1.0))
        .alias("recall_ivf"),
        F.when(n_ivf > 0, n_hit.cast("double") / n_ivf.cast("double"))
        .otherwise(F.lit(0.0))
        .alias("efficiency_ivf"),
    )


@_q(
    "knn_label_purity",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv, label AS qlabel
               FROM embeddings WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, q.qlabel, c.vec_id AS nbr, c.label AS nlabel,
             round({similarity.cosine_sql('c.embedding', 'q.qv')}, 6) AS score
      FROM embeddings c, q WHERE c.vec_id != q.qid),
    ranked AS (
      SELECT qid, qlabel, nbr, nlabel,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nbr) AS rnk
      FROM scored),
    topk AS (SELECT qid, qlabel, nlabel FROM ranked
             WHERE rnk <= {ANN_RECALL_K})
    SELECT CAST(qlabel AS INT) AS label,
           CAST(count(DISTINCT qid) AS BIGINT) AS n_probes,
           CAST(count(*) AS BIGINT) AS n_neighbors,
           CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                AS BIGINT) AS n_same_label,
           CAST(sum(CASE WHEN nlabel = qlabel THEN 1 ELSE 0 END)
                AS DOUBLE) / CAST(count(*) AS DOUBLE) AS purity_at_k
    FROM topk GROUP BY qlabel
    """,
)
def knn_label_purity(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Embedding-SPACE quality audit: for the standard probe set, what
    fraction of each probe's exact top-{ANN_RECALL_K} cosine neighbors
    share its label (purity@k, grouped by probe label). The
    supervised-signal readout a curation pipeline checks before
    trusting embedding-keyed operators at all — low purity means
    SemDeDup cluster pruning, embedding near-dup thresholds, and ANN
    retrieval are keyed on a space that does not respect the corpus's
    own structure (and per-label rows localize WHICH classes the
    space confuses). Complements the recall audits, which measure the
    INDEX against the space; this measures the space itself.

    Measured verdict for THIS corpus (TESTDATA.md §Embedding-space
    structure): purity = chance at every SF — the synthetic labels are
    assigned independently of the vectors, so per-label rows here
    verify the join/groupBy plumbing; the space-side margin companion
    is ``embedding_margin_report`` (z10 ≈ 2: no neighbor structure
    either).

    Scale shape: the exact side is the family's bounded-probe
    ``knn_join`` (one corpus scan, broadcast probe matrix, Arrow-batch
    BLAS, per-partition top-k); neighbor labels arrive by one id-key
    equi-join of the (queries x k)-sized top-k relation against the
    corpus's 2-column (vec_id, label) projection — AQE broadcasts the
    small side here, a linear hash join at 100 TB; probe labels ride
    the broadcast probe relation. One tiny groupBy ends the plan. No
    crossJoin, no collect beyond the bounded probe matrix.
    """
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    topk = similarity.knn_join(emb, probes, k=ANN_RECALL_K).select(
        "qid", "nbr"
    )
    qlab = probes.select(
        F.col("vec_id").alias("qid"), F.col("label").alias("qlabel")
    )
    nlab = emb.select(
        F.col("vec_id").alias("nbr"), F.col("label").alias("nlabel")
    )
    same = F.sum(
        F.when(F.col("nlabel") == F.col("qlabel"), 1).otherwise(0)
    )
    return (
        topk.join(F.broadcast(qlab), "qid")
        .join(nlab, "nbr")
        .groupBy(F.col("qlabel").cast("int").alias("label"))
        .agg(
            F.count_distinct("qid").cast("long").alias("n_probes"),
            F.count("*").cast("long").alias("n_neighbors"),
            same.cast("long").alias("n_same_label"),
            (same.cast("double") / F.count("*").cast("double")).alias(
                "purity_at_k"
            ),
        )
    )
