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

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup
from etl_projects_spark.queries import _q
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
    cand = dedup.lsh_candidate_pairs(sigs)
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
    n_true = F.sum("is_true")
    n_cand = F.sum("is_cand")
    n_hit = F.sum(F.col("is_true") * F.col("is_cand"))
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
