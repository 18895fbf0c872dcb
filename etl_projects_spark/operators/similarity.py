"""Similarity search over embedding columns (array<float>).

- :func:`cosine` — pure column expression (``zip_with`` +
  ``aggregate``): JVM-side, codegen'd, no UDF.
- :func:`brute_force_topk` — exact top-k vs a query vector: one narrow
  scan + ``TakeOrderedAndProject`` (no global sort, no collect).
- :func:`hyperplane_bucket` / :func:`lsh_topk` — random-hyperplane LSH:
  sign-bit bucket from fixed seeded hyperplanes; candidates searched
  within the query's bucket only. The scale path: bucketing is a cheap
  map-side expression, search cost drops ~2^bits-fold, and the same
  bucket column doubles as a shuffle/partition key for batch ANN joins.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
from pyspark.sql import Column, DataFrame
from pyspark.sql import functions as F
from pyspark.sql.types import DoubleType


# DataType instance (not a DDL string) so import needs no active session.
@F.pandas_udf(DoubleType())
def pair_dot(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-vectorized row-wise dot product (the hot path for pair
    scoring: one numpy einsum per batch instead of per-row fold)."""
    a = np.vstack(va.to_numpy())
    b = np.vstack(vb.to_numpy())
    return pd.Series(np.einsum("ij,ij->i", a, b))


def _pair_cosine_batch(va: pd.Series, vb: pd.Series) -> pd.Series:
    """Arrow-vectorized row-wise cosine. The JVM column expression
    (:func:`cosine`) folds through interpreted higher-order lambdas —
     3 passes/row outside codegen; one numpy batch op replaces them
    (verified hash-identical to the DuckDB oracle at 6 dp)."""
    a = np.vstack(va.to_numpy()).astype(np.float64)
    b = np.vstack(vb.to_numpy()).astype(np.float64)
    num = np.einsum("ij,ij->i", a, b)
    # PER-NORM floor — the one zero-norm convention of the family
    # (r13 ADVICE, completed here in r15): floor EACH norm at 1e-12,
    # never the product. Flooring the product diverged from
    # :func:`cosine` / :func:`cosine_sql` for norms in (1e-12, 1e-6):
    # the product drops below 1e-12 while both factors are above the
    # floor, so the per-norm path returns the true cosine and the
    # product path clamps. An all-zero embedding (failed encoding /
    # padding row) still scores ~0 instead of NaN (which Spark sorts
    # ABOVE every real score and passes NaN >= t filters);
    # bit-identical for every vector with norm >= 1e-12.
    den = np.maximum(np.linalg.norm(a, axis=1), 1e-12) * np.maximum(
        np.linalg.norm(b, axis=1), 1e-12
    )
    return pd.Series(num / den)


pair_cosine = F.pandas_udf(_pair_cosine_batch, DoubleType())
# Private nondeterministic twin for consumers that need evaluation
# pinned to one Arrow stage (a filter over the UDF output would
# otherwise clone a deterministic UDF into the pushed-down predicate).
# A separate instance is required: ``asNondeterministic()`` mutates the
# UDF in place, so calling it on the shared ``pair_cosine`` would flip
# every other consumer's plan shape for the rest of the process.
pair_cosine_once = F.pandas_udf(_pair_cosine_batch, DoubleType()).asNondeterministic()

EMBED_DIM = 64
LSH_PLANES_SEED = 42
# 4 planes → 16 buckets: sized so a bucket still holds ~dozens of
# candidates at test scale. At 100 TB, raise bits with corpus size
# (bucket occupancy ~ N / 2^bits) and/or probe neighboring buckets.
LSH_N_PLANES = 4


def _hyperplanes(dim: int = EMBED_DIM, n: int = LSH_N_PLANES) -> np.ndarray:
    """Fixed seeded hyperplanes — identical constants in Spark and oracle."""
    rng = np.random.RandomState(LSH_PLANES_SEED)
    return rng.standard_normal((n, dim)).round(6)


def dot(a: Column, b: Column) -> Column:
    """Σ a_i*b_i in double (sequential fold — deterministic)."""
    return F.aggregate(
        F.zip_with(a, b, lambda x, y: x.cast("double") * y.cast("double")),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )


def norm(a: Column) -> Column:
    return F.sqrt(dot(a, a))


def cosine(a: Column, b: Column) -> Column:
    # PER-NORM floor (greatest(norm, 1e-12) on each side) — the ONE
    # zero-norm convention of the whole family (r13 ADVICE): every
    # numpy path (:func:`_pair_cosine_batch`, :func:`_batch_scores`,
    # :func:`normalized`, the IVF twins) floors each norm
    # individually, and flooring the PRODUCT instead diverged for
    # norms in (1e-12, 1e-6) — the product drops below the floor while
    # the per-norm path still returns the true cosine. An all-zero
    # embedding still scores ~0 instead of NaN (which Spark sorts
    # ABOVE every real score); identical for every vector with norm
    # ≥ 1e-12. Mirrored in :func:`cosine_sql` so engine and oracle
    # agree on degenerate rows.
    return dot(a, b) / (
        F.greatest(norm(a), F.lit(1e-12)) * F.greatest(norm(b), F.lit(1e-12))
    )


def normalized(a: Column) -> Column:
    """Unit-normalize once so downstream pair scoring is dot-only —
    turns O(pairs·3d) float work into O(N·d) + O(pairs·d). Zero-norm
    rows map to ~0 vectors (floored denominator), not NaN arrays."""
    n = F.greatest(norm(a), F.lit(1e-12))
    return F.transform(a, lambda x: x.cast("double") / n)


def brute_force_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine top-k neighbors of ``query_id`` (excluded itself).

    The 1-row query side is broadcast — a broadcast nested-loop join,
    i.e. one pass over the corpus regardless of cluster size.
    """
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qvec"))
    return (
        df.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(pair_cosine(F.col(vec_col), F.col("qvec")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def hyperplane_bucket(vec: Column, planes: np.ndarray | None = None) -> Column:
    """LSH bucket id: packed sign bits of ⟨vec, plane_i⟩."""
    planes = _hyperplanes() if planes is None else planes
    bucket = F.lit(0).cast("long")
    for i, plane in enumerate(planes):
        lits = F.array(*[F.lit(float(x)) for x in plane])
        bit = F.when(dot(vec, lits) >= 0, F.lit(2**i).cast("long")).otherwise(F.lit(0))
        bucket = bucket + bit
    return bucket


def lsh_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k: exact search restricted to the query's LSH bucket.

    Recall < 1 by construction (that's the trade); the bucket column is
    a deterministic expression, so results are stable and oracle-able.
    """
    with_bucket = df.withColumn("bucket", hyperplane_bucket(F.col(vec_col)))
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    return (
        with_bucket.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.col("bucket") == F.col("qbucket"))
        .select(
            F.col(id_col),
            F.round(pair_cosine(F.col(vec_col), F.col("qvec")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def lsh_multiprobe_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = LSH_N_PLANES,
) -> DataFrame:
    """Multi-probe LSH ANN top-k: search the query's bucket AND every
    Hamming-1 neighbor bucket (flip each sign bit once).

    The recall/cost knob between single-bucket LSH (fast, recall
    gaps) and brute force: vectors near a hyperplane land on either
    side, so probing the 1-bit-flip buckets recovers most misses for
    (n_planes+1)/2^n_planes of the brute-force cost. The probe set is
    a deterministic (n_planes+1)-element IN-list on the bucket column
    — still a scan-side filter (partition-prunable when the corpus is
    stored bucketed), never a shuffle. The bucket expression is built
    from the SAME ``n_planes`` hyperplanes the probe list flips — a
    mismatched plane count would probe buckets no vector occupies.
    """
    with_bucket = df.withColumn(
        "bucket",
        hyperplane_bucket(
            F.col(vec_col), _hyperplanes(n=n_planes)
        ),
    )
    q = with_bucket.filter(F.col(id_col) == query_id).select(
        F.col(vec_col).alias("qvec"), F.col("bucket").alias("qbucket")
    )
    probed = F.array(
        F.col("qbucket"), *[F.col("qbucket").bitwiseXOR(1 << i) for i in range(n_planes)]
    )
    return (
        with_bucket.filter(F.col(id_col) != query_id)
        .join(F.broadcast(q), F.array_contains(probed, F.col("bucket")))
        .select(
            F.col(id_col),
            F.round(pair_cosine(F.col(vec_col), F.col("qvec")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def lsh_similarity_join(
    left: DataFrame,
    right: DataFrame,
    threshold: float,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    n_planes: int = LSH_N_PLANES,
) -> DataFrame:
    """Approximate similarity JOIN of two corpora on embedding cosine —
    the two-table analog of the self-join near-dup family: for every
    (a, b) pair with cosine ≥ ``threshold`` that shares an LSH bucket,
    one row (id_a, id_b, cosine).

    Candidate generation is ONE equi-join on the hyperplane-LSH bucket
    (both sides bucketed by the same fixed planes) — never an
    all-pairs product; the exact-cosine verify runs only inside
    buckets. Recall < 1 by construction (pairs split by every
    hyperplane are missed) — the standard ANN-join trade.

    Scale shape: both corpora shuffle once on the bucket key (or the
    smaller side broadcasts under AQE), and per-bucket work is
    |A_bucket|·|B_bucket| — bounded by raising ``n_planes`` with corpus
    size (occupancy ~ N/2^bits), exactly the :func:`lsh_topk` knob. The
    verify is the Arrow-batched :func:`pair_cosine` (one numpy batch op
    per Arrow batch, no per-row Python).
    """
    planes = _hyperplanes(n=n_planes)
    a = left.select(
        F.col(id_col).alias("id_a"), F.col(vec_col).alias("va")
    ).withColumn("bucket", hyperplane_bucket(F.col("va"), planes))
    b = right.select(
        F.col(id_col).alias("id_b"), F.col(vec_col).alias("vb")
    ).withColumn("bucket", hyperplane_bucket(F.col("vb"), planes))
    # The threshold filter references the UDF output; a deterministic
    # UDF gets CLONED into the pushed-down filter (two ArrowEvalPython
    # stages = 2× the pair scoring and 2× the Arrow transfer of both
    # vectors). The nondeterministic twin — the expression IS
    # deterministic — pins one evaluation (plan-tested: 1 Python stage)
    # without mutating the shared ``pair_cosine`` instance.
    return (
        a.join(b, "bucket")
        .select(
            "id_a",
            "id_b",
            F.round(pair_cosine_once(F.col("va"), F.col("vb")), 6).alias("cosine"),
        )
        .filter(F.col("cosine") >= F.lit(float(threshold)))
    )


# ---- oracle-SQL generators -------------------------------------------------


def cosine_sql(a: str, b: str) -> str:
    """DuckDB cosine in double (list ops; rounded by callers to 6 dp).

    PER-NORM ``greatest(norm, 1e-12)`` floors mirror the engine's
    single zero-norm convention (:func:`cosine`,
    :func:`_pair_cosine_batch`, :func:`_batch_scores`,
    :func:`normalized` — r13 ADVICE unified the family on per-norm
    floors; the earlier product floor diverged for norms in
    (1e-12, 1e-6)): a zero embedding makes BOTH engines emit ~0
    instead of the oracle NaN-ing where the engine doesn't (r12
    ADVICE asymmetry) — identical for every vector with norm ≥ 1e-12,
    since each floored norm is then returned unchanged."""
    d = f"list_sum(list_transform(list_zip({a}, {b}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
    na = f"sqrt(list_sum(list_transform({a}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    nb = f"sqrt(list_sum(list_transform({b}, x -> CAST(x AS DOUBLE) * CAST(x AS DOUBLE))))"
    return f"({d} / (greatest({na}, 1e-12) * greatest({nb}, 1e-12)))"


def bucket_sql(vec: str, planes: np.ndarray | None = None) -> str:
    """DuckDB twin of :func:`hyperplane_bucket` (same plane constants)."""
    planes = _hyperplanes() if planes is None else planes
    terms = []
    for i, plane in enumerate(planes):
        arr = "[" + ", ".join(repr(float(x)) for x in plane) + "]"
        d = f"list_sum(list_transform(list_zip({vec}, {arr}), p -> CAST(p[1] AS DOUBLE) * CAST(p[2] AS DOUBLE)))"
        terms.append(f"(CASE WHEN {d} >= 0 THEN CAST({2**i} AS BIGINT) ELSE 0 END)")
    return "(" + " + ".join(terms) + ")"


# ---- IVF (inverted-file) ANN -----------------------------------------------

IVF_CENTROIDS = 16
IVF_PROBE = 4


def _centroids_from_sample(sample: np.ndarray, n_centroids: int) -> np.ndarray:
    """Pure-numpy codebook core, shared by the Spark path and the
    oracle's numpy twin so both see bit-identical centroids: seed with
    the first ``n_centroids`` rows, one Lloyd refinement under cosine
    (≈ spherical k-means iteration)."""
    # np.maximum(…, 1e-12): the family's zero-norm floor — a zero
    # sample vector (or an all-cancelling cluster mean) stays a ~0
    # vector instead of poisoning the codebook with NaNs. Identical
    # floats for every real vector, and shared verbatim by the Spark
    # path and the oracle twin (both call THIS function).
    sample = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    cents = sample[:n_centroids].copy()
    assign = np.argmax(sample @ cents.T, axis=1)
    for c in range(n_centroids):
        members = sample[assign == c]
        if len(members):
            m = members.mean(axis=0)
            cents[c] = m / np.maximum(np.linalg.norm(m), 1e-12)
    return cents


def _sample_matrix(
    df: DataFrame, vec_col: str, id_col: str, sample_rows: int
) -> np.ndarray:
    """The family's ONE bounded codebook-sample fetch: the
    ``sample_rows`` lowest-id vectors as a float64 matrix (driver-side
    numpy — the sample is capped, so this stays O(sample·dim)
    regardless of corpus size; at 100 TB the same recipe runs on a
    ``limit``-ed sample exactly like here). Shared by
    :func:`ivf_centroids` and :func:`pq_codebooks` so both codebooks
    derive from the SAME floats in one pull."""
    pdf = (
        df.orderBy(id_col)
        .limit(sample_rows)
        .select(vec_col)
        .toPandas()
    )
    return np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)


def ivf_centroids(
    df: DataFrame,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> np.ndarray:
    """Deterministic IVF codebook: seed with the ``n_centroids``
    lowest-id vectors, then one Lloyd refinement over the bounded
    id-ordered sample (:func:`_sample_matrix`)."""
    return _centroids_from_sample(
        _sample_matrix(df, vec_col, id_col, sample_rows), n_centroids
    )


# Memo for _twin_assignments, keyed by (path, mtime_ns, size, params):
# three oracle generators (_ivf_oracle, _ivf_recall_oracle via BOTH its
# twins) each replay the full parquet read + normalize + corpus x
# centroid matmul at module import — one derivation serves all, and the
# stat key makes a regenerated corpus at the same path re-derive.
_TWIN_CACHE: dict[tuple, tuple] = {}


def _twin_assignments(
    parquet_path: str,
    n_centroids: int,
    vec_col: str,
    id_col: str,
    sample_rows: int,
):
    """(ids, vecs, cents, assign) numpy twin of the stored index —
    replays :func:`ivf_centroids` + :func:`ivf_assign` straight from
    the parquet file (pyarrow, no Spark) with the same numpy ops on the
    same floats, so oracle generators can reproduce the index layout
    given only the codebook constants and the data."""
    import os

    import pyarrow.parquet as pq

    st = os.stat(parquet_path)
    key = (
        os.path.abspath(parquet_path), st.st_mtime_ns, st.st_size,
        n_centroids, vec_col, id_col, sample_rows,
    )
    hit = _TWIN_CACHE.get(key)
    if hit is not None:
        return hit

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col]).to_pandas()
    tbl = tbl.sort_values(id_col).reset_index(drop=True)
    ids = tbl[id_col].to_numpy()
    vecs = np.vstack(tbl[vec_col].to_numpy()).astype(np.float64)
    cents = _centroids_from_sample(vecs[:sample_rows], n_centroids)
    vn = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
    )
    assign = np.argmax(vn @ cents.T, axis=1).astype(np.int32)
    out = (ids, vecs, cents, assign)
    _TWIN_CACHE[key] = out
    return out


def ivf_assignments(
    parquet_path: str,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> list[tuple[int, int]]:
    """Numpy twin of the full (id, cluster) assignment of the stored
    IVF index — used to generate the DuckDB oracle for cluster-local
    operators (``semdedup_prune``): the oracle inlines this mapping and
    verifies the within-cluster logic in pure SQL."""
    ids, _, _, assign = _twin_assignments(
        parquet_path, n_centroids, vec_col, id_col, sample_rows
    )
    return [(int(i), int(c)) for i, c in zip(ids, assign)]


def ivf_candidate_ids(
    parquet_path: str,
    query_id: int,
    n_probe: int = IVF_PROBE,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> list[int]:
    """Numpy twin of the IVF candidate set — the probe selection on top
    of :func:`_twin_assignments`; generates the DuckDB oracle for
    ``ann_ivf_topk``."""
    ids, vecs, cents, assign = _twin_assignments(
        parquet_path, n_centroids, vec_col, id_col, sample_rows
    )
    qn = vecs[ids == query_id][0]
    qn = qn / np.maximum(np.linalg.norm(qn), 1e-12)
    probes = np.argsort(-(cents @ qn))[:n_probe]
    mask = np.isin(assign, probes) & (ids != query_id)
    return sorted(int(i) for i in ids[mask])


def ivf_probe_clusters(
    parquet_path: str,
    probe_mod: int = 100,
    n_probe: int = IVF_PROBE,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> list[tuple[int, int]]:
    """Numpy twin of the per-probe probed-cluster selection for the
    standard probe set (``id % probe_mod == 0``): one (qid, cluster)
    row per probed IVF cell — the same ``argsort(-(cents @ qn))``
    selection :func:`ivf_topk_indexed` runs per query, replayed
    straight from the parquet file for oracle generation (the
    assignment twin's sibling; used by ``ann_ivf_recall_report``)."""
    ids, vecs, cents, _ = _twin_assignments(
        parquet_path, n_centroids, vec_col, id_col, sample_rows
    )
    out = []
    for qid, v in zip(ids, vecs):
        if qid % probe_mod:
            continue
        qn = v / np.maximum(np.linalg.norm(v), 1e-12)
        for c in np.argsort(-(cents @ qn))[:n_probe]:
            out.append((int(qid), int(c)))
    return out


def ivf_assign(
    df: DataFrame,
    centroids: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(id, cluster, v): nearest-centroid assignment via one Arrow
    batch matmul per partition — the shuffle key that turns ANN search
    into per-cluster local work."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast(centroids)

    def assign(batches):
        cents = bc.value
        for batch in batches:
            v = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )
            yield pd.DataFrame(
                {
                    id_col: batch[id_col],
                    "cluster": np.argmax(vn @ cents.T, axis=1).astype(np.int32),
                    vec_col: batch[vec_col],
                }
            )

    src = df.select(id_col, vec_col)
    return src.mapInPandas(
        assign, schema=f"{id_col} long, cluster int, {vec_col} array<float>"
    )


def ivf_write_index(
    df: DataFrame,
    path: str,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> np.ndarray:
    """Materialize the IVF index as a cluster-partitioned parquet table.

    This is the claim :func:`ivf_topk` makes, made real: the corpus is
    written once partitioned by its nearest-centroid cluster, so every
    subsequent query scans ONLY its probed cluster directories
    (partition pruning at the file-index level — at 100 TB that's
    n_probe/n_centroids of the bytes). The codebook rides along as an
    underscore-prefixed JSON sidecar (ignored by parquet readers).
    """
    import json
    import os

    cents = ivf_centroids(df, n_centroids, vec_col=vec_col, id_col=id_col)
    assigned = ivf_assign(df, cents, vec_col=vec_col, id_col=id_col)
    (
        # Rebalance on the partition key before partitionBy (the r8
        # sliver-file audit, same fix as the train-gram index): the
        # assignment keeps the scan's partitioning, so a direct write
        # sprays every task into every cluster directory —
        # tasks×clusters tiny files that each probe then pays to list
        # and open. The REBALANCE hint lands each small cluster wholly
        # in one task (one file per directory) while AQE splits a
        # giant cluster across tasks at the advisory size — at 100 TB
        # a hot IVF cell never funnels through one writer the way
        # plain repartition("cluster") would, and its directory stays
        # prunable (several advisory-sized files, not one huge one).
        assigned.hint("rebalance", "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivf_centroids.json"), "w") as f:
        json.dump(cents.tolist(), f)
    return cents


def ivf_topk_indexed(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    n_probe: int = IVF_PROBE,
    exclude_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over a materialized IVF index: read ONLY the probed
    cluster partitions (pruned scan), score with the Arrow pair-cosine
    batch UDF, TakeOrderedAndProject the top k. No shuffle, no driver
    materialization — the scan is the n_probe/n_centroids slice."""
    import json
    import os

    with open(os.path.join(path, "_ivf_centroids.json")) as f:
        cents = np.array(json.load(f), dtype=np.float64)
    qn = np.asarray(query_vec, dtype=np.float64)
    qn = qn / np.maximum(np.linalg.norm(qn), 1e-12)
    probes = [int(c) for c in np.argsort(-(cents @ qn))[:n_probe]]
    qarr = F.array(*[F.lit(float(x)) for x in query_vec])
    idx = spark.read.parquet(path).filter(F.col("cluster").isin(probes))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    return (
        idx.select(
            F.col(id_col),
            F.round(pair_cosine(F.col(vec_col), qarr), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


def ivf_topk(
    df: DataFrame,
    query_id: int,
    k: int = 10,
    n_probe: int = IVF_PROBE,
    n_centroids: int = IVF_CENTROIDS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """IVF ANN top-k: search only the ``n_probe`` clusters nearest the
    query. Cost drops ~n_centroids/n_probe-fold vs brute force; recall
    is bounded by cluster quality (pinned in tests vs exact top-k).

    The cluster column is the partition key at scale: write the corpus
    bucketed by ``cluster`` once, and every query reads only its probed
    buckets (partition pruning on the scan).
    """
    cents = ivf_centroids(df, n_centroids, vec_col=vec_col, id_col=id_col)
    assigned = ivf_assign(df, cents, vec_col=vec_col, id_col=id_col)
    q = df.filter(F.col(id_col) == query_id).select(F.col(vec_col).alias("qv"))
    qvec = q.toPandas()["qv"].iloc[0]
    qn = np.asarray(qvec, dtype=np.float64)
    qn /= np.maximum(np.linalg.norm(qn), 1e-12)
    probes = np.argsort(-(cents @ qn))[:n_probe].tolist()
    return (
        assigned.filter(F.col("cluster").isin(probes) & (F.col(id_col) != query_id))
        .join(F.broadcast(q))
        .select(
            F.col(id_col),
            F.round(pair_cosine(F.col(vec_col), F.col("qv")), 6).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )


# ---------------------------------------------------------------------------
# IVF-PQ: product quantization on top of the IVF partitioning — the
# composition an actual 100 TB vector corpus serves ANN from (the IVF
# cell bounds the scan, the 8-byte PQ code bounds the bytes per
# scanned row, and only the shortlist ever touches a full vector).
# Reference parity: this is the public FAISS IndexIVFPQ recipe
# (Jégou et al. 2011, "Product Quantization for Nearest Neighbor
# Search") re-expressed as parquet partition pruning + a codegen'd
# lookup-table fold — no library, no UDF in the ADC path.
# ---------------------------------------------------------------------------

PQ_M = 8  # subspaces: 64-dim embeddings -> 8 sub-vectors of 8 dims
PQ_K = 16  # codes per subspace (4-bit codes; an 8-byte code per vector)
PQ_SHORTLIST = 50  # ADC shortlist size handed to the exact re-rank


def _pq_codebooks_from_sample(
    sample: np.ndarray, m: int = PQ_M, k: int = PQ_K
) -> np.ndarray:
    """Pure-numpy PQ codebook core — shared verbatim by the Spark
    index build and the oracle's parquet twin so both see bit-identical
    codebooks (the :func:`_centroids_from_sample` discipline). Rows are
    normalized first (PQ codes quantize the UNIT vector here — cosine
    is the family metric, so the reconstruction target is the
    normalized embedding, not the raw one), then each of the ``m``
    sub-spaces independently seeds with its first ``k`` sub-vectors
    and runs one Lloyd refinement under squared-L2."""
    sn = sample / np.maximum(
        np.linalg.norm(sample, axis=1, keepdims=True), 1e-12
    )
    d = sn.shape[1] // m
    books = np.empty((m, k, d), dtype=np.float64)
    for mi in range(m):
        sub = sn[:, mi * d : (mi + 1) * d]
        cb = sub[:k].copy()
        code = _pq_nearest_code(sub, cb)
        for c in range(k):
            members = sub[code == c]
            if len(members):
                cb[c] = members.mean(axis=0)
        books[mi] = cb
    return books


def _pq_nearest_code(sub: np.ndarray, cb: np.ndarray) -> np.ndarray:
    """argmin squared-L2 code per sub-vector row. One kernel for the
    codebook build, the Spark Arrow-batch encoder, and the oracle twin
    — np.argmin's first-minimum tie rule is deterministic given
    identical floats, and every caller feeds it identical floats."""
    d2 = ((sub[:, None, :] - cb[None, :, :]) ** 2).sum(axis=2)
    return np.argmin(d2, axis=1).astype(np.int32)


def _pq_encode(vn: np.ndarray, books: np.ndarray) -> np.ndarray:
    """(n, m) int32 code matrix for NORMALIZED vectors ``vn``."""
    m, _, d = books.shape
    codes = np.empty((len(vn), m), dtype=np.int32)
    for mi in range(m):
        codes[:, mi] = _pq_nearest_code(vn[:, mi * d : (mi + 1) * d], books[mi])
    return codes


def _pq_adc_lut(qn: np.ndarray, books: np.ndarray) -> list[float]:
    """Flat (m·k) asymmetric-distance lookup table for a NORMALIZED
    query: ``lut[mi*k + c]`` = the query sub-vector's dot product with
    code ``c`` of subspace ``mi``, so sum over subspaces of the looked-
    up entries ≈ cosine(query, vector). Python floats — the exact
    doubles the Spark expression embeds as literals AND the twin folds."""
    m, _, d = books.shape
    return [
        float(x)
        for mi in range(m)
        for x in books[mi] @ qn[mi * d : (mi + 1) * d]
    ]


def _pq_adc_fold(codes_row, lut: list[float], k: int = PQ_K) -> float:
    """Left-to-right IEEE-double fold of the LUT entries — the exact
    shape of the Spark ``aggregate`` expression (0.0 seed, sequential
    adds), so the twin's ADC scores are bit-identical to the engine's."""
    acc = 0.0
    for mi, c in enumerate(codes_row):
        acc += lut[mi * k + int(c)]
    return acc


def ivf_pq_write_index(
    df: DataFrame,
    path: str,
    n_centroids: int = IVF_CENTROIDS,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> tuple[np.ndarray, np.ndarray]:
    """Materialize the IVF-PQ index: one cluster-partitioned parquet
    table carrying BOTH the PQ code array and the raw vector, plus a
    JSON sidecar with the IVF centroids and PQ codebooks (both trained
    on the same bounded id-ordered driver sample in ONE pull).

    Co-locating codes and vectors in one table is deliberate: parquet
    is columnar, so the ADC pass reads ONLY (id, codes) — the compact
    representation PQ exists for — while the exact re-rank reads
    (id, vector) for shortlist ids under the same partition pruning.
    Two pruned scans of one index, no second artifact to keep in sync.
    Write shape is :func:`ivf_write_index`'s rebalance-then-partitionBy
    (no sliver files, no hot-cell writer funnel)."""
    import json
    import os

    import pandas as pd

    sample = _sample_matrix(df, vec_col, id_col, sample_rows)
    cents = _centroids_from_sample(sample, n_centroids)
    books = _pq_codebooks_from_sample(sample, m, k)
    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((cents, books))

    def assign(batches):
        cts, bks = bc.value
        for batch in batches:
            v = np.vstack(batch[vec_col].to_numpy()).astype(np.float64)
            vn = v / np.maximum(
                np.linalg.norm(v, axis=1, keepdims=True), 1e-12
            )
            yield pd.DataFrame(
                {
                    id_col: batch[id_col],
                    "cluster": np.argmax(vn @ cts.T, axis=1).astype(np.int32),
                    "codes": list(_pq_encode(vn, bks)),
                    vec_col: batch[vec_col],
                }
            )

    encoded = df.select(id_col, vec_col).mapInPandas(
        assign,
        schema=(
            f"{id_col} long, cluster int, codes array<int>, "
            f"{vec_col} array<float>"
        ),
    )
    (
        encoded.hint("rebalance", "cluster")
        .write.mode("overwrite")
        .partitionBy("cluster")
        .parquet(path)
    )
    with open(os.path.join(path, "_ivf_pq_codebooks.json"), "w") as f:
        json.dump(
            {"centroids": cents.tolist(), "pq_codebooks": books.tolist()}, f
        )
    return cents, books


def pq_adc_shortlist(
    spark,
    path: str,
    qn: np.ndarray,
    books: np.ndarray,
    probes: list[int],
    shortlist: int = PQ_SHORTLIST,
    exclude_id: int | None = None,
    id_col: str = "vec_id",
) -> DataFrame:
    """Stage 2 of the IVF-PQ serve path as a standalone relation: the
    ADC top-``shortlist`` over the probed cells. The LUT is a
    (m·k)-double array LITERAL and the score is a codegen'd
    ``aggregate`` fold over the stored code array — the scan reads
    ONLY (id, codes) of the probed partitions (plan-pinned in
    tests/test_plans.py: no embedding column, no shuffle,
    TakeOrderedAndProject)."""
    m = books.shape[0]
    k = books.shape[1]
    lut_col = F.array(*[F.lit(v) for v in _pq_adc_lut(qn, books)])
    adc = F.aggregate(
        F.zip_with(
            F.col("codes"),
            F.sequence(F.lit(0), F.lit(m - 1)),
            lambda c, mi: F.element_at(lut_col, mi * k + c + 1),
        ),
        F.lit(0.0),
        lambda acc, x: acc + x,
    )
    idx = spark.read.parquet(path).filter(F.col("cluster").isin(probes))
    if exclude_id is not None:
        idx = idx.filter(F.col(id_col) != exclude_id)
    return (
        idx.select(F.col(id_col), adc.alias("adc_score"))
        .orderBy(F.desc("adc_score"), F.col(id_col))
        .limit(shortlist)
    )


def ivf_pq_topk_indexed(
    spark,
    path: str,
    query_vec,
    k: int = 10,
    n_probe: int = IVF_PROBE,
    shortlist: int = PQ_SHORTLIST,
    exclude_id: int | None = None,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """ANN top-k over a materialized IVF-PQ index, the three-stage
    serve path of a production vector store:

    1. **Probe** — rank IVF cells against the query on the driver
       (codebook-sized argsort) and scan only those partitions.
    2. **ADC** — approximate every scanned row's cosine as a sum of
       ``PQ_M`` lookup-table entries. The LUT is a (m·k)-double array
       LITERAL and the sum is a codegen'd ``aggregate`` fold over the
       stored code array — JVM expression, no Python, and the scan
       reads only the code column (column pruning does PQ's memory
       job). Top-``shortlist`` by ADC via TakeOrderedAndProject.
    3. **Re-rank** — fetch full vectors for the shortlist ids only
       (pushed-down IN filter over the same probed partitions), exact
       Arrow pair-cosine, TakeOrderedAndProject the final ``k``.

    No shuffle anywhere; the only driver materialization is the
    ``shortlist``-bounded id list between stages 2 and 3."""
    import json
    import os

    with open(os.path.join(path, "_ivf_pq_codebooks.json")) as f:
        side = json.load(f)
    cents = np.array(side["centroids"], dtype=np.float64)
    books = np.array(side["pq_codebooks"], dtype=np.float64)
    qn = np.asarray(query_vec, dtype=np.float64)
    qn = qn / np.maximum(np.linalg.norm(qn), 1e-12)
    probes = [int(c) for c in np.argsort(-(cents @ qn))[:n_probe]]
    short = pq_adc_shortlist(
        spark, path, qn, books, probes,
        shortlist=shortlist, exclude_id=exclude_id, id_col=id_col,
    )
    # Bounded by construction: exactly `shortlist` rows cross the
    # driver so the re-rank scan gets a PUSHED-DOWN id filter (a join
    # would scan-and-probe instead of pruning row groups).
    rows = short.collect()
    by_id = {r[id_col]: r["adc_score"] for r in rows}
    ids = sorted(by_id)
    adc_rel = F.create_map(
        *[F.lit(x) for i in ids for x in (i, by_id[i])]
    )
    rerank = (
        spark.read.parquet(path)
        .filter(F.col("cluster").isin(probes) & F.col(id_col).isin(ids))
        .select(
            F.col(id_col),
            # Raw double (the twin's exact bits inline into the
            # oracle; the comparator rounds) — the family's raw-
            # quotient rule, engine round() differs per engine.
            adc_rel[F.col(id_col)].alias("adc_score"),
            F.round(
                pair_cosine(
                    F.col(vec_col),
                    F.array(*[F.lit(float(x)) for x in query_vec]),
                ),
                6,
            ).alias("score"),
        )
        .orderBy(F.desc("score"), F.col(id_col))
        .limit(k)
    )
    return rerank


def _pq_reconstruct(codes: np.ndarray, books: np.ndarray) -> np.ndarray:
    """Decode an (n, m) code matrix back to (n, dim) approximate unit
    vectors — one codebook gather per subspace. ADC(candidate, query)
    is exactly ``reconstruct(codes) · qn``, so one reconstruction
    serves EVERY query at once (the multi-probe audit's batch path)."""
    m = books.shape[0]
    return np.concatenate(
        [books[mi][codes[:, mi]] for mi in range(m)], axis=1
    )


def _pq_pair_adc_batch(
    codes: np.ndarray, qn_rows: np.ndarray, books: np.ndarray
) -> np.ndarray:
    """Row-wise ADC for (candidate, query) PAIRS: reconstruct each
    row's code and dot it with its own (already-normalized) query row.
    THE single float kernel of the PQ audit path — the Spark Arrow
    stage and the oracle's numpy twin both call THIS, so their raw
    doubles are bit-identical (the ``_batch_scores`` discipline)."""
    rec = _pq_reconstruct(codes, books)
    return np.einsum("ij,ij->i", rec, qn_rows)


def ivf_pq_probe_pairs(
    parquet_path: str,
    probe_mod: int = 100,
    n_probe: int = IVF_PROBE,
    shortlist: int = PQ_SHORTLIST,
    n_centroids: int = IVF_CENTROIDS,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> list[tuple[int, int]]:
    """Numpy twin of the PQ-ADC candidate stage over the standard
    probe set (``id % probe_mod == 0``): for each probe, its probed
    IVF cells' members scored by :func:`_pq_pair_adc_batch` and cut to
    the per-probe top-``shortlist`` — one (qid, nbr) row per surviving
    candidate, replayed straight from the parquet file through the
    SAME kernels the engine's Arrow stage runs (oracle generation for
    ``ann_ivf_pq_recall_report``)."""
    ids, vecs, cents, assign = _twin_assignments(
        parquet_path, n_centroids, vec_col, id_col, sample_rows
    )
    books = _pq_codebooks_from_sample(vecs[:sample_rows], m, k)
    vn = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
    )
    codes = _pq_encode(vn, books)
    out: list[tuple[int, int]] = []
    for qid, v in zip(ids, vecs):
        if qid % probe_mod:
            continue
        qn = v / np.maximum(np.linalg.norm(v), 1e-12)
        cells = np.argsort(-(cents @ qn))[:n_probe]
        mask = np.isin(assign, cells) & (ids != qid)
        cand_ids = ids[mask]
        qn_rows = np.repeat(qn[None, :], len(cand_ids), axis=0)
        adc = _pq_pair_adc_batch(codes[mask], qn_rows, books)
        order = sorted(
            zip(cand_ids, adc), key=lambda t: (-t[1], t[0])
        )[:shortlist]
        out.extend((int(qid), int(i)) for i, _ in order)
    return out


def pq_adc_pairs(
    joined: DataFrame,
    books: np.ndarray,
    probe_bc,
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, nbr, adc) for (candidate, probe) PAIR rows — one Arrow
    batch per partition gathers each row's probe vector from the
    broadcast probe matrix (the shared ``_probe_matrix_broadcast``
    eval-set contract) and scores through
    :func:`_pq_pair_adc_batch`. Input rows: (qid, ``id_col``, codes)
    — the probed-cell equi-join output."""
    import pandas as pd

    bcb = joined.sparkSession.sparkContext.broadcast(books)

    def score(batches):
        qids, qnt = probe_bc.value
        qn_all = qnt.T
        pos = {int(q): i for i, q in enumerate(qids)}
        bks = bcb.value
        for b in batches:
            if not len(b):
                continue
            codes = np.vstack(b["codes"].to_numpy()).astype(np.int32)
            qn_rows = qn_all[[pos[int(q)] for q in b["qid"]]]
            yield pd.DataFrame(
                {
                    "qid": b["qid"],
                    "nbr": b[id_col],
                    "adc": _pq_pair_adc_batch(codes, qn_rows, bks),
                }
            )

    return joined.select("qid", id_col, "codes").mapInPandas(
        score, schema="qid long, nbr long, adc double"
    )


def ivf_pq_shortlist(
    parquet_path: str,
    query_id: int,
    n_probe: int = IVF_PROBE,
    shortlist: int = PQ_SHORTLIST,
    n_centroids: int = IVF_CENTROIDS,
    m: int = PQ_M,
    k: int = PQ_K,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = 2048,
) -> list[tuple[int, float]]:
    """Numpy twin of the engine's ADC shortlist — (vec_id, adc_score)
    pairs in shortlist order, replayed straight from the parquet file
    (pyarrow, no Spark) through the SAME kernels the index build and
    serve path use (:func:`_pq_codebooks_from_sample`,
    :func:`_pq_encode`, :func:`_pq_adc_lut`, :func:`_pq_adc_fold`), so
    oracle generators can inline the exact shortlist the engine's
    literal-LUT fold produces. The cut orders by raw ADC double DESC
    with the id tiebreak — both sides fold identical IEEE doubles in
    the same order, so no rounding is needed for the cut to agree."""
    ids, vecs, cents, assign = _twin_assignments(
        parquet_path, n_centroids, vec_col, id_col, sample_rows
    )
    books = _pq_codebooks_from_sample(vecs[:sample_rows], m, k)
    vn = vecs / np.maximum(
        np.linalg.norm(vecs, axis=1, keepdims=True), 1e-12
    )
    codes = _pq_encode(vn, books)
    qn = vn[ids == query_id][0]
    probes = np.argsort(-(cents @ qn))[:n_probe]
    mask = np.isin(assign, probes) & (ids != query_id)
    lut = _pq_adc_lut(qn, books)
    scored = sorted(
        ((int(i), _pq_adc_fold(c, lut, k)) for i, c in
         zip(ids[mask], codes[mask])),
        key=lambda t: (-t[1], t[0]),
    )
    return scored[:shortlist]


def _probe_matrix_broadcast(corpus, queries, vec_col, id_col):
    """Collect the BOUNDED probe relation into one normalized matrix
    and broadcast ``(qids, Qn.T)`` — the shared eval-set contract of
    :func:`knn_join` and :func:`score_all_probes`. None for an empty
    probe set (callers return an empty relation instead of crashing a
    vstack on the driver)."""
    qpdf = queries.select(id_col, vec_col).toPandas()  # bounded by contract
    if qpdf.empty:
        return None
    qids = qpdf[id_col].to_numpy()
    Q = np.vstack(qpdf[vec_col].to_numpy()).astype(np.float64)
    Qn = Q / np.maximum(np.linalg.norm(Q, axis=1, keepdims=True), 1e-12)
    return corpus.sparkSession.sparkContext.broadcast((qids, Qn.T))


def _batch_scores(pdf, vec_col, id_col, QnT):
    """Normalize one Arrow batch and score it against the broadcast
    probe matrix — THE single float path every bounded-probe consumer
    shares (float64 upcast, 1e-12 zero-norm floor, one BLAS matmul,
    6-dp round). knn_join's stats and score_all_probes' bulk relation
    are 'identical floats by construction' BECAUSE both call this —
    a rounding/floor/dtype change here moves both in lockstep (r13
    review: two hand-synced copies made that invariant maintenance-
    fragile). Returns (corpus ids, corpus-batch × queries scores)."""
    C = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    Cn = C / np.maximum(np.linalg.norm(C, axis=1, keepdims=True), 1e-12)
    return pdf[id_col].to_numpy(), np.round(Cn @ QnT, 6)


def knn_join(
    corpus: DataFrame,
    queries: DataFrame,
    k: int = 3,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Exact cosine k-NN JOIN: for every query vector, the top-k
    corpus neighbors — (qid, nbr, score, rank). The batch-retrieval /
    eval-set workload (N probes at once), vs the single-vector
    :func:`brute_force_topk`.

    Scale shape: ``queries`` must be a bounded probe/eval relation —
    it is collected into ONE dense matrix and broadcast (the same
    bounded-driver-sample contract as the IVF codebook); the corpus
    streams through ``mapInPandas`` exactly once — no corpus shuffle,
    one BLAS matmul per Arrow batch — and only the per-partition
    top-k rows (≤ queries·k per partition) leave a task. The global
    top-k is one window over queries·k·partitions rows. Scores are
    rounded to 6 dp BEFORE ranking so the (score desc, nbr) order —
    and therefore the k-cut — is reproducible across engines.
    """
    from pyspark.sql import Window as W

    from etl_projects_spark.operators.exec_util import fan_out

    bq = _probe_matrix_broadcast(corpus, queries, vec_col, id_col)
    if bq is None:
        # An empty probe set is an empty result, not a vstack crash on
        # the driver (and pd.concat([]) crashes in every task).
        spark = corpus.sparkSession
        return spark.createDataFrame(
            [], "qid long, nbr long, score double, rank int"
        )

    def part(batches):
        qids, QnT = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids, S = _batch_scores(pdf, vec_col, id_col, QnT)
            frames = []
            for j, qid in enumerate(qids):
                mask = ids != qid  # a query is never its own neighbor
                s, cids = S[mask, j], ids[mask]
                top = np.lexsort((cids, -s))[:k]
                frames.append(
                    pd.DataFrame({"qid": qid, "nbr": cids[top], "score": s[top]})
                )
            yield pd.concat(frames, ignore_index=True)

    partial = fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        part, "qid long, nbr long, score double"
    )
    w = W.partitionBy("qid").orderBy(F.desc("score"), F.asc("nbr"))
    return (
        partial.withColumn("rank", F.row_number().over(w))
        .filter(F.col("rank") <= k)
    )


def score_all_probes(
    corpus: DataFrame,
    queries: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """(qid, nbr, score) for EVERY (probe, corpus) pair — the full
    score relation behind the margin/crowding audits
    (``embedding_margin_report``), where :func:`knn_join` keeps only
    the top-k cut of the same scores.

    Identical floats to :func:`knn_join` BY CONSTRUCTION — both score
    through the ONE shared kernel (:func:`_probe_matrix_broadcast` +
    :func:`_batch_scores`), so a report can compare this relation
    against knn_join's k-cut without cross-path rounding seams, and a
    future float change moves both consumers in lockstep.

    Scale shape: ``queries`` is a bounded probe/eval relation by the
    family contract — collected into ONE broadcast matrix; the corpus
    streams through ``mapInPandas`` exactly once (one BLAS matmul per
    Arrow batch, no corpus shuffle, no window). Output is
    probes × corpus rows — LINEAR in the corpus for a bounded probe
    set; downstream consumers aggregate it with map-side partial aggs.
    """
    bq = _probe_matrix_broadcast(corpus, queries, vec_col, id_col)
    if bq is None:
        return corpus.sparkSession.createDataFrame(
            [], "qid long, nbr long, score double"
        )

    def part(batches):
        qids, QnT = bq.value
        for pdf in batches:
            if pdf.empty:
                continue
            ids, S = _batch_scores(pdf, vec_col, id_col, QnT)
            frames = []
            for j, qid in enumerate(qids):
                mask = ids != qid  # a probe never scores itself
                frames.append(
                    pd.DataFrame(
                        {"qid": qid, "nbr": ids[mask], "score": S[mask, j]}
                    )
                )
            yield pd.concat(frames, ignore_index=True)

    from etl_projects_spark.operators.exec_util import fan_out

    return fan_out(corpus.select(id_col, vec_col)).mapInPandas(
        part, "qid long, nbr long, score double"
    )


# ---- embedding-space admission check ----------------------------------------

# Default probe draw: Knuth's multiplicative constant with a prime
# modulus (NOT queries_mixing's 1e6 modulus — a prime keeps the draw
# uniform-ish for structured id spaces). The id is reduced mod the
# prime BEFORE the multiply so the product tops out at
# (MOD−1)·MULT ≈ 2.65e18 < 2^63 — exact for ANY int64 id (r14
# review: the unreduced multiply wrapped silently for ids above
# ~3.5e9, e.g. snowflake ids). Deterministic across runs and
# partitionings, unlike rand()/TABLESAMPLE.
_PROBE_HASH_MULT = 2_654_435_761
_PROBE_HASH_MOD = 1_000_000_007


def margin_report(
    df: DataFrame,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    k: int = 10,
    probes: DataFrame | None = None,
    n_probes: int = 20,
) -> DataFrame:
    """Relative-contrast admission check for ANY embedding column —
    run this BEFORE building an ANN index or keying SemDeDup decisions
    on a new corpus (SCALE.md §"ANN recall is data-bounded" prescribes
    it; r13 VERDICT item 1 made it an engine API instead of a fixture
    query). Per probe: the exact top-1 / top-``k`` cosine scores, the
    probe's BULK score moments against the whole corpus, and
    ``z_margin`` — how many bulk standard deviations the k-th TRUE
    neighbor stands above the bulk mean. z ≳ 6-7 → the space is
    index-able (partition-and-prune ANN will reach high recall);
    z ≲ 3 → the k-th neighbor sits inside the bulk's upper tail and
    ANY pruning index degenerates toward linear scan.

    ``probes``: a BOUNDED probe relation (same broadcast contract as
    :func:`knn_join`); when None, a deterministic ``n_probes``-row
    draw is taken — the rows with the smallest Knuth multiplicative
    hash of ``id_col`` (uniform-ish, reproducible across runs and
    partitionings, one TakeOrderedAndProject pass — never a rand()
    sample). ``id_col`` must be INTEGRAL (``ValueError`` otherwise):
    the default draw hashes it as an integer AND the shared knn
    kernel's Arrow schema is ``qid long`` — encode string ids to a
    long surrogate key before calling.

    Determinism shape (the wave31 discipline): bulk moments accumulate
    as EXACT integer sums of 1e6-scaled 6-dp-rounded scores, widened
    to decimal(19,0) BEFORE the square so nothing wraps below ~1e38;
    mean/std/z are each one float expression over those exact
    integers. The variance is clamped at 0.0 before the sqrt (r13
    ADVICE): for a probe with (near-)constant scores the exact-integer
    subtraction can round to a tiny NEGATIVE double (s² ~ 1e20 has ULP
    ~ 1e4, comparable to the smallest nonzero integer variance), and
    an unclamped sqrt yields NaN — which Spark's ``NaN > 0.0`` treats
    as TRUE, emitting z = NaN instead of the intended 0.0 fallback —
    exactly on the near-dup-heavy corpus class this audit targets.

    Scale shape: the top-k side is the bounded-probe
    :func:`knn_join`; the bulk side is :func:`score_all_probes` — the
    SAME broadcast-matrix / Arrow-BLAS corpus pass without the k-cut
    (identical floats by construction). probes × corpus rows flow into
    a map-side partial aggregate keyed by probe id — no corpus
    shuffle, nothing quadratic. At 100 TB run it over a corpus SAMPLE
    per the SCALE.md sampling contract (z's standard error shrinks as
    1/sqrt(rows-per-probe); ~1e5 sampled rows pin z to two decimals).
    """
    from pyspark.sql.types import ByteType, IntegerType, LongType, ShortType

    id_type = df.schema[id_col].dataType
    if not isinstance(id_type, (ByteType, ShortType, IntegerType, LongType)):
        # Fail LOUDLY (the repo convention — dsir_select's packing
        # guard, wave29's token-UB pre-check): a non-integral id nulls
        # out under the default draw's cast('long') — probe_key becomes
        # NULL for every row and NULLS-FIRST ordering silently turns
        # the "deterministic uniform draw" into first-n-by-null — and
        # even with explicit probes the knn_join/score_all_probes
        # kernel's 'qid long' Arrow schema rejects it mid-job with an
        # opaque serializer error.
        raise ValueError(
            f"margin_report requires an integral id_col (the knn_join "
            f"kernel emits 'qid long' and the default probe draw hashes "
            f"the id as an integer), but id_col={id_col!r} has type "
            f"{id_type.simpleString()}; encode the id to a long first "
            "(e.g. a monotonically-increasing or hashed surrogate key), "
            "then pass probes= if a custom draw is wanted"
        )
    if probes is None:
        probe_key = F.pmod(
            F.pmod(F.col(id_col).cast("long"), F.lit(_PROBE_HASH_MOD))
            * F.lit(_PROBE_HASH_MULT),
            F.lit(_PROBE_HASH_MOD),
        )
        draw = (
            df.select(id_col, vec_col)
            .orderBy(probe_key.asc(), F.col(id_col).asc())
            .limit(n_probes)
        )
        # ONE corpus pass for the draw (r14 review: handing the LAZY
        # draw to knn_join and score_all_probes re-ran the bounded
        # TakeOrderedAndProject corpus scan twice — once per
        # consumer's probe collect). The n_probes rows are collected
        # here once (bounded by construction) and both consumers get
        # a local relation whose collect is free.
        pdf = draw.toPandas()
        pdf[vec_col] = pdf[vec_col].map(list)
        probes = df.sparkSession.createDataFrame(pdf, schema=draw.schema)
    topk = knn_join(df, probes, k=k, vec_col=vec_col, id_col=id_col)
    stats = topk.groupBy("qid").agg(
        F.max("score").alias("s1"), F.min("score").alias("sk")
    )
    scored = score_all_probes(df, probes, vec_col=vec_col, id_col=id_col)
    e6 = F.round(F.col("score") * 1000000, 0).cast("decimal(19,0)")
    bulk = scored.groupBy("qid").agg(
        F.count("*").cast("long").alias("n_scored"),
        F.sum(e6).alias("s_e6"),
        F.sum(e6 * e6).alias("ss_e12"),
    )
    n_d = F.col("n_scored").cast("double")
    s_d = F.col("s_e6").cast("double")
    ss_d = F.col("ss_e12").cast("double")
    mean = (s_d / n_d) / F.lit(1000000.0)
    var = F.greatest((ss_d - (s_d * s_d) / n_d) / n_d, F.lit(0.0))
    std = F.sqrt(var) / F.lit(1000000.0)
    return bulk.join(F.broadcast(stats), "qid").select(
        "qid",
        "n_scored",
        F.col("s1").alias("top1_score"),
        F.col("sk").alias("topk_score"),
        mean.alias("bulk_mean"),
        std.alias("bulk_std"),
        F.when(std > 0.0, (F.col("sk") - mean) / std)
        .otherwise(F.lit(0.0))
        .alias("z_margin"),
    )


# ---- PCA projection (dimensionality reduction) -----------------------------

PCA_COMPONENTS = 4
PCA_SAMPLE_ROWS = 2048


def _pca_from_sample(sample: np.ndarray, k: int) -> tuple[np.ndarray, np.ndarray]:
    """(mean, 64×k eigenbasis) from a sample matrix — the shared numpy
    core of the Spark path and the oracle twin (identical ops on
    identical floats → identical basis). Eigenvector sign is fixed by
    making each column's max-|x| component positive, so the basis is
    fully deterministic."""
    mu = sample.mean(axis=0)
    cov = np.cov(sample.T, bias=True)
    w, vecs = np.linalg.eigh(cov)
    vecs = vecs[:, np.argsort(-w)][:, :k]
    for j in range(vecs.shape[1]):
        i = np.argmax(np.abs(vecs[:, j]))
        if vecs[i, j] < 0:
            vecs[:, j] = -vecs[:, j]
    return mu, vecs


def pca_basis(
    df: DataFrame,
    k: int = PCA_COMPONENTS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = PCA_SAMPLE_ROWS,
) -> tuple[np.ndarray, np.ndarray]:
    """PCA basis from a BOUNDED id-ordered driver sample (same
    documented contract as :func:`ivf_centroids`): O(sample·dim²)
    driver work regardless of corpus size — at 100 TB the same recipe
    runs on the same capped sample."""
    pdf = df.orderBy(id_col).limit(sample_rows).select(vec_col).toPandas()
    sample = np.vstack(pdf[vec_col].to_numpy()).astype(np.float64)
    return _pca_from_sample(sample, k)


def pca_basis_twin(
    parquet_path: str,
    k: int = PCA_COMPONENTS,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
    sample_rows: int = PCA_SAMPLE_ROWS,
) -> tuple[np.ndarray, np.ndarray]:
    """Numpy twin of :func:`pca_basis` straight from the parquet file
    (pyarrow, no Spark) — oracle generators inline the resulting mean
    and basis as SQL constants."""
    import pyarrow.parquet as pq

    tbl = pq.read_table(parquet_path, columns=[id_col, vec_col]).to_pandas()
    tbl = tbl.sort_values(id_col).reset_index(drop=True)
    sample = np.vstack(tbl[vec_col].to_numpy()[:sample_rows]).astype(np.float64)
    return _pca_from_sample(sample, k)


def pca_project(
    df: DataFrame,
    mu: np.ndarray,
    basis: np.ndarray,
    vec_col: str = "embedding",
    id_col: str = "vec_id",
) -> DataFrame:
    """Project every vector onto the PCA basis: one broadcast of the
    (dim + dim×k) constants, one BLAS matmul per Arrow batch, rounded
    to 6 dp. Output (id, p1..pk) — the 16× storage cut (64-d float32 →
    4-d) that precedes coarse clustering / visualization / cheap
    prefiltering at corpus scale."""
    import pandas as pd

    spark = df.sparkSession
    bc = spark.sparkContext.broadcast((mu, basis))
    k = basis.shape[1]

    def run(batches):
        m, e = bc.value
        for b in batches:
            v = np.vstack(b[vec_col].to_numpy()).astype(np.float64)
            p = np.round((v - m) @ e, 6)
            out = {id_col: b[id_col]}
            for j in range(k):
                out[f"p{j + 1}"] = p[:, j]
            yield pd.DataFrame(out)

    schema = f"{id_col} long, " + ", ".join(
        f"p{j + 1} double" for j in range(k)
    )
    return df.select(id_col, vec_col).mapInPandas(run, schema=schema)
