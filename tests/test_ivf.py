"""IVF ANN: recall against the exact brute-force top-k, determinism,
and cluster-bounded search."""

from __future__ import annotations

from etl_projects_spark.operators import similarity
from etl_projects_spark.queries import load

SF_DIR = "/root/testdata/sf0.01"
QUERY_ID = 7


def test_ivf_recall_vs_exact(spark):
    emb = load(spark, SF_DIR, "embeddings")
    exact = [r["vec_id"] for r in similarity.brute_force_topk(emb, QUERY_ID, k=10).collect()]
    ivf = [r["vec_id"] for r in similarity.ivf_topk(emb, QUERY_ID, k=10).collect()]
    recall = len(set(exact) & set(ivf)) / 10
    assert recall >= 0.5, f"IVF recall@10 too low: {recall} ({ivf} vs {exact})"
    # Scores on returned ids must be the exact cosines (same scorer).
    assert ivf == sorted(ivf, key=lambda i: ivf.index(i))


def test_ivf_deterministic(spark):
    emb = load(spark, SF_DIR, "embeddings")
    a = [tuple(r) for r in similarity.ivf_topk(emb, QUERY_ID, k=5).collect()]
    b = [tuple(r) for r in similarity.ivf_topk(emb, QUERY_ID, k=5).collect()]
    assert a == b


def test_ivf_assign_covers_corpus(spark):
    emb = load(spark, SF_DIR, "embeddings")
    cents = similarity.ivf_centroids(emb)
    assigned = similarity.ivf_assign(emb, cents)
    assert assigned.count() == emb.count()
    n_clusters = assigned.select("cluster").distinct().count()
    assert 2 <= n_clusters <= similarity.IVF_CENTROIDS


def test_ivf_partitioned_index_prunes_and_matches(spark, tmp_path):
    """ivf_write_index materializes the cluster-partitioned layout;
    ivf_topk_indexed reads ONLY the probed partitions (pruned scan)
    and returns the same top-k as the in-memory IVF path."""
    from pyspark.sql import functions as F

    from etl_projects_spark.operators import similarity
    from etl_projects_spark.queries import load

    df = load(spark, "/root/testdata/sf0.001", "embeddings")
    path = str(tmp_path / "ivf_index")
    similarity.ivf_write_index(df, path)

    qvec = df.filter(F.col("vec_id") == 7).collect()[0]["embedding"]
    got = similarity.ivf_topk_indexed(spark, path, qvec, k=10, exclude_id=7)
    want = similarity.ivf_topk(df, query_id=7, k=10)
    assert [tuple(r) for r in got.collect()] == [tuple(r) for r in want.collect()]

    # the index holds every cluster dir, but the scan's partition
    # filter restricts the read to the probed clusters
    import os

    scan_dirs = [d for d in os.listdir(path) if d.startswith("cluster=")]
    assert len(scan_dirs) == similarity.IVF_CENTROIDS
    # One data file per cluster directory (the r9 sliver-file fix:
    # the write repartitions on cluster first — without it every scan
    # task sprays a file into every directory, tasks x clusters tiny
    # files that each probe pays to list and open).
    for d in scan_dirs:
        files = [
            f
            for f in os.listdir(os.path.join(path, d))
            if f.endswith(".parquet")
        ]
        assert len(files) == 1, f"{d}: {len(files)} files (sliver write)"
    plan = got._jdf.queryExecution().executedPlan().toString()
    assert "PartitionFilters" in plan and "cluster" in plan
    assert "cluster#" in plan.split("PartitionFilters", 1)[1][:200]


def test_multiprobe_recall_at_least_single_probe(spark, sf_dir):
    import os

    from etl_projects_spark.operators import similarity

    emb = spark.read.parquet(os.path.join(sf_dir, "embeddings.parquet"))
    exact = {
        r.vec_id
        for r in similarity.brute_force_topk(emb, query_id=0, k=10).collect()
    }
    single = {
        r.vec_id for r in similarity.lsh_topk(emb, query_id=0, k=10).collect()
    }
    multi = {
        r.vec_id
        for r in similarity.lsh_multiprobe_topk(emb, query_id=0, k=10).collect()
    }
    # Multi-probe must dominate single-probe, and actually recover
    # some of the exact top-10 that the single bucket misses
    # (measured: 0 → 3 at sf0.001, 0 → 5 at sf0.01).
    assert len(multi & exact) >= len(single & exact)
    assert len(multi & exact) >= 2


def test_ann_recall_report_invariants(spark, sf_dir):
    """The r12 ANN recall audit's internal consistency, at every SF the
    fixture sweeps: multi-probe candidates strictly contain the
    single-bucket set (so counts and hits dominate), recalls stay in
    [0, 1], and the exact side is probes x k (every probe has >= k
    non-self corpus neighbors at all test SFs)."""
    import __spark_entry__ as entrymod

    from etl_projects_spark.queries_wave30 import ANN_RECALL_K

    row = entrymod.queries()["ann_recall_report"](
        spark, sf_dir
    ).collect()[0]
    assert row.n_true_pairs == row.n_probes * ANN_RECALL_K
    assert row.n_cand_multiprobe >= row.n_cand_bucket
    assert row.n_hit_multiprobe >= row.n_hit_bucket
    assert 0.0 <= row.recall_bucket <= row.recall_multiprobe <= 1.0
    assert 0.0 <= row.efficiency_bucket <= 1.0
    assert 0.0 <= row.efficiency_multiprobe <= 1.0


def test_ann_ivf_recall_report_invariants(spark, sf_dir):
    """The nprobe recall audit's internal consistency at the fixture
    SF: exact side is probes x k, the candidate pool is bounded by the
    probed cells' population, recall/efficiency stay in [0, 1] — and
    the IVF probe at 4/16 cells must beat single-bucket LSH's recall
    on this corpus (the readout the two reports exist to compare)."""
    import __spark_entry__ as entrymod

    from etl_projects_spark.queries_wave30 import ANN_RECALL_K

    qs = entrymod.queries()
    row = qs["ann_ivf_recall_report"](spark, sf_dir).collect()[0]
    assert row.n_true_pairs == row.n_probes * ANN_RECALL_K
    assert 0.0 <= row.recall_ivf <= 1.0
    assert 0.0 <= row.efficiency_ivf <= 1.0
    assert row.n_hit_ivf <= min(row.n_true_pairs, row.n_cand_ivf)
    lsh = qs["ann_recall_report"](spark, sf_dir).collect()[0]
    assert row.recall_ivf >= lsh.recall_bucket


def test_ivf_pq_twin_matches_engine_shortlist(spark, tmp_path):
    """The IVF-PQ oracle contract: the numpy twin's ADC shortlist
    (ids AND raw double scores) is bit-identical to the engine's —
    same codebooks from the same bounded sample, same encode kernel,
    same left-fold LUT sum (JVM aggregate vs the twin's Python fold
    are both sequential IEEE-double adds)."""
    import json
    import os

    import numpy as np
    from pyspark.sql import functions as F

    sf = "/root/testdata/sf0.001"
    df = load(spark, sf, "embeddings")
    path = str(tmp_path / "ivf_pq_index")
    similarity.ivf_pq_write_index(df, path)
    with open(os.path.join(path, "_ivf_pq_codebooks.json")) as f:
        side = json.load(f)
    cents = np.array(side["centroids"])
    books = np.array(side["pq_codebooks"])
    qvec = df.filter(F.col("vec_id") == QUERY_ID).collect()[0]["embedding"]
    qn = np.asarray(qvec, dtype=np.float64)
    qn /= np.maximum(np.linalg.norm(qn), 1e-12)
    probes = [int(c) for c in np.argsort(-(cents @ qn))[: similarity.IVF_PROBE]]
    engine = [
        (r["vec_id"], r["adc_score"])
        for r in similarity.pq_adc_shortlist(
            spark, path, qn, books, probes, exclude_id=QUERY_ID
        ).collect()
    ]
    twin = similarity.ivf_pq_shortlist(
        os.path.join(sf, "embeddings.parquet"), query_id=QUERY_ID
    )
    assert engine == twin


def test_ivf_pq_recall_and_determinism(spark, tmp_path):
    """PQ re-rank recall@10 vs the exact brute-force top-10 — the
    quantization-quality floor — plus run-to-run determinism and the
    exactness of the re-ranked scores (the final `score` column must
    be the same 6-dp cosine brute force emits for those ids)."""
    from pyspark.sql import functions as F

    df = load(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf_pq_index")
    similarity.ivf_pq_write_index(df, path)
    qvec = df.filter(F.col("vec_id") == QUERY_ID).collect()[0]["embedding"]
    got = similarity.ivf_pq_topk_indexed(
        spark, path, qvec, k=10, exclude_id=QUERY_ID
    )
    rows = got.collect()
    again = similarity.ivf_pq_topk_indexed(
        spark, path, qvec, k=10, exclude_id=QUERY_ID
    ).collect()
    assert [tuple(r) for r in rows] == [tuple(r) for r in again]
    exact = {
        r["vec_id"]: r["score"]
        for r in similarity.brute_force_topk(df, QUERY_ID, k=10).collect()
    }
    hit = [r for r in rows if r["vec_id"] in exact]
    recall = len(hit) / 10
    assert recall >= 0.5, f"IVF-PQ recall@10 too low: {recall}"
    for r in hit:
        assert r["score"] == exact[r["vec_id"]], "re-rank must be exact"
    # The ADC estimate exists for every returned row and differs from
    # the exact score (it is an estimate, not a copy).
    assert all(r["adc_score"] is not None for r in rows)


def test_ann_ivf_pq_recall_report_invariants(spark, sf_dir):
    """PQ candidate-stage audit consistency: the PQ candidate set is
    the IVF candidate set CUT to per-probe top-PQ_SHORTLIST by ADC, so
    its counts are bounded by the IVF audit's on the same corpus and
    its recall can only be lower — the readout exists to price exactly
    that gap."""
    import __spark_entry__ as entrymod

    from etl_projects_spark.queries_wave30 import ANN_RECALL_K

    qs = entrymod.queries()
    row = qs["ann_ivf_pq_recall_report"](spark, sf_dir).collect()[0]
    ivf = qs["ann_ivf_recall_report"](spark, sf_dir).collect()[0]
    assert row.n_probes == ivf.n_probes
    assert row.n_true_pairs == row.n_probes * ANN_RECALL_K
    assert 0.0 <= row.recall_pq <= 1.0
    assert 0.0 <= row.efficiency_pq <= 1.0
    assert row.n_cand_pq <= ivf.n_cand_ivf
    assert row.n_cand_pq <= row.n_probes * similarity.PQ_SHORTLIST
    assert row.n_hit_pq <= min(row.n_true_pairs, row.n_cand_pq)
    assert row.recall_pq <= ivf.recall_ivf
