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
