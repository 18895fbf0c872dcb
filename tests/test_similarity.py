

def test_ivf_assign_honors_custom_column_names(spark):
    """id_col/vec_col other than the defaults must flow through the
    Arrow stage (hardcoded pandas keys broke them; r5 review)."""
    import numpy as np
    from etl_projects_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0])], "vid long, feat array<float>"
    )
    cents = np.array([[1.0, 0.0], [0.0, 1.0]])
    rows = {
        r["vid"]: r["cluster"]
        for r in similarity.ivf_assign(
            df, cents, vec_col="feat", id_col="vid"
        ).collect()
    }
    assert rows == {1: 0, 2: 1}


def test_lsh_multiprobe_planes_match_bucket_bits(spark):
    """The bucket expression must be built from the SAME n_planes the
    probe list flips — with n_planes=6 every probed bucket must be
    reachable by some vector (r5 review: buckets were always built
    from the default 4 planes)."""
    from etl_projects_spark.operators import similarity
    from etl_projects_spark.queries import load
    from tests.conftest import SF_DIR

    emb = load(spark, SF_DIR, "embeddings")
    out = similarity.lsh_multiprobe_topk(emb, query_id=1, k=5, n_planes=6)
    rows = out.collect()
    assert len(rows) > 0  # probing its own bucket always finds neighbors
