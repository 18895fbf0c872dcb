

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


def test_lsh_similarity_join_finds_cobucket_pairs(spark):
    """Identical vectors always share a bucket, so an A-vs-B join of
    overlapping corpora must return their pairs at cosine 1.0; pairs
    from different buckets must never appear, and every returned pair
    meets the threshold."""
    from etl_projects_spark.operators import similarity
    from pyspark.sql import functions as F

    vecs = [
        (0, [1.0, 0.0, 0.0, 0.0] * 16),
        (2, [0.0, 1.0, 0.0, 0.0] * 16),
        (1, [1.0, 0.0, 0.0, 0.0] * 16),   # dup of 0, other corpus
        (3, [-1.0, 0.0, 0.0, 0.0] * 16),  # anti-parallel to 0
    ]
    df = spark.createDataFrame(vecs, "vec_id long, embedding array<float>")
    out = similarity.lsh_similarity_join(
        df.filter(F.col("vec_id") % 2 == 0),
        df.filter(F.col("vec_id") % 2 == 1),
        threshold=0.9,
    ).collect()
    pairs = {(r["id_a"], r["id_b"]): r["cosine"] for r in out}
    assert pairs.get((0, 1)) == 1.0
    assert all(c >= 0.9 for c in pairs.values())
    assert (0, 3) not in pairs  # cosine -1: below threshold everywhere


def test_pca_project_honors_id_col(spark):
    import numpy as np
    from etl_projects_spark.operators import similarity

    df = spark.createDataFrame(
        [(7, [1.0, 0.0]), (8, [0.0, 1.0])], "doc_id long, feat array<float>"
    )
    mu = np.array([0.5, 0.5])
    basis = np.array([[1.0], [0.0]])
    out = similarity.pca_project(df, mu, basis, vec_col="feat", id_col="doc_id")
    assert out.columns == ["doc_id", "p1"]
    assert {r.doc_id for r in out.collect()} == {7, 8}


def test_knn_join_empty_queries_yields_empty(spark):
    from etl_projects_spark.operators import similarity

    corpus = spark.createDataFrame(
        [(1, [1.0, 0.0])], "vec_id long, embedding array<float>"
    )
    empty = corpus.filter("vec_id < 0")
    out = similarity.knn_join(corpus, empty, k=3)
    assert out.count() == 0
    assert out.columns == ["qid", "nbr", "score", "rank"]


def test_similarity_join_leaves_shared_udf_deterministic(spark):
    """r6 ADVICE: lsh_similarity_join pins one Arrow stage via a
    PRIVATE nondeterministic UDF twin — the shared pair_cosine must
    stay deterministic after the join builds (asNondeterministic
    mutates in place, so the old shared-UDF call flipped every later
    consumer's plan shape for the rest of the process)."""
    from pyspark.sql import functions as F

    from etl_projects_spark.operators import similarity

    df = spark.createDataFrame(
        [(0, [1.0, 0.0] * 32), (1, [1.0, 0.0] * 32)],
        "vec_id long, embedding array<float>",
    )
    similarity.lsh_similarity_join(
        df.filter(F.col("vec_id") == 0), df.filter(F.col("vec_id") == 1), 0.9
    ).collect()
    assert similarity.pair_cosine.deterministic is True
    assert similarity.pair_cosine_once.deterministic is False


def test_recall_audits_never_miss_planted_exact_duplicates(spark, tmp_path):
    """Intent guard for the r12 audit queries, independent of the
    DuckDB oracles: an EXACT duplicate vector hashes to the same LSH
    bucket and the same IVF cell as its source by construction, so a
    planted duplicate of each probe must (a) rank as that probe's top
    exact neighbor, (b) be surfaced by single-bucket LSH AND by the
    IVF probe (hits >= the planted-pair count), and (c) with the dup
    given its probe's label, lift purity@k off zero for that label."""
    import numpy as np

    import __spark_entry__ as entrymod

    rng = np.random.RandomState(7)
    n, dim = 120, 64
    vecs = rng.standard_normal((n, dim)).astype(np.float32)
    vecs[7] = vecs[0]      # exact duplicate of probe 0
    vecs[103] = vecs[100]  # exact duplicate of probe 100
    labels = [int(i % 17) + 100 for i in range(n)]  # all distinct mod-groups
    labels[7] = labels[0]
    labels[103] = labels[100]
    rows = [(int(i), [float(x) for x in vecs[i]], labels[i]) for i in range(n)]
    emb = spark.createDataFrame(
        rows, "vec_id long, embedding array<float>, label int"
    )
    emb.write.mode("overwrite").parquet(
        str(tmp_path / "embeddings.parquet")
    )
    qs = entrymod.queries()
    sfd = str(tmp_path)

    r = qs["ann_recall_report"](spark, sfd).collect()[0]
    assert r.n_probes == 2 and r.n_true_pairs == 20
    assert r.n_hit_bucket >= 2, "single-bucket LSH missed an exact dup"
    assert r.n_hit_multiprobe >= r.n_hit_bucket

    iv = qs["ann_ivf_recall_report"](spark, sfd).collect()[0]
    assert iv.n_probes == 2 and iv.n_true_pairs == 20
    assert iv.n_hit_ivf >= 2, "IVF probe missed an exact dup"

    pur = {row.label: row for row in qs["knn_label_purity"](spark, sfd).collect()}
    for probe_label in (labels[0], labels[100]):
        assert pur[probe_label].n_same_label >= 1
        assert pur[probe_label].purity_at_k >= 0.1


def test_ann_audit_values_pinned_at_gate_sf(spark):
    """r12 VERDICT item 1, the 'bound' branch: the recall audits'
    values at the gate SF are PINNED AS-IS. These numbers are the
    data-inherent ceiling of the default knobs on the isotropic test
    corpus (SCALE.md §ANN-bound: the 0.14 single-bucket recall IS the
    predicted (1-θ/π)^4 collision probability for ~70° true
    neighbors; IVF recall tracks scanned fraction with no elbow), NOT
    a tuning defect — the structured-corpus test below proves the same
    operators at the same knobs clear 0.9 when the data has neighbor
    structure. If these values move, either the corpus vintage or the
    index math changed; both must be loud."""
    import __spark_entry__ as entrymod

    qs = entrymod.queries()
    sfd = "/root/testdata/sf0.01"
    lsh = qs["ann_recall_report"](spark, sfd).collect()[0]
    assert (
        lsh.n_probes, lsh.n_true_pairs,
        lsh.n_cand_bucket, lsh.n_hit_bucket,
        lsh.n_cand_multiprobe, lsh.n_hit_multiprobe,
    ) == (5, 50, 154, 7, 764, 27)
    assert round(lsh.recall_bucket, 6) == 0.14
    assert round(lsh.recall_multiprobe, 6) == 0.54
    ivf = qs["ann_ivf_recall_report"](spark, sfd).collect()[0]
    assert (ivf.n_probes, ivf.n_true_pairs, ivf.n_cand_ivf,
            ivf.n_hit_ivf) == (5, 50, 664, 31)
    assert round(ivf.recall_ivf, 6) == 0.62


def test_ann_operators_reach_high_recall_on_structured_corpus(spark):
    """The counter-proof completing the r12 'tune or bound' order: the
    SAME LSH/IVF operators at the SAME default knobs reach high recall
    the moment the corpus has real neighbor structure — so the 0.14 /
    0.54 / 0.62 readouts on the test corpus are the SPACE's ceiling
    (z10 ≈ 2, embedding_margin_report), not an index defect.

    Corpus: 10 planted clusters x 50 members, within-cluster cosine
    ≈ 0.95 (the near-dup regime SemDeDup / ANN retrieval target).
    Numpy twin of this construction predicts single-bucket 0.61 /
    multiprobe 0.93 / IVF 1.0; floors leave margin for the float32
    storage truncation."""
    import numpy as np

    import __spark_entry__  # registers queries; not used directly
    from etl_projects_spark.operators import similarity

    rng = np.random.RandomState(7)
    k_clusters, members, dim, noise = 10, 50, 64, 0.03
    centers = rng.standard_normal((k_clusters, dim))
    centers /= np.linalg.norm(centers, axis=1, keepdims=True)
    vecs = (
        np.repeat(centers, members, axis=0)
        + noise * rng.standard_normal((k_clusters * members, dim))
    )
    n = len(vecs)
    emb = spark.createDataFrame(
        [(i, [float(x) for x in vecs[i]]) for i in range(n)],
        "vec_id long, embedding array<float>",
    )

    # Exact ground truth through the engine path (float32-truncated
    # like every stored corpus): top-10 per vector.
    true = {}
    for r in similarity.knn_join(emb, emb, k=10).collect():
        true.setdefault(r.qid, set()).add(r.nbr)

    # Hyperplane-LSH candidates through the ENGINE bucket expression.
    from pyspark.sql import functions as F

    buckets = {
        r.vec_id: r.b
        for r in emb.select(
            "vec_id",
            similarity.hyperplane_bucket(F.col("embedding")).alias("b"),
        ).collect()
    }
    n_pairs = sum(len(s) for s in true.values())
    hit1 = hitm = 0
    for q, nbrs in true.items():
        probe = {buckets[q]}
        probe_m = probe | {
            buckets[q] ^ (1 << i)
            for i in range(similarity.LSH_N_PLANES)
        }
        hit1 += sum(buckets[nb] in probe for nb in nbrs)
        hitm += sum(buckets[nb] in probe_m for nb in nbrs)
    assert hit1 / n_pairs >= 0.5, "single-bucket recall collapsed"
    assert hitm / n_pairs >= 0.85, "multiprobe recall collapsed"

    # IVF at the default codebook/probe knobs, assignments through the
    # engine's Arrow stage; probe selection is ivf_topk's own argsort.
    cents = similarity.ivf_centroids(emb)
    assign = {
        r.vec_id: r.cluster
        for r in similarity.ivf_assign(emb, cents).collect()
    }
    stored = {
        r.vec_id: np.asarray(r.embedding, dtype=np.float64)
        for r in emb.collect()
    }
    hit_ivf = 0
    for q, nbrs in true.items():
        qn = stored[q] / np.maximum(np.linalg.norm(stored[q]), 1e-12)
        probed = set(
            int(c)
            for c in np.argsort(-(cents @ qn))[: similarity.IVF_PROBE]
        )
        hit_ivf += sum(assign[nb] in probed for nb in nbrs)
    assert hit_ivf / n_pairs >= 0.95, "IVF recall collapsed"


def test_margin_report_operator_on_arbitrary_table(spark):
    """r13 VERDICT item 1: the admission check is an engine API —
    runnable on ANY table/column names with a deterministic default
    probe draw (no probes argument), not just the fixture corpus.
    A clustered corpus must read high z_margin; the probe draw must be
    bounded by n_probes and stable across invocations."""
    import numpy as np

    from etl_projects_spark.operators import similarity

    rng = np.random.RandomState(7)
    rows = []
    # 40 tight clusters of 8 vectors in 64-d: true neighbors are RARE
    # relative to the bulk (7/319 same-cluster) and stand far above
    # it, so the relative contrast reads large. (A few huge clusters
    # would NOT: with 1/3 of the bulk same-cluster the "bulk" moments
    # absorb the neighbors and z collapses by construction.)
    for c in range(40):
        center = rng.standard_normal(64)
        center /= np.linalg.norm(center)
        for i in range(8):
            v = center + 0.02 * rng.standard_normal(64)
            rows.append((c * 100 + i, [float(x) for x in v]))
    df = spark.createDataFrame(rows, "item_id long, vec array<float>")
    rep = similarity.margin_report(
        df, vec_col="vec", id_col="item_id", k=5, n_probes=8
    )
    got = rep.collect()
    assert len(got) == 8, "default draw must yield exactly n_probes rows"
    assert {r.qid for r in got} == {
        r.qid
        for r in similarity.margin_report(
            df, vec_col="vec", id_col="item_id", k=5, n_probes=8
        ).collect()
    }, "the default probe draw must be deterministic"
    for r in got:
        assert r.n_scored == len(rows) - 1
        assert r.z_margin > 4.0, (
            "a clustered corpus must read as index-able (large z)"
        )


def test_margin_report_clamps_variance_for_constant_scores(spark):
    """r13 ADVICE (medium): a probe with (near-)constant bulk scores
    can make the exact-integer variance round to a tiny NEGATIVE
    double; unclamped, sqrt yields NaN and Spark's NaN > 0.0 emits
    z = NaN instead of the 0.0 fallback (and the DuckDB oracle would
    CRASH on sqrt(negative)). Identical vectors ⇒ every pair cosine is
    exactly 1.0 ⇒ integer variance 0 — the clamp must hold z at 0.0."""
    import math

    from etl_projects_spark.operators import similarity

    v = [1.0] * 8
    df = spark.createDataFrame(
        [(i, v) for i in range(30)], "vec_id long, embedding array<float>"
    )
    got = similarity.margin_report(df, k=3, n_probes=4).collect()
    assert len(got) == 4
    for r in got:
        assert r.bulk_std == 0.0
        assert not math.isnan(r.z_margin), "variance clamp regressed"
        assert r.z_margin == 0.0


def test_margin_report_survives_corpus_smaller_than_k(spark):
    """Robustness edge: a corpus with fewer than k+1 rows must yield a
    report (top-k side simply has fewer neighbors), not crash — the
    admission check gets pointed at arbitrary tables."""
    from etl_projects_spark.operators import similarity

    df = spark.createDataFrame(
        [(1, [1.0, 0.0]), (2, [0.0, 1.0]), (3, [1.0, 1.0])],
        "vec_id long, embedding array<float>",
    )
    got = similarity.margin_report(df, k=10, n_probes=2).collect()
    assert len(got) == 2
    for r in got:
        assert r.n_scored == 2  # the other two rows


def test_pair_cosine_batch_floors_each_norm_not_the_product():
    """r14 ADVICE (medium): _pair_cosine_batch — the kernel behind
    pair_cosine / pair_cosine_once, i.e. the engine side of
    brute-force/LSH top-k and embedding_similarity_join — must floor
    EACH norm at 1e-12, matching cosine()/cosine_sql(). For two
    parallel vectors with norm 1e-8 the norm PRODUCT is 1e-16: a
    product floor clamps the denominator to 1e-12 and returns 1e-4,
    while the per-norm convention returns the true cosine 1.0."""
    import numpy as np
    import pandas as pd

    from etl_projects_spark.operators.similarity import _pair_cosine_batch

    tiny = [1e-8, 0.0, 0.0]
    got = _pair_cosine_batch(
        pd.Series([tiny, [0.0, 0.0, 0.0], [3.0, 4.0, 0.0]]),
        pd.Series([tiny, [1.0, 0.0, 0.0], [3.0, 4.0, 0.0]]),
    ).to_numpy()
    assert abs(got[0] - 1.0) < 1e-9, (
        "tiny-norm pair must score its true cosine (per-norm floor), "
        f"got {got[0]} — the product floor is back"
    )
    assert abs(got[1]) < 1e-6  # zero-norm side still scores ~0, not NaN
    assert abs(got[2] - 1.0) < 1e-12
    assert not np.isnan(got).any()


def test_pair_cosine_matches_column_expression_on_degenerate_norms(spark):
    """Engine/oracle symmetry on the degenerate-norm class: the Arrow
    kernel and the JVM column expression (which mirrors cosine_sql's
    per-norm greatest()) must agree on vectors with norms in
    (1e-12, 1e-6) — the exact class where the old product floor
    diverged."""
    from pyspark.sql import functions as F

    from etl_projects_spark.operators import similarity

    tiny = [0.0, 2e-8, 0.0]
    df = spark.createDataFrame(
        [(tiny, tiny), (tiny, [0.0, 1.0, 1.0]), ([1.0, 1.0, 0.0], tiny)],
        "a array<float>, b array<float>",
    )
    got = df.select(
        similarity.pair_cosine(F.col("a"), F.col("b")).alias("arrow"),
        similarity.cosine(F.col("a"), F.col("b")).alias("jvm"),
    ).collect()
    for r in got:
        assert abs(r.arrow - r.jvm) < 1e-9, (
            f"Arrow kernel {r.arrow} vs column expression {r.jvm} — "
            "the family's zero-norm convention split again"
        )


def test_margin_report_rejects_non_integral_id_loudly(spark):
    """r14 ADVICE (low): a non-integral id_col nulls out under the
    default probe draw's cast('long'), silently collapsing the
    'deterministic uniform draw' into first-n-by-null. The repo
    convention is to fail loudly — ValueError pointing at probes=."""
    import pytest as _pytest

    from etl_projects_spark.operators import similarity

    df = spark.createDataFrame(
        [("a", [1.0, 0.0]), ("b", [0.0, 1.0])],
        "doc_key string, embedding array<float>",
    )
    # Both paths must refuse: the default draw would corrupt ordering,
    # and even explicit probes hit the kernel's 'qid long' Arrow
    # schema mid-job with an opaque serializer error.
    with _pytest.raises(ValueError, match="integral id_col"):
        similarity.margin_report(df, id_col="doc_key", n_probes=2)
    with _pytest.raises(ValueError, match="surrogate key"):
        similarity.margin_report(df, id_col="doc_key", probes=df.limit(1))
    # An encoded long surrogate key IS the supported path.
    from pyspark.sql import functions as F

    enc = df.withColumn("doc_id", F.xxhash64("doc_key"))
    rep = similarity.margin_report(enc, id_col="doc_id", k=1, n_probes=2)
    assert rep.count() == 2
