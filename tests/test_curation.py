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
