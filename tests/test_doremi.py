"""DoReMi domain reweighting: semantic proof beyond hash parity (the
r14-VERDICT "a visibly hard source gains weight" requirement), plus
normalization/ordering invariants on the real corpus."""

from __future__ import annotations

import shutil

import pyarrow as pa
import pyarrow.parquet as pq

import __spark_entry__ as entrymod
from etl_projects_spark.queries_wave33 import (
    DOREMI_SMOOTH_DEN,
    _PPM,
)

SF_DIR = "/root/testdata/sf0.001"


def _write_corpus(sf_dir, rows):
    tbl = pa.table(
        {
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "source": pa.array([r[1] for r in rows]),
            "text": pa.array([r[2] for r in rows]),
            "n_chars": pa.array([len(r[2]) for r in rows], pa.int64()),
        }
    )
    sf_dir.mkdir()
    pq.write_table(tbl, str(sf_dir / "documents.parquet"))


def test_hard_source_gains_weight(spark, tmp_path):
    """On a constructed corpus with a well-modeled source (one
    repeated sentence — its eval bigrams are high-count in the
    bigram LM) and a hard source (per-doc unique vocabulary — every
    eval bigram is unseen), the multiplicative-weights iteration must
    move mass to the hard source: the Group-DRO up-weighting DoReMi
    exists for."""
    rows = []
    clean = "the quick brown fox jumps over the lazy dog again"
    for i in range(150):
        rows.append((i, "clean", clean))
    for i in range(1000, 1150):
        toks = " ".join(f"w{i}x{j}" for j in range(8))
        rows.append((i, "noisy", toks))
    sf_dir = tmp_path / "corpus"
    _write_corpus(sf_dir, rows)
    try:
        out = {
            r.source: r
            for r in entrymod.queries()["doremi_domain_reweight"](
                spark, str(sf_dir)
            ).collect()
        }
    finally:
        shutil.rmtree(str(sf_dir), ignore_errors=True)
    assert set(out) == {"clean", "noisy"}
    assert out["noisy"].avg_surprise > out["clean"].avg_surprise
    # The hard source must end visibly ABOVE uniform (1/2), the easy
    # one below — not a hair's width: five steps at eta=1/4 on a
    # multi-nat surprise gap move real mass.
    assert out["noisy"].weight > 0.55, out["noisy"].weight
    assert out["clean"].weight < 0.45, out["clean"].weight
    # Smoothing floor: no source starves below eps/k.
    floor = _PPM // (DOREMI_SMOOTH_DEN * len(out))
    assert all(r.weight_ppm >= floor for r in out.values())


def test_weights_normalized_and_monotone_in_surprise(spark):
    """Real-corpus invariants: weights are a (quantized) distribution
    — ppm sum within integer-truncation distance of 1e6 — and are
    strictly monotone in the per-source average surprise (the update
    is the same monotone function of avg_micro for every source)."""
    rows = entrymod.queries()["doremi_domain_reweight"](
        spark, SF_DIR
    ).collect()
    k = len(rows)
    assert k >= 2
    total = sum(r.weight_ppm for r in rows)
    # Each of the k terms loses < 1 ppm in each of its two integer
    # divisions; the uniform-init DIV adds < k more.
    assert abs(total - _PPM) <= 3 * k, total
    by_surprise = sorted(rows, key=lambda r: (r.avg_surprise, r.source))
    weights = [r.weight_ppm for r in by_surprise]
    assert weights == sorted(weights), (
        "weight must be monotone in avg surprise"
    )
