"""Wave-32 catalog entries (round 14): DSIR SELECTION — the
weights → selected-corpus stage that completes the funnel the r13
round opened (r13 VERDICT item 2: ``dsir_importance_weights`` stopped
at ``log_weight``; the paper's point is resampling the pool
proportionally to exp(log_weight) down to a token budget).

Resampling scheme: Gumbel-top-k — rank every pool document by
``log_weight + Gumbel(u)`` where ``u`` is a DETERMINISTIC uniform from
a Knuth multiplicative hash of ``doc_id`` (the queries_mixing
convention: reproducible across engines, runs, and partitionings,
unlike ``rand()``/TABLESAMPLE). Ranking by log-weight-plus-Gumbel IS
sampling without replacement with probability proportional to
exp(log_weight) (the Gumbel-max trick); taking documents in descending
key order until a token budget fills yields the selected corpus.

The budget itself is EXACT INTEGER arithmetic: select while
``DSIR_SELECT_DEN * tokens_before < total_pool_tokens`` — a 1/4 token
budget with no float threshold to drift across engines (the same
integer-crossing discipline as ``curriculum_schedule``'s quartiles).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.queries import _q
from etl_projects_spark.queries_mixing import _MIX_MOD, _MIX_MULT
from etl_projects_spark.queries_wave31 import (
    dsir_weights_cte,
    dsir_weights_relation,
)

# Keep 1/DSIR_SELECT_DEN of the pool's tokens (select while
# den·tokens_before < total): the budget scales with the corpus, so
# the query exercises a real cut at every SF instead of selecting
# everything at sf0.001.
DSIR_SELECT_DEN = 4

# Composite-order packing widths (the curriculum_schedule pattern):
# the 1e6-scaled selection key gets 2^32 (|sel_key| < ~4295 nats —
# ~860 tokens of extreme 5-nat ratios, or a ~4k-token document
# averaging a full nat of divergence per token, before the loud
# guard trips; r14 review widened this from 2^30, whose ~1073-nat
# cap a single long divergent document could realistically breach)
# and doc_id gets 2^30 (10^9 documents). The packed maximum
# (2^33−1)·2^30 + 2^30−1 = 2^63−1 exactly fills the signed long.
# Corpora beyond either width (10^9+ docs, or book-length documents
# against a tiny model) need the widths rebalanced — the guard below
# fails loudly rather than corrupting the selection order silently.
_KEY_WIDTH_E6 = 1 << 32
_DOC_WIDTH = 1 << 30


def dsir_select_ctes(weights_rel: str = "weights") -> str:
    """The DuckDB CTE chain for Gumbel-top-k budget selection over a
    weights relation (doc_id, source, n_tokens, log_weight) — shared
    by the ``dsir_select`` oracle and the composed
    ``curation_pipeline_run`` oracle (queries_wave33). Ends at
    ``selected``: (doc_id, source, n_tokens, sel_key, tokens_before)."""
    return f"""keyed AS (
      SELECT doc_id, source, n_tokens,
             round(log_weight
                   - ln(-ln((CAST((doc_id * {_MIX_MULT}) % {_MIX_MOD}
                                  AS DOUBLE) + 0.5)
                            / {float(_MIX_MOD)})), 6) AS sel_key
      FROM {weights_rel}),
    ranked AS (
      SELECT doc_id, source, n_tokens, sel_key,
             CAST(COALESCE(SUM(n_tokens) OVER (
                    ORDER BY sel_key DESC, doc_id
                    ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                  0) AS BIGINT) AS tokens_before
      FROM keyed),
    tot AS (SELECT CAST(SUM(n_tokens) AS BIGINT) AS t FROM keyed),
    selected AS (
      SELECT doc_id, source, n_tokens, sel_key, tokens_before
      FROM ranked, tot
      WHERE {DSIR_SELECT_DEN} * tokens_before < t)"""


def dsir_select_from_weights(
    w: DataFrame, scope: str = "dsir_select"
) -> DataFrame:
    """Gumbel-top-k budget selection over a weights relation — the
    Spark twin of :func:`dsir_select_ctes`, factored out of
    ``dsir_select`` (r15) so the composed curation funnel selects from
    ITS pool's weights through the identical kernel. All semantics and
    scale commentary live on the catalog query's docstring; ``scope``
    names the :func:`materialize_scoped` pin (callers in loops get the
    bounded-pin contract per scope)."""
    from etl_projects_spark.operators.exec_util import (
        materialize_scoped,
        prefix_sum,
    )

    u = (
        F.pmod(
            F.col("doc_id") * F.lit(_MIX_MULT), F.lit(_MIX_MOD)
        ).cast("double")
        + F.lit(0.5)
    ) / F.lit(float(_MIX_MOD))
    sel_key = F.round(F.col("log_weight") - F.log(-F.log(u)), 6)
    # Composite long encoding of (sel_key DESC, doc_id ASC) for the
    # single-column distributed prefix sum — exact because sel_key is
    # already 6-dp-rounded, so its 1e6 scaling is integer. Width
    # overflow corrupts the order silently, hence the loud guard
    # (curriculum_schedule precedent).
    key_e6 = F.round(F.col("sel_key") * 1000000, 0).cast("long")
    ord_key = (F.lit(_KEY_WIDTH_E6) - key_e6) * F.lit(_DOC_WIDTH) + F.col(
        "doc_id"
    )
    ord_key = F.when(
        (F.abs(key_e6) < F.lit(_KEY_WIDTH_E6))
        & (F.col("doc_id") >= 0)
        & (F.col("doc_id") < F.lit(_DOC_WIDTH)),
        ord_key,
    ).otherwise(
        F.raise_error(
            F.lit(
                "dsir_select: sel_key exceeds the 2^32 1e6-scaled "
                "packing width or doc_id exceeds 2^30; rebalance the "
                "composite key fields"
            )
        )
    )
    keyed = w.select(
        "doc_id", "source", "n_tokens", sel_key.alias("sel_key")
    ).withColumn("_ord", ord_key)
    # Pin before fan-out (the prefix sum's two branches both read this
    # relation — unpinned, each would re-execute the full DSIR scoring
    # pipeline), and make the prefix sum's approxQuantile boundary
    # probe BE the materializing action (r16, guide §1.2): the probe
    # is a full deterministic sketch pass over the relation anyway, so
    # it doubles as the cache barrier — one job where the r15 shape
    # paid a count job, then a probe job, then a separate full-cache
    # totals aggregate + broadcast for the budget denominator (now a
    # window over prefix_sum's own per-bucket totals via total_col).
    n_parts = w.sparkSession.sparkContext.defaultParallelism
    probs = [i / n_parts for i in range(1, n_parts)]
    bounds_out: list[list[float]] = []
    keyed = materialize_scoped(
        keyed,
        scope,
        action=lambda d: bounds_out.append(
            d.stat.approxQuantile("_ord", probs, 0.001)
        ),
    )
    ranked = prefix_sum(
        keyed,
        "_ord",
        "n_tokens",
        out_col="tokens_before",
        bounds=bounds_out[0],
        total_col="_t",
    )
    return (
        ranked.filter(
            F.lit(DSIR_SELECT_DEN) * F.col("tokens_before") < F.col("_t")
        )
        .select("doc_id", "source", "n_tokens", "sel_key", "tokens_before")
    )


@_q(
    "dsir_select",
    f"""
    WITH {dsir_weights_cte()},
    {dsir_select_ctes()}
    SELECT doc_id, source, n_tokens, sel_key, tokens_before
    FROM selected
    """,
)
def dsir_select(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR data selection (Xie et al. 2023) — resample the pool
    proportionally to exp(log_weight) down to a 1/{DSIR_SELECT_DEN}
    token budget, completing the importance-weights funnel
    (``dsir_importance_weights`` emits the weights; THIS emits the
    selected corpus). Output: the selected pool documents with their
    Gumbel selection key and the exact exclusive running token count
    at which each entered the budget.

    Sampling-without-replacement is the Gumbel-max trick: the top-k of
    ``log_weight + g_i`` with g_i = −ln(−ln(u_i)), u_i ~ U(0,1), is an
    exact draw of k documents ∝ exp(log_weight). ``u_i`` is the Knuth
    multiplicative hash of doc_id mapped to (0,1) (+0.5 in the
    numerator keeps u strictly inside the open interval — u = 0 would
    make the Gumbel −inf), so the draw is deterministic across
    engines, runs, and partitionings — reproducible corpus builds, the
    property rand()-based resampling forfeits.

    Cross-engine float discipline: ``log_weight`` is the shared
    :func:`~etl_projects_spark.queries_wave31.dsir_weights_relation` /
    ``dsir_weights_cte`` value (ordered-fold, bit-identical by the r13
    proof); the Gumbel term is ONE identically-shaped expression over
    an exact-integer hash on both engines; and the key is rounded to
    6 dp BEFORE ranking (the family's k-cut convention) with doc_id as
    the tiebreak, so the selection ORDER — and therefore the budget
    cut — is reproducible. The budget test is pure BIGINT arithmetic:
    {DSIR_SELECT_DEN}·tokens_before < total_pool_tokens, no float
    threshold.

    Scale shape: the weights relation is pinned ONCE per invocation
    (``materialize_scoped`` — release-pathed, loop-safe) because three
    consumers read it (the totals aggregate, the prefix-sum boundary
    probe, and both prefix-sum branches); the global selection order
    is the engine's two-phase distributed ``prefix_sum`` over a
    composite (−key, doc_id) long — NOT a single-task global window —
    so the token cumsum stays parallel at any corpus size; the 1-row
    totals relation broadcasts. Everything upstream inherits the
    weights query's shape (model broadcast-joined, corpus never
    shuffled for the model).
    """
    w = dsir_weights_relation(spark, sf_dir)
    return dsir_select_from_weights(w, scope="dsir_select")
