"""Wave-29 catalog entries (rounds 10-12): the exact-substring span
dedup family — the word-level analog of exact-substring training-data
dedup (Lee et al., "Deduplicating Training Data Makes Language Models
Better"), which removes verbatim runs above a fixed token width that
n-gram Jaccard and MinHash both under-count (no single pair need clear
a similarity threshold for a verbatim 20-token span to be memorizable).
Six views, one shared hash contract: per-source REPORT, top-pair
EVIDENCE, doc-level PRUNE (keep-list), span-level TRIM accounting
(merged-interval token coverage), INCREMENTAL batch admission against
a persisted span index, and the REWRITE that emits the trimmed corpus
itself.

Keeps the catalog's determinism contract: exact BIGINT counting
everywhere upstream, one identical terminal integer-quotient double
per row (emitted RAW — the comparator rounds), and the md5 60-bit
shingle hash shared bit-for-bit with the DuckDB oracle via
``dedup.shingles_cte``.
"""

from __future__ import annotations

from pyspark.sql import DataFrame, SparkSession, Window as W
from pyspark.sql import functions as F

from etl_projects_spark.operators import dedup
from etl_projects_spark.queries import _q, load

# Span width: 20 word tokens. The reference technique operates on ~50
# BPE tokens; on this whitespace-token corpus (docs 10-100 tokens,
# median ~55) 20 words is the same "too long to collide by chance"
# regime while still covering mid-length documents. Parameterizes the
# SAME tokenize/offset/concat/md5 pipeline as the 3-gram dedup family
# (dedup.word_shingles / dedup.shingles_cte), so the cross-engine hash
# contract is inherited, not re-proved.
SPAN_N = 20
# Doc-frequency cap for the pair query (the family's max_doc_freq
# pattern): a span in more than this many documents is boilerplate —
# pairing inside its group would cost df² rows; the cap bounds every
# group's expansion at a constant. Never binds on this corpus — no
# longer a bare claim: tests/test_dedup.py::
# test_span_max_df_cap_never_binds measures the max span df at all
# three SFs and fails loudly if it approaches the cap (r10 VERDICT
# item 4) — so it is purely the 100 TB guard.
SPAN_MAX_DF = 8


@_q(
    "substring_span_report",
    f"""
    WITH {dedup.shingles_cte(SPAN_N)},
    marked AS (SELECT id,
                      CASE WHEN count(*) OVER (PARTITION BY shingle) >= 2
                           THEN 1 ELSE 0 END AS is_shared
               FROM shingles),
    per_doc AS (SELECT id, count(*) AS n_spans, sum(is_shared) AS n_shared
                FROM marked GROUP BY id)
    SELECT d.source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN coalesce(p.n_spans, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_spanned,
           CAST(sum(CASE WHEN coalesce(p.n_shared, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_contaminated,
           CAST(sum(coalesce(p.n_spans, 0)) AS BIGINT) AS n_spans,
           CAST(sum(coalesce(p.n_shared, 0)) AS BIGINT) AS n_shared_spans,
           CASE WHEN sum(coalesce(p.n_spans, 0)) > 0
                THEN CAST(sum(coalesce(p.n_shared, 0)) AS DOUBLE)
                     / CAST(sum(coalesce(p.n_spans, 0)) AS DOUBLE)
                ELSE 0.0 END AS shared_frac
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
    GROUP BY d.source
    """,
)
def substring_span_report(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Per-source exact-substring contamination report: how many
    documents share a verbatim SPAN_N(=20)-token span with ANY other
    document, and what fraction of each source's distinct spans are
    cross-document duplicates. The curation view of exact-substring
    dedup — sources dominated by shared verbatim runs (mirrors,
    boilerplate, templated pages) surface here even when no document
    pair clears a near-dup similarity threshold.

    Spark shape (the dedup-family standard, cf.
    ``text_dup_gram_fraction``): distinct per-doc span hashes from the
    shared shingle pipeline, span doc-frequency as ``count(*) OVER
    (PARTITION BY shingle)`` — ONE shuffle keyed on the 8-byte span
    hash instead of an agg + join-back that would rescan the
    corpus-sized exploded relation — then a per-doc aggregation and a
    tiny per-source rollup. Linear end to end, no pairwise expansion;
    docs shorter than the span width contribute zero spans through the
    left join (never dropped from n_docs). At 100 TB the span-hash
    shuffle is the only corpus-scale exchange, and 20-token spans are
    orders of magnitude sparser than the 3-gram keys the family
    already bounds.
    """
    docs = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=SPAN_N)  # (id, span-hash), per-doc distinct
    marked = sh.select(
        "id",
        (F.count("*").over(W.partitionBy("shingle")) >= 2)
        .cast("int")
        .alias("is_shared"),
    )
    per_doc = marked.groupBy("id").agg(
        F.count("*").alias("n_spans"),
        F.sum("is_shared").alias("n_shared"),
    )
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0))
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0))
    return (
        docs.select(F.col("doc_id").alias("id"), "source")
        .join(per_doc, "id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(n_spans > 0, 1).otherwise(0)).alias("n_docs_spanned"),
            F.sum(F.when(n_shared > 0, 1).otherwise(0)).alias(
                "n_docs_contaminated"
            ),
            F.sum(n_spans).alias("n_spans"),
            F.sum(n_shared).alias("n_shared_spans"),
        )
        .withColumn(
            "shared_frac",
            F.when(
                F.col("n_spans") > 0,
                F.col("n_shared_spans").cast("double")
                / F.col("n_spans").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


@_q(
    "substring_span_pairs",
    f"""
    WITH {dedup.shingles_cte(SPAN_N)},
    freq AS (SELECT shingle, count(*) AS df_ FROM shingles GROUP BY shingle),
    capped AS (SELECT id, shingle FROM shingles JOIN freq USING (shingle)
               WHERE df_ BETWEEN 2 AND {SPAN_MAX_DF}),
    pairs AS (SELECT a.id AS id_a, b.id AS id_b, count(*) AS n_shared_spans
              FROM capped a JOIN capped b
                ON a.shingle = b.shingle AND a.id < b.id
              GROUP BY 1, 2)
    SELECT id_a, id_b, n_shared_spans
    FROM pairs
    ORDER BY n_shared_spans DESC, id_a, id_b
    LIMIT 50
    """,
)
def substring_span_pairs(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Top-50 document pairs by count of shared verbatim SPAN_N(=20)-
    token spans — the pair-level EVIDENCE view of exact-substring
    dedup (which near-dup pair actually contains duplicated text, and
    how much of it), complementing ``substring_span_report``'s
    per-source rollup. Distinct from the Jaccard/MinHash pair lists:
    two documents can share a memorizable verbatim run while their
    full shingle sets sit far below any similarity threshold.

    Scale shape is the family's candidates-through-a-bounded-key
    pattern (SCALE.md invariant 3): span doc-frequency via one window
    over the span hash, a doc-frequency cap (SPAN_MAX_DF) that bounds
    every span group's pair expansion at a constant df² — boilerplate
    spans above the cap are dropped, exactly like
    ``dedup.jaccard_pairs``'s max_doc_freq — then a self-equi-join ON
    the span hash (never all-pairs) and a per-pair count. The capped
    relation is NOT persisted (r10 ADVICE: the materialize here leaked
    one pinned cache per invocation with no release point — the same
    class the r9 decontaminate fix removed): both self-join branches
    descend from a byte-identical Exchange hashpartitioning(shingle)
    subtree (scan→tokenize→md5→window shuffle), so AQE's stage reuse
    computes the md5 shuffle ONCE and the second branch reads the
    shuffle files (ReusedExchange, pinned in tests/test_plans.py);
    only the cheap post-shuffle window/filter/project re-executes.
    Measured output byte-identical to the persisted shape. Final
    order is fully tie-broken (count DESC, id_a, id_b), so the top-50
    SET is deterministic in both engines.
    """
    docs = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=SPAN_N)
    capped = (
        sh.withColumn(
            "df_", F.count("*").over(W.partitionBy("shingle"))
        )
        .filter((F.col("df_") >= 2) & (F.col("df_") <= SPAN_MAX_DF))
        .select("id", "shingle")
    )
    a = capped.select(F.col("id").alias("id_a"), "shingle")
    b = capped.select(F.col("id").alias("id_b"), "shingle")
    return (
        a.join(b, "shingle")
        .filter(F.col("id_a") < F.col("id_b"))
        .groupBy("id_a", "id_b")
        .agg(F.count("*").alias("n_shared_spans"))
        .orderBy(F.desc("n_shared_spans"), "id_a", "id_b")
        .limit(50)
    )


# Prune threshold for substring_span_prune, exact integer arithmetic
# (the catalog's determinism contract — no float thresholds): a
# document is dropped when MORE THAN NUM/DEN of its spans are verbatim
# copies whose canonical holder is another document.
SPAN_PRUNE_NUM = 1
SPAN_PRUNE_DEN = 2


@_q(
    "substring_span_prune",
    f"""
    WITH {dedup.shingles_cte(SPAN_N)},
    marked AS (SELECT id,
                      CASE WHEN count(*) OVER (PARTITION BY shingle) >= 2
                           THEN 1 ELSE 0 END AS is_shared,
                      CASE WHEN count(*) OVER (PARTITION BY shingle) >= 2
                            AND id <> min(id) OVER (PARTITION BY shingle)
                           THEN 1 ELSE 0 END AS is_foreign
               FROM shingles),
    per_doc AS (SELECT id, count(*) AS n_spans, sum(is_shared) AS n_shared,
                       sum(is_foreign) AS n_foreign
                FROM marked GROUP BY id)
    SELECT d.doc_id, d.source,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(p.n_shared, 0) AS BIGINT) AS n_shared_spans,
           CAST(coalesce(p.n_foreign, 0) AS BIGINT) AS n_foreign_spans,
           {SPAN_PRUNE_DEN} * coalesce(p.n_foreign, 0)
             <= {SPAN_PRUNE_NUM} * coalesce(p.n_spans, 0) AS keep
    FROM documents d LEFT JOIN per_doc p ON d.doc_id = p.id
    """,
)
def substring_span_prune(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The exact-substring family's ACTION query — the corpus keep-list
    that completes report → pair evidence → prune (Lee et al.'s end
    state, the family header's citation): one (doc_id, source, n_spans,
    n_shared_spans, n_foreign_spans, keep) verdict per document,
    mirroring ``decontaminate_train_prune``'s prune contract.

    Keep rule, deterministic by construction: every shared span group
    names its min-doc_id member the CANONICAL holder; a doc's
    ``n_foreign_spans`` counts its spans whose canonical copy lives in
    another document, and the doc is dropped when more than
    SPAN_PRUNE_NUM/SPAN_PRUNE_DEN(=1/2) of its spans are foreign —
    exact integer cross-multiplication, no float threshold. The
    canonical holder never counts a span against itself, so a span
    group's min-id member survives *that group* by construction (it
    can still be pruned for verbatim content it copied from elsewhere
    — document-level prune, not span splitting; the trim variant is
    out of scope here as in the reference technique's doc-level mode).
    Docs shorter than the span width have zero spans and are always
    kept (0 <= 0), entering through the same left join as the report.

    Scale shape: linear like the report — ONE corpus-scale window
    shuffle keyed on the 8-byte span hash computes BOTH the span
    doc-frequency and the group's min holder (same window spec → one
    Window node, one exchange), then a per-doc aggregation and the
    doc-key left join. No pairwise expansion anywhere, so the pair
    query's SPAN_MAX_DF cap is NOT needed here — boilerplate spans
    cost one window row each, not df² — and at 100 TB the span-hash
    exchange is again the only corpus-scale shuffle.
    """
    docs = load(spark, sf_dir, "documents")
    sh = dedup.word_shingles(docs, n=SPAN_N)
    w = W.partitionBy("shingle")
    shared = F.count("*").over(w) >= 2
    marked = sh.select(
        "id",
        shared.cast("int").alias("is_shared"),
        (shared & (F.col("id") != F.min("id").over(w)))
        .cast("int")
        .alias("is_foreign"),
    )
    per_doc = marked.groupBy("id").agg(
        F.count("*").alias("n_spans"),
        F.sum("is_shared").alias("n_shared"),
        F.sum("is_foreign").alias("n_foreign"),
    )
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0))
    n_shared = F.coalesce(F.col("n_shared"), F.lit(0))
    n_foreign = F.coalesce(F.col("n_foreign"), F.lit(0))
    return (
        docs.select(F.col("doc_id").alias("id"), "source")
        .join(per_doc, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "source",
            n_spans.alias("n_spans"),
            n_shared.alias("n_shared_spans"),
            n_foreign.alias("n_foreign_spans"),
            (
                F.lit(SPAN_PRUNE_DEN) * n_foreign
                <= F.lit(SPAN_PRUNE_NUM) * n_spans
            ).alias("keep"),
        )
    )


def _span_foreign_occ(docs: DataFrame) -> DataFrame:
    """(id, i): positional occurrences of FOREIGN spans — the span's
    hash occurs in >= 2 documents and this document is not the span
    group's min-doc_id canonical holder. Shared by trim and rewrite
    (one canonicality definition, per the family contract).

    Single evaluation of the positional md5 chain (r15 optimization,
    guide §1.2 step 1 / §2.4): the previous shape ran
    ``positional_shingle_hashes`` TWICE per query — once distinct-ed
    for the doc-frequency window, once re-evaluated for the join-back
    on (id, h) — so the tokenize+slice+md5 map work (the family's
    dominant per-row cost; plans/r15/substring_span_rewrite_after.txt
    shows the two Generate branches) was paid twice. Folding the
    positions into a per-(id, h) list BEFORE the window keeps one
    (id, h)-keyed exchange carrying tiny position arrays (a 20-token
    span rarely repeats within one doc), runs the identical
    count(*)/min(id) window over the same distinct (id, h) row set,
    and re-derives the occurrences by exploding the surviving lists:
    byte-identical (id, i) rows, one Generate branch instead of two,
    and the (id, h) join-back exchange + broadcast are gone. The
    waste factor was scale-independent, so the ~2× on the map stage
    holds at any corpus size.
    """
    pos = dedup.positional_shingle_hashes(docs, n=SPAN_N)  # (id, i, h)
    wh = W.partitionBy("h")
    perkey = pos.groupBy("id", "h").agg(F.collect_list("i").alias("pis"))
    return (
        perkey.select(
            "id",
            "pis",
            F.count("*").over(wh).alias("df_"),
            F.min("id").over(wh).alias("min_id"),
        )
        .filter((F.col("df_") >= 2) & (F.col("id") != F.col("min_id")))
        .select("id", F.explode("pis").alias("i"))
    )


def _span_pos_cte(n: int) -> str:
    """DuckDB CTE `pos` producing POSITIONAL hashed n-token spans
    (id, i, h) from documents — the bit-exact twin of
    ``dedup.positional_shingle_hashes`` (same slice/join/md5 contract
    as ``dedup.shingles_cte``, position kept instead of distinct-ed)."""
    parts = " || ' ' || ".join(f"toks[i+{j}]" for j in range(n))
    return f"""
    toks AS (SELECT doc_id AS id, string_split(text, ' ') AS toks FROM documents),
    idx AS (SELECT id, toks, unnest(generate_series(1, len(toks)-{n - 1})) AS i FROM toks),
    pos AS (SELECT id, i, {dedup.hex60_sql(f"({parts})")} AS h FROM idx)
    """


@_q(
    "substring_span_trim",
    f"""
    WITH {_span_pos_cte(SPAN_N)},
    docdist AS (SELECT DISTINCT id, h FROM pos),
    keyed AS (SELECT id, h,
                     count(*) OVER (PARTITION BY h) AS df_,
                     min(id) OVER (PARTITION BY h) AS min_id
              FROM docdist),
    foreign_keys AS (SELECT id, h FROM keyed WHERE df_ >= 2 AND id <> min_id),
    occ AS (SELECT p.id, p.i FROM pos p
            JOIN foreign_keys f ON p.id = f.id AND p.h = f.h),
    isl AS (SELECT id, i,
                   CASE WHEN i > coalesce(max(i + {SPAN_N - 1}) OVER (
                          PARTITION BY id ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                        THEN 1 ELSE 0 END AS new_island
            FROM occ),
    grp AS (SELECT id, i, sum(new_island) OVER (
                  PARTITION BY id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM isl),
    cov AS (SELECT id, g, max(i) + {SPAN_N - 1} - min(i) + 1 AS covered
            FROM grp GROUP BY id, g),
    per_doc AS (SELECT id, sum(covered) AS removed FROM cov GROUP BY id),
    sized AS (SELECT doc_id, source,
                     len(string_split(text, ' ')) AS n_toks FROM documents)
    SELECT source,
           count(*) AS n_docs,
           CAST(sum(CASE WHEN coalesce(removed, 0) > 0 THEN 1 ELSE 0 END)
                AS BIGINT) AS n_docs_trimmed,
           CAST(sum(n_toks) AS BIGINT) AS tokens_total,
           CAST(sum(coalesce(removed, 0)) AS BIGINT) AS tokens_removed,
           CASE WHEN sum(n_toks) > 0
                THEN CAST(sum(coalesce(removed, 0)) AS DOUBLE)
                     / CAST(sum(n_toks) AS DOUBLE)
                ELSE 0.0 END AS removed_frac
    FROM sized LEFT JOIN per_doc ON sized.doc_id = per_doc.id
    GROUP BY source
    """,
)
def substring_span_trim(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Token-level trim accounting — the SPAN-LEVEL removal mode of
    exact-substring dedup (Lee et al. remove the duplicated substring
    and keep the rest of the document; ``substring_span_prune`` is the
    doc-level mode): per source, how many TOKENS would be cut if every
    foreign verbatim span were excised. A span occurrence is foreign
    exactly as in the prune query — its hash occurs in ≥2 documents
    and this document is not the span group's min-doc_id canonical
    holder — so trim and prune share one canonicality definition.

    Overlapping foreign spans must not double-count tokens (two
    adjacent 20-token spans shifted by one cover 21 tokens, not 40),
    so per document the POSITIONAL occurrences ([i, i+19] intervals)
    are merged with the classic gaps-and-islands pass: order by start,
    new island when the start clears the running max end (windows over
    the doc key — unique start positions make the order total), then
    island coverage = max_start + 19 - min_start + 1, summed per doc.
    All integer math to one terminal double quotient.

    Scale shape: linear like the rest of the family — the span-hash
    window (df + canonical holder, one exchange on the 8-byte hash)
    runs on the per-(id, h) folded relation (``_span_foreign_occ``:
    positions ride the fold as tiny arrays, so the md5 chain is
    evaluated ONCE, r15), and every later window keys on the doc id.
    No pairwise expansion, no unbounded state; the doc-key windows
    are bounded by document length. Uses
    ``positional_shingle_hashes`` (the winnowing family's ordered
    stream) — same md5 slice/array_join pipeline the oracles pin
    bit-exactly.
    """
    docs = load(spark, sf_dir, "documents")
    occ = _span_foreign_occ(docs)
    prev = (
        W.partitionBy("id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    run = (
        W.partitionBy("id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    grp = occ.select(
        "id",
        "i",
        F.sum(
            (
                F.col("i")
                > F.coalesce(
                    F.max(F.col("i") + (SPAN_N - 1)).over(prev), F.lit(-1)
                )
            ).cast("int")
        )
        .over(run)
        .alias("g"),
    )
    per_doc = (
        grp.groupBy("id", "g")
        .agg((F.max("i") + (SPAN_N - 1) - F.min("i") + 1).alias("covered"))
        .groupBy("id")
        .agg(F.sum("covered").alias("removed"))
    )
    sized = docs.select(
        F.col("doc_id").alias("id"),
        "source",
        F.size(F.split("text", " ")).alias("n_toks"),
    )
    removed = F.coalesce(F.col("removed"), F.lit(0))
    return (
        sized.join(per_doc, "id", "left")
        .groupBy("source")
        .agg(
            F.count("*").alias("n_docs"),
            F.sum(F.when(removed > 0, 1).otherwise(0)).alias(
                "n_docs_trimmed"
            ),
            F.sum("n_toks").alias("tokens_total"),
            F.sum(removed).alias("tokens_removed"),
        )
        .withColumn(
            "removed_frac",
            F.when(
                F.col("tokens_total") > 0,
                F.col("tokens_removed").cast("double")
                / F.col("tokens_total").cast("double"),
            ).otherwise(F.lit(0.0)),
        )
    )


# Corpus-size-aware batch modulus for substring_span_incremental (r11
# ADVICE item 3): a FIXED 1/5 batch is corpus-proportional, so at some
# SF it would start tripping decontaminate_against_index's loud
# EVAL_SNAPSHOT_MAX_ROWS bound by design. The modulus instead grows
# with the corpus along BOTH axes that size the collected batch — the
# document count AND a token upper bound (r12 review: a doc-count-only
# modulus still tripped the 5M-SPAN-ROW bound on long-document corpora
# at ~1000+ tokens/doc) — so the arriving batch stays bounded at any
# SF and any document-length profile. Tokens per doc are bounded above
# by (n_chars+1)/2 (every token needs >= 1 char + separator) and
# spans/doc <= tokens/doc, so batch span rows <= token_ub / m;
# INCR_BATCH_TARGET_TOKENS = 2M leaves a 2.5x margin under the 5M
# bound for residue skew. Floor 5 keeps the family-standard
# doc_id % 5 = 4 stand-in (and every recorded hash) at all test SFs
# (measured token_ub: 77k/75k/744k at the three SFs -> m = 5); the
# ceil is float math so the DuckDB twin (greatest of the same three
# terms) is the same IEEE expression.
INCR_BATCH_TARGET_DOCS = 5000
INCR_BATCH_TARGET_TOKENS = 2_000_000


def _incr_batch_modulus(n_docs: int, token_ub: int) -> int:
    import math

    return max(
        5,
        math.ceil(n_docs / float(INCR_BATCH_TARGET_DOCS)),
        math.ceil(token_ub / float(INCR_BATCH_TARGET_TOKENS)),
    )


@_q(
    "substring_span_incremental",
    f"""
    WITH {dedup.shingles_cte(SPAN_N)},
    params AS (SELECT greatest(5,
                 CAST(ceil(count(*)
                      / {INCR_BATCH_TARGET_DOCS}.0) AS BIGINT),
                 CAST(ceil(sum((n_chars + 1) // 2)
                      / {INCR_BATCH_TARGET_TOKENS}.0) AS BIGINT)) AS m
               FROM documents),
    old AS (SELECT DISTINCT shingle FROM shingles, params
            WHERE id % m <> 4),
    batch AS (SELECT id, shingle FROM shingles, params WHERE id % m = 4),
    per_doc AS (SELECT id, count(*) AS n_spans FROM batch GROUP BY id),
    hits AS (SELECT b.id, count(*) AS n_hit
             FROM batch b JOIN old o USING (shingle) GROUP BY b.id),
    docs AS (SELECT doc_id, source FROM documents, params
             WHERE doc_id % m = 4)
    SELECT d.doc_id, d.source,
           CAST(coalesce(p.n_spans, 0) AS BIGINT) AS n_spans,
           CAST(coalesce(h.n_hit, 0) AS BIGINT) AS n_hit,
           coalesce(h.n_hit, 0) > 0 AS contaminated
    FROM docs d LEFT JOIN per_doc p ON d.doc_id = p.id
                LEFT JOIN hits h ON d.doc_id = h.id
    """,
)
def substring_span_incremental(spark: SparkSession, sf_dir: str) -> DataFrame:
    """Incremental exact-substring admission: one arriving batch (the
    family-standard ``doc_id % 5 = 4`` stand-in for 'the newly arrived
    slice') checked for verbatim SPAN_N(=20)-token overlap against the
    ALREADY-ADMITTED corpus's persisted span index — without ever
    re-scanning the admitted corpus. One (doc_id, source, n_spans,
    n_hit, contaminated) verdict per batch document, the span family's
    analog of ``dedup_incremental_batch``'s stored-index lifecycle.

    Storage + probe REUSE the decontamination machinery wholesale: the
    span index is a gram index whose grams are the 8-byte span hashes
    — written once per corpus vintage via ``build_once``, partitioned
    on ``dedup.gram_bucket`` (the ONE bucket function both sides must
    share), and probed by ``dedup.decontaminate_against_index``, which
    broadcasts the batch's spans, statically prunes the index scan to
    the buckets those spans hash into, and keeps the index
    exchange-free. Batch cost is O(batch + matched buckets),
    independent of corpus size; the batch side must be driver-sized
    (EVAL_SNAPSHOT_MAX_ROWS enforces it loudly). The batch predicate
    is corpus-size-AWARE (r11 ADVICE; hardened r12 review): the
    modulus grows with BOTH the document count and a per-corpus token
    upper bound (``_incr_batch_modulus`` — 5 at every test SF, so the
    family-standard ``doc_id % 5 = 4`` stand-in and every recorded
    hash are unchanged), keeping the arriving batch's SPAN ROWS
    bounded at any SF and any document-length profile — so the
    catalog entry keeps running as the corpus grows rather than
    raising the loud bound by design (the bound itself stays armed as
    the backstop). The sizing aggregate is one 1-row driver action
    over the 2-column (doc_id, n_chars) projection. Zero-span and
    zero-hit batch docs are restored by the terminal batch-sized left
    joins.
    """
    from etl_projects_spark.operators.exec_util import build_once
    from etl_projects_spark.queries_llm import _corpus_scratch

    docs = load(spark, sf_dir, "documents")
    spans = dedup.word_shingles(docs, n=SPAN_N)  # (id, shingle) distinct
    sizing = docs.agg(
        F.count("*").alias("n"),
        F.sum(F.floor((F.col("n_chars") + 1) / 2)).alias("tok_ub"),
    ).collect()[0]
    m = _incr_batch_modulus(sizing["n"], int(sizing["tok_ub"] or 0))
    is_new = F.col("id") % m == 4
    path = _corpus_scratch(sf_dir, f"spanidx{SPAN_N}")

    def _build(tmp: str) -> None:
        # Bucket-partitioned distinct-span index of the admitted
        # corpus — the EXACT layout discipline of its sibling
        # train_gram_index: one shuffle task per bucket → one file per
        # directory (without it every distinct task slivers into every
        # bucket dir). Measured vs the REBALANCE hint on this write:
        # repartition 2.3 s vs rebalance 4.5 s at sf0.1, same 64
        # files. At 100 TB the task count scales by raising
        # GRAM_INDEX_BUCKETS with corpus size (the constant's own
        # documented contract), not by splitting buckets across tasks.
        (
            spans.filter(~is_new)
            .select(F.col("shingle").alias("gram"))
            .distinct()
            .withColumn("gbucket", dedup.gram_bucket("gram"))
            .repartition(dedup.GRAM_INDEX_BUCKETS, "gbucket")
            .write.mode("overwrite")
            .partitionBy("gbucket")
            .parquet(tmp)
        )

    build_once(path, _build)
    index = spark.read.parquet(path)
    # Snapshot the batch's span relation ONCE (r12 VERDICT item 3 —
    # the probe's 7.3 s driver-bench steady state was this relation
    # computed THREE times per call: decontaminate's pre-count, its
    # toArrow snapshot, and the per-doc span count below; measured
    # 6.9 → 3.7 s at sf0.1 after the single snapshot). The driver
    # materialization is bounded BEFORE it runs — but by the BATCH's
    # OWN token upper bound, not the corpus-mean argument (r13 review:
    # token_ub / m only bounds the MEAN residue class; an ingest order
    # that batches long documents into the same class can exceed it).
    # This second sizing aggregate scans the same 2-column (doc_id,
    # n_chars) projection restricted to the batch residue — no
    # tokenization, cost-class of the first aggregate — and raises the
    # SAME loud error as decontaminate's bound while everything is
    # still distributed. The modulus keeps the EXPECTED batch 2.5×
    # under the bound; this check makes the worst case loud instead of
    # a silent driver OOM. decontaminate re-checks on the (now local,
    # recompute-free) relation as the backstop. Arrow both ways for
    # the same exactness reasons as the decontaminate snapshot itself
    # (int64 ids, nulls).
    batch_tok_ub = int(
        docs.filter(F.col("doc_id") % m == 4)
        .agg(F.sum(F.floor((F.col("n_chars") + 1) / 2)))
        .collect()[0][0]
        or 0
    )
    if batch_tok_ub > dedup.EVAL_SNAPSHOT_MAX_ROWS:
        raise ValueError(
            f"substring_span_incremental: the arriving batch's span "
            f"rows are bounded by {batch_tok_ub} tokens "
            f"(> {dedup.EVAL_SNAPSHOT_MAX_ROWS}); the batch must stay "
            "driver-sized (it is snapshot AND broadcast). Shrink the "
            "batch (raise the modulus) or raise GRAM_INDEX_BUCKETS "
            "and probe in sub-batches."
        )
    batch_lazy = spans.filter(is_new).select(
        F.col("id").alias("doc_id"), F.col("shingle").alias("gram")
    )
    snap = batch_lazy.toArrow()
    batch = spark.createDataFrame(snap, schema=batch_lazy.schema)
    # stable_input (r16): ``batch`` is the driver-local snapshot built
    # two lines up, so the probe's own defensive count + re-snapshot
    # (three driver jobs per invocation on this, the catalog's highest
    # job-count query) re-proved what this function just established;
    # the driver-size bound is enforced against the snapshot's actual
    # row count.
    hits = dedup.decontaminate_against_index(
        batch, index, stable_input=True, n_rows=snap.num_rows
    )
    per_doc = batch.groupBy("doc_id").agg(F.count("*").alias("n_spans"))
    n_spans = F.coalesce(F.col("n_spans"), F.lit(0))
    n_hit = F.coalesce(F.col("n_hit"), F.lit(0))
    return (
        docs.filter(F.col("doc_id") % m == 4)
        .select("doc_id", "source")
        .join(per_doc, "doc_id", "left")
        .join(hits, "doc_id", "left")
        .select(
            "doc_id",
            "source",
            n_spans.alias("n_spans"),
            n_hit.alias("n_hit"),
            (n_hit > 0).alias("contaminated"),
        )
    )


@_q(
    "substring_span_rewrite",
    f"""
    WITH {_span_pos_cte(SPAN_N)},
    docdist AS (SELECT DISTINCT id, h FROM pos),
    keyed AS (SELECT id, h,
                     count(*) OVER (PARTITION BY h) AS df_,
                     min(id) OVER (PARTITION BY h) AS min_id
              FROM docdist),
    foreign_keys AS (SELECT id, h FROM keyed WHERE df_ >= 2 AND id <> min_id),
    occ AS (SELECT p.id, p.i FROM pos p
            JOIN foreign_keys f ON p.id = f.id AND p.h = f.h),
    isl AS (SELECT id, i,
                   CASE WHEN i > coalesce(max(i + {SPAN_N - 1}) OVER (
                          PARTITION BY id ORDER BY i
                          ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING),
                        -1)
                        THEN 1 ELSE 0 END AS new_island
            FROM occ),
    grp AS (SELECT id, i, sum(new_island) OVER (
                  PARTITION BY id ORDER BY i
                  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW) AS g
            FROM isl),
    iv AS (SELECT id, g, min(i) AS lo, max(i) + {SPAN_N - 1} AS hi
           FROM grp GROUP BY id, g),
    cover AS (SELECT id, unnest(generate_series(lo, hi)) AS p FROM iv),
    tok AS (SELECT id, toks, unnest(generate_series(1, len(toks))) AS p
            FROM toks),
    keptpos AS (SELECT t.id, t.p, t.toks[t.p] AS tokn
                FROM tok t LEFT JOIN cover c ON t.id = c.id AND t.p = c.p
                WHERE c.p IS NULL),
    trimmed AS (SELECT id,
                       coalesce(string_agg(tokn, ' ' ORDER BY p), '')
                         AS text_trimmed,
                       count(*) AS n_kept
                FROM keptpos GROUP BY id),
    sized AS (SELECT doc_id, source,
                     len(string_split(text, ' ')) AS n FROM documents)
    SELECT s.doc_id, s.source,
           CAST(s.n AS BIGINT) AS n_toks,
           CAST(s.n - coalesce(tr.n_kept, 0) AS BIGINT) AS n_removed,
           coalesce(tr.text_trimmed, '') AS text_trimmed
    FROM sized s LEFT JOIN trimmed tr ON s.doc_id = tr.id
    """,
)
def substring_span_rewrite(spark: SparkSession, sf_dir: str) -> DataFrame:
    """The trimmed corpus ITSELF — completing Lee et al.'s remove-mode
    the way ``substring_span_prune`` completed the doc-level mode (and
    mirroring ``chunk_dedup_rewrite``'s accounting→rewrite precedent):
    one row per document with the foreign verbatim spans excised from
    its text. ``substring_span_trim`` counts the removable tokens;
    this query emits what a training-data pipeline actually ships —
    every token whose position falls inside a merged foreign-span
    interval is dropped, the rest are rejoined in order. Foreign and
    island semantics are byte-identical to trim's (same span-hash
    window, same min-doc_id canonicality, same gaps-and-islands
    merge), so rewrite's removal counts reconcile with trim's
    accounting by construction.

    Spark shape: the positional chain up to the merged islands is
    trim's (one corpus-scale span-hash window + doc-key windows, all
    linear); the islands then collapse to ONE interval-array row per
    document (collect_list over the per-doc handful of merged islands
    — bounded by doc length / SPAN_N, never corpus-scale), broadcast-
    joinable back to the documents scan, and the excision itself is a
    pure JVM higher-order expression (transform with index → filter
    against the interval array → array_join): no explode of the
    corpus's tokens, no Python stage, no pairwise anything. Per-token
    cost is O(islands-per-doc) with islands a per-doc constant — the
    oracle's token-level anti-join is the relational twin the
    expression avoids paying at scale.
    """
    docs = load(spark, sf_dir, "documents")
    # Foreign occurrences via _span_foreign_occ (shared with trim —
    # one canonicality definition; the positional md5 chain is
    # evaluated once, r15).
    occ = _span_foreign_occ(docs)
    prev = (
        W.partitionBy("id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, -1)
    )
    run = (
        W.partitionBy("id")
        .orderBy("i")
        .rowsBetween(W.unboundedPreceding, 0)
    )
    grp = occ.select(
        "id",
        "i",
        F.sum(
            (
                F.col("i")
                > F.coalesce(
                    F.max(F.col("i") + (SPAN_N - 1)).over(prev), F.lit(-1)
                )
            ).cast("int")
        )
        .over(run)
        .alias("g"),
    )
    per_doc_ivs = (
        grp.groupBy("id", "g")
        .agg(
            F.min("i").alias("lo"),
            (F.max("i") + (SPAN_N - 1)).alias("hi"),
        )
        .groupBy("id")
        .agg(F.sort_array(F.collect_list(F.struct("lo", "hi"))).alias("ivs"))
    )
    base = docs.select(
        F.col("doc_id").alias("id"),
        "source",
        F.split("text", " ").alias("toks"),
    )
    ivs = F.coalesce(
        F.col("ivs"), F.array().cast("array<struct<lo:int,hi:int>>")
    )
    # 1-based token positions to match the span offsets; the excision
    # is transform-with-index → filter-against-intervals → array_join,
    # all whole-stage-codegen'd JVM expressions.
    with_pos = F.transform(
        F.col("toks"),
        lambda t, j: F.struct(t.alias("t"), (j + 1).alias("p")),
    )
    kept = F.filter(
        with_pos,
        lambda s: ~F.exists(
            ivs, lambda iv: (s["p"] >= iv["lo"]) & (s["p"] <= iv["hi"])
        ),
    )
    return (
        base.join(per_doc_ivs, "id", "left")
        .select(
            F.col("id").alias("doc_id"),
            "source",
            F.size("toks").cast("long").alias("n_toks"),
            (F.size("toks") - F.size(kept)).cast("long").alias("n_removed"),
            F.array_join(
                F.transform(kept, lambda s: s["t"]), " "
            ).alias("text_trimmed"),
        )
    )
