"""Plan regressions: pin the physical properties the headline queries
were tuned for — pushed filters, broadcast dimensions, bounded
shuffles, top-k pushdown, pruned scans."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from etl_projects_spark.plans.audit import assert_plan, audit

SF_DIR = "/root/testdata/sf0.001"
QS = entrymod.queries()


def test_q1_pushes_filter_and_prunes(spark):
    df = QS["q1_pricing_summary"](spark, SF_DIR)
    a = audit(df)
    assert a["pushed_filters"]
    # Scan must not read columns the query never touches.
    assert all("l_partkey" not in cols for cols in a["scan_columns"])
    assert not a["cartesian"]


def test_q3_q5_broadcast_dimensions(spark):
    for name in ("q3_top_orders", "q5_local_supplier_volume", "q10_returned_revenue"):
        assert_plan(QS[name](spark, SF_DIR), cartesian=False,
                    broadcast_joins=(">=", 1))


def test_topk_uses_take_ordered(spark):
    assert_plan(QS["sort_limit_topk"](spark, SF_DIR), top_k_pushdown=True)


def test_grouped_topk_uses_window_group_limit(spark):
    assert_plan(QS["window_top_suppliers_per_nation"](spark, SF_DIR),
                window_group_limit=True)


def test_text_ops_stay_jvm_side(spark):
    for name in ("text_stats", "text_quality_score", "text_lang_id"):
        assert_plan(QS[name](spark, SF_DIR), python_stages=0)


def test_scan_agg_single_shuffle(spark):
    # Pure scan→groupBy queries must shuffle at most once.
    for name in ("q1_pricing_summary", "q6_selective_revenue"):
        assert_plan(QS[name](spark, SF_DIR), shuffles=("<=", 1))


def test_bm25_two_shuffles_no_python(spark):
    assert_plan(QS["bm25_retrieval"](spark, SF_DIR),
                python_stages=0, shuffles=("<=", 2), top_k_pushdown=True)


def test_knn_join_single_python_stage(spark):
    # One mapInPandas over the corpus; no corpus-sized shuffle — the
    # only exchange feeds the final queries·k·partitions window.
    assert_plan(QS["ann_knn_join"](spark, SF_DIR),
                python_stages=1, cartesian=False)


def test_incremental_dedup_broadcasts_batch(spark):
    # The batch probes the stored index via broadcast: the index side
    # must never shuffle, the verify stays JVM-side, and the ONLY
    # sort-merge join allowed is the final batch-sized verdict join on
    # doc ids — a band-keyed SMJ would mean the stored index gets
    # reshuffled on every arriving batch (r7 VERDICT item 5: this is
    # a bench-top-10 query; its load-bearing shape was unpinned).
    from etl_projects_spark.plans.audit import plan_string

    df = QS["dedup_incremental_batch"](spark, SF_DIR)
    assert_plan(df, broadcast_joins=(">=", 1), cartesian=False,
                python_stages=0, nested_loop_joins=0,
                sortmerge_joins=("<=", 1), shuffles=("<=", 14))
    plan = plan_string(df)
    assert "spark_graft_lsh_" in plan, "persisted band index not scanned"
    assert "spark_graft_sets_" in plan, "persisted shingle sets not scanned"
    band_smj = [ln for ln in plan.splitlines()
                if "SortMergeJoin" in ln and "band" in ln]
    assert not band_smj, band_smj


def test_pack_token_spans_no_global_window(spark):
    from etl_projects_spark.plans.audit import plan_string
    df = QS["pack_token_spans"](spark, SF_DIR)
    # The two-phase prefix sum buckets rows by a pure expression over
    # driver-collected quantile boundaries (_pid) and windows within
    # each bucket — the plan must show the bucket-keyed hash exchange,
    # NOT a single-partition corpus window (and since the r6-late
    # redesign, no range exchange either: repartitionByRange re-samples
    # its boundaries per plan branch, DETERMINISM.md recipe 30).
    plan = plan_string(df)
    assert "hashpartitioning(_pid" in plan, plan[:800]
    assert "rangepartitioning" not in plan, plan[:800]
    # Exactly one Exchange SinglePartition is the DESIGN: the offset
    # table (n_parts rows, post-aggregate) runs its cumsum in one tiny
    # task. The corpus itself must never collapse — a second
    # SinglePartition exchange would mean the naive global window.
    assert plan.count("Exchange SinglePartition") <= 1, plan[:800]
    assert_plan(df, python_stages=0, cartesian=False)


def test_multiprobe_lsh_zero_shuffles(spark):
    # Multi-probe LSH is per-row signature compute + broadcast of the
    # 1-row query: candidate generation must not shuffle the corpus.
    assert_plan(QS["ann_lsh_multiprobe_topk"](spark, SF_DIR),
                shuffles=0, range_exchanges=0, single_exchanges=0,
                cartesian=False, top_k_pushdown=True)


def test_knn_join_exactly_one_shuffle(spark):
    # The only exchange is the queries·k·partitions window cut; the
    # corpus itself never reshuffles.
    assert_plan(QS["ann_knn_join"](spark, SF_DIR), shuffles=("<=", 1))


def test_ivf_topk_scans_only_probed_clusters(spark, tmp_path):
    """The materialized-index path must show partition pruning: the
    scan reads only the probed cluster directories, never the full
    corpus, and serves the query without a shuffle."""
    from etl_projects_spark.operators import similarity
    from etl_projects_spark.plans.audit import plan_string
    from etl_projects_spark.queries import load

    df = load(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf_index")
    similarity.ivf_write_index(df, path)
    qvec = df.filter("vec_id = 7").select("embedding").toPandas()[
        "embedding"
    ].iloc[0]
    out = similarity.ivf_topk_indexed(spark, path, qvec, k=10, exclude_id=7)
    plan = plan_string(out)
    import re

    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), f"no cluster partition filter: {plan[:500]}"
    assert_plan(out, shuffles=0, top_k_pushdown=True)


def test_ivf_pq_codes_scan_and_rerank_pruned(spark, tmp_path):
    """The IVF-PQ serve path's two pruned scans: the ADC stage reads
    ONLY (vec_id, codes) of the probed cluster partitions — never the
    embedding column (column pruning is what makes PQ's compact
    representation real in a columnar lake) — via a pure-JVM
    expression fold with TakeOrderedAndProject; the exact re-rank
    scan carries both the cluster partition filter and the pushed-down
    shortlist-id filter. No shuffle in either stage."""
    import json
    import os
    import re

    import numpy as np

    from etl_projects_spark.operators import similarity
    from etl_projects_spark.plans.audit import plan_string
    from etl_projects_spark.queries import load

    df = load(spark, SF_DIR, "embeddings")
    path = str(tmp_path / "ivf_pq_index")
    similarity.ivf_pq_write_index(df, path)
    with open(os.path.join(path, "_ivf_pq_codebooks.json")) as f:
        side = json.load(f)
    cents = np.array(side["centroids"])
    books = np.array(side["pq_codebooks"])
    qvec = df.filter("vec_id = 7").select("embedding").toPandas()[
        "embedding"
    ].iloc[0]
    qn = np.asarray(qvec, dtype=np.float64)
    qn /= np.maximum(np.linalg.norm(qn), 1e-12)
    probes = [int(c) for c in np.argsort(-(cents @ qn))[: similarity.IVF_PROBE]]

    short = similarity.pq_adc_shortlist(
        spark, path, qn, books, probes, exclude_id=7
    )
    a = audit(short)
    assert all("embedding" not in cols for cols in a["scan_columns"]), (
        "ADC stage must not read the vector column"
    )
    assert_plan(short, shuffles=0, python_stages=0, top_k_pushdown=True)
    plan = plan_string(short)
    m = re.search(r"PartitionFilters: \[([^\]]*)\]", plan)
    assert m and "cluster" in m.group(1), "ADC scan must prune clusters"

    out = similarity.ivf_pq_topk_indexed(spark, path, qvec, k=10, exclude_id=7)
    a2 = audit(out)
    assert a2["pushed_filters"], "re-rank scan must push the shortlist ids"
    assert_plan(out, shuffles=0, top_k_pushdown=True)
    plan2 = plan_string(out)
    m2 = re.search(r"PartitionFilters: \[([^\]]*)\]", plan2)
    assert m2 and "cluster" in m2.group(1), "re-rank scan must prune clusters"


def test_ivf_pq_recall_report_plan(spark):
    # Two Arrow stages (the bounded knn_join probe scorer + the PQ
    # pair-ADC scorer), the per-probe shortlist cut as
    # WindowGroupLimit (partial top-R BEFORE the pair shuffle), the
    # probe map broadcast — and never a corpus-sized exchange chain.
    assert_plan(QS["ann_ivf_pq_recall_report"](spark, SF_DIR),
                python_stages=2, shuffles=("<=", 2), cartesian=False,
                window_group_limit=True, broadcast_joins=(">=", 1))


def test_doremi_stays_jvm_side_bounded_shuffles(spark):
    # Corpus-sized work is the shared bigram-surprise model (its
    # counting/scoring shuffles); everything after collapses to ONE
    # row and the multiplicative-weights iteration is a linear chain
    # of array expressions — no Python, no cartesian, no per-iteration
    # exchange (a crossJoin-per-scalar formulation re-references the
    # corpus subtree exponentially; this pin keeps it out).
    assert_plan(QS["doremi_domain_reweight"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 6))


def test_funnel_single_shuffle_jvm_side(spark):
    # The ordered funnel pays ONE user-key shuffle (collect + array
    # HOFs), not a per-stage join cascade, and stays in codegen.
    assert_plan(QS["funnel_user_conversion"](spark, SF_DIR),
                shuffles=("<=", 1), python_stages=0, cartesian=False)


def test_bigram_single_shuffle_topk(spark):
    # Adjacent pairs form inside the array: no self-join, one count
    # shuffle, top-50 via TakeOrderedAndProject.
    assert_plan(QS["ngram_bigram_topk"](spark, SF_DIR),
                shuffles=("<=", 1), python_stages=0, top_k_pushdown=True)


def test_tfidf_window_group_limit(spark):
    # The per-doc top-3 cut must run as WindowGroupLimit (partial
    # top-k before the shuffle), never a full rank-then-filter.
    assert_plan(QS["tfidf_top_terms"](spark, SF_DIR),
                window_group_limit=True, python_stages=0, cartesian=False)


def test_length_filter_no_corpus_shuffle(spark):
    # Percentile bounds broadcast into the scan-side filter: the
    # corpus itself never shuffles.
    assert_plan(QS["doc_length_percentile_filter"](spark, SF_DIR),
                shuffles=0, range_exchanges=0, python_stages=0)


def test_higher_order_funcs_zero_shuffle_jvm_side(spark):
    # The whole audit is one codegen'd projection over the scan.
    assert_plan(QS["higher_order_array_funcs"](spark, SF_DIR),
                python_stages=0, shuffles=0, range_exchanges=0,
                single_exchanges=0, cartesian=False)


def test_funnel_fertility_single_scan_single_shuffle(spark):
    # Conditional-aggregation reports: one scan, at most one exchange,
    # never a per-stage pass or a self-join.
    for name in ("filter_funnel_report", "fertility_by_source",
                 "train_split_assign"):
        assert_plan(QS[name](spark, SF_DIR),
                    python_stages=0, shuffles=("<=", 1), cartesian=False)


def test_chunk_dedup_linear_no_pairwise(spark):
    # Chunk dedup is explode → df-agg → join-back → per-doc agg: all
    # linear. A pairwise/self-join formulation would show a cartesian
    # or an extra corpus-sized exchange chain.
    assert_plan(QS["chunk_dedup_rewrite"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 4))


def test_semdedup_reads_materialized_index(spark):
    from etl_projects_spark.plans.audit import plan_string
    df = QS["semdedup_prune"](spark, SF_DIR)
    plan = plan_string(df)
    # Served from the cluster-partitioned index: the scan must be the
    # scratch index table (not the raw corpus parquet), grouped per
    # cluster with exactly the one shuffle the groupBy needs.
    assert "spark_graft_ivf_" in plan, "expected the materialized index scan"
    assert_plan(df, python_stages=1, cartesian=False, shuffles=("<=", 1))


def test_edit_distance_verify_stays_on_candidates(spark):
    # Levenshtein (JVM expression) runs only on LSH candidates; text
    # lookups are equi-joins — never a corpus×corpus product.
    # Shuffle count is only meaningful on a cold plan: a warm cache
    # from an earlier test re-prints the cached subtree's lineage and
    # inflates the textual Exchange count.
    spark.catalog.clearCache()
    assert_plan(QS["dedup_edit_distance"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 1))


def test_embedding_similarity_join_bucketed_not_all_pairs(spark):
    # Candidates come from the bucket equi-join: never a cartesian or
    # nested-loop product of the two corpora; one Arrow stage scores
    # candidate pairs.
    assert_plan(QS["embedding_similarity_join"](spark, SF_DIR),
                cartesian=False, nested_loop_joins=0,
                python_stages=("<=", 1))


def test_repartition_partition_files_single_file_per_value(spark):
    # The written table reads back pruned to the 4 report columns; the
    # report is one exchange over the partition key.
    assert_plan(QS["repartition_partition_files"](spark, SF_DIR),
                cartesian=False, python_stages=0, shuffles=("<=", 2))


def test_gopher_repetition_row_local(spark):
    # Both repetition statistics are row-local array HOFs: the filter
    # must stream with the scan — zero exchanges, zero Python.
    assert_plan(QS["gopher_repetition_filter"](spark, SF_DIR),
                shuffles=0, range_exchanges=0, single_exchanges=0,
                python_stages=0, cartesian=False)


def test_jaccard_fallback_sizes_join_unhinted(spark):
    # The no-candidates jaccard path joins pair counts to PER-DOCUMENT
    # shingle sizes: that relation must never carry a broadcast HINT
    # (one row per document = a driver-killing broadcast at 100 TB).
    # AQE may still choose broadcast from runtime stats at test scale —
    # that's the design — so the pin is on the hint, not the strategy.
    spark.catalog.clearCache()
    for name in ("dedup_ngram_jaccard", "dedup_jaccard_df_capped"):
        df = QS[name](spark, SF_DIR)
        opt = df._jdf.queryExecution().optimizedPlan().toString()
        assert "strategy=broadcast" not in opt, f"{name} hints a broadcast"
        assert_plan(df, cartesian=False, python_stages=0)


def test_jaccard_df_cap_rides_exchange_reuse_unpinned(spark):
    # r12 (r11 ADVICE): jaccard_pairs' max_doc_freq path dropped its
    # per-invocation persist (the leaked-pin class substring_span_pairs
    # shed in r11). The replacement load-bearing shape is exchange
    # reuse — the capped relation's two consumer branches (per-id
    # sizes, per-shingle groups) share byte-identical corpus-scale
    # Exchange subtrees, so the executed plan must read the second
    # branch as a ReusedExchange — and the query must leave NOTHING
    # pinned in the cache manager. Pinned for both catalog consumers
    # of the df-capped path.
    for name in ("dedup_jaccard_df_capped", "lsh_recall_report"):
        spark.catalog.clearCache()
        df = QS[name](spark, SF_DIR)
        df.collect()
        executed = df._jdf.queryExecution().executedPlan().toString()
        assert "ReusedExchange" in executed, (
            f"{name}: capped-relation branches no longer share their "
            "exchange — the corpus-scale md5 subtree computes twice\n"
            + executed[:1200]
        )
        jcat = spark._jsparkSession.sharedState().cacheManager()
        assert jcat.isEmpty(), f"{name} left a cached relation pinned"


def test_ewma_band_join_bounded(spark):
    # Banded self-join over the pre-aggregated daily relation: no
    # cartesian, no Python, bounded shuffles.
    assert_plan(QS["ewma_daily_value"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 3))


def test_weighted_sample_window_group_limit(spark):
    # rk <= 3 must push into WindowGroupLimit (per-source top-k, no
    # full per-partition sort of the corpus).
    assert_plan(QS["weighted_sample_topk"](spark, SF_DIR),
                window_group_limit=True, shuffles=("<=", 1))


def test_phrase_search_postings_pruned_before_join(spark):
    # Postings are filtered to the two query terms before the
    # adjacency equi-join; no cartesian, no Python.
    assert_plan(QS["phrase_search_positions"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 3))


def test_correlation_matrix_single_pass(spark):
    # One scan, one aggregate to a single row, however wide the matrix.
    assert_plan(QS["correlation_matrix_lineitem"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 1))


def test_component_histogram_reads_persisted_labels(spark):
    from etl_projects_spark.plans.audit import plan_string
    df = QS["dedup_component_size_histogram"](spark, SF_DIR)
    # Two tiny aggregations over the persisted label read — never the
    # label-propagation recompute.
    assert "spark_graft_cc_" in plan_string(df)


def test_debounce_single_stream_shuffle(spark):
    # One lag window + final agg inside the (user, type) partitioning.
    assert_plan(QS["events_debounce"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 2))


def test_fixed_size_sample_window_group_limit(spark):
    assert_plan(QS["fixed_size_per_group_sample"](spark, SF_DIR),
                window_group_limit=True, shuffles=("<=", 1))


def test_weighted_median_no_global_sort(spark):
    # Per-group cumulative window: the only exchange is the group-key
    # hash partitioning, never a global range sort.
    from etl_projects_spark.plans.audit import plan_string
    df = QS["weighted_median_price"](spark, SF_DIR)
    assert "rangepartitioning" not in plan_string(df)
    assert_plan(df, python_stages=0, cartesian=False, shuffles=("<=", 2))


def test_triangles_two_equi_joins_no_cartesian(spark):
    from etl_projects_spark.plans.audit import plan_string
    df = QS["dedup_graph_triangles"](spark, SF_DIR)
    # Edges come from the persisted pair-list artifact, never a re-run
    # of the shingle->signature->verify chain.
    assert "spark_graft_pairs_" in plan_string(df)
    assert_plan(df, cartesian=False, python_stages=0)


def test_pivot_multi_agg_single_pass(spark):
    # pivot().agg(count, sum) over declared values: one scan; Spark
    # plans it as a two-level aggregation ((day,type) pre-agg, then the
    # pivot-to-columns agg) so only the compact matrix shuffles twice —
    # and no distinct-values pre-query.
    assert_plan(QS["pivot_multi_agg_daily"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 2))


def test_partition_checksums_single_shuffle(spark):
    assert_plan(QS["partition_checksums"](spark, SF_DIR),
                python_stages=0, cartesian=False, shuffles=("<=", 1))


def test_cdc_changelog_single_key_shuffle(spark):
    # The log is ranked once on the key; no self-join, no cartesian.
    assert_plan(QS["cdc_changelog_apply"](spark, SF_DIR),
                shuffles=("<=", 1), cartesian=False, python_stages=0)


def test_incremental_agg_partial_merge_shape(spark):
    # Two partial aggregates + final merge: bounded shuffles, all JVM.
    assert_plan(QS["incremental_agg_maintenance"](spark, SF_DIR),
                shuffles=("<=", 3), cartesian=False, python_stages=0)


def test_regr_trend_broadcasts_dimensions(spark):
    # customer/nation broadcast; the only shuffles are the two
    # aggregation levels (daily grid, then regression moments).
    assert_plan(QS["regr_trend_nation"](spark, SF_DIR),
                broadcast_joins=(">=", 2), cartesian=False,
                shuffles=("<=", 2), python_stages=0)


def test_prefix_containment_blocked_equi_join(spark):
    # The containment pairs come from a head-key equi-join — never a
    # cartesian — and verification stays JVM-side.
    assert_plan(QS["dedup_prefix_containment"](spark, SF_DIR),
                cartesian=False, python_stages=0)


def test_phash_neardup_banded_join_one_python_stage(spark):
    # One Arrow stage extracts the hash; candidates come from the
    # banded equi-join (pigeonhole-exact), never all-pairs.
    assert_plan(QS["media_phash_neardup"](spark, SF_DIR),
                cartesian=False, python_stages=("<=", 2),
                shuffles=("<=", 1))


def test_attribution_banded_equi_join_no_cartesian(spark):
    # The 7-day lookback is an equi-join on (user, band) + residual
    # filter; candidates then rank per purchase — no cartesian anywhere.
    assert_plan(QS["attribution_first_touch"](spark, SF_DIR),
                cartesian=False, python_stages=0)


def test_zscore_broadcasts_group_moments(spark):
    # The corpus never reshuffles: group moments aggregate small and
    # broadcast back.
    assert_plan(QS["zscore_doc_length_by_source"](spark, SF_DIR),
                broadcast_joins=(">=", 1), cartesian=False,
                python_stages=0)


def test_vocab_id_single_partition_only_on_vocab(spark):
    # The corpus-scale work (explode → agg) shuffles normally; only the
    # vocab-sized result may pass through the id-assigning single
    # partition.
    assert_plan(QS["vocab_id_assign"](spark, SF_DIR),
                cartesian=False, python_stages=0)


def test_session_path_single_user_shuffle_then_topk(spark):
    # lag + running-sum + per-session collect reuse one user-key
    # partitioning; the final top-k is TakeOrderedAndProject.
    assert_plan(QS["session_path_topk"](spark, SF_DIR),
                cartesian=False, python_stages=0, top_k_pushdown=True)


def test_data_card_single_shuffle(spark):
    assert_plan(QS["data_card_report"](spark, SF_DIR),
                shuffles=("<=", 2), cartesian=False, python_stages=0)


def test_referential_integrity_broadcast_dims(spark):
    # Dimension parents broadcast into their anti joins; no cartesian
    # beyond the single-row count combiner.
    assert_plan(QS["referential_integrity_report"](spark, SF_DIR),
                broadcast_joins=(">=", 4), python_stages=0,
                shuffles=("<=", 5))


def test_training_shard_single_shuffle(spark):
    assert_plan(QS["training_shard_write"](spark, SF_DIR),
                cartesian=False, python_stages=0)


def test_scd2_point_in_time_fact_keyed_join(spark):
    # ONE fact-keyed exchange; the validity-interval predicate rides
    # the equi-join as a residual filter, never a range explosion.
    assert_plan(QS["scd2_point_in_time_join"](spark, SF_DIR),
                cartesian=False, python_stages=0, shuffles=("<=", 1))


def test_lm_surprise_filter_bounded_shuffles(spark):
    # Unigram stats + doc score + threshold broadcast: 5 bounded
    # exchanges end to end, no Python, no cartesian — pinned so a
    # rewrite that re-shuffles the corpus per stage surfaces here.
    assert_plan(QS["lm_surprise_filter"](spark, SF_DIR),
                cartesian=False, python_stages=0, shuffles=("<=", 5))


def test_curriculum_no_corpus_single_partition(spark):
    # Thresholds, per-bucket offsets, AND prefix-sum boundaries fold
    # into ONE tiny collected aggregate (r7 VERDICT item 3: down from
    # 9 exchanges): the returned plan carries exactly the prefix sum's
    # bucket-keyed window exchange + its tiny offset aggregate, and
    # the single-partition cumsum runs only over that n_parts-row
    # offset table — the corpus never collapses into one task.
    assert_plan(QS["curriculum_schedule"](spark, SF_DIR),
                cartesian=False, python_stages=0,
                shuffles=("<=", 2), range_exchanges=0,
                single_exchanges=("<=", 1))


def test_lateral_decorrelates_to_window_group_limit(spark):
    # Per-customer ORDER BY/LIMIT must become a grouped top-k + one
    # broadcast join — never per-row subquery execution or a cartesian.
    assert_plan(QS["lateral_top2_orders_per_customer"](spark, SF_DIR),
                window_group_limit=True, cartesian=False,
                broadcast_joins=(">=", 1))


def test_value_drift_single_fact_scan(spark):
    # The algebraic missing-bin settlement means events is scanned
    # exactly once; everything after runs on the (day, bin) aggregate.
    a = audit(QS["value_drift_report"](spark, SF_DIR))
    assert len(a["scan_columns"]) == 1
    assert not a["cartesian"]
    assert a["pushed_filters"]           # value IS NOT NULL reaches the scan


def test_kmv_sketch_pair_join_is_sketch_sized(spark):
    # The only non-equi join is sketch x sketch (|types|^2 rows); the
    # corpus side sees one distinct + one WindowGroupLimit top-64.
    assert_plan(QS["kmv_jaccard_event_types"](spark, SF_DIR),
                cartesian=False, window_group_limit=True,
                python_stages=0)


def test_asof_forward_single_shuffle(spark):
    # Forward direction + tolerance must not change the plan shape:
    # one union, one key shuffle, no inequality join.
    assert_plan(QS["asof_forward_purchase_window"](spark, SF_DIR),
                shuffles=("<=", 1), cartesian=False,
                nested_loop_joins=0, python_stages=0)


def test_session_window_single_shuffle(spark):
    assert_plan(QS["session_window_builtin"](spark, SF_DIR),
                shuffles=("<=", 1), cartesian=False, python_stages=0)


def test_runtime_bloom_filter_injected(spark):
    # Under the scoped confs the optimizer must inject a bloom
    # might_contain() probe into the fact-side scan subtree.
    from etl_projects_spark.queries_scale import (
        BLOOM_CONFS,
        _bloom_filtered_join,
    )

    old = {k: spark.conf.get(k, None) for k in BLOOM_CONFS}
    try:
        for k, v in BLOOM_CONFS.items():
            spark.conf.set(k, v)
        df = _bloom_filtered_join(spark, SF_DIR)
        df.write.format("noop").mode("overwrite").save()
        plan = df._jdf.queryExecution().executedPlan().toString()
    finally:
        for k, v in old.items():
            spark.conf.set(k, v) if v is not None else spark.conf.unset(k)
    assert "might_contain" in plan


def test_rolling_range_frame_single_shuffle(spark):
    assert_plan(QS["rolling_7day_revenue"](spark, SF_DIR),
                shuffles=("<=", 1), cartesian=False, python_stages=0)


def test_forward_fill_single_fact_aggregate(spark):
    # The fill window runs over the daily aggregate; the event scan
    # pushes the type filter and is never re-scanned for the calendar.
    a = audit(QS["forward_fill_daily_value"](spark, SF_DIR))
    assert a["pushed_filters"] and not a["cartesian"]


def test_shuffle_hash_hint_changes_strategy(spark):
    # The hint must actually flip the join strategy away from the
    # broadcast default; results stay identical (oracle-checked).
    from etl_projects_spark.plans.audit import plan_string

    plan = plan_string(QS["shuffle_hash_join_hint"](spark, SF_DIR))
    assert "ShuffledHashJoin" in plan


def test_rag_chunk_windows_shuffle_free(spark):
    # Pure per-row explode: the chunk table inherits corpus
    # partitioning — zero exchanges, zero Python.
    assert_plan(QS["rag_chunk_windows"](spark, SF_DIR),
                shuffles=0, range_exchanges=0, single_exchanges=0,
                python_stages=0, cartesian=False)


def test_bpe_merge_step_topk_pushdown(spark):
    # One count shuffle on 2-char keys, global top-20 via
    # TakeOrderedAndProject — never a full sort.
    assert_plan(QS["bpe_merge_step"](spark, SF_DIR),
                shuffles=("<=", 1), python_stages=0,
                top_k_pushdown=True)


def test_ngram_novelty_linear_joins(spark):
    # md5 grams → min-over-gram window → per-doc agg: single corpus
    # scan, two bounded exchanges, nothing pairwise, no join at all.
    assert_plan(QS["ngram_novelty_by_doc"](spark, SF_DIR),
                shuffles=("<=", 2), python_stages=0, cartesian=False)


def test_range_interval_window_single_shuffle(spark):
    # Value-based range frame: one exchange on user_id, frames slide
    # in a single sorted pass.
    assert_plan(QS["range_interval_window_user"](spark, SF_DIR),
                shuffles=("<=", 1), python_stages=0, cartesian=False)


def test_values_dim_join_broadcasts_literal(spark):
    # The inline VALUES relation must broadcast into the fact scan.
    assert_plan(QS["values_clause_dim_join"](spark, SF_DIR),
                broadcast_joins=(">=", 1), shuffles=("<=", 1),
                python_stages=0)


def test_embedding_norm_topk_rowlocal(spark):
    # Row-local HOF norm + TakeOrderedAndProject: no exchange at all.
    assert_plan(QS["embedding_norm_topk"](spark, SF_DIR),
                shuffles=0, range_exchanges=0, single_exchanges=0,
                python_stages=0, top_k_pushdown=True)


def test_contamination_semi_probe_no_pairwise(spark):
    # Train grams reached by a semi/equi probe from the 2% test side —
    # never a pairwise text join.
    spark.catalog.clearCache()
    assert_plan(QS["split_contamination_report"](spark, SF_DIR),
                cartesian=False, python_stages=0, shuffles=("<=", 3))


def test_json_key_drift_single_scan_lag(spark):
    # Drift = lag-gap window over the distinct (day, key) relation:
    # one events scan/parse, three metadata-sized exchanges, no join.
    assert_plan(QS["json_key_drift_daily"](spark, SF_DIR),
                shuffles=("<=", 3), python_stages=0, cartesian=False)


def test_analytics_family_bounded_shuffles(spark):
    # Cohort/funnel/attribution/share analytics: facts aggregate to
    # calendar- or user-bounded relations before any window/join —
    # pin the exchange budget each was tuned to (PLANS.md values +1
    # headroom is deliberate NOT given: a regression should fail).
    bounds = {
        "attribution_first_touch": 1,
        "cohort_ltv_curve": 3,
        "funnel_time_to_convert": 3,
        "share_of_parent_revenue": 1,
        "user_activity_entropy": 2,
        "seasonal_dow_index": 4,
        "groupby_all_revenue": 1,
        "bag_setops_lineitem": 2,
    }
    for name, n in bounds.items():
        assert_plan(QS[name](spark, SF_DIR),
                    shuffles=("<=", n), python_stages=0, cartesian=False)


def test_share_of_parent_broadcasts_dims(spark):
    # Both dimension sides must broadcast into the single fact
    # aggregate; the windows then run over the cell relation.
    assert_plan(QS["share_of_parent_revenue"](spark, SF_DIR),
                broadcast_joins=(">=", 2))


def test_tpch_heavies_broadcast_dims_bounded_shuffles(spark):
    # The multi-join TPC-H heavies must keep dimensions on the
    # broadcast side and stay inside the exchange budget each was
    # audited at (PLANS.md): a lost broadcast here multiplies shuffled
    # bytes by the fact-table width at cluster scale.
    specs = {
        "q7_nation_trade_volume": {"broadcast_joins": (">=", 4),
                                   "shuffles": ("<=", 2)},
        "q8_market_share": {"broadcast_joins": (">=", 3),
                            "shuffles": ("<=", 3)},
        "q9_product_profit": {"broadcast_joins": (">=", 3),
                              "shuffles": ("<=", 2)},
        "q18_large_orders": {"broadcast_joins": (">=", 1),
                             "shuffles": ("<=", 2)},
        "q21_sole_returning_supplier": {"broadcast_joins": (">=", 2),
                                        "shuffles": ("<=", 5)},
    }
    for name, kw in specs.items():
        assert_plan(QS[name](spark, SF_DIR), cartesian=False,
                    python_stages=0, **kw)


def test_wave28_single_pass_shapes(spark):
    # The wave-28 additions were designed as single-shuffle (or
    # all-broadcast) passes; a second fact-sized exchange appearing in
    # any of them is a plan regression.
    specs = {
        # one user_id shuffle, two windows over one sort, in-partition agg
        "interval_coverage_user": {"shuffles": ("<=", 1)},
        # day-grain aggregate + calendar-bounded windows
        "cusum_changepoint_daily": {"shuffles": ("<=", 1)},
        "rolling_corr_value_count": {"shuffles": ("<=", 1)},
        # bounded 7x explode + day-grain aggregate
        "revenue_proration_daily": {"shuffles": ("<=", 1)},
        # source-grain aggregate + tiny windows
        "token_budget_allocator": {"shuffles": ("<=", 1)},
        # union + one user_id sort; the event_type filter must push down
        "asof_nearest_click": {"shuffles": ("<=", 1),
                               "pushed_filters": True},
        # frontier levels broadcast back into the part scan
        "pareto_frontier_parts": {"shuffles": ("<=", 1),
                                  "broadcast_joins": (">=", 1)},
        # exact side sorts per group; sketch side broadcasts into it
        "approx_percentile_tolerance": {"shuffles": ("<=", 2),
                                        "broadcast_joins": (">=", 1)},
        # user-day distinct, broadcast day-filter, two-phase distinct agg
        "rolling_wau_daily": {"shuffles": ("<=", 4),
                              "broadcast_joins": (">=", 1)},
        # keylist + cascade keys broadcast: ZERO shuffles on the facts
        "gdpr_cascade_delete_audit": {"shuffles": ("<=", 0),
                                      "broadcast_joins": (">=", 3)},
    }
    for name, kw in specs.items():
        assert_plan(QS[name](spark, SF_DIR), cartesian=False,
                    python_stages=0, **kw)


def test_decontaminate_eval_join_broadcasts_eval_side(spark):
    # The eval suite probes the stored train-gram index via broadcast:
    # the index side must never shuffle (no exchange between the index
    # parquet scan and the probe join), and nothing runs in Python.
    df = QS["decontaminate_eval_join"](spark, SF_DIR)
    assert_plan(df, broadcast_joins=(">=", 1), cartesian=False,
                python_stages=0)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "contam_train_grams" in plan, "index scan missing from plan"
    # The gram-bucketed layout must actually prune: the index scan
    # carries a static gbucket partition filter computed from the eval
    # grams' own buckets (r7 VERDICT item 4) — losing it means every
    # probe lists and reads the full 100 TB-side gram table again.
    import re

    assert re.search(r"PartitionFilters: \[gbucket[^\]]*IN", plan), (
        "gbucket partition filter missing from the index scan"
    )
    # The gram-keyed probe must be a broadcast join (index side
    # streamed in place) — a shuffle-based join on the gram key would
    # mean the stored index gets reshuffled on every eval probe.
    shuffle_joins = [
        ln
        for ln in plan.splitlines()
        if ("SortMergeJoin" in ln or "ShuffledHashJoin" in ln)
        and "gram" in ln
    ]
    assert not shuffle_joins, shuffle_joins


def test_dw_promotion_gate_reports_from_promoted_table(spark):
    # The returned report must re-aggregate the PROMOTED warehouse
    # table (the write happened eagerly behind the gates), in one tiny
    # single-partition combine — no re-read of the staging view, no
    # Python, no join machinery in the report path (r7 VERDICT item 5:
    # bench top-10, previously unpinned).
    from etl_projects_spark.plans.audit import plan_string

    df = QS["dw_promotion_gate"](spark, SF_DIR)
    assert_plan(df, shuffles=0, range_exchanges=0,
                single_exchanges=("<=", 1), python_stages=0,
                cartesian=False)
    assert "spark_graft_dw_gate" in plan_string(df), (
        "report does not scan the promoted table"
    )


def test_train_prune_linear_scan_broadcast_eval(spark):
    # The 100 TB (train) side is scanned linearly and never pairwise:
    # the eval gram set broadcasts into the probe, the only exchanges
    # are the eval-distinct and the per-doc hit aggregation, nothing
    # sort-merges, nothing runs in Python.
    assert_plan(QS["decontaminate_train_prune"](spark, SF_DIR),
                broadcast_joins=(">=", 2), sortmerge_joins=0,
                shuffles=("<=", 2), cartesian=False, python_stages=0,
                nested_loop_joins=0)


def test_salted_join_plan_shape(spark):
    # Skew rewrite: the replicated dimension broadcasts (1 broadcast
    # join), the big side shuffles at most once for the final agg, and
    # nothing falls back to sort-merge, Python, or a cartesian.
    assert_plan(QS["salted_join_lineitem_orders"](spark, SF_DIR),
                broadcast_joins=(">=", 1), sortmerge_joins=0,
                shuffles=("<=", 1), cartesian=False, python_stages=0)


def test_minhash_lsh_chain_plan_shape(spark):
    # The full shingle→signature→band-join→verify chain: banded
    # candidate generation is equi-joins (no cartesian), the verify's
    # set lookups broadcast (candidate-bounded), everything JVM-side.
    assert_plan(QS["dedup_minhash_lsh"](spark, SF_DIR),
                cartesian=False, python_stages=0,
                nested_loop_joins=0, range_exchanges=0)


def test_text_repetition_ratio_exchange_free(spark):
    # Pure per-row array HOFs: the whole query must stream with the
    # scan — zero exchanges of ANY kind, zero Python.
    assert_plan(QS["text_repetition_ratio"](spark, SF_DIR),
                shuffles=0, range_exchanges=0, single_exchanges=0,
                python_stages=0, cartesian=False)


def test_remaining_bench_heavies_pinned(spark):
    # r8 extension of the r7 top-10 pin work: every remaining ~2 s
    # bench heavy gets its load-bearing shape locked so a silent plan
    # fallback (lost broadcast, SMJ on a banded key, a Python stage
    # sneaking in, a corpus re-shuffle) fails the suite instead of
    # surfacing as an unexplained bench drift two rounds later.
    spark.catalog.clearCache()
    specs = {
        # SimHash chain: per-row signatures over the stored sets, ONE
        # banded self-equi-join, Hamming verify on candidates — all
        # JVM, bounded exchanges, nothing pairwise-global.
        "dedup_simhash": {"shuffles": ("<=", 4), "python_stages": 0,
                          "cartesian": False, "nested_loop_joins": 0,
                          "range_exchanges": 0},
        # Raw shingle chain (deliberately inline): candidates from the
        # grouped-pairs expansion, sizes join unhinted (AQE decides) —
        # two bounded exchanges end to end.
        "dedup_ngram_jaccard": {"shuffles": ("<=", 2),
                                "python_stages": 0, "cartesian": False,
                                "sortmerge_joins": 0},
        # Lifecycle report paths: the returned relation re-reads the
        # table the engine just wrote — one partition-key exchange at
        # most, zero Python, no joins.
        "engine_partitioned_incremental": {"shuffles": ("<=", 1),
                                           "python_stages": 0,
                                           "cartesian": False},
        # Streaming drain result: the memory-sink table scan must stay
        # a bare local scan (all the work happened in the micro-batch).
        "streaming_quotes_ingest": {"shuffles": 0, "python_stages": 0,
                                    "single_exchanges": 0,
                                    "cartesian": False},
    }
    for name, kw in specs.items():
        assert_plan(QS[name](spark, SF_DIR), **kw)


def test_substring_span_family_plans(spark):
    # r10 additions: the exact-substring span family must stay on its
    # tuned shapes — all-JVM (no Python stage despite living next to
    # the Arrow twin), no cartesian, bounded exchanges. The report is
    # window(span)→agg(id)→agg(source): ≤4 exchanges incl. fan_out.
    # The pair query adds the df-capped self-equi-join and the
    # tie-broken top-50 (global sort is a single-partition exchange
    # over ≤50 pre-limited rows, not a corpus sort).
    spark.catalog.clearCache()
    assert_plan(QS["substring_span_report"](spark, SF_DIR),
                python_stages=0, cartesian=False, nested_loop_joins=0,
                shuffles=("<=", 4))
    pairs = QS["substring_span_pairs"](spark, SF_DIR)
    assert_plan(pairs, python_stages=0, cartesian=False,
                nested_loop_joins=0, shuffles=("<=", 6))
    # r11 addition: the prune verdict is linear like the report — one
    # span-hash window exchange (computing df AND the group's min
    # holder in a single Window node), one per-doc agg exchange, the
    # doc-key join (broadcast at this SF; SMJ-at-scale headroom +1).
    assert_plan(QS["substring_span_prune"](spark, SF_DIR),
                python_stages=0, cartesian=False, nested_loop_joins=0,
                shuffles=("<=", 3))
    # r11 addition: trim accounting stays linear too — positional
    # stream distinct (id,h), span-hash window, the (id,h) equi-join
    # back to positions (broadcast here; +2 exchange headroom for the
    # SMJ shape at scale), then doc-key windows/aggs that reuse the id
    # partitioning. Never pairwise, no single-partition collapse.
    assert_plan(QS["substring_span_trim"](spark, SF_DIR),
                python_stages=0, cartesian=False, nested_loop_joins=0,
                single_exchanges=0, shuffles=("<=", 8))
    # r12 addition: the rewrite emits the trimmed corpus itself —
    # trim's linear island chain collapsed to one interval-array row
    # per doc, joined back to the documents scan (broadcast at this
    # SF; +headroom for the SMJ shape at scale), excision a pure JVM
    # higher-order expression: zero Python stages, never pairwise,
    # no single-partition collapse.
    assert_plan(QS["substring_span_rewrite"](spark, SF_DIR),
                python_stages=0, cartesian=False, nested_loop_joins=0,
                single_exchanges=0, shuffles=("<=", 8))
    # r11: the pair query dropped its persist (r10 ADVICE leaked-pin
    # class); the replacement load-bearing shape is AQE stage reuse —
    # both self-join branches share one byte-identical
    # Exchange hashpartitioning(shingle) subtree, so the md5/window
    # shuffle must compute ONCE and the second branch must read it as
    # a ReusedExchange in the executed plan. If this pin breaks, the
    # corpus-scale md5 subtree is being computed twice per invocation.
    pairs.collect()
    executed = pairs._jdf.queryExecution().executedPlan().toString()
    assert "ReusedExchange" in executed, executed[:1200]
    # ... and nothing may be left pinned in the cache by the query.
    jcat = spark._jsparkSession.sharedState().cacheManager()
    assert jcat.isEmpty(), "substring_span_pairs left a cached relation pinned"


def test_substring_span_incremental_plan(spark):
    # r11 addition: the span family's stored-index admission path must
    # keep the decontamination probe's load-bearing shape — the batch
    # side broadcasts, the persisted span index is scanned with a
    # STATIC gbucket partition filter (only buckets the batch's spans
    # hash into are listed or read), no Python stage, no cartesian.
    from etl_projects_spark.plans.audit import plan_string

    df = QS["substring_span_incremental"](spark, SF_DIR)
    assert_plan(df, python_stages=0, cartesian=False, nested_loop_joins=0,
                broadcast_joins=(">=", 1), shuffles=("<=", 6))
    pruned = [ln for ln in plan_string(df).splitlines()
              if "PartitionFilters" in ln and "gbucket" in ln]
    assert pruned, "span-index scan lost its gbucket partition filter"


def test_lsh_recall_report_plan(spark):
    # r11 audit query: exact df-capped pairs + banded LSH candidates,
    # both the family's bounded-key patterns off the shared sets
    # artifact — no cartesian, no Python stage, and exactly ONE
    # single-partition exchange (the terminal 1-row aggregate; the
    # pair relations themselves must never collapse to one task).
    assert_plan(QS["lsh_recall_report"](spark, SF_DIR),
                python_stages=0, cartesian=False, nested_loop_joins=0,
                single_exchanges=("<=", 1), shuffles=("<=", 12))


def test_ann_ivf_recall_report_plan(spark):
    # r12 audit query (nprobe half of the ANN readout): the stored IVF
    # index must be scanned with a STATIC cluster partition filter
    # (only probed cells listed/read), the probe map broadcasts, the
    # exact side's mapInPandas is the one Python stage, and the
    # terminal 1-row aggregate is the only single-partition exchange.
    from etl_projects_spark.plans.audit import plan_string

    df = QS["ann_ivf_recall_report"](spark, SF_DIR)
    assert_plan(df, python_stages=("<=", 1), cartesian=False,
                nested_loop_joins=0, broadcast_joins=(">=", 1),
                single_exchanges=("<=", 1), shuffles=("<=", 3))
    pruned = [ln for ln in plan_string(df).splitlines()
              if "PartitionFilters" in ln and "cluster" in ln]
    assert pruned, "IVF index scan lost its cluster partition filter"


def test_knn_label_purity_plan(spark):
    # r12 audit query: exact kNN (the one Python stage) + two label
    # joins (probe side broadcast by hint, neighbor side a linear
    # id-key equi-join) + one tiny per-label groupBy. No cartesian, no
    # single-partition collapse, bounded exchanges.
    assert_plan(QS["knn_label_purity"](spark, SF_DIR),
                python_stages=("<=", 1), cartesian=False,
                nested_loop_joins=0, broadcast_joins=(">=", 1),
                single_exchanges=0, shuffles=("<=", 3))


def test_ann_recall_report_plan(spark):
    # r12 audit query (the ANN twin of lsh_recall_report): the exact
    # side is the bounded-probe knn_join — its mapInPandas is the ONE
    # allowed Python stage — and both candidate sides are broadcast
    # hash EQUI-joins on the bucket column (the multi-probe set rides
    # an exploded (qid, bucket) relation, NOT an array_contains
    # nested-loop). One pair-key shuffle, exactly one single-partition
    # exchange (the terminal 1-row aggregate), no cartesian.
    assert_plan(QS["ann_recall_report"](spark, SF_DIR),
                python_stages=("<=", 1), cartesian=False,
                nested_loop_joins=0, broadcast_joins=(">=", 2),
                single_exchanges=("<=", 1), shuffles=("<=", 3))


def test_embedding_margin_report_plan(spark):
    # r13 audit query: exact kNN + the full-score pass are the TWO
    # Python (Arrow) stages — both corpus-linear, no corpus shuffle;
    # the probe-sized stats relation broadcasts into the bulk
    # aggregate. No cartesian, no single-partition collapse; the only
    # exchanges are the probe-keyed aggregates/window.
    assert_plan(QS["embedding_margin_report"](spark, SF_DIR),
                python_stages=("<=", 2), cartesian=False,
                nested_loop_joins=0, broadcast_joins=(">=", 1),
                single_exchanges=0, shuffles=("<=", 3))


def test_dsir_importance_weights_plan(spark):
    # r13 selection query, r16 shape: the corpus never shuffles AT ALL
    # — the ≤DSIR_BUCKETS-row model folds to ONE broadcast row (dense
    # bucket→lnr array) and scoring + the per-document fold happen
    # per row (transform/aggregate over the token array). The only
    # corpus-sized exchange left is the map-side-combinable
    # union-tagged bucket count (≤DSIR_BUCKETS rows out); the two
    # crossJoins (totals onto model, 1-row model array onto the pool)
    # ride broadcast nested-loops by construction (the lm_surprise
    # class). The r15 shape additionally paid a per-token broadcast
    # hash join, a full-outer ct/cr merge, and a corpus-keyed
    # collect_list fold exchange — all gone, so no BHJ remains.
    assert_plan(QS["dsir_importance_weights"](spark, SF_DIR),
                python_stages=0, cartesian=False,
                shuffles=("<=", 4))


def test_dsir_select_plan(spark):
    # r14 funnel completion, r16 shape: the keyed weights relation is
    # pinned ONCE (materialize_scoped; the approxQuantile boundary
    # probe doubles as the materializing action) and both remaining
    # downstream consumers — the prefix sum's local-window branch and
    # its offsets branch — must read that ONE cache (2
    # InMemoryTableScan sites; the r15 shape had a third consumer, the
    # separate totals aggregate, now a window over the prefix sum's
    # own per-bucket totals). No Python stages, no cartesian, no range
    # exchange; the raw audit counts DUPLICATE because audit() walks
    # the cached subtree once per scan site. Every single-partition
    # exchange in the plan is a bounded relation (the n_parts-row
    # offset table) — the corpus itself never collapses into one task.
    from etl_projects_spark.operators.exec_util import release_scope
    from etl_projects_spark.plans.audit import plan_string

    df = QS["dsir_select"](spark, SF_DIR)
    try:
        # single_exchanges <= 10: 4 bounded singleton aggregates per
        # cached-subtree copy (the ≤DSIR_BUCKETS-row totals and 1-row
        # model-array folds, printed once per InMemoryTableScan site)
        # plus the n_parts-row offsets window — every one a bounded
        # relation; the corpus never collapses into one task.
        assert_plan(df, python_stages=0, cartesian=False,
                    range_exchanges=0, single_exchanges=("<=", 10))
        p = plan_string(df)
        assert p.count("InMemoryTableScan") == 2, (
            "both consumers of the keyed weights relation must read "
            "the single scoped pin"
        )
    finally:
        release_scope("dsir_select")
