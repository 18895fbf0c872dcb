"""Cross-scale-factor oracle checks: the driver gates at sf0.01; these
re-verify representative queries at sf0.001 so nothing is tuned to one
dataset's values."""

from __future__ import annotations

import pytest

import __spark_entry__ as entrymod
from tests.oracle_check import compare

SF = "/root/testdata/sf0.001"
REPRESENTATIVE = [
    "q1_pricing_summary",
    "q10_returned_revenue",
    "rollup_revenue",
    "window_running_order_total",
    "dedup_minhash_lsh",
    "dedup_simhash",
    "winnow_fingerprints",
    # r10 additions: exact-substring span family (20-token spans are
    # rarer at the small SF — the zero/low-signal edge lives here)
    "substring_span_report",
    "substring_span_pairs",
    # r11: the family's action query — the all-kept edge (few shared
    # spans at the small SF) must still emit one verdict per document
    "substring_span_prune",
    # r11: trim accounting at the SF where most sources trim nothing —
    # zero-island docs must still roll up through the left join
    "substring_span_trim",
    # r12: the rewrite at the SF where most docs pass through verbatim
    # (null-interval left-join edge) — trimmed text must hash-match
    "substring_span_rewrite",
    # r11: the LSH recall audit at the low-signal SF (few true pairs —
    # the zero-guard branches of both terminal quotients live here)
    "lsh_recall_report",
    # r11: incremental span admission — the span index is rebuilt per
    # corpus vintage, so the bucket-pruned probe must hold here too
    "substring_span_incremental",
    # r12: the ANN recall audit at the low-signal SF (500 vectors, the
    # same probe set — the exact/candidate tie-break edges live here)
    "ann_recall_report",
    # r12: the embedding-space purity audit at the same vintage (pure
    # SQL oracle, no twin — sparse per-label probe groups live here)
    "knn_label_purity",
    # r13: the margin/relative-contrast audit at the low-signal SF —
    # the exact-integer bulk moments and the z10 guard live here
    "embedding_margin_report",
    # r13: DSIR weights at the small vintage (25 target docs — sparse
    # bucket counts, the +1 smoothing terms dominate here)
    "dsir_importance_weights",
    # r14: the selection stage at the small vintage — the budget cut
    # lands after very few docs, exercising the boundary arithmetic
    "dsir_select",
    # r15: the composed funnel at the small vintage — every stage's
    # low-population edge (sparse dedup clusters, few contaminated
    # docs, a handful of selected docs packing into ONE shard) flows
    # through the catalog handoffs here
    "curation_pipeline_run",
    # (ann_ivf_pq_topk excluded: like ann_ivf_recall_report its oracle
    # inlines a gate-SF twin shortlist; its cross-SF rows are the
    # dedicated re-derived-oracle test below)
    # r15: DoReMi at the small vintage — few eval docs per source, so
    # the integer-micro stats are tiny and the smoothing floor binds
    "doremi_domain_reweight",
    "media_fingerprint",
    "quality_validate_events",
    "asof_click_before_purchase",
    "salted_join_lineitem_orders",
    # r6: the promotion gate's min-count threshold must PASS at the
    # smallest vintage (~493 finished orders at sf0.001) — this row is
    # the machine check DETERMINISM.md recipe 26 refers to.
    "dw_promotion_gate",
    # r2-late additions
    "dedup_incremental_batch",
    "streaming_incremental_dedup",
    "ann_knn_join",
    "ann_lsh_multiprobe_topk",
    "bm25_retrieval",
    "pack_token_spans",
    "warehouse_copy_roundtrip",
    "ohlc_hourly_events",
    "profile_orders",
    "source_quotes_scan",
    "streaming_quotes_ingest",
    "snapshot_diff_orders",
    # r3 additions
    "merge_upsert_orders",
    "scd2_apply_orders",
    "exact_distinct_users_daily",
    "funnel_user_conversion",
    "retention_cohorts",
    "tfidf_top_terms",
    "ngram_bigram_topk",
    "dedup_keep_best_quality",
    "doc_length_percentile_filter",
    "embedding_quantize_int8",
    "cooccurrence_pmi_topk",
    "neardup_rate_by_source",
    "anomaly_zscore_daily",
    "zorder_cluster_events",
    # curation wave 2 (semdedup_prune excluded: like ann_ivf_topk its
    # oracle inlines sf0.01-specific twin assignments; its sf0.001
    # parity is covered by tests/test_curation.py's numpy twin)
    "chunk_dedup_rewrite",
    "train_split_assign",
    "filter_funnel_report",
    "skew_key_report",
    "fertility_by_source",
    "higher_order_array_funcs",
    # curation wave 3
    "dedup_edit_distance",
    "ewma_daily_value",
    "weighted_sample_topk",
    # curation wave 4 (all SF-agnostic oracles, incl. the component
    # histogram whose oracle replays label propagation in SQL)
    "phrase_search_positions",
    "correlation_matrix_lineitem",
    "dedup_component_size_histogram",
    # curation wave 5
    "events_debounce",
    "fixed_size_per_group_sample",
    "weighted_median_price",
    # curation wave 6
    "dedup_graph_triangles",
    "pivot_multi_agg_daily",
    "partition_checksums",
    # media pipeline stubs (wave 8)
    "media_resize_stub",
    "media_frame_energy",
    # waves 9-12 (r3 continuation)
    "cdc_changelog_apply",
    "incremental_agg_maintenance",
    "schema_evolution_union",
    "regr_trend_nation",
    "dedup_prefix_containment",
    "media_phash_neardup",
    "attribution_first_touch",
    "zscore_doc_length_by_source",
    "vocab_id_assign",
    "compact_small_files",
    "session_path_topk",
    "equi_depth_histogram_stats",
    "data_card_report",
    "mode_priority_by_segment",
    "mad_order_totals",
    # wave 13
    "referential_integrity_report",
    "training_shard_write",
    # wave 14
    "scd2_point_in_time_join",
    "curriculum_schedule",
    "k_anonymity_audit",
    # wave 15
    "window_nth_cume",
    "bitmap_user_event_mask",
    "pipeline_dag_build",
    # waves 16-17
    "orders_rfm_segmentation",
    "grouping_id_rollup",
    "decile_lift_table",
    "gini_revenue_concentration",
    "event_markov_transitions",
    "value_drift_report",
    "vocab_oov_rate",
    # waves 18-20
    "asof_forward_purchase_window",
    "kmv_jaccard_event_types",
    "zonemap_pruning_report",
    "lateral_top2_orders_per_customer",
    "session_window_builtin",
    "streaming_dedup_within_watermark",
    # waves 21-22
    "runtime_bloom_join_revenue",
    "rolling_7day_revenue",
    "forward_fill_daily_value",
    "variant_shred_props",
    "try_scalar_functions",
    "lm_surprise_filter",
    "mlm_token_masking",
    "chi_square_type_by_dow",
    "bollinger_bands_daily",
    "streaming_scd1_user_state",
    "percent_change_mom",
    "shuffle_hash_join_hint",
    "zipf_frequency_report",
    # wave 27
    "bpe_merge_step",
    "rag_chunk_windows",
    "ngram_novelty_by_doc",
    "packing_efficiency_report",
    "user_activity_entropy",
    "json_key_drift_daily",
    "bag_setops_lineitem",
    "groupby_all_revenue",
    "values_clause_dim_join",
    "event_cooccurrence_lift",
    "cohort_ltv_curve",
    "range_interval_window_user",
    "funnel_time_to_convert",
    "seasonal_dow_index",
    "split_contamination_report",
    "minhash_jaccard_estimate",
    "share_of_parent_revenue",
    "embedding_norm_topk",
    # wave 28
    "rolling_wau_daily",
    "interval_coverage_user",
    "pareto_frontier_parts",
    "cusum_changepoint_daily",
    "approx_percentile_tolerance",
    "revenue_proration_daily",
    "gdpr_cascade_delete_audit",
    "rolling_corr_value_count",
    "token_budget_allocator",
    "asof_nearest_click",
    # r6 window rows with no prior cross-sf coverage: the reworked
    # media sampler (byte-exact hex frames), the re-quantized mixture
    # quota, the engine/catalog consumers (scratch-table builds keyed
    # on the corpus, so they must work at every vintage), and the
    # operator-module consumers fixed in the r6 review passes.
    # (embedding_pca_project excluded: like semdedup_prune its oracle
    # inlines the sf0.01 twin basis; sf0.001 parity is covered by
    # tests/test_curation.py::test_pca_projection_matches_numpy)
    "media_frame_sample",
    "mixture_weights_temperature",
    "engine_partitioned_incremental",
    "engine_sql_file_build",
    "salted_agg_order_revenue",
    "json_explode_props",
    # r6-late additions: the stream-stream interval join (two
    # watermarked file streams, stateful equi-join, availableNow
    # drain) and the applyInPandasWithState custom-stateful surface
    "streaming_interval_join",
    "streaming_stateful_running_totals",
    # r7-r8 decontamination family: gram-index build + pruned probe and
    # the train-side keep-list must work at every corpus vintage (the
    # bucketed artifact is rebuilt per snapshot key).
    "decontaminate_eval_join",
    "decontaminate_train_prune",
]


@pytest.mark.parametrize("name", REPRESENTATIVE)
def test_matches_oracle_at_sf0001(spark, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    problems = compare(qs[name](spark, SF), osql[name], SF)
    assert not problems, f"{name}@sf0.001: " + "; ".join(problems)


# The newest statistical families lean hardest on the determinism
# recipes (exact decimal moments, ordered float folds, common-
# denominator integer cross products) — prove those survive 10× the
# gate's data, not just smaller, where accumulation order and decimal
# headroom are actually stressed.
SF_UP = "/root/testdata/sf0.1"
UPSCALE = [
    # r13: the margin audit where the exact-integer moment sums carry
    # 4× the rows per probe — accumulation-order drift would bite HERE
    "embedding_margin_report",
    # r13: DSIR weights at 10× the pool — the position-ordered ln fold
    # runs ~10× longer per doc family; order drift would bite HERE
    "dsir_importance_weights",
    # r14: selection at 10× the pool — the Gumbel key order and the
    # distributed prefix-sum budget cumsum at real bucket counts
    "dsir_select",
    # r15: the composed funnel at 10× — multi-shard packing, real
    # dedup component populations, and the stage-chained DSIR moments
    "curation_pipeline_run",
    # (ann_ivf_pq_topk: dedicated re-derived-oracle test below covers
    # sf0.1, where the ADC shortlist cut BINDS)
    # r15: DoReMi at 10× — the per-source integer sums carry real
    # populations and the excess-loss gaps are data-scale, not noise
    "doremi_domain_reweight",
    "chi_square_type_by_dow",
    "bollinger_bands_daily",
    "percent_change_mom",
    "zipf_frequency_report",
    "shuffle_hash_join_hint",
    "mad_order_totals",
    "mode_priority_by_segment",
    "approx_distinct_users_daily",
    # wave 27 + late additions: entropy log-sums, ordered vector folds,
    # first-occurrence novelty ratios, lift ratios, dayofweek mapping
    "user_activity_entropy",
    "embedding_norm_topk",
    "ngram_novelty_by_doc",
    "event_cooccurrence_lift",
    "seasonal_dow_index",
    # r10 additions: 10× the spans, integer-quotient terminal double;
    # the pair query's tie-broken top-50 boundary under 10× the pairs
    "substring_span_report",
    "substring_span_pairs",
    # r11: the prune verdict where shared spans actually occur — the
    # integer cross-multiplied keep threshold sees real foreign counts
    "substring_span_prune",
    # r11: trim at 10× — overlapping foreign spans actually occur, so
    # the gaps-and-islands interval merge is exercised for real
    "substring_span_trim",
    # r11: recall audit at 10× — candidate efficiency actually departs
    # from 1.0 (756 candidates / 256 true pairs), both quotients real
    "lsh_recall_report",
    # r11: incremental span admission at 10× — batch hits actually
    # occur, and the broadcast probe sees a real index
    "substring_span_incremental",
    # the rest of the r5 driver-window entries with float/epoch/prefix
    # determinism surface: micro-epoch deltas + percentile_disc,
    # DECIMAL cumsums, gram-hash semi joins, signature agreement,
    # two-phase prefix sums, share-ratio divisions
    "funnel_time_to_convert",
    "range_interval_window_user",
    "cohort_ltv_curve",
    "share_of_parent_revenue",
    "minhash_jaccard_estimate",
    "split_contamination_report",
    "packing_efficiency_report",
    # wave 28: float terminal expressions (cusum division, correlation
    # quotient, proration division, approx-median tolerance), micro-
    # epoch deltas (islands, nearest-asof), remainder-rank allocation
    "cusum_changepoint_daily",
    "rolling_corr_value_count",
    "approx_percentile_tolerance",
    "revenue_proration_daily",
    "interval_coverage_user",
    "asof_nearest_click",
    "token_budget_allocator",
    "pareto_frontier_parts",
    "rolling_wau_daily",
    "gdpr_cascade_delete_audit",
    # r6 additions: cosine threshold boundary (rounded-to-6dp compare),
    # repetition-fraction divisions + mode/max-run equivalence, the
    # one-file-per-partition invariant at 10x the rows, observe-metric
    # gate counts at a volume where violations actually occur
    "embedding_similarity_join",
    "gopher_repetition_filter",
    "repartition_partition_files",
    "quality_monitor_gate",
    # r6 window rows whose r6 source changes (de-hinted jaccard
    # fallback, shared word_grams helper) deserve proof at 10× the
    # driver gate's volume, where the df-cap actually binds and the
    # integer threshold arithmetic sees real collision counts; the
    # mixture quota's remainder allocation is likewise only stressed
    # where many sources compete for the 10k slots.
    "dedup_ngram_jaccard",
    "dedup_jaccard_df_capped",
    "text_repetition_ratio",
    "mixture_weights_temperature",
    # r6-late sweep finds (DETERMINISM.md recipes 28-30): the three
    # queries whose defects were ONLY visible at sf0.1 — discrete-
    # quantile tie runs, round-at-compare-precision halves, and the
    # prefix_sum branch-divergent range boundaries. Permanent rows so
    # they can never regress to gate-SF-only proof.
    "curriculum_schedule",
    "media_decode_stats",
    "pack_token_spans",
    "streaming_interval_join",
    "streaming_stateful_running_totals",
    # r7 additions: the cross-corpus decontamination join's gram
    # overlap only produces non-trivial mixed verdicts at a volume
    # where eval docs straddle the train/valid/test split, and the
    # control-file roundtrip should prove at the volume where orders
    # spans many part files per status.
    "decontaminate_eval_join",
    "control_file_roundtrip",
    # r8 addition: the train-side keep-list only flags a meaningful
    # contaminated fraction at a volume where many train docs share
    # grams with the eval sample; proved here at 10× the gate SF.
    "decontaminate_train_prune",
]


@pytest.mark.parametrize("name", UPSCALE)
def test_matches_oracle_at_sf01(spark, name):
    qs, osql = entrymod.queries(), entrymod.oracle_sql()
    problems = compare(qs[name](spark, SF_UP), osql[name], SF_UP)
    assert not problems, f"{name}@sf0.1: " + "; ".join(problems)


def test_new_catalog_additions_have_cross_sf_rows():
    """Discipline tripwire (r8): every brand-new catalog query (no
    green driver CORRECTNESS row in any committed record yet) must
    already be covered by BOTH cross-SF suites before it ships — the
    r6-late lesson was that gate-SF-only proofs hide defects that only
    a different vintage exposes. Exemptions: queries whose oracle
    inlines a gate-SF twin derivation (they carry their own named
    exclusion comments in the lists above)."""
    import os
    import sys

    sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tools"))
    import freshness_report as fr

    new = {n for n, rnd in fr.latest_proof_rounds().items() if rnd == 0}
    osql = entrymod.oracle_sql()
    covered = set(REPRESENTATIVE) | set(UPSCALE)
    # Twin-oracle queries can't ride the shared lists (their recorded
    # oracle inlines gate-SF VALUES twins, so running it verbatim at
    # another SF compares against the wrong corpus); each instead has
    # a DEDICATED cross-SF test that re-derives the oracle for the
    # swept corpus — listed here by name so the exemption is explicit.
    twin_exempt = {
        # test_ann_ivf_recall_report_cross_sf_rederived_oracle below
        "ann_ivf_recall_report",
        # test_ann_ivf_pq_topk_cross_sf_rederived_oracle below
        "ann_ivf_pq_topk",
        # test_ann_ivf_pq_recall_report_cross_sf_rederived_oracle
        "ann_ivf_pq_recall_report",
    }
    missing = [
        n for n in new if n in osql and n not in covered | twin_exempt
    ]
    assert not missing, (
        f"new queries without cross-SF coverage: {missing} — add them "
        "to REPRESENTATIVE (sf0.001) and/or UPSCALE (sf0.1)"
    )


@pytest.mark.parametrize(
    "sfd", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_ann_ivf_pq_topk_cross_sf_rederived_oracle(spark, monkeypatch, sfd):
    """Cross-SF rows for the IVF-PQ query: re-derive the twin
    shortlist oracle FOR the swept corpus (the full-catalog sweeps'
    SPARK_GRAFT_ORACLE_SF_DIR mechanism) and hash-compare. sf0.001 is
    the degenerate-cut edge (probed cells hold fewer candidates than
    PQ_SHORTLIST, so the shortlist is 'all of them'); sf0.1 is where
    the ADC cut BINDS and the codebooks train on a true subsample."""
    from etl_projects_spark import queries_wave33 as w33

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", sfd)
    sql = w33._ivf_pq_oracle()
    assert sql is not None
    sdf = entrymod.queries()["ann_ivf_pq_topk"](spark, sfd)
    problems = compare(sdf, sql, sfd)
    assert not problems, f"ann_ivf_pq_topk@{sfd}: " + "; ".join(problems)


@pytest.mark.parametrize(
    "sfd", ["/root/testdata/sf0.001", "/root/testdata/sf0.1"]
)
def test_ann_ivf_pq_recall_report_cross_sf_rederived_oracle(
    spark, monkeypatch, sfd
):
    """Cross-SF rows for the PQ recall audit, oracle re-derived for
    the swept corpus: sf0.001 has a single probe whose cells hold
    fewer candidates than the shortlist (cut degenerate); sf0.1 has
    ~50 probes with binding cuts."""
    from etl_projects_spark import queries_wave33 as w33

    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", sfd)
    sql = w33._ivf_pq_recall_oracle()
    assert sql is not None
    sdf = entrymod.queries()["ann_ivf_pq_recall_report"](spark, sfd)
    problems = compare(sdf, sql, sfd)
    assert not problems, f"ann_ivf_pq_recall_report@{sfd}: " + "; ".join(
        problems
    )


def test_ann_ivf_recall_report_cross_sf_rederived_oracle(spark, monkeypatch):
    """Cross-SF row for the twin-oracle IVF recall audit: regenerate
    the oracle's assignment/probe-cluster VALUES twins FOR sf0.001
    (exactly what the full-catalog sweeps do via
    SPARK_GRAFT_ORACLE_SF_DIR) and hash-compare there — the low-signal
    vintage where probe cells hold few vectors."""
    from etl_projects_spark import queries_wave30 as w30

    sfd = "/root/testdata/sf0.001"
    monkeypatch.setenv("SPARK_GRAFT_ORACLE_SF_DIR", sfd)
    sql = w30._ivf_recall_oracle()
    assert sql is not None
    sdf = entrymod.queries()["ann_ivf_recall_report"](spark, sfd)
    problems = compare(sdf, sql, sfd)
    assert not problems, f"ann_ivf_recall_report@{sfd}: " + "; ".join(
        problems
    )
