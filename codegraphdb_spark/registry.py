"""Query registry — the single place where every operator the engine claims
is recorded as a named, runnable, oracle-checked query.

Each registered entry becomes a ``queries()`` item in ``__spark_entry__.py``;
entries with an ``oracle`` string also become ``oracle_sql()`` items and are
hash-checked against DuckDB by the driver. Entries without an oracle (custom
stateful / iterative / non-SQL ops) get the weaker rows-only check.
"""

from __future__ import annotations

from collections.abc import Callable

from pyspark.sql import DataFrame, SparkSession

QueryFn = Callable[[SparkSession, str], DataFrame]

QUERIES: dict[str, QueryFn] = {}
ORACLE: dict[str, str] = {}


def query(name: str, oracle: str | None = None) -> Callable[[QueryFn], QueryFn]:
    """Decorator: register ``fn(spark, sf_dir) -> DataFrame`` under ``name``,
    optionally with its DuckDB-equivalent ANSI SQL."""

    def deco(fn: QueryFn) -> QueryFn:
        # last-wins on re-registration: a module reload (e.g. the driver
        # re-importing __spark_entry__) re-runs decorators; crashing on
        # duplicates would take the whole contract down
        QUERIES[name] = fn
        if oracle is not None:
            ORACLE[name] = oracle
        else:
            ORACLE.pop(name, None)
        return fn

    return deco


# Driver-priority ordering. The correctness harness checks exactly the
# first 50 entries of ``queries()`` in insertion order; queries listed here
# are moved to the front after loading. ROTATION POLICY (revisit every
# round): (1) everything new or behavior-adjacent to this round's engine
# changes comes first — it MUST land in the checked window; (2) then the
# queries that have been OUTSIDE the window longest rotate back in, so
# every query periodically re-enters the hard signal even when unchanged;
# (3) already-green unchanged queries from the most recent window follow in
# registration order and may fall outside. Local `tools/check_oracle.py`
# covers ALL queries regardless — the rotation only governs the driver's
# independent record.
_DRIVER_PRIORITY: list[str] = [
    # ============ ROUND-10 WINDOW =======================================
    # Rotation rule (1): every query whose behavior round 10 touched —
    # doc_shingle_novelty (first-seen became a window min over the
    # shingle key: one Arrow kernel run instead of two — the only
    # optimized-plan change this round, confirmed by plan_pins --check),
    # the edge-semantics g_* family (the determinism audit replaced
    # every order-sensitive multi-candidate pick in the compile path:
    # binding-chain extras, gate_edges kind key, reexport
    # association_type — fixture results are proven identical, but the
    # driver should verify edge semantics independently), and the
    # multimodal family (GIF pixel decode became real behind the codec
    # seam).
    "doc_shingle_novelty",
    "g_call_edges_chain",
    "g_call_edges_deep",
    "g_call_edges",
    "g_uses_edges",
    "g_inherits_edges",
    "g_kind_census",
    "g_methods_of_class",
    "g_override_edges",
    "g_reexport_contains",
    "multimodal_frame_census",
    "multimodal_dedup",
    "multimodal_meta_extract",
    "multimodal_resolution_filter",
    # Rotation rule (2): longest outside the window — the last r4
    # vintage (latest driver green CORRECTNESS_r04), then the oldest
    # r5 vintage alphabetically, filling to 50. Remaining r5 rows
    # (g_cypher_varlen_undirected, g_cypher_with_topn,
    # g_cypher_write_roundtrip, g_triangle_count, having_share_threshold,
    # promo_revenue_ratio) lead r11's fill.
    "scalar_subquery_rich_inactive",
    "shipping_priority_topk",
    "subquery_small_quantity_revenue",
    "top_revenue_supplier",
    "approx_distinct_kmv",
    "approx_distinct_kmv_by_flag",
    "doc_bigram_lm_quality",
    "doc_lang_confusion",
    "doc_stratified_sample",
    "doc_top_collocations",
    "emb_knn_classify",
    "emb_label_outliers",
    "emb_mmr_diversify",
    "emb_recall_at_k",
    "events_anomaly_zscore",
    "events_cusum_drift",
    "events_ewma",
    "events_markov_transitions",
    "events_ohlc_bars",
    "events_rollup_two_level",
    "events_seasonality_profile",
    "events_time_weighted_avg",
    "events_top_paths",
    "events_value_mad",
    "exclusive_late_supplier",
    "g_bucketed_children",
    "g_cypher_case",
    "g_cypher_distinct_aggs",
    "g_cypher_grouped",
    "g_cypher_path",
    "g_cypher_pattern_pred",
    "g_cypher_rel_props",
    "g_cypher_shortest",
    "g_cypher_union",
    "g_cypher_unwind_params",
    "g_cypher_unwind_prop",
    # ================== r10 50-query window boundary ====================
    # ============ ROUND-9 WINDOW (previous) =============================
    # Rotation rule (1): every query whose behavior round 9 touched —
    # the A4 chain-resolution work (extractor '()'-chain rendering +
    # synthetic call slots + @property fields + the bounded deep walker
    # changes the compiled-edges lineage, so the edge-semantics queries
    # lead, headed by the NEW parity query), the dup-span family (the
    # groupBy+join dup filter became a window min/max — one Arrow kernel
    # run), the set-overlap family (size/set-pair broadcasts are now
    # size-gated), and the standing-index families (fingerprints now
    # salt in kernel source/params and verify bucket specs on attach).
    # Enforced mechanically from this round: PLAN_PINS.json +
    # tests/test_rotation_window.py fail if any query's optimized plan
    # changes while outside this list's first 50.
    "g_call_edges_chain",           # NEW: jedi-parity chain shapes
    "g_call_edges_deep",
    "g_call_edges",
    "g_uses_edges",
    "g_kind_census",
    "g_methods_of_class",
    "g_call_closure",
    "g_override_edges",
    "g_dead_code",
    "g_pagerank_top",
    "g_kcore",
    "g_blast_radius",
    "g_module_coupling",
    "doc_dup_spans",
    "doc_dup_span_stats",
    "doc_dup_span_scrub",
    "ngram_jaccard_pairs",
    "doc_containment_pairs",
    "doc_minhash_jaccard_est",
    "source_overlap_matrix",
    "doc_dedup_funnel",
    "doc_dedup_keep_best",
    "doc_dup_clusters",
    "doc_train_test_split",
    "minhash_lsh_candidates",
    "simhash_near_dup_pairs",
    "minhash_incremental_candidates",
    "emb_incremental_ivf_probe",
    # Rotation rule (2): longest outside the window — the remaining r4
    # vintage (last driver-green in CORRECTNESS_r04), filling to 50.
    "customer_order_distribution",
    "customer_revenue_concentration",
    "disjunctive_bracket_revenue",
    "doc_epoch_shuffle",
    "doc_pii_scrub",
    "doc_quality_by_source",
    "emb_dim_stats",
    "events_hourly_full_outer",
    "events_session_duration_stats",
    "events_user_features",
    "exists_late_shipment_orders",
    "g_cypher_scalar_fns",
    "g_import_cycles",
    "grouping_sets_report",
    "large_volume_customers",
    "late_shipment_priority_counts",
    "market_share_by_year",
    "orders_open_backlog",
    "part_supplier_counts",
    "product_type_profit",
    "region_volume_shipping",
    "returned_item_report",
    # ================== r9 50-query window boundary =====================
    # ============ ROUND-8 WINDOW (previous) =============================
    # Rotation rule (1): every query whose behavior round 8 touched —
    # the exact-substring span family (Arrow gram kernel, 60-bit BIGINT
    # keys, min<>max dup test, SQL twin re-keyed identically), every
    # set-overlap consumer (filter pushdown below the doc-recovery
    # joins, broadcast size joins, per-consumer caches replacing the raw
    # 44M-pair _OVERLAP_CACHE), the union-find hybrid (single
    # materialization + 1M-pair Arrow-collected driver path), and the
    # standing-index fingerprint/reattach paths (overlap tables, minhash
    # band table, frozen-IVF tables now survive sessions).
    "doc_dup_spans",
    "doc_dup_span_stats",
    "doc_dup_span_scrub",
    "ngram_jaccard_pairs",
    "doc_containment_pairs",
    "doc_minhash_jaccard_est",
    "doc_dup_clusters",
    "doc_dedup_keep_best",
    "doc_dedup_funnel",
    "doc_train_test_split",
    "source_overlap_matrix",
    "minhash_incremental_candidates",
    "emb_incremental_ivf_probe",
    # Rotation rule (2): longest outside the window — all 12 queries
    # last green in r2, all 24 last green in r3 (the g_cypher_* /
    # closure / decision-support vintage), and the alphabetically first
    # r4 row to fill the 50th slot.
    "g_override_edges",
    "left_outer_orders_per_customer",
    "moments_exact",
    "percentiles_by_segment",
    "pivot_status_by_segment",
    "point_lookup",
    "scan_filter_project",
    "semi_join_active_customers",
    "set_except_all",
    "set_intersect_all",
    "set_union_distinct",
    "window_rank_lag_running",
    "cube_returns_report",
    "doc_chunk_windows",
    "doc_decontaminate",
    "doc_pack_sequences",
    "doc_repetition_filter",
    "events_gap_fill_locf",
    "events_retention_cohorts",
    "g_call_closure",
    "g_call_edges",
    "g_cypher_code",
    "g_cypher_exists_skip",
    "g_cypher_extended",
    "g_cypher_match",
    "g_cypher_optional",
    "g_cypher_varlen",
    "g_cypher_with",
    "g_degree_centrality",
    "g_inherit_components",
    "g_inherits_edges",
    "g_reexport_contains",
    "g_uses_edges",
    "g_version_diff",
    "rollup_orders_report",
    "window_distribution_ranks",
    "best_balance_part_supplier",
    # ================== r8 50-query window boundary =====================
    # ============ ROUND-7 WINDOW (previous) =============================
    # Rotation rule (1): every query whose behavior round 7 touched —
    # the set-overlap family (posting-list standing index, join-free
    # in-array pair counting, two-BIGINT set keys), every consumer of the
    # _par_guard'd document Arrow passes (shingle/minhash/simhash/dup-span
    # hashing now parallelizes past single-split scans), the IVF
    # empty-centroid guard's cheapest family row, and
    # approx_distinct_orders' NEW checkable contract (exact + rel_err
    # flag — first oracle-checked driver row, VERDICT r6 item 7).
    "approx_distinct_orders",   # new (exact, rel_err_le_5pct) contract
    "doc_containment_pairs",    # the r6 perf-weak item: 8.8s -> ~2.9s
    "ngram_jaccard_pairs",
    "doc_minhash_jaccard_est",
    "doc_dup_clusters",
    "doc_dedup_keep_best",
    "doc_dedup_funnel",
    "source_overlap_matrix",
    "doc_train_test_split",     # _jaccard_pairs consumer; also r1-green only
    "simhash_fingerprint",
    "simhash_near_dup_pairs",   # sf1 growth 3.37x -> ~1.8x (_par_guard)
    "minhash_lsh_candidates",
    "minhash_incremental_candidates",
    "doc_dup_spans",
    "doc_dup_span_stats",
    "doc_dup_span_scrub",
    "emb_ivf_assign",           # empty-centroid guard (ADVICE r6)
    # -- r7 in-session plan changes: two-level simhash banding, the
    # multimodal _par_guard (Arrow pipelines repartitioned past
    # single-split scans), the approx_distinct split-aggregation --------
    "multimodal_frame_census",
    "multimodal_dedup",
    "multimodal_meta_extract",
    "multimodal_resolution_filter",
    # Rotation rule (2): longest outside the window — every remaining
    # query whose last driver row is r1, then r2, in name order.
    "case_when_bucketing",
    "date_parts_orders",
    "doc_fingerprint",
    "doc_lang_heuristic",
    "doc_token_stats",
    "events_asof_join",
    "events_dedup_first_per_key",
    "events_funnel",
    "events_json_extract",
    "events_range_join",
    "events_rollup_report",
    "events_sessionization",
    "events_sliding_window",
    "events_tumbling_window",
    "fuzzy_name_pairs",
    "pipeline_clean_corpus",
    "regex_group_extract",
    "scalar_string_funcs",
    "topk_orders",
    "agg_stats_by_segment",
    "anti_join_dormant_customers",
    "broadcast_dim_join",
    "dedupe_drop_duplicates",
    "doc_weighted_source_mix",
    "emb_centroid_by_label",
    "emb_int8_quantize",
    "filter_prefix_isin",
    "grouped_collect_sorted",
    "join_part_supplier_lineitem",
    "left_outer_orders_per_customer",
    "moments_exact",
    "percentiles_by_segment",
    "pivot_status_by_segment",
    # ================== r7 50-query window boundary =====================
    # ============ ROUND-6 WINDOW (previous) =============================
    # Rotation rule (1): the 5 queries that have NEVER had a driver
    # CORRECTNESS row lead (VERDICT r5 item 3 — after this window every
    # registered query has ≥1 lifetime driver row), followed by the only
    # never-GREEN row (emb_whiten — r5's harness-representation red, now
    # exploded to scalar rows), then EVERY query whose behavior round 6
    # touched: the bounded-block near-dup family (tiled integer-dgemm
    # kernel + new rounding convention), the set-overlap frame consumers
    # (set collapse + array_intersect verification), the simhash value
    # collapse, the IVF family (numpy distance kernel, dropped broadcast
    # hints), the persisted-bucket ingest probes, and the salted-agg
    # default change.
    "doc_length_histogram",    # never driver-checked (displaced in r5)
    "orders_monthly_growth",   # never driver-checked
    "value_range_window",      # never driver-checked
    "events_pivot_daily",      # never driver-checked
    "events_unpivot_daily",    # never driver-checked
    "emb_whiten",              # r5's only red row: now (vec_id, dim, val)
    # -- bounded-block near-dup family (kernel + convention change) ------
    "emb_near_dup_pairs",
    "emb_dup_clusters",
    "doc_semantic_dedup",
    "simhash_near_dup_pairs",
    # -- set-overlap frame restructure (collapse + intersect verify) -----
    "doc_containment_pairs",
    "ngram_jaccard_pairs",
    "doc_minhash_jaccard_est",
    "doc_dup_clusters",
    "doc_dedup_keep_best",
    "doc_dedup_funnel",
    "source_overlap_matrix",
    # -- IVF family: numpy distance kernel, hints dropped ----------------
    "emb_ivf_assign",
    "emb_ivf_topk",
    "emb_ivfpq_topk",
    "emb_pq_topk",
    "emb_pq_encode",
    "emb_kmeans_step",
    "emb_centroid_affinity",
    # -- persisted-bucket ingest probes (standing tables) ----------------
    "minhash_incremental_candidates",
    "emb_incremental_ivf_probe",
    # -- behavior-adjacent ------------------------------------------------
    "g_cypher_distinct_agg_projection",  # NEW r6: last DISTINCT refusal closed
    "events_salted_type_stats",  # content-only salt default (ADVICE r5)
    "g_cypher_call_procs",       # lazy propertyKeys (ADVICE r5)
    "multimodal_resolution_filter",  # codec probe change (ADVICE r5)
    "multimodal_frame_census",
    # -- longest outside the window (rotation rule 2): r1-green queries
    # that have not re-entered the hard signal since --------------------
    "revenue_by_nation",
    "pricing_summary",
    "g_point_lookup",
    "g_filter_kind_name",
    "g_methods_of_class",
    "g_module_children",
    "g_code_hydration",
    "g_kind_census",
    "g_version_stamping",
    "minhash_lsh_candidates",
    "doc_exact_dedup",
    "simhash_fingerprint",
    "emb_cosine_topk",
    "emb_ann_topk",
    "emb_norm_stats",
    "doc_tfidf_top_terms",
    "rolling_7d_customer_revenue",
    "doc_quality_score",
    "window_last_wins_merge",
    # ======================= 50-query window boundary ===================
    # Everything below has >=1 green driver CORRECTNESS row from r1-r5
    # plus the local check_oracle sweeps (both SFs, exact compare); the
    # most recently validated window (r5) rotates directly after.
    "g_import_cycles",
    "g_dead_code",
    "g_module_coupling",
    "emb_dim_stats",
    "events_user_features",
    "events_session_duration_stats",
    "doc_dup_spans",
    "doc_dup_span_stats",
    "source_overlap_matrix",
    "doc_dedup_funnel",
    "doc_quality_by_source",
    "customer_revenue_concentration",
    "orders_open_backlog",
    "doc_epoch_shuffle",
    "shipping_priority_topk",
    "region_volume_shipping",
    "market_share_by_year",
    "product_type_profit",
    "returned_item_report",
    "late_shipment_priority_counts",
    "customer_order_distribution",
    "top_revenue_supplier",
    "part_supplier_counts",
    "large_volume_customers",
    "disjunctive_bracket_revenue",
    "best_balance_part_supplier",
    "exists_late_shipment_orders",
    "subquery_small_quantity_revenue",
    "scalar_subquery_rich_inactive",
    "grouping_sets_report",
    "multimodal_resolution_filter",
    "multimodal_frame_census",
    "doc_pii_scrub",
    "g_kcore",
    "doc_containment_pairs",
    "ngram_jaccard_pairs",
    "doc_dup_clusters",
    "doc_dedup_keep_best",
    "g_cypher_scalar_fns",
    "events_hourly_full_outer",
    "g_pagerank_top",
    "emb_dup_clusters",
    "g_blast_radius",
    "g_call_edges_deep",
    "revenue_by_nation",
    "pricing_summary",
    "g_call_edges",
    "g_uses_edges",
    "g_methods_of_class",
    "g_version_stamping",
    "g_cypher_varlen",
    "g_cypher_match",
    "g_cypher_code",
    "g_override_edges",
    "g_call_closure",
    "g_inherit_components",
    "g_cypher_extended",
    "g_code_hydration",
    "g_degree_centrality",
    "g_cypher_optional",
    "g_cypher_with",
    "g_cypher_exists_skip",
    "g_point_lookup",
    "g_filter_kind_name",
    "g_module_children",
    "g_reexport_contains",
    "g_kind_census",
    "g_inherits_edges",
    "g_version_diff",
    "topk_orders",
    "scalar_string_funcs",
    "date_parts_orders",
    "case_when_bucketing",
    "fuzzy_name_pairs",
    "regex_group_extract",
    "events_tumbling_window",
    "events_sliding_window",
    "events_sessionization",
    "events_dedup_first_per_key",
    "events_asof_join",
    "events_range_join",
    "events_rollup_report",
    "events_json_extract",
    "events_funnel",
    "doc_token_stats",
    "doc_quality_score",
    "doc_lang_heuristic",
    "doc_fingerprint",
    "doc_exact_dedup",
    "simhash_fingerprint",
    "pipeline_clean_corpus",
    "doc_tfidf_top_terms",
    "doc_train_test_split",
    "agg_stats_by_segment",
    "broadcast_dim_join",
    "window_last_wins_merge",
]


def _reorder() -> None:
    ordered: dict[str, QueryFn] = {}
    for name in _DRIVER_PRIORITY:
        if name in QUERIES:
            ordered[name] = QUERIES[name]
    for name, fn in QUERIES.items():
        if name not in ordered:
            ordered[name] = fn
    QUERIES.clear()
    QUERIES.update(ordered)


def load_all() -> None:
    """Import every catalog module so decorators run. Idempotent."""
    import codegraphdb_spark.queries.relational  # noqa: F401
    import codegraphdb_spark.queries.decision_support  # noqa: F401
    import codegraphdb_spark.queries.events  # noqa: F401
    import codegraphdb_spark.queries.text  # noqa: F401
    import codegraphdb_spark.queries.similarity  # noqa: F401
    import codegraphdb_spark.queries.graph  # noqa: F401
    import codegraphdb_spark.queries.multimodal  # noqa: F401

    _reorder()
