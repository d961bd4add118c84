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
    # -- round 4, session r4e: ExactSubstr dedup + contamination ---------
    "g_import_cycles",                 # NEW: SCCs of the import graph
    "g_dead_code",                     # NEW: unreferenced definitions
    "g_cypher_union",                  # NEW: UNION between full queries
    "g_module_coupling",               # NEW: afferent/efferent instability
    "events_cusum_drift",              # NEW: telescoped CUSUM change-point
    "emb_dim_stats",                   # behavior-adjacent: decimal(38,0) moment hardening
    "events_anomaly_zscore",           # behavior-adjacent: same hardening
    "events_user_features",            # NEW: feature-store grouped pass
    "events_session_duration_stats",   # NEW: session-quality summary
    "doc_dup_spans",                   # NEW: cross-doc duplicate spans
    "doc_dup_span_scrub",              # NEW: span excision, md5-pinned
    "doc_dup_span_stats",              # NEW: per-doc dup-token coverage
    "source_overlap_matrix",           # NEW: cross-source shingle Jaccard
    "doc_dedup_funnel",                # NEW: three-gate survivorship
    "doc_quality_by_source",           # NEW: per-source curation census
    "customer_revenue_concentration",  # NEW: Pareto cum-share top-k
    "orders_open_backlog",             # NEW: sweep-line interval counting
    # -- round 4, session r4d: TPC-H decision-support completion ---------
    "doc_epoch_shuffle",               # NEW: deterministic epoch sharding
    "shipping_priority_topk",          # NEW: Q3 top-k over 3-way join
    "region_volume_shipping",          # NEW: Q7 direction-paired dims
    "market_share_by_year",            # NEW: Q8 share-of-total ratio
    "product_type_profit",             # NEW: Q9 two-term profit delta
    "returned_item_report",            # NEW: Q10 returned-revenue top-k
    "late_shipment_priority_counts",   # NEW: Q12 conditional counts
    "customer_order_distribution",     # NEW: Q13 outer-join distribution
    "top_revenue_supplier",            # NEW: Q15 agg-equality scalar
    "part_supplier_counts",            # NEW: Q16 distinct-agg + anti join
    "large_volume_customers",          # NEW: Q18 HAVING-then-join
    "disjunctive_bracket_revenue",     # NEW: Q19 OR-bracket pushdown
    "best_balance_part_supplier",      # NEW: Q2 per-group window argmax
    # -- round 4, session r4c: newest, least-driver-validated first ------
    "exists_late_shipment_orders",     # NEW: correlated EXISTS → semi join
    "subquery_small_quantity_revenue",  # NEW: Q17-shape avg threshold
    "scalar_subquery_rich_inactive",   # NEW: scalar subquery + anti join
    "grouping_sets_report",            # NEW: explicit GROUPING SETS
    "multimodal_resolution_filter",    # NEW: header-metadata quality gate
    "multimodal_frame_census",         # NEW: 1-to-many frame expansion census
    "doc_pii_scrub",                   # NEW: denylist redaction, md5-verified
    "g_kcore",                         # NEW: h-index coreness, unrolled oracle
    "doc_containment_pairs",           # NEW: asymmetric subset/superset dedup
    "ngram_jaccard_pairs",             # behavior-adjacent: shared _pair_overlap refactor
    "doc_dup_clusters",                # behavior-adjacent: same refactored pair source
    "doc_dedup_keep_best",             # behavior-adjacent: same refactored pair source
    "g_cypher_scalar_fns",             # NEW: scalar string/list functions
    "events_hourly_full_outer",        # NEW: full-outer sparse alignment
    # -- r4d hybrid-fast-path behavior changes (driver-side replicas
    #    under the limit probe) not already in-window via g_kcore /
    #    doc_dup_clusters, plus the affected-set reverse-BFS change -----
    "g_pagerank_top",          # hybrid driver replica + replaced oracle
    "emb_dup_clusters",        # hybrid union-find (LSH candidate side)
    "g_blast_radius",          # reverse frontier BFS replaces closure
    # -- the one literal-pin oracle: keep under the hard gate every round
    "g_call_edges_deep",       # deep-resolution goldens (jedi-parity pin)
    # -- headliners: keep the flagship pair inside every window ----------
    "revenue_by_nation",
    "pricing_summary",
    # ======================= 50-query window boundary ===================
    # Spilled past the window this round (all green in the full local
    # sweep at three SFs; lowest re-check risk: trivial point/filter
    # shapes whose replaced oracles verified locally, one of two
    # shared-fragment KMV variants, Cypher read shapes structurally
    # identical to in-window siblings, and r4-early entries already
    # locally green at all SFs). r4c/r4d spills are structural siblings
    # of in-window entries: Q14/Q11/Q21 share the broadcast-dim +
    # conditional-agg shape with the 13 in-window decision-support
    # queries; seasonality/histogram/MoM are plain grouped-agg/window
    # shapes; value_range_window shares the RANGE-frame machinery with
    # in-window rolling windows:
    "promo_revenue_ratio",     # Q14 — sibling of in-window TPC-H block
    "having_share_threshold",  # Q11 — sibling of in-window TPC-H block
    "events_seasonality_profile",  # plain 168-cell grouped agg
    "doc_length_histogram",    # plain bucketed grouped agg
    "orders_monthly_growth",   # aggregate-then-window LAG
    "exclusive_late_supplier", # Q21 — sibling of in-window TPC-H block
    "value_range_window",      # RANGE frame sibling of rolling_7d
    "events_ewma",             # EWMA; stateful streaming twin equality-tested
    "events_ohlc_bars",        # OHLC bars; streaming twin equality-tested
    "events_salted_type_stats",# salt phase plan-asserted; agg family in-window
    "events_time_weighted_avg",# int-exact TWA; EWMA/OHLC siblings in-window
    "events_rollup_two_level", # rollup reuse; invariant-tested bit-identity
    "g_cypher_write_roundtrip",# write dispatch covered by the 19-test write suite
    "doc_minhash_jaccard_est", # integer-rational estimator; sketch family in-window via KMV tests
    "events_unpivot_daily",    # unpivot(pivot)=identity, sibling of in-window pivot
    "g_cypher_with_topn",      # WITH-pagination sibling of in-window cypher block
    "g_cypher_rel_props",      # single-hop rel-variable sibling of in-window cypher block
    "doc_lang_confusion",      # plain confusion-matrix grouped agg
    "events_value_mad",        # exact-percentile sibling of percentiles_by_segment
    "emb_centroid_affinity",   # scaled-int dot sibling of in-window label_outliers shape
    "emb_label_outliers",      # same centroid-affinity machinery
    "doc_shingle_novelty",     # first-seen MIN agg, plain shape
    "g_call_edges",            # r4a resolver surface — golden tests + local sweeps
    "g_uses_edges",            # same resolver surface
    "g_methods_of_class",      # replaced recursive-CTE oracle, locally green at 3 SFs
    "g_version_stamping",      # replaced merge-window oracle, locally green
    "g_cypher_varlen",         # relationship-uniqueness change, 72-test cypher suite
    "g_cypher_match",          # compiler surface, cypher suite + local sweeps
    "g_cypher_code",           # replaced render oracle, locally green
    "g_override_edges",        # replaced name-join oracle, locally green
    "approx_distinct_kmv",     # KMV sketch, invariant tests + local sweeps
    "emb_ivfpq_topk",          # ADC tier, recall stress + local sweeps
    "events_markov_transitions",  # integer transition matrix, locally green
    "g_cypher_shortest",       # shares varlen machinery with in-window varlen
    "g_call_closure",          # recursive-oracle sibling of in-window methods/stamping
    "g_inherit_components",    # recursive-oracle sibling of the same family
    "g_bucketed_children",     # bucketed layout; plan property also pytest-asserted
    "emb_whiten",              # broadcast-moments shape like in-window affinity
    "emb_recall_at_k",         # embeds sibling oracles of in-window ANN tiers
    "g_cypher_unwind_params",  # params/UNWIND machinery exercised by in-window topn
    "g_cypher_pattern_pred",   # semi/anti machinery shared with in-window EXISTS shapes
    "g_cypher_case",           # CASE machinery shared with in-window scalar_fns
    "emb_mmr_diversify",       # bounded-pool shape shared with in-window recall
    "doc_bigram_lm_quality",   # shares bigram CTE with spilled collocations
    "doc_semantic_dedup",      # shares component CTE with in-window emb family
    "events_top_paths",        # TakeOrdered shape shared with in-window topn
    "doc_top_collocations",    # shares bigram CTE with in-window lm_quality
    "emb_knn_classify",        # sibling broadcast-probe shape of in-window recall
    "simhash_near_dup_pairs",  # sibling banding shape of in-window minhash est
    "g_cypher_path",           # shares chain machinery with in-window shortest
    "g_cypher_unwind_prop",    # sibling of in-window unwind_params
    "g_cypher_extended",       # sibling of in-window g_cypher_match
    "g_code_hydration",        # sibling render of in-window g_cypher_code
    "g_degree_centrality",     # sibling analytic of in-window g_pagerank_top
    "events_pivot_daily",      # r4-early NEW; single-table pivot, local green
    "doc_stratified_sample",   # r4-early NEW; single-window quota sample
    "g_triangle_count",        # r4-early NEW; recomputing oracle, local green
    "approx_distinct_kmv_by_flag",  # shares SQL fragments with in-window KMV
    "g_cypher_optional",       # same compiler surface as in-window match/extended
    "g_cypher_with",
    "g_cypher_grouped",
    "g_cypher_exists_skip",
    "g_point_lookup",          # trivial C1 shape, recomputing oracle local green
    "g_filter_kind_name",      # trivial C2 shape
    "g_module_children",       # trivial C4 shape
    "g_reexport_contains",     # fixture rebuilt with the extended zoo side
    "g_kind_census",           # same build; census values must hold
    "g_inherits_edges",
    "g_blast_radius",          # pruned-update surface re-validated at 2k files
    "g_version_diff",
    # -- rotation: longest outside the checked window (r1, none since) ---
    "topk_orders",
    "scalar_string_funcs",
    "date_parts_orders",
    "case_when_bucketing",
    "fuzzy_name_pairs",
    "regex_group_extract",
    "events_tumbling_window",
    "events_sliding_window",
    "events_sessionization",
    "events_dedup_first_per_key",  # also: r2->r3 regression audited this round
    "events_asof_join",
    "events_range_join",
    "events_rollup_report",
    "events_json_extract",
    "events_funnel",               # also: regression audited this round
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
