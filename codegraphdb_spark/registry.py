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
    # -- round 3 late additions: new queries — must land in the window ---
    "rollup_orders_report",    # new (ROLLUP grouping sets, one-pass)
    "cube_returns_report",     # new (CUBE cross-tab with margins)
    "doc_chunk_windows",       # new (context-window chunking)
    "doc_pack_sequences",      # new (training-sequence packing bins)
    "emb_dim_stats",           # new (per-dim moments for whitening/PQ)
    "g_inherit_components",    # new (union-find reused on INHERITS)
    "g_call_closure",          # new (E1 closure on CALL edges)
    "g_blast_radius",          # new (pruned-update affected set as query)
    "g_cypher_grouped",        # new (implicit grouping + collect/min/max)
    "g_cypher_exists_skip",    # new (exists() + SKIP/LIMIT, ref B8 shape)
    "g_cypher_with",           # new (WITH pipeline: agg -> HAVING -> MATCH)
    "emb_pq_encode",           # new (product-quantization codes, 4th ANN tier)
    "emb_pq_topk",             # new (ADC top-k over PQ codes)
    "events_retention_cohorts",  # new (weekly cohort retention)
    "multimodal_meta_extract",   # new (real header parse under the hash gate)
    "window_distribution_ranks",  # new (percent_rank/cume_dist/ntile/first/last)
    "events_gap_fill_locf",      # new (dense-grid resample + LOCF fill)
    "events_anomaly_zscore",     # new (broadcast moments, z-score flags)
    # -- round 3: new, or CHANGED this round — must land in the window ---
    # (combined+concurrent fixture build; poison/param/return-type deep
    #  resolution; min-dist transitive closure; extended Cypher;
    #  per-plane LSH kernel; block-local near-dup; precomputed norms)
    "doc_repetition_filter",   # new (Gopher-style repetition gate)
    "doc_decontaminate",       # new (probe-set n-gram overlap)
    "emb_ann_topk",            # new + kernel/probe-path changed
    "emb_near_dup_pairs",      # rewritten (block-local applyInPandas)
    "emb_dup_clusters",        # new (union-find over embedding near-dups)
    "emb_ivf_topk",            # new (IVF-probed ANN, third tier)
    "emb_cosine_topk",         # changed (norms precomputed once)
    "minhash_lsh_candidates",  # changed (shared signature checkpoint)
    "g_cypher_extended",       # new
    "g_cypher_code",           # new (lazy <CODE> pointer through Cypher)
    "g_cypher_optional",       # new (OPTIONAL MATCH left join)
    "g_version_diff",          # new (v1→v2 census over the versions array)
    "g_call_edges_deep",       # new goldens (annotated + inferred factory returns)
    "multimodal_dedup",        # oracle changed (real header sniff)
    "ngram_jaccard_pairs",     # df cap added this round
    "doc_dup_clusters",        # consumes the same capped pair set
    # -- headliners: keep the flagship pair inside every window ----------
    "revenue_by_nation",
    "pricing_summary",
    "g_cypher_varlen",         # exercises var-length paths through the
                               # round-3 run_cypher refactor — stays checked
    "g_cypher_match",          # same: every Cypher-path query stays checked
    "g_point_lookup",
    "g_filter_kind_name",
    "g_module_children",
    "g_methods_of_class",
    "g_inherits_edges",
    "g_reexport_contains",
    "g_call_edges",
    "g_uses_edges",
    "g_version_stamping",
    "g_kind_census",
    "g_pagerank_top",
    "g_degree_centrality",
    "g_override_edges",
    "g_code_hydration",
    # -- rotation: checked in r1, outside the r2 window since ------------
    "topk_orders",
    "scalar_string_funcs",
    "date_parts_orders",
    "case_when_bucketing",
    "fuzzy_name_pairs",
    "regex_group_extract",
    "rolling_7d_customer_revenue",
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
    "minhash_lsh_candidates",
    "simhash_fingerprint",
    "pipeline_clean_corpus",
    "doc_tfidf_top_terms",
    "doc_train_test_split",
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
    import codegraphdb_spark.queries.events  # noqa: F401
    import codegraphdb_spark.queries.text  # noqa: F401
    import codegraphdb_spark.queries.similarity  # noqa: F401
    import codegraphdb_spark.queries.graph  # noqa: F401
    import codegraphdb_spark.queries.multimodal  # noqa: F401

    _reorder()
