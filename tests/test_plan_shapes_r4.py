"""Plan-shape guards for the round-4 query paths: the properties that make
them scale are asserted on the physical plan, not just implied by the code.
"""

from __future__ import annotations

from codegraphdb_spark import registry


def _plan(spark, sf_dir, name):
    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_pivot_single_scan_no_distinct_job(spark, sf_dir):
    """The explicit pivot value list means ONE events scan and ONE
    aggregation pipeline — no separate distinct-values pass over the
    corpus (pivot without a list runs one before the real aggregate)."""
    plan = _plan(spark, sf_dir, "events_pivot_daily")
    assert plan.count("Scan parquet") == 1, plan
    # partial+final pivot aggregate (one hash exchange) + output ordering
    assert plan.count("Exchange") <= 3, plan
    assert "pivotfirst" in plan, plan


def test_whiten_broadcasts_params_and_scans_twice(spark, sf_dir):
    """The 64-entry parameter row reaches the corpus via a broadcast
    product (one row — never a shuffle); the corpus is scanned once for
    calibration and once for the apply, and the whitening itself is
    map-side (no corpus-keyed join)."""
    plan = _plan(spark, sf_dir, "emb_whiten")
    assert "BroadcastNestedLoopJoin" in plan or "BroadcastExchange" in plan, plan
    assert plan.count("Scan parquet") == 2, plan
    assert "SortMergeJoin" not in plan, plan


def test_stratified_sample_one_window_pass(spark, sf_dir):
    """Per-stratum quota sampling: one source-keyed shuffle feeding the
    window; quota arithmetic rides the same window pass (no join back)."""
    plan = _plan(spark, sf_dir, "doc_stratified_sample")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan


def test_triangle_count_no_cartesian(spark, sf_dir):
    """Triangle enumeration joins on the shared vertex / closing edge —
    never a nested-loop product of the edge set with itself."""
    plan = _plan(spark, sf_dir, "g_triangle_count")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_keep_best_reuses_cached_pairs(spark, sf_dir):
    """Survivor selection runs over the session-cached Jaccard pair graph:
    the expensive shingle inverted-index does NOT reappear in this plan
    (no Python stage; the pair set enters as a checkpointed RDD scan)."""
    # warm the shared cache the way a pipeline would (clusters first)
    registry.load_all()
    registry.QUERIES["doc_dup_clusters"](spark, sf_dir).collect()
    plan = _plan(spark, sf_dir, "doc_dedup_keep_best")
    assert "MapInPandas" not in plan and "ArrowEvalPython" not in plan, plan


def test_bucketed_children_partition_pruned(spark, sf_dir):
    """The bucketed-snapshot query reads the managed tables with the
    rel_type=CONTAINS PARTITION filter pruned at the scan and the src
    point filter pushed to parquet. (The planner rightly disables the
    bucketed read here — the bound side broadcasts, so bucket co-location
    adds nothing; the zero-Exchange shuffle-join property is asserted in
    tests/test_bucketing.py with broadcast off.)"""
    plan = _plan(spark, sf_dir, "g_bucketed_children")
    assert "rel_type#" in plan and "= CONTAINS" in plan.replace(")", ") "), plan
    assert "EqualTo(src,pkga.base)" in plan, plan


def test_kmv_map_side_dedup_and_take_ordered(spark, sf_dir):
    """KMV: the scan stage map-side-dedups hashes BEFORE the exchange
    (the shuffle carries 8-byte distinct hashes, not the column), and the
    k-cut is a TakeOrdered — never a global sort."""
    plan = _plan(spark, sf_dir, "approx_distinct_kmv")
    assert "TakeOrderedAndProject" in plan, plan
    # partial dedup under each exchange: HashAggregate(keys=[h..]) appears
    # both below (map-side) and above (final) — at least 2 per branch
    assert plan.count("HashAggregate(keys=[h#") >= 4, plan
    # the only Sort is the 2-row output ordering on key_col — the k-cut
    # itself is the TakeOrdered, never a global sort of hashes
    assert plan.count("Sort ") <= 1, plan


def test_kmv_grouped_single_hash_shuffle(spark, sf_dir):
    """Grouped KMV: one deduped-hash exchange feeds the per-group window;
    the raw column never shuffles twice and nothing joins back."""
    plan = _plan(spark, sf_dir, "approx_distinct_kmv_by_flag")
    assert plan.count("Scan parquet") == 1, plan
    assert "Join" not in plan, plan
    assert "RunningWindowFunction" in plan or "Window" in plan, plan


def test_ivfpq_no_cartesian_all_small_sides_broadcast(spark, sf_dir):
    """IVF-PQ: candidates come from probed cells only — no corpus×corpus
    join anywhere; centroids/codebook/ADC tables ride broadcasts."""
    plan = _plan(spark, sf_dir, "emb_ivfpq_topk")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastHashJoin" in plan, plan
    assert "TakeOrderedAndProject" in plan or "Window" in plan, plan


def test_simhash_pairs_band_join_no_product(spark, sf_dir):
    """Banded simhash candidates join on (band_idx, band_val) — an equi-join
    over the exploded fingerprint bands, never a nested-loop product of the
    corpus with itself; the verify (popcount) is map-side after the join."""
    plan = _plan(spark, sf_dir, "simhash_near_dup_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # the Python fingerprint stage is checkpointed: it must not appear on
    # both sides of the self-join as two separate Python stages
    assert plan.count("mapInPandas") == 0, plan  # truncated to an RDD scan


def test_bigram_lm_counts_broadcast(spark, sf_dir):
    """The bigram/prefix count tables are vocab-bounded: both reach the
    scoring join as broadcasts — the corpus-sized occurrence stream is
    never shuffled for the join (only the count aggs and the per-doc mean
    shuffle, with map-side partial aggregation)."""
    plan = _plan(spark, sf_dir, "doc_bigram_lm_quality")
    assert plan.count("BroadcastHashJoin") >= 2, plan
    assert "SortMergeJoin" not in plan, plan
    assert "CartesianProduct" not in plan, plan


def test_top_paths_take_ordered_single_user_shuffle(spark, sf_dir):
    """The user window and the per-user path agg share ONE user-keyed
    exchange (same key — no re-shuffle between them); top-20 plans as
    TakeOrdered, never a global sort of all paths."""
    plan = _plan(spark, sf_dir, "events_top_paths")
    assert "TakeOrderedAndProject" in plan, plan
    assert plan.count("Exchange") <= 3, plan  # user hash, path hash, +AQE slack


def test_mmr_pool_cut_before_rerank(spark, sf_dir):
    """MMR's greedy re-rank plan runs entirely over the CHECKPOINTED
    candidate pool (the TakeOrdered pool cut happened in the checkpoint
    job): the corpus parquet is never re-scanned, the pair self-join is a
    broadcast of the tiny pool, and the re-rank is exactly ONE Arrow
    Python stage."""
    plan = _plan(spark, sf_dir, "emb_mmr_diversify")
    assert "Scan ExistingRDD" in plan, plan       # pool enters checkpointed
    assert "Scan parquet" not in plan, plan       # corpus not re-read
    assert plan.count("FlatMapGroupsInPandas") == 1, plan
    assert "BroadcastNestedLoopJoin" in plan, plan
