"""Plan-shape guards for the round-4b decision-support subquery shapes:
each correlated-subquery form must decorrelate into the join Catalyst
would pick by hand — no nested-loop re-execution, no cartesian blowup.
"""

from __future__ import annotations

from codegraphdb_spark import registry


def _plan(spark, sf_dir, name):
    registry.load_all()
    df = registry.QUERIES[name](spark, sf_dir)
    return df._jdf.queryExecution().executedPlan().toString()


def test_exists_decorrelates_to_semi_join(spark, sf_dir):
    """Correlated EXISTS = one LEFT SEMI join on the correlation key with
    the non-equi date predicate as a join condition; the order-date range
    is pushed to the orders scan."""
    plan = _plan(spark, sf_dir, "exists_late_shipment_orders")
    assert "LeftSemi" in plan, plan
    assert "CartesianProduct" not in plan, plan
    assert plan.count("Scan parquet") == 2, plan
    assert "GreaterThanOrEqual(o_orderdate" in plan, plan


def test_avg_threshold_reuses_partkey_exchange(spark, sf_dir):
    """The per-part average and its re-join shuffle on the SAME key —
    the partkey exchange is planned once and reused (Spark's ReusedExchange
    or an aligned output partitioning), never a cartesian."""
    plan = _plan(spark, sf_dir, "subquery_small_quantity_revenue")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan
    # lineitem twice (agg + probe) and part once
    assert plan.count("Scan parquet") == 3, plan


def test_scalar_subquery_is_one_row_broadcast(spark, sf_dir):
    """The global-average scalar reaches customers as a broadcast 1-row
    product; the no-finalized-orders probe is a LEFT ANTI join whose build
    side carries only o_custkey (pruned read schema)."""
    plan = _plan(spark, sf_dir, "scalar_subquery_rich_inactive")
    assert "BroadcastNestedLoopJoin" in plan, plan
    assert "LeftAnti" in plan, plan
    assert "ReadSchema: struct<o_custkey:bigint,o_orderstatus:string>" in plan, plan
    assert "EqualTo(o_orderstatus,F)" in plan, plan


def test_grouping_sets_expand_over_partials(spark, sf_dir):
    """GROUPING SETS runs two-phase: Expand sits ABOVE the finest-grain
    partial aggregate (~15 rows), so the row multiplication never touches
    the fact table; exactly one orders scan."""
    plan = _plan(spark, sf_dir, "grouping_sets_report")
    assert "Expand" in plan, plan
    assert plan.count("Scan parquet") == 1, plan
    # Expand must appear before (above) the scan but after a HashAggregate
    # pair that groups by both raw keys — assert the partial agg exists
    # below the Expand by plan order: Expand's first occurrence is later
    # in the string than the first HashAggregate that mentions both keys.
    first_expand = plan.index("Expand")
    assert "HashAggregate" in plan[first_expand:], plan


def test_ohlc_single_exchange_for_windows_and_agg(spark, sf_dir):
    """Both row_number windows and the OHLC aggregate share the
    (day, type) partitioning: one hash exchange total (plus the output
    range sort); one events scan."""
    plan = _plan(spark, sf_dir, "events_ohlc_bars")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Window" in plan, plan


def test_ewma_one_user_shuffle_one_sort(spark, sf_dir):
    """All 8 lags ride a single user_id window pass: one hash exchange,
    one per-partition sort, no self-joins."""
    plan = _plan(spark, sf_dir, "events_ewma")
    assert plan.count("Scan parquet") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_pii_scrub_map_only(spark, sf_dir):
    """Denylist scrubbing is scan-speed: no hash exchange anywhere —
    the only exchange is the presentation sort's range partitioning."""
    plan = _plan(spark, sf_dir, "doc_pii_scrub")
    assert plan.count("Scan parquet") == 1, plan
    assert "Exchange hashpartitioning" not in plan, plan
    assert "Join" not in plan, plan


def test_resolution_filter_headers_only(spark, sf_dir):
    """The metadata gate aggregates header geometry — one Arrow stage,
    one tiny-key (format) shuffle; payload bytes never enter a shuffle."""
    plan = _plan(spark, sf_dir, "multimodal_resolution_filter")
    assert plan.count("MapInPandas") == 1, plan
    assert plan.count("Exchange hashpartitioning") == 1, plan


def test_containment_pairs_inverted_index_never_cross(spark, sf_dir):
    """Containment pairs come from the same df-capped inverted-index join
    as Jaccard — a shared-shingle equi-join, never a document cross
    product; the keep-cut is integer arithmetic inside the same stage."""
    plan = _plan(spark, sf_dir, "doc_containment_pairs")
    assert "CartesianProduct" not in plan, plan
    assert "BroadcastNestedLoopJoin" not in plan, plan


def test_salted_agg_two_phase_visible_in_plan(spark, sf_dir):
    """Skew salting is structural: phase 1 groups on (key, __salt) —
    the salt column appears in the first aggregate's grouping — and the
    merge phase re-exchanges on the key alone: exactly two hash
    exchanges, one scan."""
    plan = _plan(spark, sf_dir, "events_salted_type_stats")
    assert "__salt" in plan, plan
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Scan parquet") == 1, plan


def test_twa_window_and_agg_share_partitioning(spark, sf_dir):
    """The LEAD window and the (user, day) aggregate ride ONE exchange."""
    plan = _plan(spark, sf_dir, "events_time_weighted_avg")
    assert plan.count("Exchange hashpartitioning") == 1, plan
    assert "Join" not in plan, plan


def test_two_level_rollup_reaggregates_partials(spark, sf_dir):
    """Daily bars fold hourly partials: two aggregate levels, two hash
    exchanges, single scan of the tick table."""
    plan = _plan(spark, sf_dir, "events_rollup_two_level")
    assert plan.count("Exchange hashpartitioning") == 2, plan
    assert plan.count("Scan parquet") == 1, plan
