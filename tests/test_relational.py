"""Semantic sanity tests for the relational catalog (invariants that an
oracle hash can't express: plan shape, pushdown, broadcast)."""

from __future__ import annotations

from codegraphdb_spark import registry

registry.load_all()


def test_flagship_shape(spark, sf_dir):
    df = registry.QUERIES["revenue_by_nation"](spark, sf_dir)
    rows = df.collect()
    assert 0 < len(rows) <= 25  # at most one row per nation
    assert rows[0]["revenue"] >= rows[-1]["revenue"]  # sorted desc
    assert all(r["revenue"] > 0 for r in rows)


def test_flagship_plan_broadcasts_dims(spark, sf_dir):
    df = registry.QUERIES["revenue_by_nation"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "BroadcastHashJoin" in plan  # nation/region must broadcast


def test_scan_filter_pushdown(spark, sf_dir):
    df = registry.QUERIES["scan_filter_project"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "PushedFilters: [" in plan
    assert "l_returnflag" in plan.split("PushedFilters")[1][:400]


def test_topk_uses_take_ordered(spark, sf_dir):
    df = registry.QUERIES["topk_orders"](spark, sf_dir)
    plan = df._jdf.queryExecution().executedPlan().toString()
    assert "TakeOrderedAndProject" in plan  # never a global sort


def test_point_lookup_single_row(spark, sf_dir):
    rows = registry.QUERIES["point_lookup"](spark, sf_dir).collect()
    assert len(rows) == 1 and rows[0]["c_custkey"] == 42


def test_kmv_accuracy_and_exact_fallback(spark):
    """KMV estimator: within 10% of exact when distinct >= k (sketch
    path, l_orderkey at sf0.01 has ~14.7k distinct vs k=1024) and EXACTLY
    the distinct count when below k (fallback path, l_partkey at sf0.001
    has 200 distinct)."""
    from tests.conftest import SF_MED, SF_SMALL

    est = {
        r["key_col"]: r["est_distinct"]
        for r in registry.QUERIES["approx_distinct_kmv"](spark, SF_MED).collect()
    }
    from codegraphdb_spark.sources.tables import load_table

    li = load_table(spark, SF_MED, "lineitem")
    exact_orders = li.select("l_orderkey").distinct().count()
    assert abs(est["l_orderkey"] - exact_orders) / exact_orders < 0.10

    small = {
        r["key_col"]: r["est_distinct"]
        for r in registry.QUERIES["approx_distinct_kmv"](spark, SF_SMALL).collect()
    }
    li_s = load_table(spark, SF_SMALL, "lineitem")
    assert small["l_partkey"] == li_s.select("l_partkey").distinct().count()
