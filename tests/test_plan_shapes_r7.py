"""Round-7 plan shapes.

1. approx_distinct_orders must keep the HLL sketch and the exact
   COUNT(DISTINCT) in SEPARATE aggregations: mixing them in one
   Aggregate triggers the distinct-rewrite Expand plan, whose codegen
   enumerates the sketch's ~680-word buffer per projection — measured
   ~3.5s of driver plan-compile time per fresh plan (4.4s -> 1.0s for
   the query at sf0.1).
2. The multimodal Arrow pipelines must be par-guarded: document scans
   are 1-2 parquet splits at test SFs, which would serialize the
   synthesize/decode stages on one core. The guard repartitions only
   when the scan is narrower than the core count, so the plan at test
   SF must show a round-robin repartition feeding the Python stage.
"""

from __future__ import annotations

from codegraphdb_spark import registry
import __spark_entry__  # noqa: F401 — populate the registry

SF = "/root/testdata/sf0.001"


def _plan(spark, name):
    df = registry.QUERIES[name](spark, SF)
    return df._jdf.queryExecution().executedPlan().toString()


def test_approx_distinct_plan_has_no_expand(spark):
    plan = _plan(spark, "approx_distinct_orders")
    assert "Expand" not in plan, "HLL + countDistinct fused into one Expand"
    # both measures still present: the sketch and the exact count
    assert "approx_count_distinct" in plan
    # the exact side runs as dedup-then-count (two plain aggregates)
    assert plan.count("HashAggregate") >= 4


def test_multimodal_python_stages_are_par_guarded(spark):
    # _par_guard only repartitions when the scan's split count is BELOW
    # defaultParallelism; on a local[1] runner it is a correct no-op and
    # the RoundRobinPartitioning assertion would fail spuriously
    # (ADVICE r7).
    import pytest

    if spark.sparkContext.defaultParallelism <= 2:
        pytest.skip("par-guard is a no-op at defaultParallelism <= 2")
    for name in ("multimodal_frame_census", "multimodal_meta_extract",
                 "multimodal_dedup"):
        plan = _plan(spark, name)
        assert "MapInPandas" in plan, name
        # the guard's repartition must be in the plan at this (narrow) SF
        assert "RoundRobinPartitioning" in plan, name
